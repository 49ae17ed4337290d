"""Notebook helpers (the reference's notebook_helper.py:22-32)."""
from __future__ import annotations

import shlex
from typing import List


def text_to_args(text: str) -> List[str]:
    """Flag string -> argv list for driving the CLIs from a notebook:

        from cl_object_detection_tpu.cli import train
        train.main(text_to_args("--scenario 15 1 --distill true"))
    """
    return shlex.split(text.replace("\n", " "))
