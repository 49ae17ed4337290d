"""Native (C++) runtime components with on-demand build + ctypes bindings.

The reference leaned on library-level native kernels (pycocotools C
extensions, torchvision C++ NMS — SURVEY.md §2.4); this package owns its
own: a COCO-protocol evaluator core and a CPU greedy NMS. The shared
library builds lazily with g++ (cached next to the source); every entry
point has a pure-Python fallback so the framework works without a
toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "coco_eval.cpp")
_LIB = os.path.join(_HERE, "libcocoeval.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[str]:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB
    except Exception as e:  # toolchain missing / sandboxed FS
        print(f"native build failed ({e}); using Python fallbacks")
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _build()
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
        lib.coco_eval_class.restype = ctypes.c_int
        lib.coco_eval_class.argtypes = [
            ctypes.POINTER(ctypes.c_int),      # det_img
            ctypes.POINTER(ctypes.c_float),    # det_score
            ctypes.POINTER(ctypes.c_float),    # det_box
            ctypes.c_int64,                    # n_det
            ctypes.POINTER(ctypes.c_int),      # gt_img
            ctypes.POINTER(ctypes.c_float),    # gt_box
            ctypes.c_int64,                    # n_gt
            ctypes.c_int,                      # n_imgs
            ctypes.c_int,                      # max_dets
            ctypes.POINTER(ctypes.c_double),   # out[2]
        ]
        lib.greedy_nms.restype = None
        lib.greedy_nms.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
    return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def coco_eval_class_native(
    det_img: np.ndarray,      # (N,) int32, image indices 0..n_imgs-1
    det_score: np.ndarray,    # (N,) float32
    det_box: np.ndarray,      # (N, 4) float32 xywh
    gt_img: np.ndarray,       # (M,) int32
    gt_box: np.ndarray,       # (M, 4) float32 xywh
    n_imgs: int,
    max_dets: int = 100,
) -> Optional[Tuple[float, float]]:
    """(ap50, ar) via the C++ core; None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    det_img = np.ascontiguousarray(det_img, np.int32)
    det_score = np.ascontiguousarray(det_score, np.float32)
    det_box = np.ascontiguousarray(det_box, np.float32)
    gt_img = np.ascontiguousarray(gt_img, np.int32)
    gt_box = np.ascontiguousarray(gt_box, np.float32)
    out = np.zeros(2, np.float64)
    lib.coco_eval_class(
        _ptr(det_img, ctypes.c_int), _ptr(det_score, ctypes.c_float),
        _ptr(det_box, ctypes.c_float), len(det_img),
        _ptr(gt_img, ctypes.c_int), _ptr(gt_box, ctypes.c_float),
        len(gt_img), n_imgs, max_dets, _ptr(out, ctypes.c_double),
    )
    return float(out[0]), float(out[1])


def greedy_nms_native(
    boxes: np.ndarray,        # (n, 4) float32 xyxy, score-desc sorted
    scores: np.ndarray,       # (n,) float32
    iou_thresh: float,
) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    keep = np.zeros(len(boxes), np.uint8)
    lib.greedy_nms(
        _ptr(boxes, ctypes.c_float), _ptr(scores, ctypes.c_float),
        len(boxes), iou_thresh, _ptr(keep, ctypes.c_uint8),
    )
    return keep.astype(bool)
