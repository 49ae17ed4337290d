"""Train state: params + frozen batch stats + optimizer state + the
explicit gradient accumulator.

Accumulation is explicit (not optax.MultiSteps) because the reference
applies clip -> warm-classifier grad-zero -> A-GEM projection ON THE
ACCUMULATED gradient at step time (train.py:54-72), and A-GEM projection
is not linear — it must see the summed gradient, not each mini-step.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray                   # total micro-steps taken
    params: Any
    batch_stats: Any                    # frozen BN stats (never updated)
    opt_state: Any
    grad_acc: Any                       # gradient accumulator pytree
    acc_count: jnp.ndarray              # micro-steps since last apply
    tx: Any = struct.field(pytree_node=False)

    @classmethod
    def create(cls, *, params, batch_stats, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            grad_acc=jax.tree.map(jnp.zeros_like, params),
            acc_count=jnp.zeros((), jnp.int32),
            tx=tx,
        )

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}
