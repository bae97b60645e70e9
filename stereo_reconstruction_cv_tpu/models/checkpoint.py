"""Model checkpoint save/restore (orbax) for the learned-feature model.

Checkpoint/resume at the model level complements the stage-artifact cache
(pipeline/cache.py) — SURVEY §5 checkpoint row.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def save_params(path: str, params: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, like: Any | None = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        # Concrete sharding on the current default device so checkpoints
        # restore across device types (saved on TPU, loaded on CPU, etc.).
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        target = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding),
            like,
        )
        return ckptr.restore(path, target)
    return ckptr.restore(path)
