"""Device mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(db: Optional[int] = None, batch: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build the engine's 2-D ("db", "batch") mesh.

    Defaults: all available devices, with the "db" axis as large as
    possible (the database shard axis dominates memory) and "batch"
    taking the remainder.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if db is None and batch is None:
        batch = 1
        db = n
    elif db is None:
        db = n // batch
    elif batch is None:
        batch = n // db
    if db * batch != n:
        raise ValueError(f"mesh {db}x{batch} != {n} devices")
    arr = np.array(devices).reshape(db, batch)
    return Mesh(arr, ("db", "batch"))
