"""Device-mesh helpers.

The framework uses one mesh axis "d" for the recommender parallelism pattern
(SURVEY §2.3): embedding tables row-sharded over "d" (the reference's
mod-num_ps / alltoall sharding, distributed_ps.py:289,
distributed_ps_sync.py:95), dense tower data-parallel over the same axis
(the reference's Horovod allreduce, feature_utils.py:48)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "d") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        if len(devices) < num_devices:
            raise ValueError(f"need {num_devices} devices, have {len(devices)}")
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))
