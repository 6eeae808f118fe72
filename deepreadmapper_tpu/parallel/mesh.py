"""Device mesh construction.

The framework's parallelism (SURVEY.md §2.7, §5) is:

  * 'data'  — batch-axis data parallelism over reads (embedding, training,
              rerank); the TPU replacement for the reference's OpenMP
              per-query loops and OpenVINO request pipelining.
  * 'shard' — index sharding: reference vectors / PQ codes partitioned
              across devices; per-shard top-k then all-gather + global
              top-k merge (the multi-host dimension the reference lacks).

On a pod slice 'data' x 'shard' should map to ICI; jax.distributed extends
the same mesh across hosts over DCN.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    n_data: int | None = None,
    n_shard: int = 1,
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_shard
    n = n_data * n_shard
    if n > len(devices):
        raise ValueError(f"mesh {n_data}x{n_shard} needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(n_data, n_shard)
    return Mesh(arr, axis_names=("data", "shard"))
