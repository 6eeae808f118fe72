"""Multi-host initialization and index sharding plan.

The reference is single-process (SURVEY.md §2.7); scale-out is this
framework's addition.  The deployment model:

  * `init_distributed()` — jax.distributed.initialize() on every host;
    afterwards jax.devices() spans the pod slice and `make_mesh` builds a
    ('data','shard') mesh whose collectives ride ICI within a slice and DCN
    across slices.
  * The genome's PQ codes / vectors are sharded row-wise over 'shard' (each
    host embeds and encodes only its window range — `plan_shards` computes the
    ranges), reads stream data-parallel over 'data', and per-shard top-k
    merges with all_gather + lax.top_k (sharded_search.py).
  * Checkpoint story: each host persists its own shard (index_prefix/shard_i),
    the config.txt records the shard plan, and any host count that divides the
    shard count can reload.
"""

from __future__ import annotations

import jax


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """jax.distributed.initialize wrapper; no-op on single-process setups
    where env-based auto-detection applies."""
    if num_processes is None and coordinator_address is None:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process / already initialized
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def plan_shards(n_vectors: int, n_shards: int) -> list[tuple[int, int]]:
    """Row ranges per shard, padded so every shard holds the same count
    (fixed shapes for the collectives); the pad rows are masked by id bound.
    """
    per = -(-n_vectors // n_shards)
    return [(s * per, min((s + 1) * per, n_vectors)) for s in range(n_shards)]
