"""Index engine registry.

The reference ships four engines selected at compile time (hnswpq active;
hnswlib/hnswm/gann disabled — CMakeLists.txt:84-89).  We select by the
``index_type`` key persisted in the index directory's config.txt
(src/hnswpq/index.cpp:289-302) so every engine is runtime-loadable.
"""

from __future__ import annotations

import os

from deepreadmapper_tpu.io.configstore import load_config

_REGISTRY: dict[str, type] = {}


def register_index(index_type: str):
    def deco(cls):
        _REGISTRY[index_type] = cls
        cls.index_type = index_type
        return cls

    return deco


def load_index(index_prefix: str):
    """Load an index directory (config.txt + engine files); returns
    (engine, config)."""
    config_path = os.path.join(index_prefix, "config.txt")
    if not os.path.exists(config_path):
        raise FileNotFoundError(f"Config file does not exist: {config_path}")
    config = load_config(config_path)
    itype = str(config.get("index_type", ""))
    if os.path.exists(os.path.join(index_prefix, "sharded.txt")):
        # Mesh-sharded index (parallel/sharded_ann.py): one sub-index per
        # shard axis position; builds a ('data','shard') mesh over the
        # available devices.  Under jax.distributed (multiple processes)
        # each host loads ONLY its own shards and search runs the same
        # SPMD program everywhere (load_distributed).
        from deepreadmapper_tpu.parallel.mesh import make_mesh
        from deepreadmapper_tpu.parallel.sharded_ann import (
            ShardedANNIndex,
            read_manifest,
        )
        import jax

        if jax.process_count() > 1:
            return ShardedANNIndex.load_distributed(index_prefix), config
        n_shard = int(read_manifest(index_prefix)["n_shard"])
        mesh = make_mesh(n_shard=n_shard)
        return ShardedANNIndex.load(index_prefix, mesh), config
    cls = _REGISTRY.get(itype)
    if cls is None:
        raise ValueError(
            f"Unknown index_type {itype!r}; known: {sorted(_REGISTRY)}"
        )
    return cls.load(index_prefix, config), config
