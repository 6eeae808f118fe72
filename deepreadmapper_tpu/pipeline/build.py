"""Index build pipeline (reference: src/hnswpq/index.cpp:195-316).

ref input (FASTA/txt/npy) -> window stream -> tokenize -> encoder -> embeddings
-> index engine build -> persist (config.txt + engine files).
"""

from __future__ import annotations

import os

import numpy as np

from deepreadmapper_tpu import tokenizer as tok
from deepreadmapper_tpu.config import BuildConfig
from deepreadmapper_tpu.io import fasta as fasta_io
from deepreadmapper_tpu.io.configstore import save_config
from deepreadmapper_tpu.io.readers import FASTA_EXTS, FASTQ_EXTS, read_txt
from deepreadmapper_tpu.io.results import load_embeddings_npy
from deepreadmapper_tpu.models.encoder import Vectorizer


def _resolve_weights(weights: str | None, vectorizer: Vectorizer | None):
    """Resolve the (weights=, vectorizer=) pair for a build — shared by
    build_index and build_index_distributed so the two paths cannot drift.

    Both are allowed ONLY when they agree (harnesses pre-load the tuned
    encoder once to avoid per-build re-jits); a mismatched pair would embed
    windows with one encoder while recording another for query time — the
    exact footgun weights= exists to prevent.  Agreement is EXACT
    (array_equal on host copies fetched once): near-identical fine-tunes
    are still different encoders."""
    if weights is None:
        return vectorizer or Vectorizer()
    import jax

    from deepreadmapper_tpu.models.encoder import load_params

    tuned = load_params(weights)
    if vectorizer is None:
        return Vectorizer(tuned)
    lv = jax.tree_util.tree_leaves(jax.device_get(vectorizer.params))
    lw = jax.tree_util.tree_leaves(jax.device_get(tuned))
    if len(lv) != len(lw) or not all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(lv, lw)
    ):
        raise ValueError(
            "vectorizer= params do not match weights= — pass one, "
            "or load the vectorizer from the same npz"
        )
    return vectorizer


def embed_fasta_windows(
    records: list[np.ndarray],
    ref_len: int,
    stride: int,
    vectorizer: Vectorizer,
    window_chunk: int = 65536,
    device_out: bool = False,
    chunk_transform=None,
):
    """Embed every (fwd, revcomp) window of every record, streamed in chunks
    so genome-scale inputs never materialize all window bytes at once.

    device_out=True returns a jax array resident on device (quantizing builds
    encode straight from it, skipping a 512 B/window host download).
    chunk_transform, when given, is applied to each device chunk BEFORE
    collection (e.g. int8 quantization) — fp32 embeddings of a genome-scale
    index would not fit HBM all at once (40M windows = 20 GB fp32 vs 5 GB
    int8)."""
    from deepreadmapper_tpu.utils.progress import Progress

    outs = []
    total = 2 * sum(
        fasta_io.num_windows(len(r), ref_len, stride) for r in records
    )
    with Progress(total, "[BUILD] embed windows") as prog:
        for rec in records:
            nw = fasta_io.num_windows(len(rec), ref_len, stride)
            if nw == 0:
                continue
            for start in range(0, nw, window_chunk):
                n = min(window_chunk, nw - start)
                outs.append(
                    _embed_record_windows(
                        rec, ref_len, stride, start, n, vectorizer,
                        transform=chunk_transform, device_out=device_out,
                    )
                )
                prog.update(2 * n)
    if not outs:
        z = np.zeros((0, 128), dtype=np.float32)
        if chunk_transform is not None:
            z = np.asarray(chunk_transform(jnp_asarray(z)))
        return jnp_asarray(z) if device_out else z
    if device_out:
        return jnp_concat(outs)
    return np.concatenate(outs, axis=0)


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def jnp_concat(xs):
    import jax.numpy as jnp

    return jnp.concatenate(xs, axis=0) if len(xs) > 1 else xs[0]


def _embed_record_windows(rec, ref_len: int, stride: int, first: int,
                          n: int, vectorizer: Vectorizer, transform=None,
                          device_out: bool = False):
    """Embed windows [first, first+n) of ONE record -> [2n, 128]
    (interleaved fwd/rev, the row = 2*window + strand convention).

    THE chunk-embed step every build/stream path shares: fused native
    windowing+revcomp+2-bit wire with on-device tokenization when
    available, native tokenize else, pure-host fallback last.  transform
    (e.g. int8 quantization) applies ON DEVICE before any fetch —
    genome-scale downloads ship 128 B/row codes, not 512 B fp32."""
    from deepreadmapper_tpu import native

    if native.available() and vectorizer.max_len == tok.MAX_LEN:
        wire = native.pack_windows(rec, ref_len, stride, first, n)
        emb = vectorizer.vectorize_wire(wire, device_out=True)
    else:
        if native.available():
            tokens = native.tokenize_windows(
                rec, ref_len, stride, first, n, vectorizer.max_len
            )
        else:
            positions = (first + np.arange(n, dtype=np.int64)) * stride
            mat, lengths = fasta_io.window_byte_matrix(
                rec, positions, ref_len, vectorizer.max_len
            )
            tokens = tok.tokenize_bytes(mat, lengths, vectorizer.max_len)
        emb = vectorizer.vectorize_tokens(tokens, device_out=True)
    if transform is not None:
        emb = transform(jnp_asarray(emb))
    return emb if device_out else np.asarray(emb)


def stream_codes_resumable(
    records: list[np.ndarray],
    ref_len: int,
    stride: int,
    vectorizer: Vectorizer,
    transform,
    cache_path: str,
    n_cols: int,
    dtype: str,
    window_chunk: int = 65536,
) -> np.ndarray:
    """Embed every (fwd, rev) window, appending each transformed chunk to a
    resumable on-disk npy; chunks already on disk are skipped entirely (no
    re-embed, no re-transfer).  The chunk grid is deterministic (record
    order × window_chunk), so after a crash the stream truncates back to
    the last complete chunk boundary and continues from there.  Beyond the
    reference: its resumable path (format_fasta_batch's resume_pos state,
    parse_inputs.cpp:371-482) survives only within one process; this one
    survives the process dying.  Returns the finished code matrix
    (memory-mapped — genome-scale codes need not fit RAM)."""
    from deepreadmapper_tpu.io.npy_stream import NpyStreamWriter
    from deepreadmapper_tpu.utils.progress import Progress

    total = 2 * sum(
        fasta_io.num_windows(len(r), ref_len, stride) for r in records
    )
    w = NpyStreamWriter.resume(cache_path, total, n_cols, dtype)
    if w.rows_written:
        print(
            f"[BUILD INDEX] resuming embed stream: {w.rows_written}/{total} "
            "rows already on disk"
        )
    cursor = 0
    with Progress(total, "[BUILD] embed windows") as prog:
        for rec in records:
            nw = fasta_io.num_windows(len(rec), ref_len, stride)
            for start in range(0, nw, window_chunk):
                n = min(window_chunk, nw - start)
                if w.rows_written >= cursor + 2 * n:
                    cursor += 2 * n  # chunk fully on disk from a prior run
                    prog.update(2 * n)
                    continue
                if w.rows_written > cursor:
                    w.truncate_to(cursor)  # half-written chunk: redo it
                w.append(
                    _embed_record_windows(
                        rec, ref_len, stride, start, n, vectorizer,
                        transform=transform,
                    )
                )
                cursor += 2 * n
                prog.update(2 * n)
    w.close()
    return np.load(cache_path, mmap_mode="r")


def make_fasta_embed_rows(
    fasta_path: str,
    ref_len: int,
    stride: int,
    vectorizer: Vectorizer,
    window_chunk: int = 65536,
    transform=None,
):
    """embed_rows(start, end) factory for per-host distributed builds
    (parallel/distributed.build_own_shards): embeds exactly the global
    VECTOR-row range [start, end) of the FASTA's interleaved (fwd, rev)
    window stream — record-aware, so a host touches only the genome bytes
    its shard covers.  transform applies on device before the fetch (int8
    quantization ships 128 B/row instead of 512 B fp32 — genome builds are
    transfer-bound)."""
    records = fasta_io.parse_fasta_records(fasta_path)
    nwins = [fasta_io.num_windows(len(r), ref_len, stride) for r in records]
    bounds = np.concatenate(
        [[0], np.cumsum([2 * n for n in nwins])]
    ).astype(np.int64)

    def embed_rows(start: int, end: int) -> np.ndarray:
        outs = []
        for ri, rec in enumerate(records):
            lo = int(max(start, bounds[ri]))
            hi = int(min(end, bounds[ri + 1]))
            if lo >= hi:
                continue
            # covering window range (rows are 2*window + strand)
            rlo = lo - int(bounds[ri])
            rhi = hi - int(bounds[ri])
            w0 = rlo // 2
            w1 = (rhi + 1) // 2
            parts = []
            for ws in range(w0, w1, window_chunk):
                n = min(window_chunk, w1 - ws)
                parts.append(
                    _embed_record_windows(
                        rec, ref_len, stride, ws, n, vectorizer,
                        transform=transform,
                    )
                )
            emb = parts[0] if len(parts) == 1 else np.concatenate(parts)
            outs.append(emb[rlo - 2 * w0: rhi - 2 * w0])
        if not outs:
            dtype = np.int8 if transform is not None else np.float32
            return np.zeros((0, 128), dtype)
        return outs[0] if len(outs) == 1 else np.concatenate(outs)

    embed_rows.n_vectors = int(bounds[-1])
    return embed_rows


def build_index_distributed(
    ref_file: str,
    index_prefix: str,
    ref_len: int,
    stride: int = 1,
    index_type: str = "INT8FLAT",
    build_cfg: BuildConfig | None = None,
    vectorizer: Vectorizer | None = None,
    n_shards: int = 1,
    weights: str | None = None,
) -> dict:
    """Per-host sharded build: every jax.distributed process embeds and
    persists ONLY its own shards (its slice of the genome's window rows);
    process 0 writes the manifest and config.txt.  Single-process calls
    build every shard — same on-disk layout as build_index(n_shards=...).
    """
    import jax

    from deepreadmapper_tpu.parallel.distributed import build_own_shards

    cfg = build_cfg or BuildConfig()
    vectorizer = _resolve_weights(weights, vectorizer)
    codes_scale = None
    transform = None
    if index_type in ("INT8FLAT", "IVFINT8"):
        # quantize ON DEVICE and ship int8 codes (128 B/row vs 512 B fp32 —
        # genome builds are transfer-bound); encoder outputs are
        # tanh-bounded so the fixed 1/127 scale is what build() would
        # derive anyway (same convention as build_index's int8_stream path)
        from deepreadmapper_tpu.index.int8_flat import quantize

        codes_scale = 1.0 / 127.0
        transform = lambda e: quantize(e, codes_scale)  # noqa: E731
    embed_rows = make_fasta_embed_rows(
        ref_file, ref_len, stride, vectorizer, transform=transform
    )
    n_vectors = embed_rows.n_vectors
    build_own_shards(
        embed_rows, n_vectors, n_shards, index_prefix,
        cfg=cfg, index_type=index_type, codes_scale=codes_scale,
    )
    config = {
        "index_type": index_type,
        "stride": stride,
        "ref_len": ref_len,
        "n_vects": n_vectors,
        "dim": 128,
        "M_hnsw": cfg.m_hnsw,
        "EFC": cfg.efc,
        "M_pq": cfg.m_pq,
        "nbits": cfg.nbits,
        "index_file": "sharded",
    }
    if weights is not None:
        config["weights"] = "encoder.npz"
    if jax.process_index() == 0:
        if weights is not None:
            import shutil

            os.makedirs(index_prefix, exist_ok=True)
            shutil.copyfile(
                weights, os.path.join(index_prefix, "encoder.npz")
            )
        save_config(config, index_prefix)
    return config


def stream_embed_fasta_to_npy(
    fasta_path: str,
    out_path: str,
    ref_len: int,
    stride: int,
    vectorizer: Vectorizer,
    window_chunk: int = 65536,
) -> int:
    """Stream-embed every window of a FASTA straight into a pre-headered npy
    (the reference `inference` tool's batch mode, test_inference.cpp:160-227).
    Bounded memory regardless of genome size; returns rows written."""
    from deepreadmapper_tpu.io.npy_stream import NpyStreamWriter

    records = fasta_io.parse_fasta_records(fasta_path)
    total = sum(
        2 * fasta_io.num_windows(len(r), ref_len, stride) for r in records
    )
    from deepreadmapper_tpu.utils.progress import Progress

    with NpyStreamWriter(out_path, total, 128) as w, \
            Progress(total, "[INFERENCE] embed windows") as prog:
        for rec in records:
            nw = fasta_io.num_windows(len(rec), ref_len, stride)
            for start in range(0, nw, window_chunk):
                n = min(window_chunk, nw - start)
                w.append(
                    _embed_record_windows(
                        rec, ref_len, stride, start, n, vectorizer
                    )
                )
                prog.update(2 * n)
    return total


def embed_input_file(
    path: str, ref_len: int, stride: int, vectorizer: Vectorizer,
    device_out: bool = False,
):
    from deepreadmapper_tpu.io.fileio import true_ext

    ext = true_ext(path)
    if ext == ".npy":
        return load_embeddings_npy(path)
    if ext in FASTA_EXTS:
        records = fasta_io.parse_fasta_records(path)
        return embed_fasta_windows(
            records, ref_len, stride, vectorizer, device_out=device_out
        )
    if ext in FASTQ_EXTS:
        from deepreadmapper_tpu.io.fastq import parse_fastq_bytes

        mat, lengths, _ = parse_fastq_bytes(path)
        tokens = tok.tokenize_bytes_fast(mat, lengths, vectorizer.max_len)
        return vectorizer.vectorize_tokens(tokens)
    if ext == ".txt":
        seqs = read_txt(path)
        return vectorizer.vectorize(seqs)
    raise ValueError(f"Unsupported reference input: {path}")


def stream_embed_seqs_to_npy(
    path: str,
    out_path: str,
    vectorizer: Vectorizer,
    batch: int = 65536,
) -> int:
    """Stream-embed a sequence file (txt / FASTQ: one embedding per read) in
    fixed-size batches straight into a pre-headered npy — the reference
    `inference` tool's [batch_size] semantics (test_inference.cpp:49,
    160-227): embedding temporaries and write cadence are bounded by
    `batch` no matter how many reads the file holds.  Returns rows."""
    from deepreadmapper_tpu.io.npy_stream import NpyStreamWriter
    from deepreadmapper_tpu.utils.progress import Progress

    from deepreadmapper_tpu.io.fileio import true_ext

    ext = true_ext(path)
    if ext in FASTQ_EXTS:
        from deepreadmapper_tpu.io.fastq import parse_fastq_bytes

        mat, lengths, _ = parse_fastq_bytes(path)

        def embed_slice(s, e):
            tokens = tok.tokenize_bytes_fast(
                mat[s:e], lengths[s:e], vectorizer.max_len
            )
            return vectorizer.vectorize_tokens(tokens)

        total = mat.shape[0]
    else:
        seqs = read_txt(path)

        def embed_slice(s, e):
            return vectorizer.vectorize(seqs[s:e])

        total = len(seqs)
    with NpyStreamWriter(out_path, total, 128) as w, \
            Progress(total, "[INFERENCE] embed reads") as prog:
        for s in range(0, total, batch):
            e = min(s + batch, total)
            w.append(embed_slice(s, e))
            prog.update(e - s)
    return total


def _build_sharded_from_rows(rows: np.ndarray, ntotal: int, n_shards: int,
                             make_sub, index_type: str):
    """Shared shard-splitting for pre-encoded rows (codes or embeddings):
    pad by repeating the last real row (pad rows are masked at merge by the
    manifest's ntotal), enforce the int32 local-id bound that
    ShardedANNIndex.build enforces, split evenly, wrap.

    One definition for the PQFLAT / INT8FLAT / IVFINT8 stream branches so
    the invariants can't drift apart."""
    from deepreadmapper_tpu.parallel.mesh import make_mesh
    from deepreadmapper_tpu.parallel.sharded_ann import ShardedANNIndex

    pad = (-ntotal) % n_shards
    if pad:
        rows = np.concatenate([rows, np.repeat(rows[-1:], pad, 0)])
    if rows.shape[0] // n_shards >= 2**31:
        raise NotImplementedError(
            f"{rows.shape[0] // n_shards} rows/shard exceeds the int32 "
            "local-id space; use more shards"
        )
    subs = [make_sub(c) for c in np.split(rows, n_shards)]
    return ShardedANNIndex(
        subs, make_mesh(n_shard=n_shards), ntotal, index_type
    )


def _drop_cache(cache, codes_ref=None) -> None:
    """Remove the resume cache once the index is persisted.  Any still-open
    mmap of codes.npy stays valid (Linux keeps the inode until unmapped)."""
    import shutil

    if cache:
        shutil.rmtree(cache, ignore_errors=True)


def _resume_cache(index_prefix: str, params: dict, resume: bool):
    """Open (or validate) the crash-resume cache for a streaming build.

    Returns the cache dir, or None when resume is off.  The state file
    pins every parameter that shapes the embed stream; a mismatch means
    the partial codes on disk describe a different index — refuse."""
    import json

    if not resume:
        return None
    cache = os.path.join(index_prefix, ".build_cache")
    os.makedirs(cache, exist_ok=True)
    state_path = os.path.join(cache, "state.json")
    if os.path.exists(state_path):
        with open(state_path) as f:
            old = json.load(f)
        if old != params:
            raise ValueError(
                f"--resume: cached build state {old} does not match "
                f"requested {params}; delete {cache} to restart"
            )
    else:
        with open(state_path, "w") as f:
            json.dump(params, f)
    return cache


def build_index(
    ref_file: str,
    index_prefix: str,
    ref_len: int,
    stride: int = 1,
    index_type: str = "INT8FLAT",
    build_cfg: BuildConfig | None = None,
    vectorizer: Vectorizer | None = None,
    n_shards: int = 1,
    resume: bool = False,
    weights: str | None = None,
) -> dict:
    """Build + persist an index directory; returns the saved config.

    resume=True makes genome-scale streaming builds (PQFLAT / INT8FLAT /
    IVFINT8 from FASTA) crash-resumable: embedded code chunks append to
    `<prefix>/.build_cache/` as they stream off the device, and a rerun
    with the same arguments skips everything already on disk.

    weights: path to a fine-tuned encoder npz (pipeline.finetune output).
    The file is copied into the index dir as encoder.npz and recorded in
    config.txt, so serving automatically embeds queries with the SAME
    encoder that embedded the index — a mismatch silently destroys
    accuracy (fine-tuning moves the whole embedding space)."""
    cfg = build_cfg or BuildConfig(stride=stride)
    vectorizer = _resolve_weights(weights, vectorizer)
    if cfg.opq and index_type not in ("PQFLAT", "IVFPQ"):
        print(
            f"[BUILD INDEX] WARNING: --opq only applies to PQFLAT/IVFPQ; "
            f"ignored for {index_type}"
        )

    # Quantizing engines consume embeddings on device (only the 8-128 B/window
    # codes ever download); graph builds need host vectors anyway.
    device_out = (
        index_type in ("PQFLAT", "IVFPQ", "INT8FLAT", "IVFINT8")
        and n_shards == 1
    )
    from deepreadmapper_tpu.io.fileio import true_ext

    ext = true_ext(ref_file)
    if ext in FASTA_EXTS:
        # Pre-build memory estimate (reference prints one before every build,
        # src/hnswpq/index.cpp:5-53).
        from deepreadmapper_tpu.utils.memory import (
            estimate_index_memory,
            estimate_window_count,
        )

        nv = estimate_window_count(ref_file, ref_len, stride)  # both strands
        dim = 128
        if index_type == "INT8FLAT":
            total = nv * dim  # 1 B/dim, no graph
            detail = f"int8 codes {total/1e6:.1f}"
        elif index_type == "IVFINT8":
            total = int(nv * dim / 0.8)  # slab fill measured ~0.8 (ivf_int8)
            detail = f"int8 slabs {total/1e6:.1f}"
        elif index_type == "FLAT":
            total = nv * dim * 4
            detail = f"fp32 vectors {total/1e6:.1f}"
        elif index_type == "PQFLAT":
            total = nv * cfg.m_pq + (1 << cfg.nbits) * dim * 4
            detail = f"pq codes {nv*cfg.m_pq/1e6:.1f}"
        elif index_type == "IVFPQ":
            # packed codes + fp32 recon norms, over the ~0.8 slab fill
            total = int(nv * (cfg.m_pq + 4) / 0.8)
            detail = f"pq slabs {total/1e6:.1f}"
        else:  # HNSW variants: PQ/flat storage + graph
            est = estimate_index_memory(
                nv, m_pq=cfg.m_pq, nbits=cfg.nbits, m_hnsw=cfg.m_hnsw,
                n_train=int(nv * cfg.sample_rate),
            )
            total = est["total"]
            if index_type == "HNSWFLAT":
                total += nv * dim * 4 - est["pq_codes"]
            detail = f"graph {est['hnsw_graph']/1e6:.1f}"
        print(
            f"[BUILD INDEX] ~{nv} vectors; estimated index memory "
            f"{total/1e6:.1f} MB ({detail})"
        )

    cache = _resume_cache(
        index_prefix,
        {
            "ref_file": os.path.abspath(ref_file),
            "ref_len": ref_len,
            "stride": stride,
            "index_type": index_type,
            "m_pq": cfg.m_pq,
            "nbits": cfg.nbits,
            "opq": bool(cfg.opq and index_type in ("PQFLAT", "IVFPQ")),
            "seed": cfg.seed,
        },
        resume
        and ext in FASTA_EXTS
        and index_type in ("PQFLAT", "IVFPQ", "INT8FLAT", "IVFINT8"),
    )

    pq_stream = index_type in ("PQFLAT", "IVFPQ") and ext in FASTA_EXTS
    if pq_stream:
        # Two-pass stream-encode (PQ is the >10M-window engine, where even
        # device-resident fp32 embeddings would not fit HBM — 40M windows =
        # 20 GB):  pass A embeds an evenly-spaced window sample (the
        # reference trains on a 50% evenly-spaced sample, create_training_set
        # index.cpp:57-84 — capped here, ample for 8x256 centroids) and
        # trains the codebook; pass B re-streams every window and encodes
        # each embedding chunk to codes ON DEVICE, so only 8 B/window ever
        # reaches the host.
        import jax

        from deepreadmapper_tpu.ops import pq as pq_ops

        records = fasta_io.parse_fasta_records(ref_file)
        nv_est = sum(
            2 * fasta_io.num_windows(len(r), ref_len, stride) for r in records
        )
        # Cap at 262k training vectors: 1000 points/centroid (FAISS trains
        # with at most 256/centroid), and the k-means assignment tensor
        # [m, n_train, ksub] fp32 stays ~2 GB instead of 16 GB at 2M.
        target = max(1, min(int(nv_est * cfg.sample_rate), 262_144))
        # nv_est counts both strands and so does the sampled embed; ceil so
        # the sample never exceeds ~target (floor could double it)
        step = max(1, -(-nv_est // max(target, 1)))
        cb_path = cache and os.path.join(cache, "codebook.npz")
        if cb_path and os.path.exists(cb_path):
            # pass A already ran before the crash — reuse its codebook
            with np.load(cb_path) as z:
                cb = pq_ops.PQCodebook(jnp_asarray(z["centroids"]))
                rot = z["rot"] if "rot" in z.files else None
            print("[BUILD INDEX] resume: reusing trained PQ codebook")
        else:
            train = embed_fasta_windows(
                records, ref_len, stride * step, vectorizer
            )
            if train.shape[0] == 0:
                raise ValueError(f"No sequences found in file: {ref_file}")
            rot = None
            if cfg.opq:
                cb, rot = pq_ops.train_opq(
                    np.asarray(train), m=cfg.m_pq, nbits=cfg.nbits,
                    iters=cfg.opq_iters, seed=cfg.seed,
                )
            else:
                cb = pq_ops.train_pq(
                    np.asarray(train), m=cfg.m_pq, nbits=cfg.nbits,
                    iters=cfg.kmeans_iters, seed=cfg.seed,
                )
            if cb_path:
                extra = {} if rot is None else {"rot": np.asarray(rot)}
                np.savez(cb_path, centroids=np.asarray(cb.centroids), **extra)
        cent = cb.centroids
        m_pq = cfg.m_pq
        if rot is not None:
            import jax.numpy as jnp

            rot_dev = jnp.asarray(rot)
            encode = jax.jit(
                lambda e: pq_ops._encode(pq_ops._split(e @ rot_dev, m_pq), cent)
            )
        else:
            encode = jax.jit(
                lambda e: pq_ops._encode(pq_ops._split(e, m_pq), cent)
            )
        if cache:
            codes = stream_codes_resumable(
                records, ref_len, stride, vectorizer, encode,
                os.path.join(cache, "codes.npy"), cfg.m_pq, "|u1",
            )
        else:
            codes = embed_fasta_windows(
                records, ref_len, stride, vectorizer, chunk_transform=encode
            )
        embeddings = codes  # row count for config below
    int8_stream = index_type in ("INT8FLAT", "IVFINT8") and ext in FASTA_EXTS
    if int8_stream:
        # Stream-quantize: every embedding chunk becomes int8 ON DEVICE before
        # collection — fp32 for a genome-scale index would not fit HBM (40M
        # windows = 20 GB fp32 vs 5 GB int8).  Encoder outputs are final
        # bi-GRU hiddens, tanh-bounded in [-1,1], so the fixed 1/127 scale is
        # what build() would derive from the data anyway.
        from deepreadmapper_tpu.index.int8_flat import quantize

        int8_scale = 1.0 / 127.0
        records = fasta_io.parse_fasta_records(ref_file)
        if cache:
            embeddings = stream_codes_resumable(
                records, ref_len, stride, vectorizer,
                lambda e: quantize(e, int8_scale),
                os.path.join(cache, "codes.npy"), 128, "|i1",
            )
        else:
            embeddings = embed_fasta_windows(
                records, ref_len, stride, vectorizer, device_out=True,
                chunk_transform=lambda e: quantize(e, int8_scale),
            )
    elif not pq_stream:
        embeddings = embed_input_file(
            ref_file, ref_len, stride, vectorizer, device_out=device_out
        )
    if embeddings.shape[0] == 0:
        raise ValueError(f"No sequences found in file: {ref_file}")

    basename = os.path.basename(os.path.normpath(index_prefix))
    index_file = os.path.join(index_prefix, basename + ".index")

    # Config keys mirror the reference (src/hnswpq/index.cpp:289-302); the
    # reference's index-path quirk (prefix+"/"+prefix) is fixed to
    # prefix+"/"+basename, which is what its own pipeline reads back
    # (main.cpp:34-36).
    config = {
        "index_type": index_type,
        "stride": stride,
        "ref_len": ref_len,
        "n_vects": int(embeddings.shape[0]),
        # pq_stream collects codes, not embeddings; the vector dim is fixed
        "dim": 128 if pq_stream else int(embeddings.shape[1]),
        "M_hnsw": cfg.m_hnsw,
        "EFC": cfg.efc,
        "M_pq": cfg.m_pq,
        "nbits": cfg.nbits,
        "index_file": index_file,
    }
    os.makedirs(index_prefix, exist_ok=True)
    if weights is not None:
        import shutil

        shutil.copyfile(weights, os.path.join(index_prefix, "encoder.npz"))
        config["weights"] = "encoder.npz"
    # config.txt is the "build complete" sentinel (load_index and the
    # bench/resume paths probe it) — it must be written AFTER the engine
    # files land, or a crash mid-build leaves a config with no engine
    # behind it (observed: killed between the stream finishing and the
    # coarse build at the 500M-row tier)

    if pq_stream:
        from deepreadmapper_tpu.index.pq_flat import PQFlatIndex

        n = codes.shape[0]
        if index_type == "IVFPQ":
            from deepreadmapper_tpu.index.ivf_pq import IVFPQIndex

            if n_shards > 1:
                # shards share one codebook/rotation, build per-shard
                # coarse quantizers (the IVFINT8 sharding convention)
                engine = _build_sharded_from_rows(
                    codes, n, n_shards,
                    lambda c: IVFPQIndex.build_from_codes(c, cb, cfg, rot=rot),
                    "IVFPQ",
                )
            else:
                engine = IVFPQIndex.build_from_codes(codes, cb, cfg, rot=rot)
        elif n_shards > 1:
            # shards share one codebook (and OPQ rotation, if any)
            engine = _build_sharded_from_rows(
                codes, n, n_shards,
                lambda c: PQFlatIndex(c, cb, c.shape[0], rot), "PQFLAT",
            )
        else:
            engine = PQFlatIndex(codes, cb, n, rot)
        engine.save(index_prefix)
        save_config(config, index_prefix)
        _drop_cache(cache, codes)
        return config

    if int8_stream:
        from deepreadmapper_tpu.index.int8_flat import Int8FlatIndex

        codes = np.asarray(embeddings)  # int8 download, 128 B/window
        n = codes.shape[0]
        if index_type == "IVFINT8":
            from deepreadmapper_tpu.index.ivf_int8 import IVFInt8Index

            if n_shards > 1:
                # per-shard coarse quantizers, like per-shard PQ codebooks
                engine = _build_sharded_from_rows(
                    codes, n, n_shards,
                    lambda c: IVFInt8Index.build_from_codes(
                        c, int8_scale, cfg
                    ),
                    "IVFINT8",
                )
            else:
                engine = IVFInt8Index.build_from_codes(
                    codes, int8_scale, cfg
                )
            engine.save(index_prefix)
            save_config(config, index_prefix)
            _drop_cache(cache, embeddings)
            return config
        if n_shards > 1:
            engine = _build_sharded_from_rows(
                codes, n, n_shards,
                lambda c: Int8FlatIndex(c, int8_scale, c.shape[0]),
                "INT8FLAT",
            )
        else:
            engine = Int8FlatIndex(codes, int8_scale, n)
        engine.save(index_prefix)
        save_config(config, index_prefix)
        _drop_cache(cache, embeddings)
        return config

    if n_shards > 1:
        from deepreadmapper_tpu.parallel.mesh import make_mesh
        from deepreadmapper_tpu.parallel.sharded_ann import ShardedANNIndex

        mesh = make_mesh(n_shard=n_shards)
        engine = ShardedANNIndex.build(embeddings, mesh, cfg, index_type)
        engine.save(index_prefix)
        save_config(config, index_prefix)
        return config

    from deepreadmapper_tpu.index.registry import _REGISTRY

    cls = _REGISTRY[index_type]
    engine = cls.build(embeddings, cfg) if hasattr(cls, "build") else cls(embeddings)
    engine.save(index_prefix)
    save_config(config, index_prefix)
    return config
