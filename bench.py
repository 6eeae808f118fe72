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

import jax.numpy as jnp
import sys
import time

import numpy as np

NOMINAL_BASELINE_QPS = 1000.0


def main() -> None:
    from deepreadmapper_tpu import tokenizer as tok
    from deepreadmapper_tpu.io import fasta as fasta_io
    from deepreadmapper_tpu.io.fastq import parse_fastq_bytes
    from deepreadmapper_tpu.models.encoder import Vectorizer, encode_tokens
    from deepreadmapper_tpu.ops.topk import l2_topk
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
    bs = vec.device_batch

    def run_once():
        n_done = 0
        outs = []
        # Dispatch every batch before fetching any result: uploads (uint16
        # tokens), the GRU, and the top-k all pipeline asynchronously.
        for start in range(0, nq, bs):
            m = mat[start : start + bs]
            ln = lengths[start : start + bs]
            if m.shape[0] < bs:
                m = np.pad(m, ((0, bs - m.shape[0]), (0, 0)))
                ln = np.pad(ln, (0, bs - ln.shape[0]))
            tokens = tok.tokenize_bytes_fast(m, ln).astype(np.uint16)
            emb = encode_tokens(vec.params, tokens)
            d, i = l2_topk(emb, ref_dev, 128)
            # 1,702 ids fit in uint16: halve the result download.
            outs.append(i.astype(jnp.uint16))
            n_done += m.shape[0]
        for i in outs:
            np.asarray(i)  # fetch results (forces completion)
        return n_done

    run_once()  # warmup/compile
    t0 = time.time()
    run_once()
    dt = time.time() - t0
    qps = nq / dt

    print(
        json.dumps(
            {
                "metric": "ecoli150_dense_e2e_qps",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / NOMINAL_BASELINE_QPS, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
