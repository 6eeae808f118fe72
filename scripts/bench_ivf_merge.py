"""Device-time split of the IVF kernel search: scan kernel vs merge, for
the packed-output path (per-visit [V, QTK, 4*KP] stream -> slot gather ->
wide approx_max_k) vs the round-5 FOLD path (per-query VMEM accumulator in
the kernel -> one 512-wide exact top_k).  The r5 working-notes split showed
the merge dominating the packed path (63 ms merge vs 45 ms kernel at 40M
rows / nprobe 32 / 8192 q) — this script makes that split reproducible and
records what fold mode does to it.

Run against a bench_crossover --keep-dir cache (index + reads already on
disk):

    python - --dir /tmp/ivf40m < scripts/bench_ivf_merge.py

Timing truths honored (CLAUDE.md): device sync = host fetch of a small
slice (block_until_ready is a no-op on the axon backend); e2e fetches
everything.
"""

import argparse
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp


def fetch_sync(x):
    """Real device sync: tiny host fetch (axon block_until_ready lies)."""
    np.asarray(jax.device_get(x[:2, :2]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/ivf40m")
    ap.add_argument("--nlist", type=int, default=0)
    ap.add_argument("--nprobe", type=int, default=32)
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from deepreadmapper_tpu.index.int8_flat import (
        quantize_host,
        query_scale_ratio,
    )
    from deepreadmapper_tpu.index.ivf_int8 import IVFInt8Index
    from deepreadmapper_tpu.io.fastq import parse_fastq_bytes
    from deepreadmapper_tpu.models.encoder import Vectorizer
    from deepreadmapper_tpu.ops import ivf_kernel as ik

    ivf = IVFInt8Index.load(os.path.join(args.dir, f"ivf_nlist{args.nlist}"))
    print(f"[MERGE-AB] n={ivf.ntotal} nlist={ivf.nlist} "
          f"slabs={ivf.n_slabs} cap={ivf.cap}", flush=True)

    vec = Vectorizer()
    mat, lengths, _ = parse_fastq_bytes(os.path.join(args.dir, "reads.fastq"))
    emb = np.asarray(vec.vectorize_wrapped_bytes(mat, lengths))
    q = emb.shape[0]
    k = args.k
    nprobe = args.nprobe

    # one shared plan: probe on device, invert on host (the big-batch path,
    # search()'s own quantization convention)
    c, rn, cent, cn = ivf._device()
    sq, ratio = query_scale_ratio(emb, ivf.scale)
    q8 = quantize_host(emb, sq)
    ratio = np.float32(ratio)
    probe_fn = ivf._probe_fn(nprobe)
    probe = np.asarray(probe_fn(
        jnp.asarray(q8, jnp.float32), cent, cn, jnp.float32(ratio)
    ))
    step_chunk, step_visit, qidx, slot_of = ivf._build_plan_chunked(
        probe, ik.QTK
    )
    q8_pad = np.concatenate([q8, np.zeros((1, q8.shape[1]), np.int8)])
    s_pad, v_pad = step_chunk.shape[0], qidx.shape[0]
    plan = jnp.asarray(np.concatenate([
        step_chunk.astype(np.int32), step_visit.astype(np.int32),
        qidx.ravel().astype(np.int32), slot_of.ravel().astype(np.int32),
    ]))
    q8d = jnp.asarray(q8_pad)
    print(f"[MERGE-AB] q={q} nprobe={nprobe} steps={s_pad} visits={v_pad}",
          flush=True)

    dev = {}

    def timeit(name, fn, sync):
        fn()  # warm/compile
        ts = []
        for _ in range(args.trials):
            t0 = time.time()
            sync(fn())
            ts.append(time.time() - t0)
        dev[name] = round(min(ts) * 1000.0, 1)
        print(f"[MERGE-AB] {name}: {dev[name]} ms", flush=True)

    stepc_d, stepv_d, qidx_d = (
        jnp.asarray(step_chunk.astype(np.int32)),
        jnp.asarray(step_visit.astype(np.int32)),
        jnp.asarray(qidx.astype(np.int32)),
    )
    qsteps = jnp.asarray(q8_pad[qidx])

    # kernel-only, packed form
    timeit(
        "kernel_packed_ms",
        lambda: ik.ivf_chunk_scan_int8(
            stepc_d, stepv_d, qsteps, c, rn, 2.0 * np.float32(ratio),
            ik.CHK, v_pad),
        fetch_sync,
    )
    # kernel-only, fold form
    timeit(
        "kernel_fold_ms",
        lambda: ik.ivf_chunk_scan_int8_fold(
            stepc_d, stepv_d, qidx_d, qsteps, c, rn,
            2.0 * np.float32(ratio), ik.CHK, q),
        fetch_sync,
    )

    # full search program (plan upload amortized out by passing device plan)
    type(ivf)._FOLD_MIN_Q = 1 << 30
    ivf._fns.clear()
    kfn_packed = ivf._kernel_fn(k, nprobe, s_pad, v_pad)
    timeit(
        "total_packed_ms",
        lambda: kfn_packed(plan, q8d, c, rn, jnp.float32(ratio)),
        fetch_sync,
    )
    type(ivf)._FOLD_MIN_Q = 1
    ivf._fns.clear()
    kfn_fold = ivf._kernel_fn(k, nprobe, s_pad, v_pad)
    timeit(
        "total_fold_ms",
        lambda: kfn_fold(plan, q8d, c, rn, jnp.float32(ratio)),
        fetch_sync,
    )

    di_p = np.asarray(kfn_packed(plan, q8d, c, rn, jnp.float32(ratio)))
    di_f = np.asarray(kfn_fold(plan, q8d, c, rn, jnp.float32(ratio)))
    d_p = np.ascontiguousarray(di_p[:, :k]).view(np.float32)
    d_f = np.ascontiguousarray(di_f[:, :k]).view(np.float32)
    i_p, i_f = di_p[:, k:], di_f[:, k:]
    # tie-aware agreement: fold candidate counts as a hit if its distance
    # dominates the packed path's kth distance (same quantized metric)
    kth = d_p[:, k - 1:k]
    tol = 1e-3 + 1e-5 * np.abs(kth)
    valid_f = d_f < 3.4e38 / 2
    tie = float(np.mean(np.sum((d_f <= kth + tol) & valid_f, axis=1) / k))
    top1 = float(np.mean(i_f[:, 0] == i_p[:, 0]))
    doc = {
        "n_rows": ivf.ntotal, "q": q, "nprobe": nprobe, "k": k,
        **dev,
        "merge_packed_ms": round(dev["total_packed_ms"]
                                 - dev["kernel_packed_ms"], 1),
        "merge_fold_ms": round(dev["total_fold_ms"]
                               - dev["kernel_fold_ms"], 1),
        "fold_vs_packed_tie_recall_at_k": round(min(tie, 1.0), 4),
        "fold_vs_packed_top1_agree": round(top1, 4),
    }
    print(json.dumps(doc), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=2)


main()
