"""Paired-end accuracy harness: single-end vs paired mapping on simulated
FR read pairs, with repeats planted so pairing has something to fix.

Reports per config: proper-pair rate, R1/R2 top-1 accuracy (single-end vs
pair-resolved primaries), and MAPQ calibration (accuracy among MAPQ>=30
primaries — the margin must mean something for a variant caller to trust
it).  One JSON line per row; a JSON document at the end.

    python - [--n-bp 2000000 --n-pairs 2048 --err 0.02] < scripts/eval_paired.py
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.getcwd(), "scripts"))
from demo_genome_scale import make_genome  # noqa: E402

_COMP = str.maketrans("ACGT", "TGCA")


def simulate_pairs(genome, n_pairs, read_len, isize_mean, isize_sd, err,
                   seed=1):
    rng = np.random.default_rng(seed)
    bases = np.array(list("ACGT"))
    max_start = len(genome) - (isize_mean + 4 * isize_sd) - 1
    starts = rng.integers(0, max_start, n_pairs)
    isizes = np.clip(
        rng.normal(isize_mean, isize_sd, n_pairs).astype(int),
        2 * read_len, isize_mean + 4 * isize_sd,
    )

    def mutate(s):
        out = list(s)
        for i in np.flatnonzero(rng.random(len(out)) < err):
            out[i] = rng.choice(bases[bases != out[i]])
        return "".join(out)

    r1, r2, truth = [], [], []
    for i, (s, isz) in enumerate(zip(starts, isizes)):
        a = mutate(genome[s: s + read_len])
        b = mutate(genome[s + isz - read_len: s + isz]).translate(
            _COMP
        )[::-1]
        r1.append((f"p{i}", a))
        r2.append((f"p{i}", b))
        truth.append((int(s), int(s + isz - read_len)))
    return r1, r2, truth


def write_fq(path, reads):
    with open(path, "w") as f:
        for name, seq in reads:
            f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")


def acc(ids, truth_col, tol):
    got = (np.asarray(ids)[:, 0] // 2).astype(np.int64)
    return float(np.mean(np.abs(got - truth_col) <= tol))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-bp", type=int, default=2_000_000)
    ap.add_argument("--n-pairs", type=int, default=2048)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--err", type=float, default=0.02)
    ap.add_argument("--isize", type=int, default=500)
    ap.add_argument("--isize-sd", type=int, default=50)
    ap.add_argument("--repeat-frac", type=float, default=0.05,
                    help="fraction of the genome duplicated elsewhere "
                         "(what pairing must disambiguate)")
    ap.add_argument("--index-type", default="INT8FLAT")
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="eval_paired.json")
    args = ap.parse_args()

    genome = make_genome(args.n_bp, seed=args.seed)
    # plant repeats: copy blocks from the first half into the second half
    rng = np.random.default_rng(args.seed + 7)
    g = np.frombuffer(genome.encode(), np.uint8).copy()
    block = 2_000
    n_blocks = int(args.n_bp * args.repeat_frac / block)
    for _ in range(n_blocks):
        src = rng.integers(0, args.n_bp // 2 - block)
        dst = rng.integers(args.n_bp // 2, args.n_bp - block)
        g[dst: dst + block] = g[src: src + block]
    genome = g.tobytes().decode()

    r1, r2, truth = simulate_pairs(
        genome, args.n_pairs, args.read_len, args.isize, args.isize_sd,
        args.err, seed=args.seed + 1,
    )
    t1 = np.array([t[0] for t in truth], np.int64)
    t2 = np.array([t[1] for t in truth], np.int64)

    from deepreadmapper_tpu.pipeline.build import build_index
    from deepreadmapper_tpu.pipeline.search import (
        run_pipeline,
        run_pipeline_paired,
    )

    with tempfile.TemporaryDirectory() as tmp:
        ref = os.path.join(tmp, "ref.fna")
        with open(ref, "w") as f:
            f.write("> sim\n")
            for i in range(0, len(genome), 80):
                f.write(genome[i: i + 80] + "\n")
        f1 = os.path.join(tmp, "r1.fastq")
        f2 = os.path.join(tmp, "r2.fastq")
        write_fq(f1, r1)
        write_fq(f2, r2)
        prefix = os.path.join(tmp, "idx")
        t0 = time.time()
        build_index(ref, prefix, args.read_len, index_type=args.index_type)
        t_build = time.time() - t0

        rows = []
        # single-end per end
        se = {}
        for name, fq, tcol in (("R1", f1, t1), ("R2", f2, t2)):
            out = os.path.join(tmp, "se_" + name)
            res = run_pipeline(prefix, fq, ref, k=args.k, output_dir=out,
                               write_sam=False)
            ids = np.asarray(res["final_ids"])
            se[name] = ids
            rows.append({
                "mode": f"single_{name}", "top1": round(acc(ids, tcol, 5), 4),
            })
            print(json.dumps(rows[-1]), flush=True)
        # paired
        out = os.path.join(tmp, "pe")
        t0 = time.time()
        res = run_pipeline_paired(
            prefix, f1, f2, ref, k=args.k, output_dir=out, mapq=True,
            max_isize=args.isize + 4 * args.isize_sd,
        )
        t_pair = time.time() - t0
        ids = np.load(os.path.join(out, "indices.npy"))
        n = args.n_pairs
        ids1, ids2 = ids[:n], ids[n:]
        # MAPQ calibration from the SAM primaries
        mq_ok = mq_tot = 0
        for line in open(os.path.join(out, "results.sam")):
            if line.startswith("@"):
                continue
            f = line.split("\t")
            flag = int(f[1])
            if flag & 0x900 or int(f[4]) < 30:
                continue
            i = int(f[0][1:])
            tcol = t2[i] if flag & 0x80 else t1[i]
            mq_tot += 1
            mq_ok += int(abs(int(f[3]) - 1 - tcol) <= 110)
        row = {
            "mode": "paired",
            "proper_rate": round(res["n_proper"] / n, 4),
            "top1_R1": round(acc(ids1, t1, 5), 4),
            "top1_R2": round(acc(ids2, t2, 5), 4),
            "mapq30_precision": round(mq_ok / max(mq_tot, 1), 4),
            "mapq30_n": mq_tot,
            "t_pair_s": round(t_pair, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    doc = {
        "n_bp": args.n_bp, "n_pairs": args.n_pairs, "err": args.err,
        "repeat_frac": args.repeat_frac, "isize": args.isize,
        "index_type": args.index_type, "k": args.k, "t_build_s":
        round(t_build, 1), "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=2)
    print(f"[EVAL] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
