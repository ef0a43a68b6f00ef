"""Measured recall-vs-probe-budget sweep for hyperplane LSH on the
driver testdata — the evidence behind simsearch._lsh_candidates'
honesty note: on this corpus the exact top-10 sit at cosine ≈0.35
(near-orthogonal), where the per-plane agreement probability for a
true neighbor (~0.61) barely beats a random pair (0.5), so NO
hyperplane parameterization reaches recall 0.9 at a 25% probe budget.
The quantized-scan path (ann_sq_topk) is the ≥0.9-recall design for
this regime.

Usage: python tools/ann_sweep.py [sf_dir]
Pure numpy/duckdb — no Spark session.
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from arcade_spark.simsearch import N_QUERIES, TOPK, _plane

    con = duckdb.connect()
    rows = con.execute(
        f"select vec_id, embedding from read_parquet('{sf_dir}/embeddings.parquet') order by vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    E = np.array([r[1] for r in rows], dtype=np.float64)
    n, d = E.shape
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    sims = En[:N_QUERIES] @ En.T
    exact = []
    for q in range(N_QUERIES):
        s = sims[q].copy()
        s[q] = -2
        exact.append(set(ids[np.lexsort((ids, -s))[:TOPK]].tolist()))
    print(f"n={n} d={d}  true top-{TOPK} cosine ≈ "
          f"{[round(float(np.sort(sims[q])[-2]), 3) for q in range(N_QUERIES)]}")

    for P in (4, 6, 8):
        planes = np.array([_plane(i, d) for i in range(P)])
        proj = E @ planes.T
        bucket = ((proj >= 0).astype(np.int64) @ (1 << np.arange(P)))
        for frac in (0.125, 0.25, 0.5, 0.75):
            T = max(1, int(frac * 2 ** P))
            masks = np.arange(2 ** P)
            mbits = (masks[:, None] >> np.arange(P)) & 1
            top = masks[np.lexsort((masks, mbits.sum(1)))[:T]]
            recs = []
            for q in range(N_QUERIES):
                probes = set((bucket[q] ^ top).tolist())
                cand = [i for i in range(n) if bucket[i] in probes and i != q]
                if cand:
                    s = En[cand] @ En[q]
                    got = set(ids[np.array(cand)[np.lexsort((ids[cand], -s))[:TOPK]]].tolist())
                else:
                    got = set()
                recs.append(len(got & exact[q]) / TOPK)
            print(f"planes={P} probe_frac={frac:.3f}: mean recall={np.mean(recs):.2f}")


if __name__ == "__main__":
    main()
