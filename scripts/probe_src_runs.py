"""Measure the src-sorted multi-row-copy lever on the hybrid gather layout.

The SpMM floor analysis (ops/spmm_pallas.py) names one untried layout
family for beating 0.505 of stream-SoL: sort each gather tile's edges by
src so equal-src RUNS share one (k, F) broadcast copy instead of k (1, F)
copies, attacking the dominant ~5 cy/edge copy-issue term.

This probe computes the run statistics of the ACTUAL production layout
(host-side, exact, full population — no kernel needed to bound the win):

    edges_per_run = gather edges / equal-src runs within tiles

The copy term scales as runs/edges even if extra rows were FREE, so
5 * runs/edges cy is a hard lower bound for the family.  Measured on the
Reddit-synth hybrid layout (dense_t=300): 68.9M gather edges, 64.9M runs
-> 1.063 edges/run — a <= 6% ceiling on the copy term (~3% end-to-end,
~178 M edges/s), because the hybrid's dense extraction already removed
exactly the high-occupancy (window, sub-band) blocks where src repeats
concentrate.  REJECTED; recorded in the spmm_pallas.py budget.

Usage: python scripts/probe_src_runs.py [path-to-hybrid-npz]

Re-run on the SBM community family's production layout (r5,
sbm_hybrid_v2 under the hub-cluster order, VERDICT r4 ask #5 — the
statistic must not be fit to one generator): 10.64M gather edges,
9.58M runs -> 1.111 edges/run; zero-marginal-cost ceiling 1.111x on the
copy term.  Same verdict as the degree-matched synth (1.063): the dense
extraction removes the repeat-concentrated blocks on BOTH families —
rejection confirmed generator-independent.
"""
import os
import sys

import numpy as np

path = (
    sys.argv[1]
    if len(sys.argv) > 1
    else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache",
        "hybrid_v2_232965_114848857_300.npz",
    )
)
d = np.load(path)
src = d["g_src_rel"]
w = d["g_edge_w"]
B = src.shape[0]
ET = w.shape[2]
NT = src.shape[1] // ET
src = src.reshape(B * NT, ET)
w = w.reshape(B * NT, ET)
valid = w != 0

tot_e = 0
tot_runs = 0
cls = {1: 0, 2: 0, 4: 0, 8: 0}
for t in range(B * NT):
    v = src[t][valid[t]]
    if len(v) == 0:
        continue
    v.sort()
    brk = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
    lens = np.diff(np.r_[brk, len(v)])
    tot_e += len(v)
    tot_runs += len(lens)
    for L in lens:
        while L > 0:
            for c in (8, 4, 2, 1):
                if L >= c:
                    cls[c] += 1
                    L -= c
                    break

print(f"gather edges {tot_e}, equal-src runs {tot_runs}, "
      f"edges/run {tot_e / tot_runs:.4f}")
print(f"run classes (greedy 8/4/2/1): {cls}")
# cost model: measured (1,640) copy ~5 cy; (k,640) broadcast assumed 5+k-1
cost = cls[1] * 5 + cls[2] * 6 + cls[4] * 8 + cls[8] * 12
print(f"modeled copy cy/edge {cost / tot_e:.3f} vs 5.0 "
      f"({5.0 / (cost / tot_e):.3f}x)")
print(f"zero-marginal-cost ceiling: {tot_runs * 5 / tot_e:.3f} cy "
      f"({tot_e / tot_runs:.3f}x max on the copy term)")
