"""Probe the small-workload floor: wall time of the production
batch_scores path at small P as a function of the bucket-shape count.

The clustered P=512 suite case ran ~7x below the 100k-pair pipeline
rate (round-4 verdict #4): at small P the greedy bucketizer still splits
to ~32 shapes, and each bucket costs a fixed dispatch+transfer overhead
through the tunnel that dwarfs the fill time its padding saves. This
probe measures that overhead directly — wall vs forced bucket count on
the SAME workload — and the slope calibrates batch._split_min_cells.

    /opt/venv/bin/python benchmarks/probe_smallp.py [--pairs 512]

One JSON line per bucket budget, then a summary with the fitted
per-bucket overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    P = 512
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--pairs":
            P = int(argv[i + 1])

    from aligntools_tpu import backend
    from aligntools_tpu.batch import _bucket_keys, batch_scores
    from aligntools_tpu.params import AlignParams
    from aligntools_tpu.utils.synth import clustered_pairs

    backend.enable_compile_cache()
    pairs = clustered_pairs(P)
    true_cells = sum(len(q) * len(t) for q, t in pairs)
    p = AlignParams()
    points = []
    for budget in (1, 2, 4, 8, 16, 32):
        keys = _bucket_keys(pairs, 64, 128, max_buckets=budget)
        nshapes = len(set(keys))
        padded = sum(mp * np_ for mp, np_ in keys)
        batch_scores("local", pairs, p, keys=keys)  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            batch_scores("local", pairs, p, keys=keys)
            best = min(best, time.perf_counter() - t0)
        points.append((nshapes, best))
        print(json.dumps({
            "P": P, "budget": budget, "shapes": nshapes,
            "pad_efficiency": round(true_cells / padded, 3),
            "wall_s": round(best, 4),
            "pairs_per_sec": round(P / best, 1),
            "eff_gcups": round(true_cells / best / 1e9, 2),
        }), flush=True)
    xs = np.array([x for x, _ in points], float)
    ys = np.array([y for _, y in points], float)
    slope = float(np.polyfit(xs, ys, 1)[0]) if len(set(xs)) > 1 else None
    print(json.dumps({
        "summary": "per_bucket_overhead",
        "seconds_per_bucket": round(slope, 4) if slope else None,
        "best_config": min(points, key=lambda t: t[1])[0],
    }), flush=True)


if __name__ == "__main__":
    main()
