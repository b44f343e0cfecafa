"""Synthetic workload generators shared by the calibration stages and
the benchmarks, so the workload a knob is calibrated against is BY
CONSTRUCTION the one the benchmarks document (round-5 review finding:
autotune._bench_splitmin and benchmarks/probe_smallp.py each carried
their own copy of this distribution).
"""

from __future__ import annotations

import numpy as np


def clustered_pairs(P: int, seed: int = 7) -> list[tuple[bytes, bytes]]:
    """The length-clustered synthetic read set used everywhere a
    'realistic' mixed-length workload is needed (bench.py pad
    efficiency, suite clustered cases, split_min_cells calibration):
    m ~ lognormal(300, 0.2), n ~ lognormal(3000, 0.25), random ACGT."""
    rng = np.random.default_rng(seed)
    alpha = list(b"ACGT")
    ms = np.exp(rng.normal(np.log(300), 0.2, P)).astype(int)
    ns = np.exp(rng.normal(np.log(3000), 0.25, P)).astype(int)
    return [
        (bytes(rng.choice(alpha, max(1, int(a))).tolist()),
         bytes(rng.choice(alpha, max(1, int(b))).tolist()))
        for a, b in zip(ms, ns)
    ]
