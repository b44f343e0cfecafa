"""One-off probe: ONE flat-kernel config per process (the axon tunnel can
wedge long-lived multi-compile processes). Toggle the adaptive in-row scan
with ALIGNTOOLS_ADAPTIVE_SCAN=0/1 in the environment — it is read at
import time, so per-process probing A/Bs it cleanly.

    /opt/venv/bin/python benchmarks/probe_flat.py <mode> <B> <L> <engine>
    /opt/venv/bin/python benchmarks/probe_flat.py fitjump <B> <m> <L> <engine>
"""

from __future__ import annotations

import os
import sys

try:
    import numpy as np
except ImportError:
    venv = "/opt/venv/bin/python"
    if os.path.exists(venv) and not sys.executable.startswith("/opt/venv/"):
        os.execv(venv, [venv, os.path.abspath(__file__), *sys.argv[1:]])
    raise

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.suite import bench_case, bench_fit_jump


def main():
    adaptive = os.environ.get("ALIGNTOOLS_ADAPTIVE_SCAN", "1")
    rng = np.random.default_rng(0)
    if sys.argv[1] == "fitjump":
        B, m, L, engine = int(sys.argv[2]), int(sys.argv[3]), \
            int(sys.argv[4]), sys.argv[5]
        g, per = bench_fit_jump(engine, B, m, L, rng)
        case = f"fit+jump {B}x({m}x{L})"
    else:
        mode, B, L, engine = sys.argv[1], int(sys.argv[2]), \
            int(sys.argv[3]), sys.argv[4]
        g, per = bench_case(mode, engine, B, L, rng)
        case = f"{mode} {B}x{L}^2"
    print(f"{case} {engine} adaptive={adaptive}: {g:.1f} GCUPS "
          f"({per * 1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
