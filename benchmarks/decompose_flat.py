"""Roofline decomposition of the flat Pallas kernel (VERDICT r2 #3).

Where do the GCUPS go at the XLA engine's sweet spot (e.g. local
256x2048^2: XLA ~62 vs flat Pallas ~48 in round 1)? The kernel's per-row
cost splits into (a) the log2(n) Hillis-Steele in-row scan passes and
(b) everything else (char extraction, DP elementwise math, loop
overhead). This probe measures the split directly by truncating the scan
tails to K passes via ALIGNTOOLS_DANGER_SCAN_CAP (scores become WRONG —
timing only), one subprocess per configuration (the axon tunnel wedges
multi-compile processes):

    /opt/venv/bin/python benchmarks/decompose_flat.py [mode B L]

Output: ms per fill at cap = 0,1,2,4,8,full; the per-pass slope; the
scan share of total time; and the same-run XLA engine time for the
sibling anchor.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
PROBE = os.path.join(HERE, "probe_flat.py")


def run_probe(mode, B, L, engine, cap=None, timeout=900):
    env = dict(os.environ)
    # isolate the variable: plain tails only
    env["ALIGNTOOLS_ADAPTIVE_SCAN"] = "0"
    env["ALIGNTOOLS_TWOLEVEL_SCAN"] = "0"
    if cap is not None:
        env["ALIGNTOOLS_DANGER_SCAN_CAP"] = str(cap)
    r = subprocess.run(
        [sys.executable, PROBE, mode, str(B), str(L), engine],
        capture_output=True, text=True, timeout=timeout, env=env,
    )
    m = re.search(r"\(([\d.]+) ms\)", r.stdout)
    if not m:
        print(f"  probe cap={cap} engine={engine} FAILED rc={r.returncode}: "
              f"{(r.stderr or r.stdout)[-200:].strip()}")
        return None
    return float(m.group(1))


def main():
    mode, B, L = "local", 256, 2048
    if len(sys.argv) == 4:
        mode, B, L = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    full_passes = max(1, (L - 1).bit_length())
    print(f"=== decompose flat Pallas: {mode} {B}x{L}^2 "
          f"(full scan = {full_passes} passes/row/scan) ===")

    xla = run_probe(mode, B, L, "xla")
    full = run_probe(mode, B, L, "pallas")
    caps = [0, 1, 2, 4, 8]
    ms = {c: run_probe(mode, B, L, "pallas", cap=c) for c in caps}
    ms["full"] = full
    print(f"XLA engine (same run): {xla} ms" if xla else "XLA probe failed")
    for c in caps + ["full"]:
        v = ms[c]
        print(f"  cap={c:>4}: {v:8.2f} ms" if v else f"  cap={c:>4}: FAILED")
    if full and ms[0]:
        scan_ms = full - ms[0]
        print(f"scan passes cost {scan_ms:.2f} ms = "
              f"{100 * scan_ms / full:.0f}% of the fill; "
              f"non-scan floor {ms[0]:.2f} ms")
        if ms[8] and ms[4]:
            print(f"per-pass slope (caps 4->8): "
                  f"{(ms[8] - ms[4]) / 4:.3f} ms/pass")
        if xla:
            print(f"non-scan floor vs XLA total: {ms[0]:.2f} / {xla:.2f} ms "
                  f"({100 * ms[0] / xla:.0f}%)")


if __name__ == "__main__":
    main()
