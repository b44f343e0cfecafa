"""Benchmark: batched Smith-Waterman (affine) GCUPS on the current backend.

Prints ONE JSON line:
  {"metric": "sw_affine_gcups", "value": N, "unit": "GCUPS",
   "vs_baseline": R, ...}

``vs_baseline`` is measured live: the reference C binary
(r3fang/alignTools.C, compiled -O2 from the read-only checkout) timed on
one pair of the same shape on this host's CPU — the reference is strictly
single-core scalar code (SURVEY.md §2.4), so this is its true throughput.

Workload: B x (m=1024, n=1024) random DNA pairs, local (SW) mode, affine
gaps, score-only (no pointer emission) — the GCUPS configuration named in
BASELINE.json. Cell count = B * m * n per step.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REF_SRC = "/root/reference/src"


def _measure_reference_gcups(q: bytes, t: bytes) -> float | None:
    """Compile and time the reference binary on one pair (same shape)."""
    try:
        tmp = tempfile.mkdtemp(prefix="alignbench")
        binary = os.path.join(tmp, "alignTools")
        subprocess.run(
            ["cc", "-g", "-O2", f"{REF_SRC}/main.c", f"{REF_SRC}/kstring.c",
             f"-I{REF_SRC}", "-lz", "-o", binary],
            check=True, capture_output=True, timeout=120,
        )
        fa = os.path.join(tmp, "pair.fa")
        with open(fa, "wb") as f:
            f.write(b">q\n" + q + b"\n>t\n" + t + b"\n")
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            subprocess.run(
                [binary, "local", fa], check=True, capture_output=True,
                timeout=600,
            )
            best = min(best, time.perf_counter() - t0)
        return len(q) * len(t) / best / 1e9
    except Exception as err:  # no cc / no reference checkout: report absolute
        print(f"[bench] reference baseline unavailable: {err}", file=sys.stderr)
        return None


def main():
    import jax
    import jax.numpy as jnp

    from aligntools_tpu.engine.scan import local_fill

    B = int(os.environ.get("BENCH_BATCH", "256"))
    m_pad = n_pad = int(os.environ.get("BENCH_LEN", "2048"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))

    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    qs = rng.choice(alpha, (B, m_pad)).astype(np.int32)
    ts = rng.choice(alpha, (B, n_pad)).astype(np.int32)
    ns = np.full(B, n_pad, dtype=np.int32)
    ps = np.tile(np.array([1, -2, -5, -1, -10, 0], np.float32), (B, 1))
    ps[:, 5] = m_pad

    fwd = jax.jit(
        lambda qs, ts, ns, ps: jax.vmap(
            lambda q, t, n, p: local_fill(q, t, n, p, n_pad, False)
        )(qs, ts, ns, ps)[0]
    )
    args = tuple(jnp.asarray(a) for a in (qs, ts, ns, ps))
    np.asarray(fwd(*args))  # compile + warm
    # NOTE: time to a host materialization, not block_until_ready() — under
    # the axon TPU tunnel block_until_ready can return before execution
    # finishes, which inflates GCUPS ~50x. Transferring B floats is
    # negligible next to the fill.
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fwd(*args))
        best = min(best, time.perf_counter() - t0)
    cells = B * m_pad * n_pad
    gcups = cells / best / 1e9
    pairs_per_sec = B / best

    ref_gcups = _measure_reference_gcups(
        bytes(rng.choice(alpha, m_pad).tolist()),
        bytes(rng.choice(alpha, n_pad).tolist()),
    )
    out = {
        "metric": "sw_affine_gcups",
        "value": round(gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / ref_gcups, 1) if ref_gcups else None,
        "pairs_per_sec": round(pairs_per_sec, 1),
        "batch": B,
        "shape": [m_pad, n_pad],
        "step_ms": round(best * 1e3, 3),
        "reference_gcups": round(ref_gcups, 4) if ref_gcups else None,
        "backend": jax.devices()[0].platform,
        "device": str(jax.devices()[0].device_kind),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
