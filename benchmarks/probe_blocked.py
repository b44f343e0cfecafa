"""Probe the blocked streaming kernel's cost structure (verdict #4).

    /opt/venv/bin/python benchmarks/probe_blocked.py [mode] [B] [m] [n] [c_blk...]

Times blocked_scores at the given shape for each column-block width and
prints one JSON row per config (amortized on-device chains, like
suite.py). The long-target small-batch regime (8x(2048x131072)) measured
9.2 GCUPS in round 3 — per-row block-edge one-hot contractions and
per-row fixed costs amortize over c_blk columns, so width is the first
lever to test.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

try:
    import numpy as np
except ImportError:
    venv = "/opt/venv/bin/python"
    if os.path.exists(venv) and not sys.executable.startswith("/opt/venv/"):
        os.execv(venv, [venv, os.path.abspath(__file__), *sys.argv[1:]])
    raise

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _amortized(run_k, reps=3, k1=2, k2=10):
    def timed(K):
        np.asarray(run_k(K))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run_k(K))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(k2) - timed(k1)) / (k2 - k1)


def main():
    from aligntools_tpu.ops.pallas_blocked import blocked_scores

    args = sys.argv[1:]
    mode = args[0] if args else "fit"
    B = int(args[1]) if len(args) > 1 else 8
    m = int(args[2]) if len(args) > 2 else 2048
    n = int(args[3]) if len(args) > 3 else 131072
    cblks = [int(x) for x in args[4:]] or [8192, 16384, 32768]
    use_jump = mode == "fit"

    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    qs = rng.choice(alpha, (B, m)).astype(np.int32)
    ts = jnp.asarray(rng.choice(alpha, (B, n)).astype(np.int32))
    allow = np.ones((B, n), np.float32)
    allow[:, :: max(n // 16, 1)] = 0.0
    allow = jnp.asarray(allow)
    ns = jnp.asarray(np.full((B, 1), n, np.int32))
    ms = jnp.asarray(np.full((B, 1), m, np.int32))
    pm = np.zeros((1, 8), np.float32)
    pm[0, :5] = [1, -2, -5, -1, -10]
    pm = jnp.asarray(pm)

    for c_blk in cblks:
        if n % c_blk:
            print(json.dumps({"c_blk": c_blk, "skip": "n % c_blk != 0"}))
            continue

        def one(qs, c_blk=c_blk):
            return blocked_scores(mode, use_jump, m, n, c_blk, False,
                                  qs, ts, allow, ns, ms, pm)

        @functools.partial(jax.jit, static_argnums=(0,))
        def run_k(K, qs, one=one):
            def body(k, carry):
                acc, qs = carry
                sc = jnp.ravel(one(qs))
                return acc + sc, qs + (sc * 0).astype(qs.dtype)[:, None]
            acc, _ = jax.lax.fori_loop(
                0, K, body, (jnp.zeros(qs.shape[0]), qs))
            return acc

        qs_d = jnp.asarray(qs)
        try:
            per = _amortized(lambda K: run_k(K, qs_d))
            g = B * m * n / per / 1e9
            print(json.dumps({
                "mode": mode, "B": B, "m": m, "n": n, "c_blk": c_blk,
                "gcups": round(g, 2), "fill_ms": round(per * 1e3, 2),
            }), flush=True)
        except Exception as err:
            print(json.dumps({
                "c_blk": c_blk,
                "error": f"{type(err).__name__}: {str(err)[:200]}",
            }), flush=True)


if __name__ == "__main__":
    main()
