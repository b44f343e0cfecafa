"""One-off probe: banded Pallas tile_b / shape sweep vs the XLA banded
fill on hardware. Not part of the suite; used to set routing thresholds.

    /opt/venv/bin/python benchmarks/probe_banded.py
"""

from __future__ import annotations

import functools
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

from benchmarks.suite import _amortized


def probe(mode, B, L, W, tile_b):
    from aligntools_tpu.engine.banded import banded_fill
    from aligntools_tpu.ops.pallas_banded import (
        banded_pallas_scores,
        build_t_win,
    )

    rng = np.random.default_rng(7)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    V = 2 * W + 1
    qs = rng.choice(alpha, (B, L)).astype(np.int32)
    te = np.full((B, W + L + V + 1), -2, np.int32)
    te[:, W : W + L] = rng.choice(alpha, (B, L))
    cells = B * L * V

    if tile_b == 0:  # XLA
        ps = np.zeros((B, 8), np.float32)
        ps[:, :5] = [1, -2, -5, -1, -10]
        ps[:, 5] = L
        ps = jnp.asarray(ps)
        tej = jnp.asarray(te)
        ns = jnp.asarray(np.full(B, L, np.int32))

        @functools.partial(jax.jit, static_argnums=(0,))
        def run_k(K, qs, tej):
            def body(k, carry):
                acc, qs = carry
                sc = jax.vmap(
                    lambda q, t, n, p: banded_fill(mode, q, t, n, W, p)[0]
                )(qs, tej, ns, ps)
                return acc + sc, qs + (sc * 0).astype(qs.dtype)[:, None]

            acc, _ = jax.lax.fori_loop(
                0, K, body, (jnp.zeros(qs.shape[0]), qs)
            )
            return acc

        qsj = jnp.asarray(qs)
        per = _amortized(lambda K: run_k(K, qsj, tej))
        return cells / per / 1e9, per

    V_pad = -(-V // 128) * 128
    t_win = build_t_win(jnp.asarray(te), L, V_pad)
    ns = jnp.asarray(np.full((B, 1), L, np.int32))
    ms = jnp.asarray(np.full((B, 1), L, np.int32))
    pv = jnp.asarray(np.array([[1, -2, -5, -1, -10, 0, 0, 0]], np.float32))

    @functools.partial(jax.jit, static_argnums=(0,))
    def run_k(K, qs, tw):
        def body(k, carry):
            acc, qs = carry
            sc = banded_pallas_scores(
                mode, W, L, False, tile_b, qs, tw, ns, ms, pv
            )[0]
            return acc + sc, qs + (sc * 0).astype(qs.dtype)[:, None]

        acc, _ = jax.lax.fori_loop(0, K, body, (jnp.zeros(qs.shape[0]), qs))
        return acc

    qsj = jnp.asarray(qs)
    per = _amortized(lambda K: run_k(K, qsj, t_win))
    return cells / per / 1e9, per


def main():
    # one config per process when args are given (the axon tunnel can
    # wedge long-lived processes): mode B L W tile_b
    if len(sys.argv) == 6:
        mode, B, L, W, tile_b = sys.argv[1], *map(int, sys.argv[2:])
        g, per = probe(mode, B, L, W, tile_b)
        eng = "xla" if tile_b == 0 else f"pallas tb={tile_b}"
        print(f"{mode} {B}x{L} W={W} {eng}: {g:.1f} GCUPS "
              f"({per * 1e3:.2f} ms)", flush=True)
        return
    for mode in ("global", "edit"):
        for B, L, W in ((256, 1024, 64), (2048, 512, 64), (64, 4096, 128)):
            for tile_b in (0, 64, 256, 512, 2048):
                if tile_b > B:
                    continue
                try:
                    g, per = probe(mode, B, L, W, tile_b)
                    eng = "xla" if tile_b == 0 else f"pallas tb={tile_b}"
                    print(
                        f"{mode} {B}x{L} W={W} {eng}: {g:.1f} GCUPS "
                        f"({per * 1e3:.2f} ms)",
                        flush=True,
                    )
                except Exception as err:
                    print(f"{mode} {B}x{L} W={W} tb={tile_b}: "
                          f"ERR {str(err)[:100]}", flush=True)


if __name__ == "__main__":
    main()
