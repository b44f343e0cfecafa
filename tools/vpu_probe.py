"""VPU microbenchmarks on the real chip (run under the axon tunnel).

Answers two round-2 questions (VERDICT.md):
  1. An INDEPENDENT elementwise op ceiling (weak #7): chained max+add
     throughput per dtype — f32 vs i32 vs i16 — so the roofline defense
     is a measurement, not an assertion, and the int16 question (#4) is
     settled by data.
  2. Flat-kernel batch-tile scaling (#1): the same Pallas fill at
     tile_b = 8/16/32/64 — if the kernel is per-instruction-overhead
     bound at moderate n_pad, wider tiles amortize it.

Usage: /opt/venv/bin/python tools/vpu_probe.py [--quick]
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _amortized(run_k, reps=2, k1=1, k2=5):
    def timed(K):
        np.asarray(run_k(K))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run_k(K))
            best = min(best, time.perf_counter() - t0)
        return best

    per = (timed(k2) - timed(k1)) / (k2 - k1)
    if per <= 0:
        # tunnel noise inverted the difference; widen the chain once,
        # then fail loudly rather than return a negative rate
        per = (timed(4 * k2) - timed(k1)) / (4 * k2 - k1)
    if per <= 0:
        raise RuntimeError(
            "amortized timing non-positive twice — link too noisy"
        )
    return per


def elementwise_ceiling(shape=(256, 2048), chain=512):
    """Chained y = max(y + a, b): 2 VPU ops per element per link, serial
    dependency so XLA cannot collapse the chain."""
    print(f"# elementwise ceiling, shape {shape}, chain {chain}")
    for dtype, a_val in (("float32", 1.0), ("int32", 1), ("int16", 1),
                         ("bfloat16", 1.0)):
        dt = jnp.dtype(dtype)
        a = jnp.asarray(np.full(shape, a_val), dt)
        b = jnp.asarray(np.zeros(shape), dt)
        y0 = jnp.asarray(np.zeros(shape), dt)

        @functools.partial(jax.jit, static_argnums=(0,))
        def run_k(K, y, a, b):
            def body(k, y):
                y = jnp.maximum(y + a, b)
                return y - a  # keep magnitudes bounded; still 3 ops/link

            return jax.lax.fori_loop(0, K, body, y)

        per = _amortized(lambda K: run_k(K * chain, y0, a, b))
        ops = 3 * np.prod(shape) * chain / per
        print(f"  {dtype:9s}: {ops/1e12:7.3f} Tops/s "
              f"({per*1e6/chain:6.3f} us per 3-op link)")


def vmem_ceiling(shape=(32, 1024), chain=2048):
    """True VPU op ceiling: chained y = max(y + a, b) entirely in VMEM via
    a Pallas kernel (the XLA fori_loop version round-trips its carry
    through HBM and measures bandwidth instead)."""
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"# VMEM ceiling, shape {shape}, chain {chain}")
    for dtype in ("float32", "int32", "int16"):
        dt = jnp.dtype(dtype)

        def kern(a_ref, b_ref, out_ref):
            a = a_ref[:, :]
            b = b_ref[:, :]

            def body(k, y):
                return jnp.maximum(y + a, b) - a

            out_ref[:, :] = jax.lax.fori_loop(0, chain, body, b)

        @jax.jit
        def run(a, b):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(shape, dt),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a, b)

        try:
            a = jnp.asarray(np.ones(shape), dt)
            b = jnp.asarray(np.zeros(shape), dt)
            np.asarray(run(a, b))
            t0 = time.perf_counter()
            reps = 20
            for _ in range(reps):
                r = run(a, b)
            np.asarray(r)
            per = (time.perf_counter() - t0) / reps
            ops = 3 * np.prod(shape) * chain / per
            print(f"  {dtype:8s}: {ops/1e12:7.3f} Tops/s")
        except Exception as err:
            print(f"  {dtype:8s}: ERROR {str(err)[:140]}")


def roofline_ops_per_sec(dtype="float32", shape=(64, 2048), chain=4096,
                         width=8):
    """One dtype's saturated VPU op ceiling in op/s (see vpu_roofline).

    Importable (bench.py calls this in the SAME session as its GCUPS
    measurement so the headline can be reported as a fraction of a
    same-run roofline — cross-session probes drift up to 2x through the
    tunnel; DESIGN.md §4). The defaults here are HEAVIER than
    vpu_roofline's (one run_k(1) ~ 13 G ops ~ 8 ms of device work):
    the per-call tunnel round trip is 30-300 ms, so a short-chain
    difference measures noise, not the ceiling — the long-chain
    amortization keeps the K2-K1 signal above it."""
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = jnp.dtype(dtype)

    def kern(a_ref, b_ref, out_ref):
        a = a_ref[:, :]
        b = b_ref[:, :]

        def body(k, ys):
            return tuple(jnp.maximum(y + a, b) - a for y in ys)

        ys = jax.lax.fori_loop(
            0, chain, body, tuple(b + i for i in range(width))
        )
        acc = ys[0]
        for y in ys[1:]:
            acc = acc + y
        out_ref[:, :] = acc

    @ft.partial(jax.jit, static_argnums=(0,))
    def run_k(K, a, b):
        def outer(k, carry):
            r = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(shape, dt),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(carry, b)
            return jnp.maximum(carry, r)

        return jax.lax.fori_loop(0, K, outer, a)

    a = jnp.asarray(np.ones(shape), dt)
    b = jnp.asarray(np.zeros(shape), dt)
    per = _amortized(lambda K: run_k(K, a, b), reps=3, k1=2, k2=12)
    return 3 * width * float(np.prod(shape)) * chain / per


def vpu_roofline(shape=(64, 2048), chain=256, width=8):
    """Saturated VPU op ceiling: ``width`` INDEPENDENT max/add chains per
    loop iteration (ILP hides the loop-carried latency that bounds the
    single-chain probes above — those measure latency, not throughput).
    This is the number DESIGN.md 4's speed-of-light argument divides by:
    a DP fill doing ~19 VPU ops/cell cannot beat (ceiling / 19) GCUPS."""
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"# VPU roofline, shape {shape}, chain {chain}, width {width}")
    for dtype in ("float32", "int32", "bfloat16", "int16"):
        dt = jnp.dtype(dtype)

        def kern(a_ref, b_ref, out_ref):
            a = a_ref[:, :]
            b = b_ref[:, :]

            def body(k, ys):
                return tuple(jnp.maximum(y + a, b) - a for y in ys)

            ys = jax.lax.fori_loop(
                0, chain, body, tuple(b + i for i in range(width))
            )
            acc = ys[0]
            for y in ys[1:]:
                acc = acc + y
            out_ref[:, :] = acc

        @ft.partial(jax.jit, static_argnums=(0,))
        def run_k(K, a, b):
            def outer(k, carry):
                r = pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct(shape, dt),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(carry, b)
                # real serial dependency (XLA folds where(p, x, x) and
                # x + r*0, which silently DCEs the kernel): feed r back
                # as the next 'a'; values stabilize after one iteration
                return jnp.maximum(carry, r)

            return jax.lax.fori_loop(0, K, outer, a)

        try:
            a = jnp.asarray(np.ones(shape), dt)
            b = jnp.asarray(np.zeros(shape), dt)
            per = _amortized(lambda K: run_k(K, a, b))
            ops = 3 * width * np.prod(shape) * chain / per
            print(f"  {dtype:8s}: {ops/1e12:7.3f} Tops/s")
        except Exception as err:
            print(f"  {dtype:8s}: ERROR {str(err)[:120]}")


def pallas_tile_scaling(quick=False):
    from aligntools_tpu.ops import pallas_scan as pk

    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    cases = [(256, 2048), (64, 2048), (32, 8192)]
    if quick:
        cases = cases[:1]
    for B, L in cases:
        qs = jnp.asarray(rng.choice(alpha, (B, L)).astype(np.int32))
        ts = jnp.asarray(rng.choice(alpha, (B, L)).astype(np.int32))
        ns = jnp.asarray(np.full((B, 1), L, np.int32))
        ms = jnp.asarray(np.full((B, 1), L, np.int32))
        pm = np.zeros((1, 8), np.float32)
        pm[0, :5] = [1, -2, -5, -1, -10]
        pm = jnp.asarray(pm)
        print(f"# pallas local {B}x{L}^2, tile_b sweep")
        ref = None
        for tile_b in (8, 16, 32, 64):
            if tile_b > B:
                continue
            try:
                one = functools.partial(
                    pk.pallas_scores, "local", L, L, False,
                    ns=ns, ms=ms, params=pm, tile_b=tile_b,
                )

                @functools.partial(jax.jit, static_argnums=(0,))
                def run_k(K, qs):
                    def body(k, carry):
                        acc, q = carry
                        sc = one(q, ts)
                        return acc + sc, q + (sc * 0).astype(q.dtype)[:, None]

                    acc, _ = jax.lax.fori_loop(
                        0, K, body, (jnp.zeros(qs.shape[0]), qs)
                    )
                    return acc

                got = np.asarray(run_k(1, qs))
                if ref is None:
                    ref = got
                ok = np.array_equal(got, ref)
                per = _amortized(lambda K: run_k(K, qs))
                g = B * L * L / per / 1e9
                print(f"  tile_b={tile_b:3d}: {g:6.1f} GCUPS "
                      f"({per*1e3:7.2f} ms) exact={ok}")
            except Exception as err:
                print(f"  tile_b={tile_b:3d}: ERROR {str(err)[:140]}")


if __name__ == "__main__":
    quick = "--quick" in sys.argv
    print(f"backend: {jax.default_backend()} {jax.devices()[0].device_kind}")
    elementwise_ceiling(chain=128 if quick else 512)
    vpu_roofline(chain=64 if quick else 256)
    pallas_tile_scaling(quick)
