"""Device-free Mosaic lowering gate: jax.export every Pallas kernel for
the TPU platform from a CPU host. This runs the Pallas -> Mosaic dialect
conversion (where an unsupported primitive — a vector lax.cond, a strided
slice, a reshape Mosaic cannot legalize — fails fast) WITHOUT a TPU
device or the axon tunnel. It does not replace tools/tpu_check.py: the
libtpu backend still applies its own layout passes at real compile time;
this gate just catches front-end lowering regressions while hardware is
unavailable.

Usage: JAX_PLATFORMS=cpu /opt/venv/bin/python tools/mosaic_lower_check.py
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


def main():
    import jax
    import jax.numpy as jnp

    from aligntools_tpu.ops import pallas_scan as pk
    from aligntools_tpu.ops.pallas_blocked import (
        blocked_ptr_fill,
        blocked_scores,
    )
    from aligntools_tpu.ops.pallas_banded import (
        banded_pallas_scores,
        build_t_win,
    )
    from aligntools_tpu.ops.pallas_ptr import pallas_ptr_fill

    B, m_pad, n_pad = 8, 64, 512
    qs = jnp.zeros((B, m_pad), jnp.int32)
    ts = jnp.zeros((B, n_pad), jnp.int32)
    allow = jnp.ones((B, n_pad), jnp.float32)
    ns = jnp.full((B, 1), n_pad, jnp.int32)
    ms = jnp.full((B, 1), m_pad, jnp.int32)
    pm = jnp.zeros((1, 8), jnp.float32)
    fails = 0

    def gate(label, fn, *args):
        nonlocal fails
        try:
            jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
            print(f"  {label}: lowering OK", flush=True)
        except Exception as err:
            fails += 1
            print(f"  {label}: FAILED — {str(err)[:300]}", flush=True)

    for pre, tl in ((0, False), (4, False), (4, True)):
        pk._PRE_OVERRIDE, pk._TWOLEVEL_OVERRIDE = pre, tl
        pk.pallas_scores.clear_cache()
        pk.pallas_fit_scores.clear_cache()
        print(f"scan variant pre={pre} twolevel={tl}:", flush=True)
        for mode in ("global", "local", "overlap", "edit"):
            gate(f"flat {mode}",
                 lambda *a, m=mode: pk.pallas_scores(
                     m, m_pad, n_pad, False, *a),
                 qs, ts, ns, ms, pm)
        gate("flat fit+jump",
             lambda *a: pk.pallas_fit_scores(
                 True, m_pad, n_pad, False, *a),
             qs, ts, allow, ns, ms, pm)
        gate("flat-ptr local",
             lambda *a: pallas_ptr_fill(
                 "local", False, m_pad, n_pad, False, *a, rows_per_byte=2),
             qs, ts, allow, ns, ms, pm)
        n_blk = 16384
        tsb = jnp.zeros((B, n_blk), jnp.int32)
        alb = jnp.ones((B, n_blk), jnp.float32)
        nsb = jnp.full((B, 1), n_blk, jnp.int32)
        gate("blocked fit+jump",
             lambda *a: blocked_scores(
                 "fit", True, m_pad, n_blk, 8192, False, *a),
             qs, tsb, alb, nsb, ms, pm)
        gate("blocked-ptr overlap",
             lambda *a: blocked_ptr_fill(
                 "overlap", False, m_pad, n_blk, 8192, False, *a,
                 rows_per_byte=4),
             qs, tsb, alb, nsb, ms, pm)
        W, L = 64, 512
        V_pad = -(-(2 * W + 1) // 128) * 128
        te = jnp.zeros((B, W + L + 2 * W + 2), jnp.int32)
        t_win = build_t_win(te, L, V_pad)
        qsl = jnp.zeros((B, L), jnp.int32)
        nsl = jnp.full((B, 1), L, jnp.int32)
        gate("banded global",
             lambda q, tw: banded_pallas_scores(
                 "global", W, L, False, 8, q, tw, nsl, nsl, pm),
             qsl, t_win)
    pk._PRE_OVERRIDE = pk._TWOLEVEL_OVERRIDE = None
    if fails:
        sys.exit(f"{fails} lowering failures")
    print("MOSAIC LOWERING GATE PASSED", flush=True)


if __name__ == "__main__":
    main()
