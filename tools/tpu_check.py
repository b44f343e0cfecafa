"""On-device validation: run the REAL Mosaic kernels on the TPU and compare
against the spec oracle (the pytest suite forces the CPU backend, so this
is the hardware half of the story; run after kernel changes).

Covers the numerics trap found in round 1: TPU f32 matmuls decompose to
bf16 passes at default precision (exact only to |v| <= 256), which
silently corrupted the blocked kernel's block-edge extraction for DP
values past 256 — every kernel dot now pins Precision.HIGHEST, and this
check exercises targets long enough (100k+) that DP values reach -130k.

Usage: /opt/venv/bin/python tools/tpu_check.py
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

    from aligntools_tpu.batch import align_batch
    from aligntools_tpu.ops.pallas_blocked import (
        blocked_ptr_fill,
        blocked_scores,
    )
    from aligntools_tpu.ops.pallas_scan import pallas_scores
    from aligntools_tpu.engine import device_tb
    from aligntools_tpu.params import AlignParams
    from aligntools_tpu.spec import engine as spec

    assert jax.default_backend() == "tpu", (
        f"tpu_check must run on the TPU backend, got {jax.default_backend()}"
    )
    rng = np.random.default_rng(5)
    alpha = list(b"ACGT")
    p = AlignParams(match=2, mismatch=-3, gap_open=-4, gap_extend=-1)
    params = np.zeros((1, 8), np.float32)
    params[0, :5] = [p.match, p.mismatch, p.gap_open, p.gap_extend, p.jump]

    def bucket(pairs, m_pad, n_pad):
        B = len(pairs)
        qs = np.full((B, m_pad), -1, np.int32)
        ts = np.full((B, n_pad), -2, np.int32)
        ms = np.ones((B, 1), np.int32)
        ns = np.ones((B, 1), np.int32)
        allow = np.ones((B, n_pad), np.float32)
        for k, (q, t) in enumerate(pairs):
            qs[k, : len(q)] = np.frombuffer(q, np.uint8)
            ts[k, : len(t)] = np.frombuffer(t, np.uint8)
            ms[k, 0], ns[k, 0] = len(q), len(t)
        return qs, ts, allow, ns, ms

    # 1. flat kernels, DP values to ~2k
    pairs = [
        (bytes(rng.choice(alpha, int(rng.integers(100, 512))).tolist()),
         bytes(rng.choice(alpha, int(rng.integers(100, 1024))).tolist()))
        for _ in range(8)
    ]
    qs, ts, allow, ns, ms = bucket(pairs, 512, 1024)
    a = tuple(jnp.asarray(x) for x in (qs, ts, ns, ms, params))
    for mode in ("global", "local", "overlap", "edit"):
        got = np.asarray(
            pallas_scores(mode, 512, 1024, False, *a)
        ).astype(np.float64)
        want = [
            getattr(spec, f"spec_{mode}")(q, t, p).score
            if mode != "edit" else float(spec.spec_edit(q, t, p))
            for q, t in pairs
        ]
        assert np.array_equal(got, want), (mode, got[:4], want[:4])
        print(f"flat {mode}: OK", flush=True)

    # 1b. scan-strategy variants on hardware: every (scan_pre, twolevel)
    # composition must be bit-identical — the adaptive early exit and the
    # two-level tail are exact by construction, and this is where a
    # Mosaic lowering problem (lax.cond on vectors, the strided block
    # extract, the 3D broadcast-back) would surface first.
    from aligntools_tpu.ops import pallas_scan as pk

    fitpairs = [
        (bytes(rng.choice(alpha, int(rng.integers(50, 256))).tolist()),
         bytes(rng.choice(alpha, int(rng.integers(300, 1024))).tolist()))
        for _ in range(8)
    ]
    fq, ft, fallow, fns, fms = bucket(fitpairs, 256, 1024)
    fa = tuple(jnp.asarray(x) for x in (fq, ft, fallow, fns, fms, params))
    base = {}
    try:
        for pre, tl in ((0, False), (3, False), (4, True), (3, True)):
            pk._PRE_OVERRIDE, pk._TWOLEVEL_OVERRIDE = pre, tl
            pk.pallas_scores.clear_cache()
            pk.pallas_fit_scores.clear_cache()
            for mode in ("global", "local", "overlap", "edit"):
                got = np.asarray(pallas_scores(mode, 512, 1024, False, *a))
                if mode not in base:
                    base[mode] = got
                assert np.array_equal(got, base[mode]), (
                    "scan-variant", mode, pre, tl)
            gotf = np.asarray(
                pk.pallas_fit_scores(True, 256, 1024, False, *fa)
            )
            if "fit" not in base:
                base["fit"] = gotf
            assert np.array_equal(gotf, base["fit"]), (
                "scan-variant fit+jump", pre, tl)
            print(f"scan variants pre={pre} twolevel={tl}: OK", flush=True)
    finally:
        pk._PRE_OVERRIDE = pk._TWOLEVEL_OVERRIDE = None
        pk.pallas_scores.clear_cache()
        pk.pallas_fit_scores.clear_cache()
    gotf = [
        float(x) for x in base["fit"]
    ]
    wantf = [
        spec.spec_fit(q, t, p, sites=[]).score for q, t in fitpairs
    ]
    assert gotf == wantf, ("fit+jump vs spec", gotf[:3], wantf[:3])
    print("scan variants vs spec: OK", flush=True)

    # 2. blocked kernel at 131k columns (DP values to ~-130k)
    big = [
        (bytes(rng.choice(alpha, int(rng.integers(30, 64))).tolist()),
         bytes(rng.choice(alpha, int(rng.integers(100_000, 131_072))).tolist()))
        for _ in range(8)
    ]
    qs, ts, allow, ns, ms = bucket(big, 64, 131072)
    a = tuple(jnp.asarray(x) for x in (qs, ts, allow, ns, ms, params))
    for mode in ("global", "local", "fit", "overlap", "edit"):
        got = np.asarray(
            blocked_scores(mode, False, 64, 131072, 8192, False, *a)
        ).astype(np.float64)
        want = [
            float(spec.spec_edit(q, t, p)) if mode == "edit"
            else (spec.spec_fit if mode == "fit"
                  else getattr(spec, f"spec_{mode}"))(q, t, p).score
            for q, t in big
        ]
        assert np.array_equal(got, want), (mode, got[:4], want[:4])
        print(f"blocked {mode} @131k: OK", flush=True)

    # 3. blocked pointer kernel + device walk, medium-long targets
    med = [
        (bytes(rng.choice(alpha, int(rng.integers(50, 256))).tolist()),
         bytes(rng.choice(alpha, int(rng.integers(4000, 65536))).tolist()))
        for _ in range(8)
    ]
    qs, ts, allow, ns, ms = bucket(med, 256, 65536)
    a = tuple(jnp.asarray(x) for x in (qs, ts, allow, ns, ms, params))
    for mode in ("global", "local", "fit", "overlap"):
        want = align_batch(mode, med, p, engine="xla")
        for pack in (1, 2) + ((4,) if mode == "overlap" else ()):
            score, av, bv, ptrs = blocked_ptr_fill(
                mode, False, 256, 65536, 8192, False, *a,
                rows_per_byte=pack,
            )
            score = np.asarray(score).astype(np.float64)
            av, bv = np.asarray(av), np.asarray(bv)
            assert np.array_equal(score, [w.score for w in want]), mode
            if mode == "global":
                starts = [(int(av[k]), int(ms[k, 0]), int(ns[k, 0]))
                          for k in range(8)]
            elif mode == "local":
                starts = [(1, int(av[k]), int(bv[k])) for k in range(8)]
            elif mode == "fit":
                starts = [(0 if int(av[k]) else 1, int(ms[k, 0]),
                           int(bv[k])) for k in range(8)]
            else:  # overlap: bottom-row start at latched column a
                starts = [(0, int(ms[k, 0]), int(av[k])) for k in range(8)]
            rows = device_tb.batch_traceback(
                mode, ptrs, qs, ts, med, starts, col_base=1, pack4=pack
            )
            for k in range(8):
                assert rows[k] == (want[k].row1, want[k].row2), (mode, k)
            print(f"blocked-ptr {mode} @64k rows"
                  f"{f' (packed x{pack})' if pack > 1 else ''}: OK",
                  flush=True)

    # 3b. FLAT pointer kernel on hardware, byte and nibble layouts
    from aligntools_tpu.ops.pallas_ptr import pallas_ptr_fill

    fl = [
        (bytes(rng.choice(alpha, int(rng.integers(100, 512))).tolist()),
         bytes(rng.choice(alpha, int(rng.integers(500, 2048))).tolist()))
        for _ in range(8)
    ]
    qs, ts, allow, ns, ms = bucket(fl, 512, 2048)
    a = tuple(jnp.asarray(x) for x in (qs, ts, allow, ns, ms, params))
    for mode in ("global", "local", "fit", "overlap"):
        want = align_batch(mode, fl, p, engine="xla")
        for pack in (1, 2) + ((4,) if mode == "overlap" else ()):
            score, av, bv, ptrs = pallas_ptr_fill(
                mode, False, 512, 2048, False, *a, rows_per_byte=pack,
            )
            score = np.asarray(score).astype(np.float64)
            av, bv = np.asarray(av), np.asarray(bv)
            assert np.array_equal(score, [w.score for w in want]), mode
            if mode == "global":
                starts = [(int(av[k]), int(ms[k, 0]), int(ns[k, 0]))
                          for k in range(8)]
            elif mode == "local":
                starts = [(1, int(av[k]), int(bv[k])) for k in range(8)]
            elif mode == "fit":
                starts = [(0 if int(av[k]) else 1, int(ms[k, 0]),
                           int(bv[k])) for k in range(8)]
            else:
                starts = [(0, int(ms[k, 0]), int(av[k])) for k in range(8)]
            rows = device_tb.batch_traceback(
                mode, ptrs, qs, ts, fl, starts, col_base=1, pack4=pack
            )
            for k in range(8):
                assert rows[k] == (want[k].row1, want[k].row2), (mode, k)
            print(f"flat-ptr {mode}"
                  f"{f' (packed x{pack})' if pack > 1 else ''}: OK",
                  flush=True)

    # 4. blocked pointer kernel for OVERLAP at 131k columns + device walk
    # (trace_back_overlap, alignment.h:896-922; long-target full rows)
    ov = [
        (bytes(rng.choice(alpha, int(rng.integers(30, 64))).tolist()),
         bytes(rng.choice(alpha, int(rng.integers(100_000, 131_072))).tolist()))
        for _ in range(8)
    ]
    qs, ts, allow, ns, ms = bucket(ov, 64, 131072)
    a = tuple(jnp.asarray(x) for x in (qs, ts, allow, ns, ms, params))
    score, av, bv, ptrs = blocked_ptr_fill(
        "overlap", False, 64, 131072, 8192, False, *a
    )
    score = np.asarray(score).astype(np.float64)
    av = np.asarray(av)
    want = align_batch("overlap", ov, p, engine="xla")
    assert np.array_equal(score, [w.score for w in want]), "overlap@131k"
    starts = [(0, int(ms[k, 0]), int(av[k])) for k in range(8)]
    rows = device_tb.batch_traceback(
        "overlap", ptrs, qs, ts, ov, starts, col_base=1
    )
    for k in range(8):
        assert rows[k] == (want[k].row1, want[k].row2), ("overlap@131k", k)
    print("blocked-ptr overlap @131k rows: OK", flush=True)

    # 5. checkpoint-rescan full rows at ONE MILLION columns (VERDICT #5's
    # scaling target: ~10x past the single-tensor pointer capacity for
    # this shape class). No oracle fits this size, so validate by
    # (a) score parity with the independent blocked Pallas fill and
    # (b) re-scoring the emitted rows against fit affine-gap semantics
    # (alignment.h:596-694: gap run of k costs o + (k-1)e).
    from aligntools_tpu.engine.rescan import rescan_align

    n1m = 1_000_000
    tbig = rng.choice(alpha, n1m)
    qv = tbig[600_000:600_512].copy()
    mut = rng.random(512) < 0.05
    qv[mut] = rng.choice(alpha, int(mut.sum()))
    qb, tb = bytes(qv.tolist()), bytes(tbig.tolist())
    res = rescan_align("fit", qb, tb, p, stride=128)
    got = res.score
    qs, ts, allow, ns, ms = bucket([(qb, tb)] * 8, 512, 1 << 20)
    a = tuple(jnp.asarray(x) for x in (qs, ts, allow, ns, ms, params))
    bs = np.asarray(
        blocked_scores("fit", False, 512, 1 << 20, 8192, False, *a)
    )
    assert float(bs[0]) == got, ("rescan@1M score", bs[0], got)
    assert res.row1.replace(b"-", b"") == qb
    assert res.row2.replace(b"-", b"") in tb
    walked = 0.0
    run = None
    for c1, c2 in zip(res.row1, res.row2):
        g = ord("-")
        if c1 != g and c2 != g:
            walked += p.match if c1 == c2 else p.mismatch
            run = None
        else:
            which = "L" if c2 == g else "U"
            walked += p.gap_extend if run == which else p.gap_open
            run = which
    assert walked == got, ("rescan@1M rescore", walked, got)
    print(f"rescan fit @1M columns: OK (score {got})", flush=True)

    # 6. banded Pallas kernel on hardware: bit-parity with the vmapped
    # XLA banded fill AND with the full (unbanded) engine on similar
    # pairs whose optimal path stays in band.
    from aligntools_tpu.engine.banded import banded_batch_scores
    from aligntools_tpu.batch import batch_scores

    def similar(n):
        q = rng.choice(alpha, n).astype(np.uint8)
        t = list(q.tolist())
        for _ in range(n // 30):
            t[int(rng.integers(0, len(t)))] = int(rng.choice(alpha))
        for _ in range(4):
            t.insert(int(rng.integers(0, len(t))), int(rng.choice(alpha)))
        return bytes(q.tolist()), bytes(t)

    bp = [similar(int(rng.integers(500, 2000))) for _ in range(24)]
    for mode in ("global", "local", "edit", "fit", "overlap"):
        got, ge = banded_batch_scores(mode, bp, 64, p, engine="pallas")
        want, we = banded_batch_scores(mode, bp, 64, p, engine="xla")
        assert np.array_equal(got, want), ("banded-pallas", mode)
        assert np.array_equal(ge, we), ("banded-pallas edge", mode)
        if mode in ("global", "local"):
            full = batch_scores(mode, bp, p)
            assert np.array_equal(got, full), ("banded-vs-full", mode)
        print(f"banded-pallas {mode} W=64: OK", flush=True)

    # 7. pointer-emitting banded Pallas kernel on hardware (uint8 window
    # slabs + start scalars): rows byte-identical to the XLA fill + walk
    from aligntools_tpu.engine.banded import banded_align_batch

    for mode in ("global", "local", "fit", "overlap"):
        want = banded_align_batch(mode, bp, 64, p, engine="xla")[0]
        got = banded_align_batch(mode, bp, 64, p, engine="pallas")[0]
        for k, (w, g) in enumerate(zip(want, got)):
            assert (g.score, g.row1, g.row2) == (
                w.score, w.row1, w.row2,
            ), ("banded-ptr", mode, k)
        print(f"banded-ptr {mode} W=64 rows: OK", flush=True)

    print("TPU CHECK PASSED", flush=True)


if __name__ == "__main__":
    main()
