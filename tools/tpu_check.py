"""On-device validation: run the REAL Mosaic kernels on the TPU and compare
against the spec oracle (the pytest suite forces the CPU backend, so this
is the hardware half of the story; run after kernel changes).

Covers the numerics trap found in round 1: TPU f32 matmuls decompose to
bf16 passes at default precision (exact only to |v| <= 256), which
silently corrupted the blocked kernel's block-edge extraction for DP
values past 256 — every kernel dot now pins Precision.HIGHEST, and this
check exercises targets long enough (100k+) that DP values reach -130k.

Each stage runs in its OWN subprocess with a timeout: the axon tunnel
wedges long-lived multi-compile processes (round 2: calibrate and
multi-config probes hung mid-run), and one wedged stage must not cost the
whole hardware pass. `--stage NAME` runs a single stage in-process.

Usage: /opt/venv/bin/python tools/tpu_check.py [--stage NAME]
"""

from __future__ import annotations

import os
import subprocess
import sys

try:
    import numpy as np
except ImportError:
    venv = "/opt/venv/bin/python"
    if os.path.exists(venv) and not sys.executable.startswith("/opt/venv/"):
        os.execv(venv, [venv, os.path.abspath(__file__), *sys.argv[1:]])
    raise

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGE_TIMEOUT = 1800


class Ctx:
    """Per-process stage context: device check + shared fixtures."""

    def __init__(self):
        import jax

        from aligntools_tpu.params import AlignParams

        assert jax.default_backend() == "tpu", (
            f"tpu_check must run on the TPU backend, got "
            f"{jax.default_backend()}"
        )
        self.rng = np.random.default_rng(5)
        self.alpha = list(b"ACGT")
        self.p = AlignParams(match=2, mismatch=-3, gap_open=-4, gap_extend=-1)
        self.params = np.zeros((1, 8), np.float32)
        self.params[0, :5] = [self.p.match, self.p.mismatch, self.p.gap_open,
                              self.p.gap_extend, self.p.jump]

    def bucket(self, pairs, m_pad, n_pad):
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

    def gen(self, n, lo_m, hi_m, lo_n, hi_n):
        return [
            (bytes(self.rng.choice(self.alpha,
                                   int(self.rng.integers(lo_m, hi_m)))
                   .tolist()),
             bytes(self.rng.choice(self.alpha,
                                   int(self.rng.integers(lo_n, hi_n)))
                   .tolist()))
            for _ in range(n)
        ]

    def flat_bucket_args(self):
        import jax.numpy as jnp

        pairs = self.gen(8, 100, 512, 100, 1024)
        qs, ts, allow, ns, ms = self.bucket(pairs, 512, 1024)
        return pairs, tuple(
            jnp.asarray(x) for x in (qs, ts, ns, ms, self.params)
        )


def stage_flat(ctx):
    """Flat kernels, DP values to ~2k."""
    from aligntools_tpu.ops.pallas_scan import pallas_scores
    from aligntools_tpu.spec import engine as spec

    pairs, a = ctx.flat_bucket_args()
    for mode in ("global", "local", "overlap", "edit"):
        got = np.asarray(
            pallas_scores(mode, 512, 1024, False, *a)
        ).astype(np.float64)
        want = [
            getattr(spec, f"spec_{mode}")(q, t, ctx.p).score
            if mode != "edit" else float(spec.spec_edit(q, t, ctx.p))
            for q, t in pairs
        ]
        assert np.array_equal(got, want), (mode, got[:4], want[:4])
        print(f"flat {mode}: OK", flush=True)


def stage_scanvar(ctx):
    """Scan-strategy variants on hardware: every (scan_pre, twolevel)
    composition must be bit-identical — the adaptive early exit and the
    two-level tail are exact by construction, and this is where a Mosaic
    lowering problem (lax.cond on vectors, the strided block extract, the
    3D broadcast-back) would surface first."""
    import jax.numpy as jnp

    from aligntools_tpu.ops import pallas_scan as pk
    from aligntools_tpu.ops.pallas_scan import pallas_scores
    from aligntools_tpu.spec import engine as spec

    pairs, a = ctx.flat_bucket_args()
    fitpairs = ctx.gen(8, 50, 256, 300, 1024)
    fq, ft, fallow, fns, fms = ctx.bucket(fitpairs, 256, 1024)
    fa = tuple(jnp.asarray(x)
               for x in (fq, ft, fallow, fns, fms, ctx.params))
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
    gotf = [float(x) for x in base["fit"]]
    wantf = [
        spec.spec_fit(q, t, ctx.p, sites=[]).score for q, t in fitpairs
    ]
    assert gotf == wantf, ("fit+jump vs spec", gotf[:3], wantf[:3])
    print("scan variants vs spec: OK", flush=True)


def stage_blocked(ctx):
    """Blocked kernel at 131k columns (DP values to ~-130k)."""
    import jax.numpy as jnp

    from aligntools_tpu.ops.pallas_blocked import blocked_scores
    from aligntools_tpu.spec import engine as spec

    big = ctx.gen(8, 30, 64, 100_000, 131_072)
    qs, ts, allow, ns, ms = ctx.bucket(big, 64, 131072)
    a = tuple(jnp.asarray(x) for x in (qs, ts, allow, ns, ms, ctx.params))
    for mode in ("global", "local", "fit", "overlap", "edit"):
        got = np.asarray(
            blocked_scores(mode, False, 64, 131072, 8192, False, *a)
        ).astype(np.float64)
        want = [
            float(spec.spec_edit(q, t, ctx.p)) if mode == "edit"
            else (spec.spec_fit if mode == "fit"
                  else getattr(spec, f"spec_{mode}"))(q, t, ctx.p).score
            for q, t in big
        ]
        assert np.array_equal(got, want), (mode, got[:4], want[:4])
        print(f"blocked {mode} @131k: OK", flush=True)


def _ptr_roundtrip(ctx, pairs, m_pad, n_pad, fill, label):
    """Shared pointer-kernel + device-walk check (flat or blocked)."""
    import jax.numpy as jnp

    from aligntools_tpu.batch import align_batch
    from aligntools_tpu.engine import device_tb

    qs, ts, allow, ns, ms = ctx.bucket(pairs, m_pad, n_pad)
    a = tuple(jnp.asarray(x) for x in (qs, ts, allow, ns, ms, ctx.params))
    for mode in ("global", "local", "fit", "overlap"):
        want = align_batch(mode, pairs, ctx.p, engine="xla")
        for pack in (1, 2) + ((4,) if mode == "overlap" else ()):
            score, av, bv, ptrs = fill(mode, a, pack)
            score = np.asarray(score).astype(np.float64)
            av, bv = np.asarray(av), np.asarray(bv)
            assert np.array_equal(score, [w.score for w in want]), mode
            if mode == "global":
                starts = [(int(av[k]), int(ms[k, 0]), int(ns[k, 0]))
                          for k in range(len(pairs))]
            elif mode == "local":
                starts = [(1, int(av[k]), int(bv[k]))
                          for k in range(len(pairs))]
            elif mode == "fit":
                starts = [(0 if int(av[k]) else 1, int(ms[k, 0]),
                           int(bv[k])) for k in range(len(pairs))]
            else:  # overlap: bottom-row start at latched column a
                starts = [(0, int(ms[k, 0]), int(av[k]))
                          for k in range(len(pairs))]
            rows = device_tb.batch_traceback(
                mode, ptrs, qs, ts, pairs, starts, col_base=1, pack4=pack
            )
            for k in range(len(pairs)):
                assert rows[k] == (want[k].row1, want[k].row2), (mode, k)
            print(f"{label} {mode} rows"
                  f"{f' (packed x{pack})' if pack > 1 else ''}: OK",
                  flush=True)


def stage_blockedptr(ctx):
    """Blocked pointer kernel + device walk, medium-long targets."""
    from aligntools_tpu.ops.pallas_blocked import blocked_ptr_fill

    med = ctx.gen(8, 50, 256, 4000, 65536)
    _ptr_roundtrip(
        ctx, med, 256, 65536,
        lambda mode, a, pack: blocked_ptr_fill(
            mode, False, 256, 65536, 8192, False, *a, rows_per_byte=pack),
        "blocked-ptr @64k",
    )


def stage_flatptr(ctx):
    """FLAT pointer kernel on hardware, byte and nibble layouts."""
    from aligntools_tpu.ops.pallas_ptr import pallas_ptr_fill

    fl = ctx.gen(8, 100, 512, 500, 2048)
    _ptr_roundtrip(
        ctx, fl, 512, 2048,
        lambda mode, a, pack: pallas_ptr_fill(
            mode, False, 512, 2048, False, *a, rows_per_byte=pack),
        "flat-ptr",
    )


def stage_overlapptr(ctx):
    """Blocked pointer kernel for OVERLAP at 131k columns + device walk
    (trace_back_overlap, alignment.h:896-922; long-target full rows)."""
    import jax.numpy as jnp

    from aligntools_tpu.batch import align_batch
    from aligntools_tpu.engine import device_tb
    from aligntools_tpu.ops.pallas_blocked import blocked_ptr_fill

    ov = ctx.gen(8, 30, 64, 100_000, 131_072)
    qs, ts, allow, ns, ms = ctx.bucket(ov, 64, 131072)
    a = tuple(jnp.asarray(x) for x in (qs, ts, allow, ns, ms, ctx.params))
    score, av, bv, ptrs = blocked_ptr_fill(
        "overlap", False, 64, 131072, 8192, False, *a
    )
    score = np.asarray(score).astype(np.float64)
    av = np.asarray(av)
    want = align_batch("overlap", ov, ctx.p, engine="xla")
    assert np.array_equal(score, [w.score for w in want]), "overlap@131k"
    starts = [(0, int(ms[k, 0]), int(av[k])) for k in range(8)]
    rows = device_tb.batch_traceback(
        "overlap", ptrs, qs, ts, ov, starts, col_base=1
    )
    for k in range(8):
        assert rows[k] == (want[k].row1, want[k].row2), ("overlap@131k", k)
    print("blocked-ptr overlap @131k rows: OK", flush=True)


def stage_rescan1m(ctx):
    """Checkpoint-rescan full rows at ONE MILLION columns. No oracle fits
    this size, so validate by (a) score parity with the independent
    blocked Pallas fill and (b) re-scoring the emitted rows against fit
    affine-gap semantics (alignment.h:596-694: gap run of k costs
    o + (k-1)e)."""
    import jax.numpy as jnp

    from aligntools_tpu.engine.rescan import rescan_align
    from aligntools_tpu.ops.pallas_blocked import blocked_scores

    p, rng, alpha = ctx.p, ctx.rng, ctx.alpha
    n1m = 1_000_000
    tbig = rng.choice(alpha, n1m)
    qv = tbig[600_000:600_512].copy()
    mut = rng.random(512) < 0.05
    qv[mut] = rng.choice(alpha, int(mut.sum()))
    qb, tb = bytes(qv.tolist()), bytes(tbig.tolist())
    res = rescan_align("fit", qb, tb, p, stride=128)
    got = res.score
    qs, ts, allow, ns, ms = ctx.bucket([(qb, tb)] * 8, 512, 1 << 20)
    a = tuple(jnp.asarray(x) for x in (qs, ts, allow, ns, ms, ctx.params))
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


def _similar_pairs(ctx, n_pairs=24):
    rng, alpha = ctx.rng, ctx.alpha

    def similar(n):
        q = rng.choice(alpha, n).astype(np.uint8)
        t = list(q.tolist())
        for _ in range(n // 30):
            t[int(rng.integers(0, len(t)))] = int(rng.choice(alpha))
        for _ in range(4):
            t.insert(int(rng.integers(0, len(t))), int(rng.choice(alpha)))
        return bytes(q.tolist()), bytes(t)

    return [similar(int(rng.integers(500, 2000))) for _ in range(n_pairs)]


def stage_banded(ctx):
    """Banded Pallas kernel on hardware: bit-parity with the vmapped XLA
    banded fill AND with the full (unbanded) engine on similar pairs
    whose optimal path stays in band."""
    from aligntools_tpu.batch import batch_scores
    from aligntools_tpu.engine.banded import banded_batch_scores

    bp = _similar_pairs(ctx)
    for mode in ("global", "local", "edit", "fit", "overlap"):
        got, ge = banded_batch_scores(mode, bp, 64, ctx.p, engine="pallas")
        want, we = banded_batch_scores(mode, bp, 64, ctx.p, engine="xla")
        assert np.array_equal(got, want), ("banded-pallas", mode)
        assert np.array_equal(ge, we), ("banded-pallas edge", mode)
        if mode in ("global", "local"):
            full = batch_scores(mode, bp, ctx.p)
            assert np.array_equal(got, full), ("banded-vs-full", mode)
        print(f"banded-pallas {mode} W=64: OK", flush=True)


def stage_bandedptr(ctx):
    """Pointer-emitting banded Pallas kernel on hardware (uint8 window
    slabs + start scalars): rows byte-identical to the XLA fill + walk."""
    from aligntools_tpu.engine.banded import banded_align_batch

    bp = _similar_pairs(ctx)
    for mode in ("global", "local", "fit", "overlap"):
        want = banded_align_batch(mode, bp, 64, ctx.p, engine="xla")[0]
        got = banded_align_batch(mode, bp, 64, ctx.p, engine="pallas")[0]
        for k, (w, g) in enumerate(zip(want, got)):
            assert (g.score, g.row1, g.row2) == (
                w.score, w.row1, w.row2,
            ), ("banded-ptr", mode, k)
        print(f"banded-ptr {mode} W=64 rows: OK", flush=True)


def stage_chunked(ctx):
    """Column-chunked XLA engine (engine/chunked.py) on hardware: scores
    bit-identical to the spec engine across ragged true lengths and chunk
    widths (boundaries landing before/on/after each pair's n), incl. the
    pick_chunk rounding path (n_pad 4608 is not a multiple of 2048)."""
    import jax.numpy as jnp

    from aligntools_tpu.engine import chunked as ck
    from aligntools_tpu.spec import engine as spec

    pairs = ctx.gen(8, 100, 512, 1000, 4600)
    qs, ts, allow, ns, ms = ctx.bucket(pairs, 512, 4608)
    ps = np.zeros((len(pairs), 6), np.float32)
    ps[:, :5] = ctx.params[0, :5]
    ps[:, 5] = ms[:, 0]
    a = (jnp.asarray(qs), jnp.asarray(ts), jnp.asarray(ns[:, 0]),
         jnp.asarray(ps))
    for mode in ("global", "local", "overlap", "edit"):
        want = [
            getattr(spec, f"spec_{mode}")(q, t, ctx.p).score
            if mode != "edit" else float(spec.spec_edit(q, t, ctx.p))
            for q, t in pairs
        ]
        for chunk in (1024, 2048):
            got = np.asarray(
                ck.chunked_scores(mode, a[0], a[1], a[2], chunk,
                                  params=a[3])
            ).astype(np.float64)
            assert np.array_equal(got, want), (
                "chunked", mode, chunk, got[:4], want[:4])
        if mode == "local":
            # the production fast path (ctx.p penalties are decaying)
            got = np.asarray(
                ck.chunked_scores(mode, a[0], a[1], a[2], 2048,
                                  params=a[3], decaying_params=True)
            ).astype(np.float64)
            assert np.array_equal(got, want), ("chunked decay", got[:4])
        print(f"chunked {mode}: OK", flush=True)
    # fit + junction jump (m <= n holds: gen above keeps m <= 512 < 1000)
    sites_list = [
        sorted(int(x) for x in ctx.rng.integers(0, len(t), 4))
        for _, t in pairs
    ]
    allowb = np.ones((len(pairs), 4608), bool)
    for k, sites in enumerate(sites_list):
        allowb[k, sites] = False
    want = [
        spec.spec_fit(q, t, ctx.p, sites=sites).score
        for (q, t), sites in zip(pairs, sites_list)
    ]
    for chunk in (1024, 2048):
        got = np.asarray(
            ck.chunked_fit_scores(True, a[0], a[1], jnp.asarray(allowb),
                                  a[2], chunk, params=a[3])
        ).astype(np.float64)
        assert np.array_equal(got, want), (
            "chunked fit+jump", chunk, got[:4], want[:4])
    print("chunked fit+jump: OK", flush=True)
    # pointer fills + device walk: rows byte-identical to the XLA engine
    # (the same plumbing batch.py's chunked_full branch drives)
    from aligntools_tpu.batch import align_batch
    from aligntools_tpu.engine import device_tb

    qs2, ts2, _, ns2, ms2 = ctx.bucket(pairs, 512, 4608)
    ps2 = np.zeros((len(pairs), 6), np.float32)
    ps2[:, :5] = ctx.params[0, :5]
    ps2[:, 5] = ms2[:, 0]
    a2 = (jnp.asarray(qs2), jnp.asarray(ts2), jnp.asarray(ns2[:, 0]),
          jnp.asarray(ps2))
    for mode in ("global", "local", "overlap"):
        want_r = align_batch(mode, pairs, ctx.p, engine="xla")
        out = ck.chunked_ptr_fill(mode, a2[0], a2[1], a2[2], 1024,
                                  params=a2[3])
        score = np.asarray(out[0]).astype(np.float64)
        assert np.array_equal(score, [w.score for w in want_r]), mode
        if mode == "global":
            starts = [(int(np.asarray(out[1])[k]), int(ms2[k, 0]),
                       int(ns2[k, 0])) for k in range(len(pairs))]
        elif mode == "local":
            starts = [(1, int(np.asarray(out[1])[k]),
                       int(np.asarray(out[2])[k]))
                      for k in range(len(pairs))]
        else:
            starts = [(0, int(ms2[k, 0]), int(np.asarray(out[1])[k]))
                      for k in range(len(pairs))]
        rows = device_tb.batch_traceback(
            mode, out[-1], qs2, ts2, pairs, starts
        )
        for k in range(len(pairs)):
            assert rows[k] == (want_r[k].row1, want_r[k].row2), (mode, k)
        print(f"chunked-ptr {mode} rows: OK", flush=True)
    want_r = align_batch("fit", pairs, ctx.p,
                         sites_list=sites_list, engine="xla")
    out = ck.chunked_fit_ptr_fill(True, a2[0], a2[1], jnp.asarray(allowb),
                                  a2[2], 1024, params=a2[3])
    score = np.asarray(out[0]).astype(np.float64)
    assert np.array_equal(score, [w.score for w in want_r]), "fit"
    starts = [
        (1 if int(np.asarray(out[1])[k]) == 0 else 0, int(ms2[k, 0]),
         int(np.asarray(out[2])[k]))
        for k in range(len(pairs))
    ]
    rows = device_tb.batch_traceback("fit", out[-1], qs2, ts2, pairs,
                                     starts)
    for k in range(len(pairs)):
        assert rows[k] == (want_r[k].row1, want_r[k].row2), ("fit", k)
    print("chunked-ptr fit+jump rows: OK", flush=True)


def stage_chunkedpack(ctx):
    """Packed chunked pointer fills on hardware (round 4): rpb=2 nibble
    (global/local/fit no-jump) and rpb=4 2-bit (overlap) raw block
    layouts, walked directly by the device walker (blk_chunk>0,
    col_base=1) — the production path batch._bucket_rows drives whenever
    the HBM budget router picks the packed route. Rows must be
    byte-identical to the unpacked XLA-engine run."""
    import jax.numpy as jnp

    from aligntools_tpu.batch import align_batch
    from aligntools_tpu.engine import chunked as ck
    from aligntools_tpu.engine import device_tb

    pairs = ctx.gen(8, 100, 512, 1000, 4600)
    qs, ts, allow, ns, ms = ctx.bucket(pairs, 512, 4608)
    ps = np.zeros((len(pairs), 6), np.float32)
    ps[:, :5] = ctx.params[0, :5]
    ps[:, 5] = ms[:, 0]
    a = (jnp.asarray(qs), jnp.asarray(ts), jnp.asarray(ns[:, 0]),
         jnp.asarray(ps))
    chunk = 1024
    blk_chunk = ck.pick_chunk(4608, chunk)[1]
    for mode, rpb in (("global", 2), ("local", 2), ("overlap", 4)):
        want_r = align_batch(mode, pairs, ctx.p, engine="xla")
        out = ck.chunked_ptr_fill(mode, a[0], a[1], a[2], chunk, rpb,
                                  params=a[3])
        score = np.asarray(out[0]).astype(np.float64)
        assert np.array_equal(score, [w.score for w in want_r]), mode
        if mode == "global":
            starts = [(int(np.asarray(out[1])[k]), int(ms[k, 0]),
                       int(ns[k, 0])) for k in range(len(pairs))]
        elif mode == "local":
            starts = [(1, int(np.asarray(out[1])[k]),
                       int(np.asarray(out[2])[k]))
                      for k in range(len(pairs))]
        else:
            starts = [(0, int(ms[k, 0]), int(np.asarray(out[1])[k]))
                      for k in range(len(pairs))]
        rows = device_tb.batch_traceback(
            mode, out[-1], qs, ts, pairs, starts,
            col_base=1, pack4=rpb, blk_chunk=blk_chunk,
        )
        for k in range(len(pairs)):
            assert rows[k] == (want_r[k].row1, want_r[k].row2), (mode, k)
        print(f"chunked-packed rpb={rpb} {mode} rows: OK", flush=True)
    # fit without jump: nibble layout
    want_r = align_batch("fit", pairs, ctx.p, engine="xla")
    allowb = jnp.asarray(np.ones((len(pairs), 4608), bool))
    out = ck.chunked_fit_ptr_fill(False, a[0], a[1], allowb, a[2], chunk,
                                  2, params=a[3])
    score = np.asarray(out[0]).astype(np.float64)
    assert np.array_equal(score, [w.score for w in want_r]), "fit"
    starts = [
        (1 if int(np.asarray(out[1])[k]) == 0 else 0, int(ms[k, 0]),
         int(np.asarray(out[2])[k]))
        for k in range(len(pairs))
    ]
    rows = device_tb.batch_traceback("fit", out[-1], qs, ts, pairs,
                                     starts, col_base=1, pack4=2,
                                     blk_chunk=blk_chunk)
    for k in range(len(pairs)):
        assert rows[k] == (want_r[k].row1, want_r[k].row2), ("fit", k)
    print("chunked-packed rpb=2 fit rows: OK", flush=True)


STAGES = {
    "flat": stage_flat,
    "chunked": stage_chunked,
    "chunkedpack": stage_chunkedpack,
    "scanvar": stage_scanvar,
    "blocked": stage_blocked,
    "blockedptr": stage_blockedptr,
    "flatptr": stage_flatptr,
    "overlapptr": stage_overlapptr,
    "rescan1m": stage_rescan1m,
    "banded": stage_banded,
    "bandedptr": stage_bandedptr,
}


def main():
    if "--stage" in sys.argv:
        name = sys.argv[sys.argv.index("--stage") + 1]
        STAGES[name](Ctx())
        print(f"STAGE {name} PASSED", flush=True)
        return

    failed = []
    for name in STAGES:
        print(f"=== stage {name} ===", flush=True)
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--stage", name],
                timeout=STAGE_TIMEOUT,
            )
            ok = r.returncode == 0
        except subprocess.TimeoutExpired:
            print(f"stage {name} TIMED OUT ({STAGE_TIMEOUT}s) — tunnel "
                  "wedge?", flush=True)
            ok = False
        if not ok:
            failed.append(name)
    if failed:
        print(f"TPU CHECK FAILED: stages {failed}", flush=True)
        sys.exit(1)
    print("TPU CHECK PASSED", flush=True)


if __name__ == "__main__":
    main()
