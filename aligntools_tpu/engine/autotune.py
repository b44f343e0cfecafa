"""Measured engine-crossover calibration, cached per device kind.

engine/select.py routes each shape bucket between the XLA lax.scan
engine and the Pallas VMEM kernels. The regime boundary — XLA wins iff
``batch >= bmin`` and ``n_pad <= nmax`` (its fused-carry window; outside
it the carries spill to HBM and throughput collapses 10-40x) — was
round-1 hardcoded from v5e measurements. This module measures it ON THE
CURRENT DEVICE and caches the result as JSON next to the persistent
XLA compile cache, so routing on any other TPU generation comes from
measurement, not another chip's literals.

Protocol (``aligntools calibrate`` or :func:`calibrate`):
  * ``bmin``: at a moderate row width (n_pad 2048), time both engines at
    batch 32/64/128/256 and take the smallest batch where XLA wins.
  * ``nmax``: at the deepest batch that won above, time both engines at
    n_pad 2048/4096/8192 and take the largest width where XLA still
    wins.
  * ``banded_bmin``: the same batch sweep for the BANDED engines
    (engine/banded.py vs ops/pallas_banded.py, L=2048 W=64) — the banded
    XLA fill's fused-carry window is also batch-gated but need not break
    at the same point as the flat engine's.
  * ``flat_tile_cap``: the flat Pallas kernel's hard batch-tile ceiling —
    128 vs 256 timed at the 256x2048 sweet spot (v5e measures 50.6 vs
    48.7 GCUPS, so 128 stands there; another generation may prefer 256).
  * ``scan_pre``: the adaptive in-row scan's unconditional pass count
    (ops/pallas_scan) — 0/2/3/4/5 timed at the same sweet spot; 0
    disables the early exit on devices where the lax.cond overhead loses.
  * ``scan_twolevel``: whether the two-level scan tail (narrow
    cross-block carries instead of full-width passes past window 128)
    wins at a long-row shape; stays off if its strided extract does not
    compile on this toolchain.
Timing uses the same amortized on-device chaining as benchmarks/suite.py
(K fills with a serial data dependency; difference two K values) so the
30-90 ms per-call tunnel latency cancels. Total runtime is dominated by
the one losing-engine fill at the widest probe (~10-20 s worst case).

The cache never invalidates implicitly — recalibrate with ``--force``
after a libtpu/toolchain change. select.py falls back to the v5e
literals (bmin=128, nmax=4096) when no cache entry exists.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

from aligntools_tpu.backend import backend_name as _backend_name

CACHE_ENV = "ALIGNTOOLS_JAX_CACHE"
_DEFAULTS = {"bmin": 128, "nmax": 4096, "flat_tile_cap": 128}
_loaded: dict | None = None


def _cache_path() -> str:
    base = os.environ.get(
        CACHE_ENV, os.path.expanduser("~/.cache/aligntools-jax")
    )
    import jax

    kind = jax.devices()[0].device_kind
    slug = re.sub(r"[^A-Za-z0-9._-]+", "_", kind)
    return os.path.join(base, f"autotune_{slug}.json")


def table() -> dict:
    """The active crossover table: cached measurement if present for this
    device kind, else the v5e defaults."""
    global _loaded
    if _loaded is None:
        try:
            with open(_cache_path()) as f:
                _loaded = {**_DEFAULTS, **json.load(f)}
        except Exception:
            _loaded = dict(_DEFAULTS)
    return _loaded


def _amortized(run_k, k1=2, k2=10, reps=3):
    """Best-of-``reps`` amortized per-fill seconds. The per-call tunnel
    jitter here is +-30-90 ms; differencing two LONG chains (8 fills
    apart) divides the residual jitter by 8, and best-of on BOTH ends
    keeps the difference from going negative. Round-3 lesson: the old
    k2=3 (diff over 2 fills) ranked scan strategies by noise — it wrote
    scan_pre=4/scan_twolevel=true into the table while the repeatable
    probe_flat instrument showed plain tails winning every shape."""
    import numpy as np

    def timed(k):
        np.asarray(run_k(k))  # warm/compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run_k(k))
            best = min(best, time.perf_counter() - t0)
        return best

    return max((timed(k2) - timed(k1)) / (k2 - k1), 1e-9)


def _bench_pair(batch, n_pad):
    """Amortized seconds per fill for (xla, pallas) at batch x n_pad^2,
    local mode score-only (the routing proxy used since round 1)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aligntools_tpu.engine import scan as _scan
    from aligntools_tpu.engine.select import flat_tile_b
    from aligntools_tpu.ops import pallas_scan as pk

    rng = np.random.default_rng(7)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    qs = rng.choice(alpha, (batch, n_pad)).astype(np.int32)
    ts = jnp.asarray(rng.choice(alpha, (batch, n_pad)).astype(np.int32))
    ns = jnp.asarray(np.full(batch, n_pad, np.int32))
    ps = np.zeros((batch, 6), np.float32)
    ps[:, :4] = [1, -2, -5, -1]
    ps = jnp.asarray(ps)
    ns2 = jnp.asarray(np.full((batch, 1), n_pad, np.int32))
    pm = np.zeros((1, 8), np.float32)
    pm[0, :5] = [1, -2, -5, -1, -10]
    pm = jnp.asarray(pm)
    tile = flat_tile_b(batch, n_pad)

    def one_xla(q, te_arg):
        return jax.vmap(
            lambda qq, tt, nn, pp: _scan.local_fill(
                qq, tt, nn, pp, n_pad, False
            )[0]
        )(q, te_arg, ns, ps)

    def one_pl(q, te_arg):
        return pk.pallas_scores(
            "local", n_pad, n_pad, False, q, te_arg, ns2, ns2, pm,
            tile_b=tile,
        )

    qsj = jnp.asarray(qs)
    return (
        _chain_amortized(one_xla, qsj, ts),
        _chain_amortized(one_pl, qsj, ts),
    )


def _chain_amortized(one, qs, *extras):
    """Amortized per-call seconds for ``one(qs, *extras)->(B,) scores``
    chained on-device (scores fed back into qs to serialize iterations).
    Large operands MUST ride ``extras`` — closure-captured arrays embed
    as HLO constants and blow the axon tunnel's remote-compile request
    limit (HTTP 413)."""
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=(0,))
    def run_k(K, q, *ex):
        def body(_, carry):
            acc, qq = carry
            sc = one(qq, *ex).reshape(-1)[: qq.shape[0]]
            return acc + sc, qq + (sc * 0).astype(qq.dtype)[:, None]

        acc, _ = jax.lax.fori_loop(0, K, body, (jnp.zeros(q.shape[0]), q))
        return acc

    return _amortized(lambda K: run_k(K, qs, *extras))


def _bench_banded_pair(batch, L, W):
    """Amortized seconds per banded fill for (xla, pallas) at batch x L,
    band W, global mode."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aligntools_tpu.engine.banded import banded_fill, banded_tile_b
    from aligntools_tpu.ops.pallas_banded import (
        banded_pallas_scores,
        build_t_win,
    )

    rng = np.random.default_rng(7)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    V = 2 * W + 1
    qs = jnp.asarray(rng.choice(alpha, (batch, L)).astype(np.int32))
    te = np.full((batch, W + L + V + 1), -2, np.int32)
    te[:, W : W + L] = rng.choice(alpha, (batch, L))
    ps = np.zeros((batch, 8), np.float32)
    ps[:, :5] = [1, -2, -5, -1, -10]
    ps[:, 5] = L
    ps = jnp.asarray(ps)
    tej = jnp.asarray(te)
    ns = jnp.asarray(np.full(batch, L, np.int32))

    def one_xla(q, te_arg):
        return jax.vmap(
            lambda qq, tt, nn, pp: banded_fill("global", qq, tt, nn, W, pp)[0]
        )(q, te_arg, ns, ps)

    V_pad = -(-V // 128) * 128
    tile = banded_tile_b(batch, L, V_pad)
    t_win = build_t_win(tej, L, V_pad)
    ns2 = jnp.asarray(np.full((batch, 1), L, np.int32))
    pv = jnp.asarray(np.array([[1, -2, -5, -1, -10, 0, 0, 0]], np.float32))

    def one_pl(q, tw):
        return banded_pallas_scores(
            "global", W, L, False, tile, q, tw, ns2, ns2, pv
        )[0]

    return (
        _chain_amortized(one_xla, qs, tej),
        _chain_amortized(one_pl, qs, t_win),
    )


def _bench_chunked(batch, n_pad, chunk=None):
    """Amortized seconds per chunked-engine local fill (engine/chunked.py)
    at an optional forced chunk width."""
    import jax.numpy as jnp
    import numpy as np

    from aligntools_tpu.engine import chunked as ck

    chunk = chunk or ck.DEFAULT_CHUNK
    rng = np.random.default_rng(7)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    qs = jnp.asarray(rng.choice(alpha, (batch, n_pad)).astype(np.int32))
    ts = jnp.asarray(rng.choice(alpha, (batch, n_pad)).astype(np.int32))
    ns = jnp.asarray(np.full(batch, n_pad, np.int32))
    ps = np.zeros((batch, 6), np.float32)
    ps[:, :5] = [1, -2, -5, -1, -10]
    ps[:, 5] = n_pad
    ps = jnp.asarray(ps)

    def one(q, te_arg):
        return ck.chunked_scores("local", q, te_arg, ns, chunk, params=ps)

    return _chain_amortized(one, qs, ts)


def _bench_blocked(batch, m, n_pad, c_blk):
    """Amortized seconds per blocked streaming fill (fit+jump — the
    long-target workload the kernel exists for) at a forced c_blk."""
    import jax.numpy as jnp
    import numpy as np

    from aligntools_tpu.ops.pallas_blocked import blocked_scores

    rng = np.random.default_rng(7)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    qs = jnp.asarray(rng.choice(alpha, (batch, m)).astype(np.int32))
    ts = jnp.asarray(rng.choice(alpha, (batch, n_pad)).astype(np.int32))
    allow = np.ones((batch, n_pad), np.float32)
    allow[:, :: max(n_pad // 16, 1)] = 0.0
    allow = jnp.asarray(allow)
    ns = jnp.asarray(np.full((batch, 1), n_pad, np.int32))
    ms = jnp.asarray(np.full((batch, 1), m, np.int32))
    pm = np.zeros((1, 8), np.float32)
    pm[0, :5] = [1, -2, -5, -1, -10]
    pm = jnp.asarray(pm)

    def one(q, te_arg):
        return jnp.ravel(
            blocked_scores("fit", True, m, n_pad, c_blk, False,
                           q, te_arg, allow, ns, ms, pm)
        )

    return _chain_amortized(one, qs, ts)


def _bench_flat_tile(tile, batch=256, n_pad=2048):
    """Amortized seconds per flat-Pallas local fill at a forced tile."""
    import jax.numpy as jnp
    import numpy as np

    from aligntools_tpu.ops import pallas_scan as pk

    rng = np.random.default_rng(7)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    qs = jnp.asarray(rng.choice(alpha, (batch, n_pad)).astype(np.int32))
    ts = jnp.asarray(rng.choice(alpha, (batch, n_pad)).astype(np.int32))
    ns = jnp.asarray(np.full((batch, 1), n_pad, np.int32))
    pm = np.zeros((1, 8), np.float32)
    pm[0, :5] = [1, -2, -5, -1, -10]
    pm = jnp.asarray(pm)

    def one(q):
        return pk.pallas_scores(
            "local", n_pad, n_pad, False, q, ts, ns, ns, pm, tile_b=tile
        )

    return _chain_amortized(one, qs)


PROBE_TIMEOUT = 900


def _run_probe_spec(spec: str) -> dict:
    """In-process measurement for one probe spec (called in the probe
    SUBPROCESS). Grammar: pair:B:N | banded:B:L:W | flattile:T |
    flatlong:T:B:N."""
    f = spec.split(":")
    if f[0] == "pair":
        tx, tp = _bench_pair(int(f[1]), int(f[2]))
        return {"xla": tx, "pallas": tp}
    if f[0] == "banded":
        tx, tp = _bench_banded_pair(int(f[1]), int(f[2]), int(f[3]))
        return {"xla": tx, "pallas": tp}
    if f[0] == "flattile":
        return {"s": _bench_flat_tile(int(f[1]))}
    if f[0] == "chunked":
        return {"s": _bench_chunked(int(f[1]), int(f[2]))}
    if f[0] == "chunkedw":
        return {"s": _bench_chunked(int(f[1]), int(f[2]), chunk=int(f[3]))}
    if f[0] == "blockedc":
        return {"s": _bench_blocked(int(f[1]), int(f[2]), int(f[3]),
                                    int(f[4]))}
    if f[0] == "flatlong":
        return {"s": _bench_flat_tile(int(f[1]), batch=int(f[2]),
                                      n_pad=int(f[3]))}
    if f[0] == "splitmin":
        return {"s": _bench_splitmin(int(f[1]), int(f[2]))}
    raise ValueError(f"unknown probe spec {spec!r}")


def _bench_splitmin(P: int, thr: int) -> float:
    """Warm wall of the production batch_scores path at small P on the
    clustered read workload under one split-stop threshold (the
    small-workload latency-floor knob; batch._split_min_cells)."""
    import time as _t

    from aligntools_tpu.batch import _bucket_keys, batch_scores
    from aligntools_tpu.params import AlignParams
    from aligntools_tpu.utils.synth import clustered_pairs

    pairs = clustered_pairs(P)
    keys = _bucket_keys(pairs, 64, 128, min_split_cells=thr)
    p = AlignParams()
    batch_scores("local", pairs, p, keys=keys)  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = _t.perf_counter()
        batch_scores("local", pairs, p, keys=keys)
        best = min(best, _t.perf_counter() - t0)
    return best


def _probe(spec: str, env_extra: dict | None = None, log=print):
    """One probe in a FRESH subprocess. The axon tunnel wedges long-lived
    multi-compile processes (observed round 2: calibrate and multi-config
    probe runs hang after ~10 compiles), so each configuration gets its
    own process and its own timeout; a wedged probe costs PROBE_TIMEOUT
    seconds, not the whole calibration. Scan-strategy overrides ride the
    existing env knobs (ALIGNTOOLS_ADAPTIVE_SCAN / _TWOLEVEL_SCAN), which
    the kernels read at trace time in the child — no cache-clearing
    dance. Returns the probe's dict, or None on failure."""
    import subprocess

    env = dict(os.environ)
    env.update(env_extra or {})
    try:
        r = subprocess.run(
            [sys.executable, "-m", "aligntools_tpu.engine.autotune",
             "--probe", spec],
            capture_output=True, text=True, timeout=PROBE_TIMEOUT, env=env,
        )
    except subprocess.TimeoutExpired:
        log(f"  probe {spec} TIMED OUT ({PROBE_TIMEOUT}s) — tunnel wedge?")
        return None
    for ln in r.stdout.splitlines():
        if ln.startswith("RESULT "):
            return json.loads(ln[7:])
    log(f"  probe {spec} failed rc={r.returncode}: "
        f"{(r.stderr or r.stdout)[-200:].strip()}")
    return None


def calibrate(force: bool = False, log=print) -> dict:
    """Measure the crossover table on the current device and cache it.
    Returns the table. No-op (returns the cached table) unless ``force``
    or no cache entry exists."""
    global _loaded
    import jax

    path = _cache_path()
    if not force and os.path.exists(path):
        _loaded = None
        return table()
    if _backend_name() != "tpu":
        raise RuntimeError(
            "calibrate must run on the TPU backend (routing on CPU is "
            "interpret-only and never uses these thresholds)"
        )
    result = {
        "device_kind": jax.devices()[0].device_kind,
        "measured": {},
    }
    # 1. batch threshold at n_pad 2048
    bmin = None
    for batch in (32, 64, 128, 256):
        d = _probe(f"pair:{batch}:2048", log=log)
        if d is None:
            continue  # failed probe: this batch contributes no evidence
        tx, tp = d["xla"], d["pallas"]
        result["measured"][f"b{batch}_n2048"] = {"xla": tx, "pallas": tp}
        log(f"  batch {batch:4d} x 2048^2: xla {tx*1e3:8.2f} ms  "
            f"pallas {tp*1e3:8.2f} ms")
        if tx < tp and bmin is None:
            bmin = batch
    bmin = bmin if bmin is not None else 1 << 30  # XLA never wins
    # 2. n ceiling at the deepest probed batch
    nmax = 0
    if bmin < 1 << 30:
        for n_pad in (2048, 4096, 8192):
            d = _probe(f"pair:256:{n_pad}", log=log)
            if d is None:
                continue
            tx, tp = d["xla"], d["pallas"]
            result["measured"][f"b256_n{n_pad}"] = {"xla": tx, "pallas": tp}
            log(f"  batch  256 x {n_pad}^2: xla {tx*1e3:8.2f} ms  "
                f"pallas {tp*1e3:8.2f} ms")
            if tx < tp:
                nmax = n_pad
    result["bmin"] = int(bmin)
    result["nmax"] = int(nmax)
    # Stages 3/4 are individually fenced: a probe that cannot run on
    # this device (e.g. a tile width over a VMEM limit) must not discard
    # the minutes of measurements above — failed fields keep defaults.
    # 3. banded crossover: smallest batch where the XLA fill wins
    banded_bmin = None
    banded_any = False
    for batch in (32, 64, 128, 256):
        d = _probe(f"banded:{batch}:2048:64", log=log)
        if d is None:
            continue
        banded_any = True
        tx, tp = d["xla"], d["pallas"]
        result["measured"][f"banded_b{batch}"] = {"xla": tx, "pallas": tp}
        log(f"  banded b{batch:4d} x 2048 W=64: xla {tx*1e3:8.2f} ms  "
            f"pallas {tp*1e3:8.2f} ms")
        if tx < tp and banded_bmin is None:
            banded_bmin = batch
    if banded_any:
        result["banded_bmin"] = int(
            banded_bmin if banded_bmin is not None else 1 << 30
        )
    else:
        log("  banded calibration failed entirely; keeping bmin fallback")
    # 4. flat kernel batch-tile ceiling (128 vs 256 at the sweet spot)
    d128 = _probe("flattile:128", log=log)
    d256 = _probe("flattile:256", log=log)
    if d128 and d256:
        t128, t256 = d128["s"], d256["s"]
        result["measured"]["flat_tile"] = {"t128": t128, "t256": t256}
        log(f"  flat tile 128: {t128*1e3:8.2f} ms   256: {t256*1e3:8.2f} ms")
        result["flat_tile_cap"] = 256 if t256 < t128 else 128
    else:
        log("  flat-tile calibration failed; keeping cap 128")
    # 5. adaptive-scan pre-pass count (0 = early exit disabled). Each
    #    probe child pins the strategy via ALIGNTOOLS_ADAPTIVE_SCAN (read
    #    at trace time); twolevel pinned off to isolate the variable.
    timings = {}
    for pre in (0, 2, 3, 4, 5):
        d = _probe("flattile:128", log=log, env_extra={
            "ALIGNTOOLS_ADAPTIVE_SCAN": str(pre) if pre else "0",
            "ALIGNTOOLS_TWOLEVEL_SCAN": "0",
        })
        if d is None:
            continue
        timings[pre] = d["s"]
        log(f"  scan_pre {pre}: {timings[pre]*1e3:8.2f} ms")
    if timings:
        result["measured"]["scan_pre"] = {
            str(k): v for k, v in timings.items()
        }
        result["scan_pre"] = min(timings, key=timings.get)
    else:
        log("  scan-pre calibration failed; keeping default")
    # 6. two-level scan tail on/off at a long-row shape (the J scans and
    #    the adaptive checks' failure path pay the full tail there). A
    #    Mosaic compile failure of the strided block-extract fails that
    #    probe child only: the flag simply stays off.
    pre_env = str(result.get("scan_pre") or 0) or "0"
    tl_ms = {}
    for tl in (False, True):
        d = _probe("flatlong:32:32:8192", log=log, env_extra={
            "ALIGNTOOLS_ADAPTIVE_SCAN": pre_env if pre_env != "0" else "0",
            "ALIGNTOOLS_TWOLEVEL_SCAN": "1" if tl else "0",
        })
        if d is None:
            continue
        tl_ms[tl] = d["s"]
        log(f"  twolevel={tl}: {tl_ms[tl]*1e3:8.2f} ms (32x8192)")
    if len(tl_ms) == 2:
        result["measured"]["scan_twolevel"] = {
            str(k): v for k, v in tl_ms.items()
        }
        result["scan_twolevel"] = bool(tl_ms[True] < tl_ms[False])
    else:
        log("  twolevel calibration incomplete; flag stays off")
    # 7. chunked-engine batch cliff: smallest batch where the chunked
    #    engine beats the Pallas kernel (its collapse point is an XLA
    #    layout pathology that need not track the vmap engine's bmin on
    #    other device generations). Reuses step 1's pallas timings.
    chunked_bmin = None
    for batch in (32, 64, 128, 256):
        pl = result["measured"].get(f"b{batch}_n2048", {}).get("pallas")
        if pl is None:
            continue
        d = _probe(f"chunked:{batch}:2048", log=log)
        if d is None:
            continue
        result["measured"][f"chunked_b{batch}"] = d["s"]
        log(f"  chunked b{batch:4d} x 2048^2: {d['s']*1e3:8.2f} ms "
            f"(pallas {pl*1e3:8.2f} ms)")
        if d["s"] < pl and chunked_bmin is None:
            chunked_bmin = batch
    if chunked_bmin is not None:
        result["chunked_bmin"] = int(chunked_bmin)
    else:
        log("  chunked calibration failed or never wins; bmin fallback")
    # 8. chunked-engine chunk width, judged across TWO regimes (the
    #    width trades fused-carry register pressure against per-chunk
    #    edge reseed cost, and the optimum moves with shape: the round-4
    #    grid probe benchmarks/probe_chunkgrid.py found 1024 > 2048 at
    #    every shape incl. the headline 256x2048^2 — 91.1 vs 82.2 GCUPS
    #    — while at 128x8192^2 alone they tie within noise, so a single
    #    long-target probe would mis-pick). The winner minimizes the sum
    #    of per-shape time ratios (each shape weighted equally).
    cw_shapes = ((128, 8192), (256, 2048))
    cw_ms = {cw: {} for cw in (512, 1024, 2048)}
    for cw in cw_ms:
        for b_, n_ in cw_shapes:
            d = _probe(f"chunkedw:{b_}:{n_}:{cw}", log=log)
            if d is None:
                continue
            cw_ms[cw][(b_, n_)] = d["s"]
            log(f"  chunk width {cw:5d} @{b_}x{n_}^2: "
                f"{d['s']*1e3:8.2f} ms")
    complete = {
        cw: m for cw, m in cw_ms.items() if len(m) == len(cw_shapes)
    }
    if complete:
        best_per_shape = {
            sh: min(m[sh] for m in complete.values()) for sh in cw_shapes
        }
        score = {
            cw: sum(m[sh] / best_per_shape[sh] for sh in cw_shapes)
            for cw, m in complete.items()
        }
        result["measured"]["chunked_chunk"] = {
            str(cw): {f"{b_}x{n_}": v for (b_, n_), v in m.items()}
            for cw, m in cw_ms.items() if m
        }
        result["chunked_chunk"] = int(min(score, key=score.get))
    else:
        log("  chunk-width calibration failed; keeping default 1024")
    # 9. blocked streaming column-block width (fit+jump small-batch long
    #    target — the kernel's home regime). NOTE: bucket n snapping
    #    (batch._align_n) follows this value, so only powers of two that
    #    divide common long-target pads are probed.
    cb_ms = {}
    for cb in (8192, 16384, 32768):
        d = _probe(f"blockedc:8:2048:65536:{cb}", log=log)
        if d is None:
            continue
        cb_ms[cb] = d["s"]
        log(f"  blocked c_blk {cb:5d} @8x(2048x65536): {d['s']*1e3:8.2f} ms")
    if cb_ms:
        result["measured"]["blocked_c_blk"] = {
            str(k): v for k, v in cb_ms.items()
        }
        result["blocked_c_blk"] = int(min(cb_ms, key=cb_ms.get))
    else:
        log("  blocked c_blk calibration failed; keeping default 8192")
    #    small-workload split stop (batch._split_min_cells): warm
    #    batch_scores wall at P=512 over a threshold grid
    sm_ms = {}
    for thr in (0, 50_000_000, 100_000_000, 200_000_000):
        d = _probe(f"splitmin:512:{thr}", log=log)
        if d is None:
            continue
        sm_ms[thr] = d["s"]
        log(f"  split_min_cells {thr:>11d} @P=512: {d['s']*1e3:8.2f} ms")
    if sm_ms:
        result["measured"]["split_min_cells"] = {
            str(k): v for k, v in sm_ms.items()
        }
        result["split_min_cells"] = int(min(sm_ms, key=sm_ms.get))
    else:
        log("  split_min_cells calibration failed; keeping default 0")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(result, f, indent=1)
    os.replace(tmp, path)
    _loaded = None
    log(f"calibrated {result['device_kind']}: XLA engine wins iff "
        f"batch >= {result['bmin']} and n_pad <= {result['nmax']} -> {path}")
    return table()


if __name__ == "__main__":
    # probe-child entry: `python -m aligntools_tpu.engine.autotune --probe
    # SPEC` measures ONE configuration and prints `RESULT {json}`.
    if len(sys.argv) == 3 and sys.argv[1] == "--probe":
        print("RESULT " + json.dumps(_run_probe_spec(sys.argv[2])),
              flush=True)
    else:
        sys.exit("usage: python -m aligntools_tpu.engine.autotune "
                 "--probe SPEC")
