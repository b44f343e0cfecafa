"""Pallas TPU kernels: row-scan DP fills with VMEM-resident carries.

The lax.scan engine (engine/scan.py) is HBM-bandwidth-bound: every row
step round-trips its (B, n) carry rows through HBM. These kernels run the
whole fill inside one Pallas program per batch tile — sequences and all
carry rows live in VMEM, so HBM traffic is just the input sequences and
per-pair scalar results. Score-only (the pointer-emitting path stays on
the scan engine until the DMA-staged pointer kernel lands).

Layout: each grid program owns ``tile_b`` pairs (8-64 sublanes; routing
picks the widest tile VMEM allows — engine/select.py flat_tile_b — since
the kernel is per-instruction-overhead-bound at narrow tiles); rows are
(tile_b, n_pad) f32 vectors (lanes = target columns 1..n_pad, the
column-0 border is carried as a (tile_b, 1) scalar column and shifted
in). The in-row gap recurrences use the same exact max-plus normalization
as the scan engine (engine/scan.py docstring), with the running max done
as an ADAPTIVE Hillis-Steele doubling scan over lanes — a few
unconditional shift+max passes, then a convergence check that skips the
remaining log2(n_pad) passes once the fixpoint is provably reached (see
_adaptive_scan; the common case on real data); ROW_UNROLL consecutive
rows share one MXU char-extraction dot per
fori_loop iteration.

Semantics are identical to engine/scan.py (itself parity-tested against
the reference binary): f32 holds exact integers, -inf borders, and scores
match bit-for-bit. Reference recurrences: src/alignment.h:417-473 (global),
805-847 (local), 596-694 (fit), 926-964 (overlap), 291-315 (edit).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from aligntools_tpu.backend import on_tpu as _on_tpu
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = float("-inf")
TILE_B = 8


def _shift_in(x, col):
    """[col, x[:, :-1]] — lane shift right by one, border column shifted in."""
    return jnp.concatenate([col, x[:, :-1]], axis=1)


def _scan_pass(v, k, op, sent):
    """One Hillis-Steele pass: combine with self shifted right by k lanes.

    The pad+slice concatenate IS the fast shift on this toolchain: the
    round-3 decompose probe measured each pass at ~3.4 op-equivalents
    (max=1, shift the rest), and the obvious alternative — one cyclic
    pltpu.roll plus a compile-time-constant edge mask — measured ~7%
    SLOWER end-to-end on v5e across local/global/edit at 256x2048 and
    32x8192 (hardware A/B, round 3). Keep the concatenate."""
    pad = jnp.full((v.shape[0], k), sent, v.dtype)
    return op(v, jnp.concatenate([pad, v[:, :-k]], axis=1))


def _danger_scan_cap() -> int | None:
    """ALIGNTOOLS_DANGER_SCAN_CAP=N truncates every in-row scan tail to
    at most N doubling passes. SCORES BECOME WRONG — this exists solely
    so benchmarks/decompose_flat.py can measure what fraction of the
    kernel's time the Hillis-Steele passes cost (VERDICT r2 #3 roofline
    decomposition). Never set it outside that probe."""
    env = os.environ.get("ALIGNTOOLS_DANGER_SCAN_CAP")
    return int(env) if env else None


def _scan_tail(v, k, w, op, sent):
    """Finish a prefix scan whose lanes currently hold exact windows of
    size ``k``: doubling passes k, 2k, ... up to width w — or, when
    enabled, the two-level form that replaces the O(log2 w) full-width
    passes past window 128 with a NARROW cross-block scan."""
    if _twolevel() and w % _BLK == 0 and k <= _BLK and w > _BLK:
        return _scan_tail_twolevel(v, k, w, op, sent)
    cap = _danger_scan_cap()
    done = 0
    while k < w and (cap is None or done < cap):
        v = _scan_pass(v, k, op, sent)
        k *= 2
        done += 1
    return v


# Two-level tail: full-width doubling passes stop at window _BLK; the
# remaining cross-block resolution runs at width w/_BLK. Gated off on TPU
# until `aligntools calibrate` measures it (scan_twolevel) or
# ALIGNTOOLS_TWOLEVEL_SCAN=1 forces it; always on elsewhere (interpret
# tests cover both compositions).
_BLK = 128
_TWOLEVEL_OVERRIDE: bool | None = None


def _twolevel() -> bool:
    if _TWOLEVEL_OVERRIDE is not None:
        return _TWOLEVEL_OVERRIDE
    env = os.environ.get("ALIGNTOOLS_TWOLEVEL_SCAN")
    if env is not None:
        return env == "1"
    try:
        if _on_tpu():
            from aligntools_tpu.engine.autotune import table

            return bool(table().get("scan_twolevel", False))
    except Exception:
        pass
    return not _on_tpu()


def _scan_tail_twolevel(v, k, w, op, sent):
    """Prefix-scan tail via per-block carries, exact for IDEMPOTENT ops
    (max/min — which these scans are).

    Doubling passes widen the window to exactly _BLK; the lane at each
    block's last position then holds precisely that block's reduction, so
    a scan over those w/_BLK values (narrow: ~w/128 lanes instead of w)
    plus an exclusive shift gives every block the reduction of all
    preceding blocks. The final combine op(v, broadcast) is exact even
    though the window-_BLK values overlap block boundaries — idempotent
    ops tolerate double-counted coverage; the union of [block start of j
    .. j]'s window and all-preceding-blocks covers [0..j] exactly.
    Full-width work: log2(_BLK) passes + broadcast + combine, independent
    of w — vs log2(w) passes for the flat tail."""
    tb = v.shape[0]
    while k < _BLK:
        v = _scan_pass(v, k, op, sent)
        k *= 2
    nb = w // _BLK
    # per-block reductions: the window-_BLK value at each block-final
    # lane. NOT a strided slice (Mosaic confines vector slice strides to
    # 1): reshape to expose blocks, take the unit-stride block-final
    # column, drop the axis.
    e = v.reshape(tb, nb, _BLK)[:, :, _BLK - 1]  # (tb, nb)
    kk = 1
    while kk < nb:
        e = _scan_pass(e, kk, op, sent)
        kk *= 2
    p = jnp.concatenate(
        [jnp.full((tb, 1), sent, v.dtype), e[:, :-1]], axis=1
    )
    b = jnp.broadcast_to(p[:, :, None], (tb, nb, _BLK)).reshape(tb, w)
    return op(v, b)


# Unconditional doubling passes before the first convergence check
# (window 2^pre). Resolution order (read at TRACE time): _PRE_OVERRIDE
# (calibrate/test hook; pair writes with pallas_scores.clear_cache()),
# then ALIGNTOOLS_ADAPTIVE_SCAN (0 disables the early exit entirely, an
# integer >= 2 forces that many pre passes), then the per-device-kind
# autotune table ("scan_pre", measured by `aligntools calibrate`), then
# the default below.
# Default 4 OFF-TPU (interpret tests exercise the adaptive composition).
# ON TPU the adaptive scan runs ONLY with a measured calibrate entry —
# same gate as the two-level tail: an unmeasured data-dependent default
# on the production fill path risks a silent regression if the lax.cond
# convergence check costs more than the passes it skips (VERDICT r2 #2).
# The pre-pass rationale: the convergence check spans the whole
# (tile_b, n) tile, and a stage-1 failure needs a score drop >
# 2^pre * |slope| inside the check window somewhere in the tile. For DNA
# defaults (match 1, e -1) at 128x2048 lanes, window 16 (pre=3) trips on
# roughly half the rows while window 32 (pre=4) almost never does.
_PRE_DEFAULT = 4
_PRE_OVERRIDE: int | None = None


def _scan_pre() -> int:
    if _PRE_OVERRIDE is not None:
        return _PRE_OVERRIDE
    env = os.environ.get("ALIGNTOOLS_ADAPTIVE_SCAN", "1")
    if env not in ("", "1"):
        return max(0, int(env))
    try:
        if _on_tpu():
            from aligntools_tpu.engine.autotune import table

            return int(table().get("scan_pre", 0))  # off until measured
    except Exception:
        pass
    return _PRE_DEFAULT if not _on_tpu() else 0


def _adaptive_scan(v, op, sent, pre):
    """Prefix scan along lanes with a data-dependent early exit.

    The plain Hillis-Steele scan always pays log2(w) full-width passes.
    In the DP rows these scans resolve gap chains, and the normalized
    candidates carry a negative slope (-e*j etc.), so on real inputs the
    running max/min is almost always achieved within a few lanes. This
    runs _ADAPTIVE_PRE doubling passes unconditionally, then one more
    pass at the current window k: if that pass changes NO lane, then
    v[j] = op over the trailing 2k-window AND v[j] "absorbs" v[j-k]
    (max(v[j], v[j-k]) == v[j]); induction along the chain j, j-k,
    j-2k, ... gives that v already equals the full prefix scan, and the
    remaining passes are skipped (lax.cond). The early exit fires only
    at the fixpoint, so exactness never depends on the data; the worst
    case costs one extra reduction over the plain scan.
    """
    tb, w = v.shape
    k, done = 1, 0
    while k < w and done < pre:
        v = _scan_pass(v, k, op, sent)
        k *= 2
        done += 1
    if k >= w:
        return v
    nxt = _scan_pass(v, k, op, sent)
    changed = jnp.any(nxt != v)
    k2 = 2 * k

    def stage2(u):
        # The check spans every lane of the whole batch tile (up to
        # 128 x n), so a single deep-propagation lane anywhere fails it.
        # Rather than falling straight to the full tail, run two more
        # doublings and check once more — rows whose propagation fits
        # the widened window still skip the expensive remainder.
        kk = k2
        for _ in range(2):
            if kk < w:
                u = _scan_pass(u, kk, op, sent)
                kk *= 2
        if kk >= w:
            return u
        nxt2 = _scan_pass(u, kk, op, sent)
        ch2 = jnp.any(nxt2 != u)
        kk2 = 2 * kk
        return jax.lax.cond(
            ch2,
            lambda y: _scan_tail(y, kk2, w, op, sent),
            lambda y: y,
            nxt2,
        )

    return jax.lax.cond(changed, stage2, lambda u: u, nxt)


def _cummax_lanes(v):
    """Inclusive running max along lanes (adaptive Hillis-Steele)."""
    pre = _scan_pre()
    if pre > 0:
        return _adaptive_scan(v, jnp.maximum, NEG, pre)
    return _scan_tail(v, 1, v.shape[1], jnp.maximum, NEG)


def _cummax_lanes_flat(v):
    """Unconditional full scan — for recurrences with NO decay slope
    (fit's jump carry is free horizontal extension), where the prefix max
    routinely reaches far back and the adaptive check would fail almost
    every row, paying its reductions for nothing."""
    return _scan_tail(v, 1, v.shape[1], jnp.maximum, NEG)


def _cummin_lanes(v):
    """Inclusive running min along lanes (adaptive Hillis-Steele)."""
    pre = _scan_pre()
    if pre > 0:
        return _adaptive_scan(v, jnp.minimum, float("inf"), pre)
    return _scan_tail(v, 1, v.shape[1], jnp.minimum, float("inf"))


def _u_row(m_row, m_border, u0, o, e, jcol, oj=None, ej=None):
    """U[j] = max(M[j-1]+o, U[j-1]+e), U[0] = u0 (a scalar — the border is
    the same for every pair in the tile).

    Exact normalized form (engine/scan.py _u_scan): V[j] = U[j] - e*j is the
    running max of [u0, M[j-1]+o-e*j]; here over lanes j=1..n_pad with the
    column-0 M border shifted in. u0 folds in as a scalar max (Mosaic
    handles scalar broadcasts; (8,1)->(8,n) vector relayouts it does not).
    ``oj``/``ej`` are the caller-hoisted o-e*j / e*j row constants.
    """
    if oj is None:
        oj, ej = o - e * jcol, e * jcol
    cand = _shift_in(m_row, m_border) + oj
    v = jnp.maximum(_cummax_lanes(cand), u0)
    return v + ej



def _row_char(qf, iota_col, idx, n_pad):
    """Extract column ``idx`` of the (tb, m_pad) f32 query tile, replicated
    across n_pad lanes. Mosaic cannot dynamically index the lane dimension,
    so contract with a one-hot (m_pad, 1) column (a tiny MXU op) and lane-
    broadcast the result. ``iota_col`` is the hoisted (m_pad, 1) iota."""
    onehot = (iota_col == idx).astype(jnp.float32)
    # HIGHEST precision: the default f32 MXU path rounds through bf16
    # (exact only to 256); byte values are < 256 but don't rely on it
    qc = jnp.dot(qf, onehot, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    return jnp.broadcast_to(qc, (qf.shape[0], n_pad))


def _row_chars(qf, iota_col, blk, R, n_pad):
    """Columns ``blk*R .. blk*R+R-1`` of the query tile in ONE MXU dot:
    (tb, m_pad) x (m_pad, R) one-hot -> (tb, R); per-subrow lanes are then
    static slices (free at trace time). Amortizes the dot + its latency
    over R DP rows."""
    rvec = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
    onehot = (iota_col == blk * R + rvec).astype(jnp.float32)
    qcs = jnp.dot(qf, onehot, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    return [
        jnp.broadcast_to(qcs[:, r : r + 1], (qf.shape[0], n_pad))
        for r in range(R)
    ]


# rows per fori_loop iteration: amortizes the one-hot MXU dot and the loop
# bookkeeping; m_pad is always a multiple (buckets are >= 64 and pow2-ish).
ROW_UNROLL = 4

# Lane budget for the unrolled body: _grid_call raises the Mosaic
# scoped-VMEM limit to the kernel footprint (~48 rows, 100 MiB ceiling),
# under which R=4 compiles and wins at every measured tile up to 32x32768
# = 1Mi lanes (fit 27.8 GCUPS). The cap guards the ceiling itself.
UNROLL_LANE_CAP = 1 << 22


def _pick_unroll(tile_b, m_pad, n_pad):
    if m_pad % ROW_UNROLL != 0 or tile_b * n_pad > UNROLL_LANE_CAP:
        return 1
    return ROW_UNROLL


def _affine_kernel(mode, m_pad, n_pad, q_ref, t_ref, n_ref, m_ref, p_ref,
                   out_ref):
    """global/local score kernel. Shapes: q (tb, m_pad) i32, t (tb, n_pad)
    i32, n/m (tb, 1) i32, params (1, 8) f32 SMEM, out (tb, 1) f32.

    Per-row cost trims vs the v1 kernel (measured 11.5 -> see RESULTS.md):
    one combined-max shift for the diagonal instead of three per-state
    shifts (score-only: max of shifts == shift of max, borders folded),
    hoisted o/e*j row constants, a full-row score accumulator so the
    cross-lane reduction happens once after the loop, and ROW_UNROLL rows
    per iteration sharing one MXU char-extraction dot."""
    match, mis = p_ref[0, 0], p_ref[0, 1]
    o, e = p_ref[0, 2], p_ref[0, 3]
    t = t_ref[:, :].astype(jnp.float32)
    qf = q_ref[:, :].astype(jnp.float32)
    iota_col = jax.lax.broadcasted_iota(jnp.int32, (m_pad, 1), 0)
    n_col = n_ref[:, :]  # (tb,1) true target lengths
    m_col = m_ref[:, :]
    jcol = (
        jax.lax.broadcasted_iota(jnp.int32, (q_ref.shape[0], n_pad), 1) + 1
    )
    jcol_f = jcol.astype(jnp.float32)
    mask_le_n = jcol <= n_col
    mask_eq_n = jcol == n_col
    ej = e * jcol_f            # hoisted row constants
    oj = o - ej
    # zero templates derived from loaded data: keeps fori_loop carry inits
    # in natural vector layout (splat constants are lane-replicated, which
    # Mosaic cannot unify with the loop body's outputs)
    zrow = t * 0.0
    zcol = jnp.max(zrow, axis=1, keepdims=True)

    if mode == "global":
        # row 0 (cols 1..n): M=L=-inf, U = o + e*j (alignment.h:437-441)
        m_init = zrow + NEG
        l_init = zrow + NEG
        best_init = zrow + o + ej  # max(L,M,U) of row 0 = U row 0
    else:  # local: calloc-zero borders (alignment.h:805-847)
        m_init = zrow
        l_init = zrow
        best_init = zrow
    accrow0 = zrow + NEG

    def one_row(idx, qc, mp, lp, best, accrow):
        i = idx + 1
        sub = jnp.where(t == qc, match, mis)
        if mode == "global":
            # borders at col 0 of the PREVIOUS row i-1 (alignment.h:428-441):
            # M=-inf (0 at i-1==0), L=o+e*(i-1), U=-inf (o at i-1==0);
            # their max folds to one scalar per row.
            i_f = jnp.float32(i)
            bb = zcol + jnp.where(idx == 0, 0.0, o + e * (i_f - 1.0))
            m_row = _shift_in(best, bb) + sub
            l_row = jnp.maximum(lp + e, mp + o)
            # U seed is -inf (no-op under max): plain scan, no seed fold
            u_row = _cummax_lanes(_shift_in(m_row, zcol + NEG) + oj) + ej
            best = jnp.maximum(jnp.maximum(l_row, m_row), u_row)
            # latch row m's max(L,M,U); the (m,n) lane is picked after the
            # loop (alignment.h:466-469)
            accrow = jnp.where(i == m_col, best, accrow)
        else:  # local
            m_row = jnp.maximum(_shift_in(best, zcol) + sub, 0.0)
            l_row = jnp.maximum(lp + e, mp + o)
            u_row = _u_row(m_row, zcol, 0.0, o, e, jcol_f, oj, ej)
            best = jnp.maximum(jnp.maximum(l_row, m_row), u_row)
            # running max of M over true rows (i <= m); j-mask after loop
            accrow = jnp.maximum(
                accrow, jnp.where(i <= m_col, m_row, NEG)
            )
        return m_row, l_row, best, accrow

    R = _pick_unroll(q_ref.shape[0], m_pad, n_pad)

    def block(blk, carry):
        mp, lp, best, accrow = carry
        qcs = _row_chars(qf, iota_col, blk, R, n_pad)
        for r in range(R):
            mp, lp, best, accrow = one_row(
                blk * R + r, qcs[r], mp, lp, best, accrow
            )
        return mp, lp, best, accrow

    _, _, _, accrow = jax.lax.fori_loop(
        0, m_pad // R, block,
        (m_init, l_init, best_init, accrow0),
    )
    if mode == "global":
        fin = jnp.where(mask_eq_n, accrow, NEG)
    else:
        fin = jnp.where(mask_le_n, accrow, NEG)
    out_ref[:, :] = jnp.max(fin, axis=1, keepdims=True)


def _overlap_kernel(m_pad, n_pad, q_ref, t_ref, n_ref, m_ref, p_ref, out_ref):
    """Single-matrix, linear gap o (alignment.h:926-964). Borders: row0=-inf
    (cols>=1), col0=0. Final: max over row m, j in [0, n-1] (j=0's border 0
    included, last column excluded)."""
    match, mis, o = p_ref[0, 0], p_ref[0, 1], p_ref[0, 2]
    t = t_ref[:, :].astype(jnp.float32)
    qf = q_ref[:, :].astype(jnp.float32)
    iota_col = jax.lax.broadcasted_iota(jnp.int32, (m_pad, 1), 0)
    n_col = n_ref[:, :]
    m_col = m_ref[:, :]
    jcol = jax.lax.broadcasted_iota(jnp.int32, (q_ref.shape[0], n_pad), 1) + 1
    jcol_f = jcol.astype(jnp.float32)
    mask_lt_n = jcol <= n_col - 1
    zrow = t * 0.0
    zcol = jnp.max(zrow, axis=1, keepdims=True)
    m_init = zrow + NEG
    accrow0 = zrow + NEG
    zero_col = zcol
    ojc = o * jcol_f  # hoisted slope constant

    def one_row(idx, qc, mp, accrow):
        i = idx + 1
        sub = jnp.where(t == qc, match, mis)
        # diag pred at col0 of prev row: M(i-1,0)=0 (col0 border)
        dr = jnp.maximum(_shift_in(mp, zero_col) + sub, mp + o)
        # M[i,0]=0; M[i,j]=max(M[i,j-1]+o, dr[j]) -> slope-o scan, seed 0
        cand = dr - ojc
        v = jnp.maximum(_cummax_lanes(cand), 0.0)  # seed = M[i,0]-o*0 = 0
        m_row = v + ojc
        # latch row m; masked lane-reduce happens once after the loop
        accrow = jnp.where(i == m_col, m_row, accrow)
        return m_row, accrow

    R = _pick_unroll(q_ref.shape[0], m_pad, n_pad)

    def block(blk, carry):
        mp, accrow = carry
        qcs = _row_chars(qf, iota_col, blk, R, n_pad)
        for r in range(R):
            mp, accrow = one_row(blk * R + r, qcs[r], mp, accrow)
        return mp, accrow

    _, accrow = jax.lax.fori_loop(0, m_pad // R, block, (m_init, accrow0))
    # score = max(0, max over j in [1, n-1]); the 0 is the j=0 border
    fin = jnp.max(jnp.where(mask_lt_n, accrow, NEG), axis=1, keepdims=True)
    out_ref[:, :] = jnp.maximum(fin, 0.0)


def _edit_kernel(m_pad, n_pad, q_ref, t_ref, n_ref, m_ref, p_ref, out_ref):
    """Min-plus DP (alignment.h:291-315): indel hardcoded 1, sub=0/u."""
    u = p_ref[0, 1]
    t = t_ref[:, :].astype(jnp.float32)
    qf = q_ref[:, :].astype(jnp.float32)
    iota_col = jax.lax.broadcasted_iota(jnp.int32, (m_pad, 1), 0)
    n_col = n_ref[:, :]
    m_col = m_ref[:, :]
    jcol = jax.lax.broadcasted_iota(jnp.int32, (q_ref.shape[0], n_pad), 1) + 1
    jcol_f = jcol.astype(jnp.float32)
    mask_eq_n = jcol == n_col
    zrow = t * 0.0
    zcol = jnp.max(zrow, axis=1, keepdims=True)
    row0 = zrow + jcol_f  # M(0,j) = j
    accrow0 = zrow

    def one_row(idx, qc, prev, accrow):
        i = idx + 1
        i_f = jnp.float32(idx) + 1.0
        sub = jnp.where(t == qc, 0.0, u)
        pb = zcol + (i_f - 1.0)  # M(i-1, 0) = i-1
        cand = jnp.minimum(_shift_in(prev, pb) + sub, prev + 1.0)
        # row[0]=i; row[j]=min(cand[j], row[j-1]+1) -> slope-1 min scan
        v = jnp.minimum(_cummin_lanes(cand - jcol_f), i_f)
        row_v = v + jcol_f
        accrow = jnp.where(i == m_col, row_v, accrow)
        return row_v, accrow

    R = _pick_unroll(q_ref.shape[0], m_pad, n_pad)

    def block(blk, carry):
        prev, accrow = carry
        qcs = _row_chars(qf, iota_col, blk, R, n_pad)
        for r in range(R):
            prev, accrow = one_row(blk * R + r, qcs[r], prev, accrow)
        return prev, accrow

    _, accrow = jax.lax.fori_loop(0, m_pad // R, block, (row0, accrow0))
    fin = jnp.min(
        jnp.where(mask_eq_n, accrow, float("inf")), axis=1, keepdims=True
    )
    out_ref[:, :] = fin


def _fit_kernel(use_jump, m_pad, n_pad, q_ref, t_ref, allow_ref, n_ref,
                m_ref, p_ref, out_ref):
    """Fit mode (alignment.h:596-694): 4 states with the junction-gated jump
    (inverted enum-bool semantics — see QUIRKS.md). allow (8, n_pad) f32 is
    1.0 where jump ENTRY is permitted at that column. Score = max over
    row m of M and L at j in [0, n-1] (col0 borders are -inf)."""
    match, mis = p_ref[0, 0], p_ref[0, 1]
    o, e, jp = p_ref[0, 2], p_ref[0, 3], p_ref[0, 4]
    t = t_ref[:, :].astype(jnp.float32)
    qf = q_ref[:, :].astype(jnp.float32)
    iota_col = jax.lax.broadcasted_iota(jnp.int32, (m_pad, 1), 0)
    m_col = m_ref[:, :]
    jcol_f = (
        jax.lax.broadcasted_iota(jnp.int32, (q_ref.shape[0], n_pad), 1) + 1
    ).astype(jnp.float32)
    zrow = t * 0.0
    zcol = jnp.max(zrow, axis=1, keepdims=True)
    neg_col = zcol + NEG
    ej = e * jcol_f            # hoisted row constant (oj derived per row:
    #                            one extra vector op buys back a live
    #                            (tile_b, n_pad) buffer — this kernel rides
    #                            the 16 MiB scoped-VMEM line at 8x32768)
    # row 0: M=U=0, L=J=-inf (alignment.h:619-624) -> combined max = 0
    m_init = zrow
    l_init = zrow + NEG
    best_init = zrow
    accrow0 = zrow + NEG
    if use_jump:
        # fold the entry mask into a jump-bias row: sm + jbias is
        # sm + jp where entry is allowed and -inf elsewhere (finite + -inf
        # and -inf + -inf both give -inf), replacing the per-row
        # compare+select and retiring the raw allow row
        jbias = jnp.where(allow_ref[:, :] > 0.0, jp, NEG)

    def one_row(idx, qc, mp, lp, best, accrow):
        i = idx + 1
        sub = jnp.where(t == qc, match, mis)
        # col0 borders all -inf for i >= 1 (alignment.h:612-617); row0 col0
        # is ALSO overwritten to M(0,0)=U(0,0)=0 by the row0 loop (619-624,
        # j starts at 0), so the combined diag border at i=1 is 0.
        bb = zcol + jnp.where(idx == 0, 0.0, NEG)
        m_row = _shift_in(best, bb) + sub
        l_row = jnp.maximum(lp + e, mp + o)
        # one shifted m_row feeds both the U scan and the J scan; the
        # U(i,0) = -inf seed is a no-op under max, so no seed fold needed
        sm = _shift_in(m_row, neg_col)
        u_row = _cummax_lanes(sm + (o - ej)) + ej
        best_ml = jnp.maximum(m_row, l_row)
        best = jnp.maximum(best_ml, u_row)
        if use_jump:
            j_row = _cummax_lanes_flat(sm + jbias)
            best = jnp.maximum(best, j_row)
        accrow = jnp.where(i == m_col, best_ml, accrow)
        return m_row, l_row, best, accrow

    R = _pick_unroll(q_ref.shape[0], m_pad, n_pad)

    def block(blk, carry):
        mp, lp, best, accrow = carry
        qcs = _row_chars(qf, iota_col, blk, R, n_pad)
        for r in range(R):
            mp, lp, best, accrow = one_row(
                blk * R + r, qcs[r], mp, lp, best, accrow
            )
        return mp, lp, best, accrow

    _, _, _, accrow = jax.lax.fori_loop(
        0, m_pad // R, block, (m_init, l_init, best_init, accrow0)
    )
    # final-scan mask built AFTER the loop so it isn't live across it
    jcol = jax.lax.broadcasted_iota(jnp.int32, (q_ref.shape[0], n_pad), 1) + 1
    mask_lt_n = jcol <= n_ref[:, :] - 1
    fin = jnp.max(jnp.where(mask_lt_n, accrow, NEG), axis=1, keepdims=True)
    out_ref[:, :] = fin


def _grid_call(kernel, nin, m_pad, n_pad, B, interpret, tile_b=TILE_B):
    grid = (B // tile_b,)
    seq_spec = [
        pl.BlockSpec((tile_b, m_pad), lambda b: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_b, n_pad), lambda b: (b, 0),
                     memory_space=pltpu.VMEM),
    ]
    if nin == 6:  # fit: + allow mask
        seq_spec.append(
            pl.BlockSpec((tile_b, n_pad), lambda b: (b, 0),
                         memory_space=pltpu.VMEM)
        )
    seq_spec += [
        pl.BlockSpec((tile_b, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_b, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8), lambda b: (0, 0), memory_space=pltpu.SMEM),
    ]
    kwargs = {}
    if not interpret:
        # the fill's live set is ~20-24 (tile_b, n_pad) f32 rows plus
        # double-buffered input blocks; the Mosaic default scoped-VMEM
        # limit (16 MiB) rejects 8x32768 fit, so size the limit to the
        # footprint (v5e has 128 MiB VMEM)
        need = 48 * tile_b * n_pad * 4
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(min(100 * 2**20, max(16 * 2**20, need))),
        )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=seq_spec,
        out_specs=pl.BlockSpec((tile_b, 1), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        interpret=interpret,
        **kwargs,
    )


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3),
                   static_argnames=("tile_b",))
def pallas_scores(mode, m_pad, n_pad, interpret, qs, ts, ns, ms, params,
                  tile_b=TILE_B):
    """Score-only batch fill. qs (B, m_pad) i32, ts (B, n_pad) i32,
    ns/ms (B, 1) i32, params (1, 8) f32 [match, mis, o, e, jump, 0, 0, 0].
    B must be a multiple of ``tile_b``. Returns (B,) f32 scores."""
    B = qs.shape[0]
    if mode in ("global", "local"):
        kern = functools.partial(_affine_kernel, mode, m_pad, n_pad)
    elif mode == "overlap":
        kern = functools.partial(_overlap_kernel, m_pad, n_pad)
    elif mode == "edit":
        kern = functools.partial(_edit_kernel, m_pad, n_pad)
    else:
        raise ValueError(mode)
    out = _grid_call(kern, 5, m_pad, n_pad, B, interpret, tile_b)(
        qs, ts, ns, ms, params
    )
    return out[:, 0]


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3),
                   static_argnames=("tile_b",))
def pallas_fit_scores(use_jump, m_pad, n_pad, interpret, qs, ts, allow, ns,
                      ms, params, tile_b=TILE_B):
    B = qs.shape[0]
    kern = functools.partial(_fit_kernel, use_jump, m_pad, n_pad)
    out = _grid_call(kern, 6, m_pad, n_pad, B, interpret, tile_b)(
        qs, ts, allow, ns, ms, params
    )
    return out[:, 0]
