"""Banded Pallas kernels: the O(m·W) sliding-window fill in VMEM.

The XLA banded engine (engine/banded.py) scans query rows with a
(2W+1)-lane window; this kernel runs the same recurrences — bit for bit,
including every column-0 border fold and tie-break — on the TPU with the
window rows resident in VMEM scratch and the per-row target windows
streamed from HBM by the Pallas grid pipeline (no manual DMA: the grid's
second axis walks 8-row groups of a precomputed ``t_win`` slab, which
BlockSpec double-buffers automatically).

Mosaic constraints shape two deviations from the XLA engine, neither
observable in results:
  * ``jax.lax.dynamic_slice`` on the lane axis is unsupported, so the
    per-row window ``t_ext[i-1 : i-1+V]`` is materialized OUTSIDE the
    kernel as ``t_win[b, i-1, k] = t_ext[b, i-1+k]`` (one XLA gather;
    int32, (B, m_pad, V_pad) in HBM) and streamed in blocks.
  * ``lax.cummax/cummin`` have no Mosaic lowering — the hand-rolled
    Hillis-Steele lane scans from pallas_scan are used instead.
V is padded to a lane multiple (V_pad); the extra lanes are forced
out-of-band by a static ``kidx < V`` mask so they can never widen the
band.

Score-only (like the XLA engine's batch path): returns (best, edge)
where ``edge`` is the band-boundary diagnostic engine/banded.py
documents. Banded full alignments keep riding the XLA path.

Reference recurrences: src/alignment.h:417-473 (global), 805-847
(local), 291-315 (edit), 596-694 (fit sans jump), 926-964 (overlap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aligntools_tpu.ops.pallas_scan import (
    _cummax_lanes,
    _cummin_lanes,
    _row_chars,
)

NEG = float("-inf")
POS = float("inf")
SROW = 8  # query rows per grid step


def _shl(x, col):
    """[x[:, 1:], col] — lane shift LEFT by one (k+1 view)."""
    return jnp.concatenate([x[:, 1:], col], axis=1)


def _shr(x, col):
    """[col, x[:, :-1]] — lane shift RIGHT by one (k-1 view)."""
    return jnp.concatenate([col, x[:, :-1]], axis=1)


def _banded_kernel(mode, w, V, V_pad, m_pad, tile_b, emit,
                   q_ref, tw_ref, n_ref, m_ref, p_ref,
                   best_ref, edge_ref, *rest):
    """One (batch_tile, row_group) grid step; mirrors
    engine/banded.py banded_fill step-for-step (see that docstring for
    the border rationale). rows_ref (3, tile_b, V_pad) carries M/L/U
    (edit/overlap use row 0 only); acc_ref (2 or 4, tile_b, 1) carries
    (best, edge[, a, b]). With ``emit``: also writes the byte pointer
    codes (banded_fill's layout — pm 3 bits incl. HOME=4/unset=7, pL at
    bit 3, pU at bit 4; overlap's 2-bit codes) into ptr_ref
    (tile_b, SROW, V_pad) and tracks the per-mode traceback start in
    acc rows 2/3 (global: state; local: i_max/j_max; fit: use_l/j_max;
    overlap: j_max)."""
    if emit:
        a_ref, b_ref, ptr_ref, rows_ref, acc_ref = rest
    else:
        rows_ref, acc_ref = rest
    c = pl.program_id(1)
    match, mis = p_ref[0, 0], p_ref[0, 1]
    o, e = p_ref[0, 2], p_ref[0, 3]
    n_col = n_ref[:, :]
    m_col = m_ref[:, :]
    # per-row query chars via one one-hot MXU dot per SROW group (Mosaic
    # cannot take an 8-lane block of q, nor dynamically index lanes —
    # same pattern as pallas_scan._row_chars)
    qf = q_ref[:, :].astype(jnp.float32)
    iota_col = jax.lax.broadcasted_iota(jnp.int32, (m_pad, 1), 0)
    qcs = _row_chars(qf, iota_col, c, SROW, V_pad)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (tile_b, V_pad), 1)
    in_win = kidx < V  # static pad-lane mask
    zrow = tw_ref[:, 0, :].astype(jnp.float32) * 0.0
    zcol = jnp.max(zrow, axis=1, keepdims=True)
    bad = POS if mode == "edit" else NEG

    @pl.when(c == 0)
    def _init():
        j_row0 = kidx - w
        if mode == "edit":
            m0 = jnp.where(
                in_win & (j_row0 >= 0), j_row0.astype(jnp.float32), POS
            )
            rows_ref[0] = m0
        elif mode == "overlap":
            rows_ref[0] = jnp.where(in_win & (j_row0 == 0), 0.0, NEG)
        elif mode == "global":
            rows_ref[0] = jnp.where(in_win & (j_row0 == 0), 0.0, NEG)
            rows_ref[1] = jnp.where(in_win & (j_row0 == 0), o, NEG)
            rows_ref[2] = jnp.where(
                in_win & (j_row0 >= 0),
                o + e * j_row0.astype(jnp.float32), NEG,
            )
        elif mode == "fit":
            valid0 = in_win & (j_row0 >= 0)
            rows_ref[0] = jnp.where(valid0, 0.0, NEG)
            rows_ref[1] = zrow + NEG
            rows_ref[2] = jnp.where(valid0, 0.0, NEG)
        else:  # local
            valid0 = in_win & (j_row0 >= 0)
            rows_ref[0] = jnp.where(valid0, 0.0, NEG)
            rows_ref[1] = jnp.where(valid0, 0.0, NEG)
            rows_ref[2] = jnp.where(valid0, 0.0, NEG)
        acc_ref[0] = zcol + bad
        acc_ref[1] = zcol + bad
        if emit:
            acc_ref[2] = zcol
            acc_ref[3] = zcol

    def row_step(r):
        i = c * SROW + r + 1
        i_f = jnp.float32(1.0) * i
        qc = qcs[r]
        tw = tw_ref[:, r, :].astype(jnp.float32)
        jcol = i - w + kidx
        jf = jcol.astype(jnp.float32)
        in_mat = in_win & (jcol >= 1) & (jcol <= n_col) & (i <= m_col)
        at_j0 = jcol == 0
        at_j0_diag = jcol == 1
        best, edge = acc_ref[0], acc_ref[1]

        if mode == "edit":
            mp = rows_ref[0]
            sub = jnp.where(tw == qc, 0.0, mis)
            diag = mp
            vert = _shl(mp, zcol + POS)
            diag = jnp.where(at_j0_diag, i_f - 1.0, diag)
            cand2 = jnp.minimum(diag + sub, vert + 1.0)
            cand2 = jnp.where(in_mat, cand2, POS)
            cd = jnp.where(
                at_j0, i_f,
                jnp.where(
                    at_j0_diag, jnp.minimum(cand2 - jf, i_f), cand2 - jf
                ),
            )
            cd = jnp.where(in_win, cd, POS)
            row = _cummin_lanes(cd) + jf
            row = jnp.minimum(row, cand2)
            row = jnp.where(in_mat, row, POS)
            fin = jnp.min(
                jnp.where(jcol == n_col, row, POS), axis=1, keepdims=True
            )
            best = jnp.where(i == m_col, fin, best)
            edge = jnp.minimum(
                edge, jnp.minimum(row[:, 0:1], row[:, V - 1 : V])
            )
            rows_ref[0] = row
            acc_ref[0], acc_ref[1] = best, edge
            return

        if mode == "overlap":
            mp = rows_ref[0]
            sub = jnp.where(tw == qc, match, mis)
            diag = mp
            vert = _shl(mp, zcol + NEG)
            diag = jnp.where(at_j0_diag, 0.0, diag)
            vert = jnp.where(at_j0, 0.0, vert)
            cand = jnp.maximum(diag + sub, vert + o)
            cand = jnp.where(in_mat, cand, NEG)
            cd = jnp.where(at_j0, 0.0, cand - o * jf)
            cd = jnp.where(in_win, cd, NEG)
            row = _cummax_lanes(cd) + o * jf
            row = jnp.where(in_mat, row, NEG)
            latch = i == m_col
            rowmax = jnp.max(
                jnp.where(jcol <= n_col - 1, row, NEG),
                axis=1, keepdims=True,
            )
            fin = jnp.maximum(rowmax, 0.0)
            best = jnp.where(latch, fin, best)
            if emit:
                # 2-bit codes, arg order LEFT, DIAGONAL, RIGHT
                # (engine/banded.py ostep)
                lh = _shr(row, zcol + NEG)
                lh = jnp.where(at_j0_diag, 0.0, lh)  # M(i, 0) = 0
                code = jnp.where(
                    lh + o >= row, 0,
                    jnp.where(diag + sub >= vert + o, 1, 2),
                )
                code = jnp.where(row > NEG, code, 3)
                ptr_ref[:, r, :] = code.astype(jnp.uint8)
                hit = (row == rowmax) & (jcol <= n_col - 1) & in_mat
                jarg = jnp.min(
                    jnp.where(hit, jf, jnp.float32(1 << 30)),
                    axis=1, keepdims=True,
                )
                jarg = jnp.where(rowmax > 0.0, jarg, 0.0)
                acc_ref[2] = jnp.where(latch, jarg, acc_ref[2])
            edge = jnp.maximum(
                edge, jnp.maximum(row[:, 0:1], row[:, V - 1 : V])
            )
            rows_ref[0] = row
            acc_ref[0], acc_ref[1] = best, edge
            return

        # --- affine family: global / local / fit ---
        mp, lp, up = rows_ref[0], rows_ref[1], rows_ref[2]
        sub = jnp.where(tw == qc, match, mis)
        diag_m, diag_l, diag_u = mp, lp, up
        vert_m = _shl(mp, zcol + NEG)
        vert_l = _shl(lp, zcol + NEG)
        if mode == "global":
            bM_d = jnp.where(i - 1 == 0, 0.0, NEG) + zcol
            bL_d = zcol + (o + e * (i_f - 1.0))
            bU_d = jnp.where(i - 1 == 0, o, NEG) + zcol
            diag_m = jnp.where(at_j0_diag, bM_d, diag_m)
            diag_l = jnp.where(at_j0_diag, bL_d, diag_l)
            diag_u = jnp.where(at_j0_diag, bU_d, diag_u)
            vert_m = jnp.where(at_j0, NEG, vert_m)
            vert_l = jnp.where(at_j0, bL_d, vert_l)
        elif mode == "fit":
            bMU_d = jnp.where(i - 1 == 0, 0.0, NEG) + zcol
            diag_m = jnp.where(at_j0_diag, bMU_d, diag_m)
            diag_l = jnp.where(at_j0_diag, NEG, diag_l)
            diag_u = jnp.where(at_j0_diag, bMU_d, diag_u)
            vert_m = jnp.where(at_j0, bMU_d, vert_m)
            vert_l = jnp.where(at_j0, NEG, vert_l)
        else:  # local
            diag_m = jnp.where(at_j0_diag, 0.0, diag_m)
            diag_l = jnp.where(at_j0_diag, 0.0, diag_l)
            diag_u = jnp.where(at_j0_diag, 0.0, diag_u)
            vert_m = jnp.where(at_j0, 0.0, vert_m)
            vert_l = jnp.where(at_j0, 0.0, vert_l)
        cand_l = diag_l + sub
        cand_m = diag_m + sub
        cand_u = diag_u + sub
        best3 = jnp.maximum(jnp.maximum(cand_l, cand_m), cand_u)
        m_row = best3
        if mode == "local":
            m_row = jnp.maximum(m_row, 0.0)
        m_row = jnp.where(in_mat, m_row, NEG)
        la_, lb_ = vert_l + e, vert_m + o
        l_row = jnp.maximum(la_, lb_)
        l_row = jnp.where(in_mat, l_row, NEG)
        cand = _shr(m_row, zcol + NEG) + o - e * jf
        if mode == "local":
            cand = jnp.where(at_j0, 0.0 - e * jf, cand)
            cand = jnp.where(
                at_j0_diag, jnp.maximum(cand, 0.0 + o - e * jf), cand
            )
        cand = jnp.where(in_win, cand, NEG)
        u_row = _cummax_lanes(cand)
        if mode == "local":
            u_row = jnp.maximum(u_row, 0.0)
        u_row = u_row + e * jf
        u_row = jnp.where(in_mat, u_row, NEG)
        if emit:
            # byte pointer codes, banded_fill's exact layout/tie-breaks
            pm = jnp.where(
                cand_l >= best3, 0,
                jnp.where(cand_m >= best3, 1, 2),
            )
            if mode == "local":
                pm = jnp.where(best3 >= 0.0, pm, 4)  # HOME: LAST max5 arg
            pm = jnp.where(m_row > NEG, pm, 7)
            plb = jnp.where(la_ >= lb_, 0, 1 << 3)
            mh = _shr(m_row, zcol + NEG)
            uh = _shr(u_row, zcol + NEG)
            if mode == "local":
                mh = jnp.where(at_j0_diag, 0.0, mh)
                uh = jnp.where(at_j0_diag, 0.0, uh)
            pub = jnp.where(mh + o >= uh + e, 0, 1 << 4)
            ptr_ref[:, r, :] = (pm | plb | pub).astype(jnp.uint8)
        BIG = jnp.float32(1 << 30)
        latch = i == m_col
        if mode == "fit":
            lt_n = jcol <= n_col - 1
            mb = jnp.max(jnp.where(lt_n, m_row, NEG), axis=1, keepdims=True)
            lb3 = jnp.max(jnp.where(lt_n, l_row, NEG), axis=1, keepdims=True)
            fin = jnp.maximum(mb, lb3)
            best = jnp.where(latch, fin, best)
            if emit:
                # M beats L on ties; smallest j within the winning matrix
                use_l = lb3 > mb
                win_row = jnp.where(use_l, l_row, m_row)
                hit = (win_row == fin) & lt_n & in_mat
                jarg = jnp.min(jnp.where(hit, jf, BIG), axis=1,
                               keepdims=True)
                acc_ref[2] = jnp.where(
                    latch, use_l.astype(jnp.float32), acc_ref[2]
                )
                acc_ref[3] = jnp.where(latch, jarg, acc_ref[3])
        elif mode == "global":
            at_n = jcol == n_col
            ln_ = jnp.max(jnp.where(at_n, l_row, NEG), axis=1,
                          keepdims=True)
            mn_ = jnp.max(jnp.where(at_n, m_row, NEG), axis=1,
                          keepdims=True)
            un_ = jnp.max(jnp.where(at_n, u_row, NEG), axis=1,
                          keepdims=True)
            fin = jnp.maximum(jnp.maximum(ln_, mn_), un_)
            best = jnp.where(latch, fin, best)
            if emit:
                st = jnp.where(
                    (ln_ >= mn_) & (ln_ >= un_), 0.0,
                    jnp.where(mn_ >= un_, 1.0, 2.0),
                )
                acc_ref[2] = jnp.where(latch, st, acc_ref[2])
        else:  # local: running max of M, row-major strict >
            rowmax = jnp.max(m_row, axis=1, keepdims=True)
            if emit:
                upd = rowmax > best
                hit = (m_row == rowmax) & in_mat
                jarg = jnp.min(jnp.where(hit, jf, BIG), axis=1,
                               keepdims=True)
                acc_ref[2] = jnp.where(upd, i_f + zcol, acc_ref[2])
                acc_ref[3] = jnp.where(upd, jarg, acc_ref[3])
            best = jnp.maximum(best, rowmax)
        edge = jnp.maximum(
            edge, jnp.maximum(m_row[:, 0:1], m_row[:, V - 1 : V])
        )
        rows_ref[0], rows_ref[1], rows_ref[2] = m_row, l_row, u_row
        acc_ref[0], acc_ref[1] = best, edge

    for r in range(SROW):
        row_step(r)
    best_ref[:, :] = acc_ref[0]
    edge_ref[:, :] = acc_ref[1]
    if emit:
        a_ref[:, :] = acc_ref[2]
        b_ref[:, :] = acc_ref[3]


def build_t_win(te, m_pad, V_pad):
    """(B, n_ext) target-with-pads -> (B, m_pad, V_pad) per-row windows:
    t_win[b, i, k] = te[b, i + k] (clipped; pad lanes are masked in the
    kernel). One XLA gather, runs on the device."""
    B, n_ext = te.shape
    idx = (
        jnp.arange(m_pad, dtype=jnp.int32)[:, None]
        + jnp.arange(V_pad, dtype=jnp.int32)[None, :]
    )
    idx = jnp.minimum(idx, n_ext - 1)
    return te[:, idx]


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def banded_pallas_scores(mode, w, m_pad, interpret, tile_b,
                         qs, t_win, ns, ms, params):
    """Batched banded score fill on the Pallas kernel.

    qs (B, m_pad) i32; t_win from :func:`build_t_win`; ns/ms (B, 1) i32;
    params (1, 8) f32 [match, mis, o, e, ...]. Returns (best (B,),
    edge (B,)) — bit-identical to engine/banded.py banded_fill."""
    out = _banded_call(mode, w, m_pad, interpret, tile_b, False,
                       qs, t_win, ns, ms, params)
    return out[0][:, 0], out[1][:, 0]


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def banded_pallas_full(mode, w, m_pad, interpret, tile_b,
                       qs, t_win, ns, ms, params):
    """Pointer-emitting banded fill. Returns (best (B,), edge (B,),
    a (B,), b (B,), ptrs (B, m_pad, V_pad) uint8) — scores, per-mode
    traceback-start scalars, and banded_fill's byte pointer layout in
    window coordinates (pad lanes k >= V hold garbage; the walk never
    reads them). Modes: global/local/fit/overlap (edit has no
    traceback)."""
    assert mode != "edit", "edit mode has no traceback"
    best, edge, a, b, ptrs = _banded_call(
        mode, w, m_pad, interpret, tile_b, True, qs, t_win, ns, ms, params
    )
    return best[:, 0], edge[:, 0], a[:, 0], b[:, 0], ptrs


def _banded_call(mode, w, m_pad, interpret, tile_b, emit,
                 qs, t_win, ns, ms, params):
    V = 2 * w + 1
    V_pad = t_win.shape[2]
    B = qs.shape[0]
    assert m_pad % SROW == 0 and B % tile_b == 0
    kern = functools.partial(
        _banded_kernel, mode, w, V, V_pad, m_pad, tile_b, emit
    )
    grid = (B // tile_b, m_pad // SROW)
    kwargs = {}
    if not interpret:
        # wide batch tiles: scratch rows + double-buffered t_win blocks +
        # the resident q tile (+ the ptr output block when emitting) can
        # exceed Mosaic's 16 MiB default scoped-VMEM limit; size it to
        # the footprint (v5e has 128 MiB)
        need = 4 * tile_b * (3 * V_pad + 4 * SROW * V_pad + m_pad)
        if emit:
            need += 2 * tile_b * SROW * V_pad
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(min(100 * 2**20, max(16 * 2**20, 2 * need))),
        )
    scalar = pl.BlockSpec((tile_b, 1), lambda g, c: (g, 0),
                          memory_space=pltpu.VMEM)
    out_specs = [scalar, scalar]
    out_shape = [
        jax.ShapeDtypeStruct((B, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, 1), jnp.float32),
    ]
    if emit:
        out_specs += [scalar, scalar, pl.BlockSpec(
            (tile_b, SROW, V_pad), lambda g, c: (g, c, 0),
            memory_space=pltpu.VMEM,
        )]
        out_shape += [
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, m_pad, V_pad), jnp.uint8),
        ]
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, m_pad), lambda g, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, SROW, V_pad), lambda g, c: (g, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda g, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda g, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda g, c: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((3, tile_b, V_pad), jnp.float32),
            pltpu.VMEM((4 if emit else 2, tile_b, 1), jnp.float32),
        ],
        interpret=interpret,
        **kwargs,
    )(qs, t_win, ns, ms, params)
