"""Pallas TPU kernels: row-scan DP fills with VMEM-resident carries.

The lax.scan engine (engine/scan.py) is HBM-bandwidth-bound: every row
step round-trips its (B, n) carry rows through HBM. These kernels run the
whole fill inside one Pallas program per batch tile — sequences and all
carry rows live in VMEM, so HBM traffic is just the input sequences and
per-pair scalar results. Score-only (the pointer-emitting path stays on
the scan engine until the DMA-staged pointer kernel lands).

Layout: each grid program owns TILE_B=8 pairs (the VPU sublane count);
rows are (8, n_pad) f32 vectors (lanes = target columns 1..n_pad, the
column-0 border is carried as an (8, 1) scalar column and shifted in).
The in-row gap recurrences use the same exact max-plus normalization as
the scan engine (engine/scan.py docstring), with the running max done as
a Hillis-Steele doubling scan over lanes (log2(n_pad) shift+max steps).

Semantics are identical to engine/scan.py (itself parity-tested against
the reference binary): f32 holds exact integers, -inf borders, and scores
match bit-for-bit. Reference recurrences: src/alignment.h:417-473 (global),
805-847 (local), 596-694 (fit), 926-964 (overlap), 291-315 (edit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = float("-inf")
TILE_B = 8


def _shift_in(x, col):
    """[col, x[:, :-1]] — lane shift right by one, border column shifted in."""
    return jnp.concatenate([col, x[:, :-1]], axis=1)


def _cummax_lanes(v):
    """Inclusive running max along lanes (Hillis-Steele doubling)."""
    tb, w = v.shape
    k = 1
    while k < w:
        pad = jnp.full((tb, k), NEG, v.dtype)
        v = jnp.maximum(v, jnp.concatenate([pad, v[:, :-k]], axis=1))
        k *= 2
    return v


def _cummin_lanes(v):
    tb, w = v.shape
    k = 1
    while k < w:
        pad = jnp.full((tb, k), float("inf"), v.dtype)
        v = jnp.minimum(v, jnp.concatenate([pad, v[:, :-k]], axis=1))
        k *= 2
    return v


def _u_row(m_row, m_border, u0, o, e, jcol):
    """U[j] = max(M[j-1]+o, U[j-1]+e), U[0] = u0 (a scalar — the border is
    the same for every pair in the tile).

    Exact normalized form (engine/scan.py _u_scan): V[j] = U[j] - e*j is the
    running max of [u0, M[j-1]+o-e*j]; here over lanes j=1..n_pad with the
    column-0 M border shifted in. u0 folds in as a scalar max (Mosaic
    handles scalar broadcasts; (8,1)->(8,n) vector relayouts it does not).
    """
    cand = _shift_in(m_row, m_border) + o - e * jcol
    v = jnp.maximum(_cummax_lanes(cand), u0)
    return v + e * jcol



def _row_char(qf, iota_col, idx, n_pad):
    """Extract column ``idx`` of the (8, m_pad) f32 query tile, replicated
    across n_pad lanes. Mosaic cannot dynamically index the lane dimension,
    so contract with a one-hot (m_pad, 1) column (a tiny MXU op) and lane-
    broadcast the result. ``iota_col`` is the hoisted (m_pad, 1) iota."""
    onehot = (iota_col == idx).astype(jnp.float32)
    # HIGHEST precision: the default f32 MXU path rounds through bf16
    # (exact only to 256); byte values are < 256 but don't rely on it
    qc = jnp.dot(qf, onehot, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    return jnp.broadcast_to(qc, (TILE_B, n_pad))

def _affine_kernel(mode, m_pad, n_pad, q_ref, t_ref, n_ref, m_ref, p_ref,
                   out_ref):
    """global/local score kernel. Shapes: q (8, m_pad) i32, t (8, n_pad) i32,
    n/m (8, 1) i32, params (1, 8) f32 SMEM, out (8, 1) f32."""
    match, mis = p_ref[0, 0], p_ref[0, 1]
    o, e = p_ref[0, 2], p_ref[0, 3]
    t = t_ref[:, :].astype(jnp.float32)
    qf = q_ref[:, :].astype(jnp.float32)
    iota_col = jax.lax.broadcasted_iota(jnp.int32, (m_pad, 1), 0)
    n_col = n_ref[:, :]  # (8,1) true target lengths
    m_col = m_ref[:, :]
    jcol = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_B, n_pad), 1) + 1
    )
    jcol_f = jcol.astype(jnp.float32)
    mask_le_n = jcol <= n_col
    mask_eq_n = jcol == n_col
    # zero templates derived from loaded data: keeps fori_loop carry inits
    # in natural vector layout (splat constants are lane-replicated, which
    # Mosaic cannot unify with the loop body's outputs)
    zrow = t * 0.0
    zcol = jnp.max(zrow, axis=1, keepdims=True)

    if mode == "global":
        # row 0 (cols 1..n): M=L=-inf, U = o + e*j (alignment.h:437-441)
        m_init = zrow + NEG
        l_init = zrow + NEG
        u_init = zrow + o + e * jcol_f
    else:  # local: calloc-zero borders (alignment.h:805-847)
        m_init = zrow
        l_init = zrow
        u_init = zrow
    acc0 = zcol + NEG

    def row(idx, carry):
        mp, lp, up, acc = carry
        i = idx + 1
        i_f = jnp.float32(i)
        qc = _row_char(qf, iota_col, idx, n_pad)
        sub = jnp.where(t == qc, match, mis)
        if mode == "global":
            # borders at column 0 of the PREVIOUS row i-1 (alignment.h:428-441)
            mb = zcol + jnp.where(idx == 0, 0.0, NEG)
            lb = zcol + (o + e * (i_f - 1.0))
            ub = zcol + jnp.where(idx == 0, o, NEG)
            diag = jnp.maximum(
                jnp.maximum(_shift_in(lp, lb), _shift_in(mp, mb)),
                _shift_in(up, ub),
            )
            m_row = diag + sub
            l_row = jnp.maximum(lp + e, mp + o)
            u_row = _u_row(m_row, zcol + NEG, NEG, o, e, jcol_f)
            # latch max(L, M, U) at (m, n) when i == m (alignment.h:466-469)
            fin = jnp.max(
                jnp.where(
                    mask_eq_n,
                    jnp.maximum(jnp.maximum(l_row, m_row), u_row),
                    NEG,
                ),
                axis=1,
                keepdims=True,
            )
            acc = jnp.where(i == m_col, fin, acc)
        else:  # local
            zero_col = zcol
            diag = jnp.maximum(
                jnp.maximum(_shift_in(lp, zero_col), _shift_in(mp, zero_col)),
                _shift_in(up, zero_col),
            )
            m_row = jnp.maximum(diag + sub, 0.0)
            l_row = jnp.maximum(lp + e, mp + o)
            u_row = _u_row(m_row, zero_col, 0.0, o, e, jcol_f)
            # running max of M over true cells (i <= m, j <= n)
            rowmax = jnp.max(
                jnp.where(mask_le_n, m_row, NEG), axis=1, keepdims=True
            )
            rowmax = jnp.where(i <= m_col, rowmax, NEG)
            acc = jnp.maximum(acc, rowmax)
        return m_row, l_row, u_row, acc

    _, _, _, acc = jax.lax.fori_loop(
        0, m_pad, row, (m_init, l_init, u_init, acc0)
    )
    out_ref[:, :] = acc


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
    jcol = jax.lax.broadcasted_iota(jnp.int32, (TILE_B, n_pad), 1) + 1
    jcol_f = jcol.astype(jnp.float32)
    mask_lt_n = jcol <= n_col - 1
    zrow = t * 0.0
    zcol = jnp.max(zrow, axis=1, keepdims=True)
    m_init = zrow + NEG
    acc0 = zcol + NEG
    zero_col = zcol

    def row(idx, carry):
        mp, acc = carry
        i = idx + 1
        qc = _row_char(qf, iota_col, idx, n_pad)
        sub = jnp.where(t == qc, match, mis)
        # diag pred at col0 of prev row: M(i-1,0)=0 (col0 border)
        dr = jnp.maximum(_shift_in(mp, zero_col) + sub, mp + o)
        # M[i,0]=0; M[i,j]=max(M[i,j-1]+o, dr[j]) -> slope-o scan, seed 0
        cand = dr - o * jcol_f
        v = jnp.maximum(_cummax_lanes(cand), 0.0)  # seed = M[i,0]-o*0 = 0
        m_row = v + o * jcol_f
        # latch row m: score = max(0, max over j in [1, n-1])
        rowmax = jnp.max(
            jnp.where(mask_lt_n, m_row, NEG), axis=1, keepdims=True
        )
        rowmax = jnp.maximum(rowmax, 0.0)  # j=0 border candidate (value 0)
        acc = jnp.where(i == m_col, rowmax, acc)
        return m_row, acc

    _, acc = jax.lax.fori_loop(0, m_pad, row, (m_init, acc0))
    out_ref[:, :] = acc


def _edit_kernel(m_pad, n_pad, q_ref, t_ref, n_ref, m_ref, p_ref, out_ref):
    """Min-plus DP (alignment.h:291-315): indel hardcoded 1, sub=0/u."""
    u = p_ref[0, 1]
    t = t_ref[:, :].astype(jnp.float32)
    qf = q_ref[:, :].astype(jnp.float32)
    iota_col = jax.lax.broadcasted_iota(jnp.int32, (m_pad, 1), 0)
    n_col = n_ref[:, :]
    m_col = m_ref[:, :]
    jcol = jax.lax.broadcasted_iota(jnp.int32, (TILE_B, n_pad), 1) + 1
    jcol_f = jcol.astype(jnp.float32)
    mask_eq_n = jcol == n_col
    zrow = t * 0.0
    zcol = jnp.max(zrow, axis=1, keepdims=True)
    row0 = zrow + jcol_f  # M(0,j) = j
    acc0 = zcol

    def row(idx, carry):
        prev, acc = carry
        i = idx + 1
        i_f = jnp.float32(idx) + 1.0
        qc = _row_char(qf, iota_col, idx, n_pad)
        sub = jnp.where(t == qc, 0.0, u)
        pb = zcol + (i_f - 1.0)  # M(i-1, 0) = i-1
        cand = jnp.minimum(_shift_in(prev, pb) + sub, prev + 1.0)
        # row[0]=i; row[j]=min(cand[j], row[j-1]+1) -> slope-1 min scan
        v = jnp.minimum(_cummin_lanes(cand - jcol_f), i_f)
        row_v = v + jcol_f
        fin = jnp.min(
            jnp.where(mask_eq_n, row_v, float("inf")),
            axis=1,
            keepdims=True,
        )
        acc = jnp.where(i == m_col, fin, acc)
        return row_v, acc

    _, acc = jax.lax.fori_loop(0, m_pad, row, (row0, acc0))
    out_ref[:, :] = acc


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
    n_col = n_ref[:, :]
    m_col = m_ref[:, :]
    jcol = jax.lax.broadcasted_iota(jnp.int32, (TILE_B, n_pad), 1) + 1
    jcol_f = jcol.astype(jnp.float32)
    mask_lt_n = jcol <= n_col - 1
    zrow = t * 0.0
    zcol = jnp.max(zrow, axis=1, keepdims=True)
    neg_col = zcol + NEG
    # row 0: M=U=0, L=J=-inf (alignment.h:619-624)
    m_init = zrow
    u_init = zrow
    l_init = zrow + NEG
    j_init = zrow + NEG
    acc0 = zcol + NEG
    if use_jump:
        allow = allow_ref[:, :]

    def row(idx, carry):
        mp, lp, up, jpr, acc = carry
        i = idx + 1
        qc = _row_char(qf, iota_col, idx, n_pad)
        sub = jnp.where(t == qc, match, mis)
        # col0 borders all -inf for i >= 1 (alignment.h:612-617); row0 col0
        # is ALSO overwritten to M(0,0)=U(0,0)=0 by the row0 loop (619-624,
        # j starts at 0), so the diag shift-in at i=1 is 0 for M and U.
        mb = zcol + jnp.where(idx == 0, 0.0, NEG)
        ub = zcol + jnp.where(idx == 0, 0.0, NEG)
        diag = jnp.maximum(
            jnp.maximum(_shift_in(lp, neg_col), _shift_in(mp, mb)),
            _shift_in(up, ub),
        )
        if use_jump:
            diag = jnp.maximum(diag, _shift_in(jpr, neg_col))
        m_row = diag + sub
        l_row = jnp.maximum(lp + e, mp + o)
        u_row = _u_row(m_row, neg_col, NEG, o, e, jcol_f)
        if use_jump:
            cand = jnp.where(
                allow > 0.0, _shift_in(m_row, neg_col) + jp, NEG
            )
            j_row = _cummax_lanes(cand)
        else:
            j_row = jpr
        best_ml = jnp.maximum(m_row, l_row)
        rowmax = jnp.max(
            jnp.where(mask_lt_n, best_ml, NEG), axis=1, keepdims=True
        )
        acc = jnp.where(i == m_col, rowmax, acc)
        return m_row, l_row, u_row, j_row, acc

    _, _, _, _, acc = jax.lax.fori_loop(
        0, m_pad, row, (m_init, l_init, u_init, j_init, acc0)
    )
    out_ref[:, :] = acc


def _grid_call(kernel, nin, m_pad, n_pad, B, interpret):
    grid = (B // TILE_B,)
    seq_spec = [
        pl.BlockSpec((TILE_B, m_pad), lambda b: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_B, n_pad), lambda b: (b, 0),
                     memory_space=pltpu.VMEM),
    ]
    if nin == 6:  # fit: + allow mask
        seq_spec.append(
            pl.BlockSpec((TILE_B, n_pad), lambda b: (b, 0),
                         memory_space=pltpu.VMEM)
        )
    seq_spec += [
        pl.BlockSpec((TILE_B, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_B, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8), lambda b: (0, 0), memory_space=pltpu.SMEM),
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=seq_spec,
        out_specs=pl.BlockSpec((TILE_B, 1), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def pallas_scores(mode, m_pad, n_pad, interpret, qs, ts, ns, ms, params):
    """Score-only batch fill. qs (B, m_pad) i32, ts (B, n_pad) i32,
    ns/ms (B, 1) i32, params (1, 8) f32 [match, mis, o, e, jump, 0, 0, 0].
    B must be a multiple of TILE_B. Returns (B,) f32 scores."""
    B = qs.shape[0]
    if mode in ("global", "local"):
        kern = functools.partial(_affine_kernel, mode, m_pad, n_pad)
    elif mode == "overlap":
        kern = functools.partial(_overlap_kernel, m_pad, n_pad)
    elif mode == "edit":
        kern = functools.partial(_edit_kernel, m_pad, n_pad)
    else:
        raise ValueError(mode)
    out = _grid_call(kern, 5, m_pad, n_pad, B, interpret)(
        qs, ts, ns, ms, params
    )
    return out[:, 0]


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def pallas_fit_scores(use_jump, m_pad, n_pad, interpret, qs, ts, allow, ns,
                      ms, params):
    B = qs.shape[0]
    kern = functools.partial(_fit_kernel, use_jump, m_pad, n_pad)
    out = _grid_call(kern, 6, m_pad, n_pad, B, interpret)(
        qs, ts, allow, ns, ms, params
    )
    return out[:, 0]
