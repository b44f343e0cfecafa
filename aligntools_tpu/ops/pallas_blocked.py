"""Column-blocked Pallas kernels: targets far beyond VMEM, streamed.

The flat kernels (pallas_scan.py) keep whole (8, n_pad) carry rows in VMEM,
which caps n_pad near 64k. Long-target workloads — the reference's own fit
fixtures run to 114,491 bp (test/tmp.fa) — need more, so this kernel tiles
the TARGET axis: grid (batch_tile, col_block), col blocks iterated
sequentially per tile (TPU grids are sequential on a core), with the DP
state crossing block edges through persistent VMEM scratch:

  * ``bnd`` scratch holds block c-1's last-column (M, L, U, J) per row —
    row i's diagonal predecessors read the row i-1 entry, the in-row scan
    seeds read the row i entry, and block c's edges replace them for block
    c+1. Mosaic cannot index the lane axis dynamically, so per-row edge
    READS are one-hot MXU contractions and WRITES are iota-select merges
    into carried arrays (stored back to scratch once per block);
  * the in-row max-plus scans use GLOBAL column indices in the slope
    normalization, so a block's scan continues the previous block's
    exactly (same trick as parallel/seqpar.py across devices).

Scores accumulate into the (8, 1) output block (same output block for
every col step). Exact per-cell semantics identical to pallas_scan.py /
engine/scan.py. Score-only; global / local / fit(+jump).

Reference recurrences: src/alignment.h:417-473, 805-847, 596-694.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aligntools_tpu.ops.pallas_scan import (
    TILE_B,
    _cummax_lanes,
    _cummax_lanes_flat,
    _cummin_lanes,
    _row_char,
    _shift_in,
)

NEG = float("-inf")


def _blocked_affine_kernel(mode, use_jump, m_pad, c_blk, q_ref, t_ref,
                           allow_ref, n_ref, m_ref, p_ref, out_ref, bnd_ref):
    """One (batch_tile, col_block) grid step. ``bnd_ref`` (4, 8, m_pad)
    scratch persists across the sequential col_block iterations."""
    c = pl.program_id(1)
    match, mis = p_ref[0, 0], p_ref[0, 1]
    o, e, jp = p_ref[0, 2], p_ref[0, 3], p_ref[0, 4]
    t = t_ref[:, :].astype(jnp.float32)
    qf = q_ref[:, :].astype(jnp.float32)
    iota_col = jax.lax.broadcasted_iota(jnp.int32, (m_pad, 1), 0)
    iota_row = jax.lax.broadcasted_iota(jnp.int32, (TILE_B, m_pad), 1)
    n_col = n_ref[:, :]
    m_col = m_ref[:, :]
    col0 = c * c_blk  # global index of the column before this block
    jcol = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_B, c_blk), 1) + 1 + col0
    )
    jcol_f = jcol.astype(jnp.float32)
    first_blk = c == 0
    zrow = t * 0.0
    zcol = jnp.max(zrow, axis=1, keepdims=True)
    zbnd = qf * 0.0  # natural-layout (8, m_pad) zeros
    if use_jump:
        allow = allow_ref[:, :]
    if mode in ("global", "edit"):
        mask_fin = jcol == n_col
    elif mode == "local":
        mask_fin = jcol <= n_col
    else:  # fit / overlap: bottom-row scan excludes the last column
        mask_fin = jcol <= n_col - 1

    # previous block's edges (rows 1..m_pad at lane idx = row-1)
    oldM = bnd_ref[0, :, :]
    oldL = bnd_ref[1, :, :]
    oldU = bnd_ref[2, :, :]
    oldJ = bnd_ref[3, :, :]

    # row-0 carries for this block (analytic; alignment.h border inits)
    if mode == "global":
        m_init = zrow + NEG
        l_init = zrow + NEG
        u_init = zrow + o + e * jcol_f
    elif mode == "local":
        m_init = zrow
        l_init = zrow
        u_init = zrow
    elif mode == "fit":  # row0 M=U=0, L=J=-inf
        m_init = zrow
        l_init = zrow + NEG
        u_init = zrow
    elif mode == "overlap":  # row0 = -inf for j >= 1 (col0 handled as edge)
        m_init = zrow + NEG
        l_init = u_init = zrow
    else:  # edit: M(0,j) = j (global column index)
        m_init = zrow + jcol_f
        l_init = u_init = zrow
    j_init = zrow + NEG

    gj0 = jnp.float32(col0)
    if mode in ("overlap", "edit"):
        # single-matrix modes: only the M edge is meaningful
        e0 = (jnp.where(first_blk, 0.0, NEG), NEG, NEG, NEG)
        if mode == "overlap":
            # M(0,j)=-inf for j>=1; M(0,0)=0
            pass
        else:  # edit M(0,j) = j
            e0 = (gj0, NEG, NEG, NEG)
    elif mode == "global":
        # block c-1's last-column value of the INIT row (analytic):
        # M(0,j)=-inf (j>0) / 0 at j=0; L likewise with o; U(0,j)=o+e*j
        e0 = (
            jnp.where(first_blk, 0.0, NEG),
            jnp.where(first_blk, o, NEG),
            jnp.where(first_blk, o, o + e * gj0),
            NEG,
        )
    elif mode == "local":
        e0 = (0.0, 0.0, 0.0, NEG)
    else:  # fit: M(0,j)=U(0,j)=0 everywhere incl. col0
        e0 = (0.0, NEG, 0.0, NEG)

    def border_cols(i_f):
        """Column-0 borders of row i>=1 (used when c == 0)."""
        if mode == "global":
            return NEG, o + e * i_f, NEG, NEG
        if mode == "local":
            return 0.0, 0.0, 0.0, NEG
        if mode == "overlap":
            return 0.0, NEG, NEG, NEG  # M(i,0)=0 (col0 loop, :938)
        if mode == "edit":
            return i_f, NEG, NEG, NEG  # M(i,0)=i (:301)
        return NEG, NEG, NEG, NEG  # fit col0 all -inf for i >= 1

    def row(idx, carry):
        mp, lp, up, jpr, nM, nL, nU, nJ, acc = carry
        i = idx + 1
        i_f = jnp.float32(idx) + 1.0
        qc = _row_char(qf, iota_col, idx, c_blk)
        # previous block's edges at rows idx (-> row i-1... stored at lane
        # r-1 for row r) and idx+1? Layout: old*[ :, r-1] = edge of row r.
        # diag needs edge of row i-1 = lane idx-1; seeds need row i = lane
        # idx. Extract both with one 2-column one-hot contraction.
        oh = jnp.concatenate(
            [
                (iota_col == idx - 1).astype(jnp.float32),
                (iota_col == idx).astype(jnp.float32),
            ],
            axis=1,
        )  # (m_pad, 2)

        def edges(old):
            # Precision.HIGHEST: the MXU's default f32 dot decomposes to
            # bf16 passes, exact only for |values| <= 256 — DP edge values
            # far exceed that (first seen as an off-by-one at length 257)
            r = jax.lax.dot_general(
                jnp.where(jnp.isfinite(old), old, 0.0), oh,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            inf_r = jax.lax.dot_general(
                jnp.where(jnp.isfinite(old), 0.0, 1.0), oh,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            r = jnp.where(inf_r > 0.0, NEG, r)  # restore -inf entries
            return r[:, 0:1], r[:, 1:2]

        eM_prev, eM_cur = edges(oldM)
        if mode in ("overlap", "edit"):
            bM0, _, _, _ = border_cols(i_f - 1.0)
            sh_m = jnp.where(
                first_blk, zcol + bM0,
                jnp.where(idx == 0, zcol + e0[0], eM_prev),
            )
            bMi, _, _, _ = border_cols(i_f)
            m_edge_cur = jnp.where(first_blk, zcol + bMi, eM_cur)
            if mode == "overlap":
                sub = jnp.where(t == qc, match, mis)
                dr = jnp.maximum(_shift_in(mp, sh_m) + sub, mp + o)
                seed_w = m_edge_cur - o * gj0
                w = jnp.maximum(
                    _cummax_lanes(dr - o * jcol_f),
                    jnp.broadcast_to(seed_w, (TILE_B, c_blk)),
                )
                m_row = w + o * jcol_f
                rowmax = jnp.max(
                    jnp.where(mask_fin, m_row, NEG), axis=1, keepdims=True
                )
                rowmax = jnp.maximum(rowmax, 0.0)  # j=0 zero candidate
                acc = jnp.where(i == m_col, rowmax, acc)
            else:  # edit: min-plus, indel hardcoded 1
                sub = jnp.where(t == qc, 0.0, mis)
                cand = jnp.minimum(_shift_in(mp, sh_m) + sub, mp + 1.0)
                seed_w = m_edge_cur - gj0
                w = jnp.minimum(
                    _cummin_lanes(cand - jcol_f),
                    jnp.broadcast_to(seed_w, (TILE_B, c_blk)),
                )
                m_row = w + jcol_f
                fin = jnp.min(
                    jnp.where(mask_fin, m_row, jnp.inf), axis=1,
                    keepdims=True,
                )
                acc = jnp.where(i == m_col, fin, acc)
            sel = iota_row == idx
            nM = jnp.where(
                sel, jnp.broadcast_to(m_row[:, -1:], (TILE_B, m_pad)), nM
            )
            return m_row, lp, up, jpr, nM, nL, nU, nJ, acc
        eL_prev, _ = edges(oldL)
        eU_prev, eU_cur = edges(oldU)
        eJ_prev, eJ_cur = edges(oldJ)
        # shift-in columns: col-0 border (c==0) vs left block's edge; the
        # row-0 edge (idx==0) is analytic on every block.
        bM, bL, bU, bJ = border_cols(i_f - 1.0)
        if mode == "global":
            bM = jnp.where(idx == 0, 0.0, bM)
            bU = jnp.where(idx == 0, o, bU)
        if mode == "fit":
            bM = jnp.where(idx == 0, 0.0, bM)
            bU = jnp.where(idx == 0, 0.0, bU)
        sh_m = jnp.where(
            first_blk, zcol + bM,
            jnp.where(idx == 0, zcol + e0[0], eM_prev),
        )
        sh_l = jnp.where(
            first_blk, zcol + bL,
            jnp.where(idx == 0, zcol + e0[1], eL_prev),
        )
        sh_u = jnp.where(
            first_blk, zcol + bU,
            jnp.where(idx == 0, zcol + e0[2], eU_prev),
        )
        sh_j = jnp.where(
            first_blk, zcol + bJ,
            jnp.where(idx == 0, zcol + e0[3], eJ_prev),
        )
        sub = jnp.where(t == qc, match, mis)
        diag = jnp.maximum(
            jnp.maximum(_shift_in(lp, sh_l), _shift_in(mp, sh_m)),
            _shift_in(up, sh_u),
        )
        if use_jump:
            diag = jnp.maximum(diag, _shift_in(jpr, sh_j))
        m_row = diag + sub
        if mode == "local":
            m_row = jnp.maximum(m_row, 0.0)
        l_row = jnp.maximum(lp + e, mp + o)
        # U scan with global-column slope; seed = U at this row's left edge
        bMi, _, bUi, _ = border_cols(i_f)
        m_edge_cur = jnp.where(first_blk, zcol + bMi, eM_cur)
        u_edge_cur = jnp.where(first_blk, zcol + bUi, eU_cur)
        cand = _shift_in(m_row, m_edge_cur) + o - e * jcol_f
        seed_v = u_edge_cur - e * gj0  # V-normalized left-edge seed
        v = jnp.maximum(
            _cummax_lanes(cand), jnp.broadcast_to(seed_v, (TILE_B, c_blk))
        )
        u_row = v + e * jcol_f
        if use_jump:
            j_edge_cur = jnp.where(first_blk, zcol + NEG, eJ_cur)
            jcand = jnp.where(
                allow > 0.0, _shift_in(m_row, m_edge_cur) + jp, NEG
            )
            j_row = jnp.maximum(
                _cummax_lanes_flat(jcand),
                jnp.broadcast_to(j_edge_cur, (TILE_B, c_blk)),
            )
        else:
            j_row = jpr
        # merge this block's row-i edge into the new-edge accumulators
        sel = iota_row == idx
        bc = lambda x: jnp.broadcast_to(x, (TILE_B, m_pad))
        nM = jnp.where(sel, bc(m_row[:, -1:]), nM)
        nL = jnp.where(sel, bc(l_row[:, -1:]), nL)
        nU = jnp.where(sel, bc(u_row[:, -1:]), nU)
        if use_jump:
            nJ = jnp.where(sel, bc(j_row[:, -1:]), nJ)
        # score tracking within this block
        if mode == "global":
            fin = jnp.max(
                jnp.where(
                    mask_fin,
                    jnp.maximum(jnp.maximum(l_row, m_row), u_row), NEG,
                ),
                axis=1, keepdims=True,
            )
            acc = jnp.where(i == m_col, fin, acc)
        elif mode == "local":
            rowmax = jnp.max(
                jnp.where(mask_fin, m_row, NEG), axis=1, keepdims=True
            )
            rowmax = jnp.where(i <= m_col, rowmax, NEG)
            acc = jnp.maximum(acc, rowmax)
        else:  # fit
            rowmax = jnp.max(
                jnp.where(mask_fin, jnp.maximum(m_row, l_row), NEG),
                axis=1, keepdims=True,
            )
            acc = jnp.where(i == m_col, rowmax, acc)
        return m_row, l_row, u_row, j_row, nM, nL, nU, nJ, acc

    acc_init = zcol + (jnp.inf if mode == "edit" else NEG)
    init = (
        m_init, l_init, u_init, j_init,
        zbnd + NEG, zbnd + NEG, zbnd + NEG, zbnd + NEG,
        acc_init,
    )
    out = jax.lax.fori_loop(0, m_pad, row, init)
    nM, nL, nU, nJ, acc = out[4], out[5], out[6], out[7], out[8]
    bnd_ref[0, :, :] = nM
    bnd_ref[1, :, :] = nL
    bnd_ref[2, :, :] = nU
    bnd_ref[3, :, :] = nJ
    if mode == "edit":
        prev = jnp.where(first_blk, zcol + jnp.inf, out_ref[:, :])
        out_ref[:, :] = jnp.minimum(prev, acc)
    else:
        prev = jnp.where(first_blk, zcol + NEG, out_ref[:, :])
        out_ref[:, :] = jnp.maximum(prev, acc)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def blocked_scores(mode, use_jump, m_pad, n_pad, c_blk, interpret,
                   qs, ts, allow, ns, ms, params):
    """Score-only blocked fill. Shapes as pallas_scores, plus c_blk (column
    block width, multiple of 128, n_pad % c_blk == 0)."""
    assert n_pad % c_blk == 0
    B = qs.shape[0]
    kern = functools.partial(
        _blocked_affine_kernel, mode, use_jump, m_pad, c_blk
    )
    grid = (B // TILE_B, n_pad // c_blk)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_B, m_pad), lambda b, c: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, c_blk), lambda b, c: (b, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, c_blk), lambda b, c: (b, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda b, c: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda b, c: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda b, c: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TILE_B, 1), lambda b, c: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((4, TILE_B, m_pad), jnp.float32)],
        interpret=interpret,
    )(qs, ts, allow, ns, ms, params)
    return out[:, 0]


# ---------------------------------------------------------------------------
# Pointer-emitting blocked kernel (long-target FULL alignments)
# ---------------------------------------------------------------------------

SROW = 8  # rows per staged pointer DMA (uint8 slice alignment)


def _blocked_ptr_kernel(mode, use_jump, rpb, m_pad, c_blk, q_ref, t_ref,
                        allow_ref, n_ref, m_ref, p_ref,
                        score_ref, a_ref, b_ref, ptr_ref,
                        bnd_ref, stage_ref, sem_ref):
    """Blocked fill with packed pointer emission and traceback-start info.

    Like _blocked_affine_kernel (boundary state in ``bnd_ref`` scratch
    across sequential column blocks) plus the pallas_ptr.py machinery:
    pointer rows packed in int32, cast to uint8, staged in 8-row
    super-rows, and DMA'd to the HBM tensor at this block's column range.
    Start info merges ACROSS blocks: global latches at the block holding
    column n; local keeps the lexicographically earliest (i, j) argmax
    (strictly-greater values replace; ties keep the earlier block — the
    reference's row-major scan order); fit prefers M over L on score ties
    and the smallest j within each matrix (alignment.h:672-690).
    Overlap scans the bottom row with the j=0 zero candidate folded into
    block 0 (alignment.h:950-959). Modes: global / local / fit(+jump) /
    overlap. ``rpb``: DP rows packed per byte — 1 (byte layout), 2
    (nibble; any mode but fit+jump), 4 (2-bit; overlap only). See
    pallas_ptr.py docstring.
    """
    if rpb > 1:
        K_HOME = K_UNSET = 3
        LBIT, UBIT = 1 << 2, 1 << 3
    else:
        K_HOME, K_UNSET = 4, 7
        LBIT, UBIT = 1 << 3, 1 << 4
    c = pl.program_id(1)
    b0 = pl.program_id(0) * TILE_B
    match, mis = p_ref[0, 0], p_ref[0, 1]
    o, e, jp = p_ref[0, 2], p_ref[0, 3], p_ref[0, 4]
    t = t_ref[:, :].astype(jnp.float32)
    qf = q_ref[:, :].astype(jnp.float32)
    iota_col = jax.lax.broadcasted_iota(jnp.int32, (m_pad, 1), 0)
    iota_row = jax.lax.broadcasted_iota(jnp.int32, (TILE_B, m_pad), 1)
    n_col = n_ref[:, :]
    m_col = m_ref[:, :]
    col0 = c * c_blk
    jcol = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_B, c_blk), 1) + 1 + col0
    )
    jcol_f = jcol.astype(jnp.float32)
    first_blk = c == 0
    zrow = t * 0.0
    zcol = jnp.max(zrow, axis=1, keepdims=True)
    zcol_i = jnp.int32(0) * jnp.max(t_ref[:, :], axis=1, keepdims=True)
    zbnd = qf * 0.0
    if use_jump:
        allow = allow_ref[:, :]
    if mode == "global":
        mask_fin = jcol == n_col
    elif mode == "local":
        mask_fin = jcol <= n_col
    else:
        mask_fin = jcol <= n_col - 1

    oldM = bnd_ref[0, :, :]
    oldL = bnd_ref[1, :, :]
    oldU = bnd_ref[2, :, :]
    oldJ = bnd_ref[3, :, :]

    if mode == "global":
        m_init = zrow + NEG
        l_init = zrow + NEG
        u_init = zrow + o + e * jcol_f
    elif mode == "local":
        m_init = l_init = u_init = zrow
    elif mode == "overlap":  # row 0 = -inf for j >= 1 (alignment.h:937)
        m_init = zrow + NEG
        l_init = u_init = zrow
    else:
        m_init = zrow
        l_init = zrow + NEG
        u_init = zrow
    j_init = zrow + NEG

    gj0 = jnp.float32(col0)
    if mode == "global":
        e0 = (
            jnp.where(first_blk, 0.0, NEG),
            jnp.where(first_blk, o, NEG),
            jnp.where(first_blk, o, o + e * gj0),
            NEG,
        )
    elif mode == "local":
        e0 = (0.0, 0.0, 0.0, NEG)
    else:
        e0 = (0.0, NEG, 0.0, NEG)

    def border_cols(i_f):
        if mode == "global":
            return NEG, o + e * i_f, NEG, NEG
        if mode == "local":
            return 0.0, 0.0, 0.0, NEG
        return NEG, NEG, NEG, NEG

    def send_srow(srow, packed8):
        slot = jax.lax.rem(srow, 2)

        @pl.when(srow >= 2)
        def _():
            pltpu.make_async_copy(
                stage_ref.at[slot],
                ptr_ref.at[pl.ds(b0, TILE_B),
                           pl.ds((srow - 2) * SROW, SROW),
                           pl.ds(col0, c_blk)],
                sem_ref.at[slot],
            ).wait()

        stage_ref[slot] = packed8
        pltpu.make_async_copy(
            stage_ref.at[slot],
            ptr_ref.at[pl.ds(b0, TILE_B), pl.ds(srow * SROW, SROW),
                       pl.ds(col0, c_blk)],
            sem_ref.at[slot],
        ).start()

    def row_step(idx, carry):
        mp, lp, up, jpr, nM, nL, nU, nJ, acc = carry
        i = idx + 1
        i_f = jnp.float32(idx) + 1.0
        qc = _row_char(qf, iota_col, idx, c_blk)
        oh = jnp.concatenate(
            [
                (iota_col == idx - 1).astype(jnp.float32),
                (iota_col == idx).astype(jnp.float32),
            ],
            axis=1,
        )

        def edges(old):
            # Precision.HIGHEST: the MXU's default f32 dot decomposes to
            # bf16 passes, which are only exact for |values| <= 256 — DP
            # edge values far exceed that (first seen as an off-by-one at
            # target length 257)
            r = jax.lax.dot_general(
                jnp.where(jnp.isfinite(old), old, 0.0), oh,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            inf_r = jax.lax.dot_general(
                jnp.where(jnp.isfinite(old), 0.0, 1.0), oh,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            r = jnp.where(inf_r > 0.0, NEG, r)
            return r[:, 0:1], r[:, 1:2]

        eM_prev, eM_cur = edges(oldM)
        if mode == "overlap":
            # single matrix, linear gap o (alignment.h:926-964); argmax
            # order LEFT, DIAG, RIGHT (:944) — LEFT resolved by the
            # slope-o scan, pointer codes from direct comparisons like the
            # flat kernel (pallas_ptr.py), boundary plumbing like the
            # blocked score kernel: M(i-1, col-edge) diag shift-in, M(i,
            # col-edge) scan seed, col0 border M(*, 0) = 0 (:937-938).
            sh_m = jnp.where(
                first_blk, zcol,
                jnp.where(idx == 0, zcol + NEG, eM_prev),
            )
            sub = jnp.where(t == qc, match, mis)
            diag = _shift_in(mp, sh_m) + sub
            right = mp + o
            dr = jnp.maximum(diag, right)
            m_edge_cur = jnp.where(first_blk, zcol, eM_cur)  # M(i, col0)
            seed_w = m_edge_cur - o * gj0
            w = jnp.maximum(
                _cummax_lanes(dr - o * jcol_f),
                jnp.broadcast_to(seed_w, (TILE_B, c_blk)),
            )
            m_row = w + o * jcol_f
            left = _shift_in(m_row, m_edge_cur) + o
            val = jnp.maximum(left, dr)
            code = jnp.where(left >= val, 0, jnp.where(diag >= right, 1, 2))
            packed = jnp.where(val > NEG, code, 3)
            # bottom-row start scan over j in [0, n-1]; the j=0 zero
            # candidate exists only in block 0 and wins ties (scan order)
            sc, ai, bj = acc
            rowmax = jnp.max(jnp.where(mask_fin, m_row, NEG), axis=1,
                             keepdims=True)
            jarg = jnp.min(
                jnp.where(
                    (m_row == jnp.broadcast_to(rowmax, m_row.shape))
                    & mask_fin,
                    jcol, BIG,
                ),
                axis=1, keepdims=True,
            )
            score = jnp.where(first_blk, jnp.maximum(rowmax, 0.0), rowmax)
            jarg = jnp.where(first_blk & (rowmax <= 0.0), zcol_i, jarg)
            latch = i == m_col
            acc = (
                jnp.where(latch, score, sc),
                jnp.where(latch, jarg, ai),
                bj,
            )
            sel = iota_row == idx
            nM = jnp.where(
                sel, jnp.broadcast_to(m_row[:, -1:], (TILE_B, m_pad)), nM
            )
            return (m_row, lp, up, jpr, nM, nL, nU, nJ, acc), packed
        eL_prev, _ = edges(oldL)
        eU_prev, eU_cur = edges(oldU)
        eJ_prev, eJ_cur = edges(oldJ)
        bM, bL, bU, bJ = border_cols(i_f - 1.0)
        if mode in ("global", "fit"):
            bM = jnp.where(idx == 0, 0.0, bM)
            bU = jnp.where(idx == 0, o if mode == "global" else 0.0, bU)
        sh_m = jnp.where(first_blk, zcol + bM,
                         jnp.where(idx == 0, zcol + e0[0], eM_prev))
        sh_l = jnp.where(first_blk, zcol + bL,
                         jnp.where(idx == 0, zcol + e0[1], eL_prev))
        sh_u = jnp.where(first_blk, zcol + bU,
                         jnp.where(idx == 0, zcol + e0[2], eU_prev))
        sh_j = jnp.where(first_blk, zcol + bJ,
                         jnp.where(idx == 0, zcol + e0[3], eJ_prev))
        sub = jnp.where(t == qc, match, mis)
        cand_l = _shift_in(lp, sh_l) + sub
        cand_m = _shift_in(mp, sh_m) + sub
        cand_u = _shift_in(up, sh_u) + sub
        best3 = jnp.maximum(jnp.maximum(cand_l, cand_m), cand_u)
        pm = jnp.where(cand_l >= best3, 0,
                       jnp.where(cand_m >= best3, 1, 2))
        m_row = best3
        if use_jump:
            cand_j = _shift_in(jpr, sh_j) + sub
            take_j = cand_j > best3
            m_row = jnp.maximum(best3, cand_j)
            pm = jnp.where(take_j, 3, pm)
        if mode == "local":
            pm = jnp.where(m_row >= 0.0, pm, K_HOME)  # 0.0 HOME: LAST arg
            m_row = jnp.maximum(m_row, 0.0)
        pm = jnp.where(m_row > NEG, pm, K_UNSET)
        la_, lb_ = lp + e, mp + o
        l_row = jnp.maximum(la_, lb_)
        plb = jnp.where(la_ >= lb_, 0, LBIT)
        bMi, _, bUi, _ = border_cols(i_f)
        m_edge_cur = jnp.where(first_blk, zcol + bMi, eM_cur)
        u_edge_cur = jnp.where(first_blk, zcol + bUi, eU_cur)
        mh = _shift_in(m_row, m_edge_cur)
        cand = mh + o - e * jcol_f
        seed_v = u_edge_cur - e * gj0
        v = jnp.maximum(
            _cummax_lanes(cand), jnp.broadcast_to(seed_v, (TILE_B, c_blk))
        )
        u_row = v + e * jcol_f
        uh = _shift_in(u_row, u_edge_cur)
        pub = jnp.where(mh + o >= uh + e, 0, UBIT)
        if use_jump:
            j_edge_cur = jnp.where(first_blk, zcol + NEG, eJ_cur)
            jc = jnp.where(allow > 0.0, mh + jp, NEG)
            j_row = jnp.maximum(
                _cummax_lanes_flat(jc),
                jnp.broadcast_to(j_edge_cur, (TILE_B, c_blk)),
            )
            jh = _shift_in(j_row, j_edge_cur)
            pjb = jnp.where((jc > NEG) & (jc >= jh), 0, 1 << 5)
        else:
            j_row = jpr
            pjb = 0 * pm
        packed = pm | plb | pub | pjb
        sel = iota_row == idx
        bc = lambda x: jnp.broadcast_to(x, (TILE_B, m_pad))
        nM = jnp.where(sel, bc(m_row[:, -1:]), nM)
        nL = jnp.where(sel, bc(l_row[:, -1:]), nL)
        nU = jnp.where(sel, bc(u_row[:, -1:]), nU)
        if use_jump:
            nJ = jnp.where(sel, bc(j_row[:, -1:]), nJ)
        # start-info tracking within this block
        sc, ai, bj = acc
        if mode == "global":
            ln_ = jnp.max(jnp.where(mask_fin, l_row, NEG), axis=1,
                          keepdims=True)
            mn_ = jnp.max(jnp.where(mask_fin, m_row, NEG), axis=1,
                          keepdims=True)
            un_ = jnp.max(jnp.where(mask_fin, u_row, NEG), axis=1,
                          keepdims=True)
            fin = jnp.maximum(jnp.maximum(ln_, mn_), un_)
            st = jnp.where((ln_ >= mn_) & (ln_ >= un_), 0,
                           jnp.where(mn_ >= un_, 1, 2))
            latch = (i == m_col) & (fin > NEG)
            acc = (jnp.where(latch, fin, sc), jnp.where(latch, st, ai), bj)
        elif mode == "local":
            rowmax = jnp.max(jnp.where(mask_fin, m_row, NEG), axis=1,
                             keepdims=True)
            hit = (m_row == jnp.broadcast_to(rowmax, m_row.shape)) & mask_fin
            jarg = jnp.min(jnp.where(hit, jcol, BIG), axis=1, keepdims=True)
            upd = (rowmax > sc) & (i <= m_col)
            acc = (
                jnp.where(upd, rowmax, sc),
                jnp.where(upd, i, ai),
                jnp.where(upd, jarg, bj),
            )
        else:  # fit: score in sc; ai = 0 M / 1 L; bj = j
            mb_ = jnp.max(jnp.where(mask_fin, m_row, NEG), axis=1,
                          keepdims=True)
            lb2 = jnp.max(jnp.where(mask_fin, l_row, NEG), axis=1,
                          keepdims=True)
            use_l = lb2 > mb_
            fin = jnp.maximum(mb_, lb2)
            jarg = jnp.where(
                use_l,
                jnp.min(jnp.where(
                    (l_row == jnp.broadcast_to(lb2, l_row.shape)) & mask_fin,
                    jcol, BIG), axis=1, keepdims=True),
                jnp.min(jnp.where(
                    (m_row == jnp.broadcast_to(mb_, m_row.shape)) & mask_fin,
                    jcol, BIG), axis=1, keepdims=True),
            )
            latch = i == m_col
            acc = (
                jnp.where(latch, fin, sc),
                jnp.where(latch, use_l.astype(jnp.int32), ai),
                jnp.where(latch, jarg, bj),
            )
        return (m_row, l_row, u_row, j_row, nM, nL, nU, nJ, acc), packed

    rows_per_iter = rpb * SROW

    def super_row(srow, carry):
        packs = []
        for sub_i in range(rows_per_iter):
            carry, packed = row_step(srow * rows_per_iter + sub_i, carry)
            packs.append(packed)
        if rpb > 1:
            bits = 8 // rpb
            packs = [
                functools.reduce(
                    lambda a, b_: a | b_,
                    (packs[rpb * k + r] << (bits * r) for r in range(rpb)),
                )
                for k in range(SROW)
            ]
        send_srow(
            srow, jnp.stack([p_.astype(jnp.uint8) for p_ in packs], axis=1)
        )
        return carry

    acc0 = (zcol + NEG, zcol_i, zcol_i)
    init = (m_init, l_init, u_init, j_init,
            zbnd + NEG, zbnd + NEG, zbnd + NEG, zbnd + NEG, acc0)
    out = jax.lax.fori_loop(0, m_pad // rows_per_iter, super_row, init)
    nM, nL, nU, nJ, acc = out[4], out[5], out[6], out[7], out[8]
    n_srows = m_pad // rows_per_iter
    for sr in (n_srows - 2, n_srows - 1):
        if sr < 0:
            continue
        slot = sr % 2
        pltpu.make_async_copy(
            stage_ref.at[slot],
            ptr_ref.at[pl.ds(b0, TILE_B), pl.ds(sr * SROW, SROW),
                       pl.ds(col0, c_blk)],
            sem_ref.at[slot],
        ).wait()
    bnd_ref[0, :, :] = nM
    bnd_ref[1, :, :] = nL
    bnd_ref[2, :, :] = nU
    bnd_ref[3, :, :] = nJ
    sc, ai, bj = acc
    # merge this block's start info with previous blocks'
    prev_sc = jnp.where(first_blk, zcol + NEG, score_ref[:, :])
    prev_a = jnp.where(first_blk, zcol_i, a_ref[:, :])
    prev_b = jnp.where(first_blk, zcol_i + BIG, b_ref[:, :])
    if mode in ("global", "overlap"):
        # global: exactly one block holds column n; overlap: earlier block
        # = smaller j, which keeps ties (strictly-greater scan, :953)
        take = sc > prev_sc
    elif mode == "local":
        # strictly greater replaces; ties keep the earlier block, which is
        # row-major-earlier only when its i is <= ours — the reference
        # scans rows outermost, so on equal scores the SMALLER i wins,
        # and for equal i the earlier block's smaller j wins.
        take = (sc > prev_sc) | ((sc == prev_sc) & (ai < prev_a))
    else:  # fit: M (0) beats L (1) on ties; then smaller j
        take = (sc > prev_sc) | (
            (sc == prev_sc)
            & ((ai < prev_a) | ((ai == prev_a) & (bj < prev_b)))
        )
    score_ref[:, :] = jnp.where(take, sc, prev_sc)
    a_ref[:, :] = jnp.where(take, ai, prev_a)
    b_ref[:, :] = jnp.where(take, bj, prev_b)


BIG = 1 << 30


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 12))
def blocked_ptr_fill(mode, use_jump, m_pad, n_pad, c_blk, interpret,
                     qs, ts, allow, ns, ms, params, rows_per_byte=1):
    """Blocked full fill: returns (score (B,), a (B,), b (B,),
    ptrs uint8 device-resident — (B, m_pad/rows_per_byte, n_pad)).
    m_pad % (rows_per_byte * 8) == 0. rows_per_byte: 1 byte layout
    (required for fit+jump), 2 nibble, 4 two-bit (overlap only)."""
    rpb = rows_per_byte
    assert n_pad % c_blk == 0 and m_pad % (rpb * SROW) == 0
    assert rpb in (1, 2, 4) and not (rpb > 1 and use_jump)
    assert rpb < 4 or mode == "overlap"
    B = qs.shape[0]
    r_out = m_pad // rpb
    kern = functools.partial(_blocked_ptr_kernel, mode, use_jump, rpb,
                             m_pad, c_blk)
    grid = (B // TILE_B, n_pad // c_blk)
    score, a, b, ptrs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_B, m_pad), lambda g, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, c_blk), lambda g, c: (g, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, c_blk), lambda g, c: (g, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda g, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda g, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda g, c: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_B, 1), lambda g, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda g, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda g, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, r_out, n_pad), jnp.uint8),
        ),
        scratch_shapes=[
            pltpu.VMEM((4, TILE_B, m_pad), jnp.float32),
            pltpu.VMEM((2, TILE_B, SROW, c_blk), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(qs, ts, allow, ns, ms, params)
    return score[:, 0], a[:, 0], b[:, 0], ptrs
