"""Pointer-emitting Pallas kernels: full-alignment path at kernel speeds.

Extends the flat score kernels (pallas_scan.py) with per-cell packed
pointer emission (the same <=6-bit uint8 layout as engine/scan.py) and
on-device traceback-start info, so the complete alignment pipeline —
fill + packed pointers + batched device walk (engine/device_tb.py) — runs
on the chip with only the walked rows crossing the host link.

With ``rows_per_byte=2`` (every mode except fit+jump) each cell needs
only 4 bits — pM is 2 bits because code 3 doubles as the mode's fourth
value (HOME for local, where M = max(..., 0) is never -inf; UNSET for
global/fit, which have no HOME) plus the pL/pU flag bits at 1<<2 /
1<<3 — so TWO consecutive DP rows share one byte (row 2k in the low
bits) and the pointer tensor is (B, m_pad/2, n_pad): half the HBM of
the byte layout, doubling the full-alignment bucket capacity. Overlap's
codes are only 2 bits (LEFT/DIAG/RIGHT/unset), so it also supports
``rows_per_byte=4`` — FOUR rows per byte, 4x capacity. fit+jump keeps
the byte layout: pM spans 5 values (LOW/MID/UPP/JUMP/unset) and pJ
needs its own bit — 40 states cannot fit a nibble. Decode lives in
engine/device_tb.py (one shift+mask per walk step; the walk is
gather-bound, so free).

Pointer rows are built in a double-buffered VMEM staging buffer and
DMA'd to the HBM-resident output tensor row by row, overlapping the next
row's compute (the classic Pallas double-buffering pattern); the output
tensor holds columns 1..n_pad (the column-0 border is never walked
through), one byte per cell.

Start-info outputs replicate the reference's start rules exactly
(earliest-argument strict-> ties; see engine/scan.py):
  * global: argmax state over (L, M, U) at (m, n) (alignment.h:466-469);
  * local:  running strictly-greater argmax of M in row-major order
    (:830-833) -> (i_max, j_max);
  * fit:    bottom-row scan over j in [0, n-1], M beats L on ties,
    smallest j within each (:672-690) -> (state, j_max);
  * overlap: bottom-row scan with the j=0 zero candidate first (:950-959).
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
    _row_char,
    _shift_in,
    _u_row,
)

NEG = float("-inf")
BIG = 1 << 30
SROW = 8  # rows per staged DMA super-row (uint8 HBM slices need dim-1 % 8)  # plain int: jnp constants captured by a kernel fail to trace

# packed-byte fields (engine/scan.py layout)
PK_LOW, PK_MID, PK_UPP, PK_JUMP, PK_HOME, PK_UNSET = 0, 1, 2, 3, 4, 7
PK_L_IS_MID = 1 << 3
PK_U_IS_UPP = 1 << 4
PK_J_IS_JUMP = 1 << 5


def _argsel(cands, codes):
    """Running earliest-argument argmax: returns (best, code) with strict->
    semantics (a later candidate must EXCEED to take over)."""
    best, code = cands[0], codes[0]
    for c, k in zip(cands[1:], codes[1:]):
        take = c > best  # strictly greater: earlier argument keeps ties
        best = jnp.maximum(best, c)
        code = jnp.where(take, k, code)
    return best, code


def _first_eq_j(vec, target, mask, jcol):
    """Smallest column index where vec == target within mask (int32 (8,1))."""
    hit = (vec == jnp.broadcast_to(target, vec.shape)) & mask
    return jnp.min(jnp.where(hit, jcol, BIG), axis=1, keepdims=True)


def _ptr_kernel(mode, use_jump, rpb, m_pad, n_pad,
                q_ref, t_ref, allow_ref, n_ref, m_ref, p_ref,
                score_ref, a_ref, b_ref, ptr_ref, stage_ref, sem_ref):
    """Unified pointer-emitting kernel: mode in global/local/fit/overlap.

    Outputs: score (8,1) f32; a/b (8,1) i32 start info (global: a=state;
    local: a=i_max, b=j_max; fit: a=state(0 MID/1 LOW), b=j_max; overlap:
    a=j_max); ptr (TILE_B, m_pad/rpb, n_pad) uint8 in HBM (cols
    1..n_pad) with ``rpb`` DP rows packed per byte (module docstring).
    """
    if rpb > 1:
        # packed layout: pM 2 bits (3 = HOME for local, UNSET for
        # global/fit), pL at 1<<2, pU at 1<<3; no jump state
        K_HOME = K_UNSET = 3
        LBIT, UBIT = 1 << 2, 1 << 3
    else:
        K_HOME, K_UNSET = PK_HOME, PK_UNSET
        LBIT, UBIT = PK_L_IS_MID, PK_U_IS_UPP
    match, mis = p_ref[0, 0], p_ref[0, 1]
    o, e, jp = p_ref[0, 2], p_ref[0, 3], p_ref[0, 4]
    t = t_ref[:, :].astype(jnp.float32)
    qf = q_ref[:, :].astype(jnp.float32)
    iota_col = jax.lax.broadcasted_iota(jnp.int32, (m_pad, 1), 0)
    n_col = n_ref[:, :]
    m_col = m_ref[:, :]
    jcol = jax.lax.broadcasted_iota(jnp.int32, (TILE_B, n_pad), 1) + 1
    jcol_f = jcol.astype(jnp.float32)
    mask_le_n = jcol <= n_col
    mask_eq_n = jcol == n_col
    mask_lt_n = jcol <= n_col - 1
    zrow = t * 0.0
    zcol = jnp.max(zrow, axis=1, keepdims=True)
    zcol_i = jnp.int32(0) * jnp.max(t_ref[:, :], axis=1, keepdims=True)
    if use_jump:
        allow = allow_ref[:, :]

    if mode == "global":
        m_init, l_init = zrow + NEG, zrow + NEG
        u_init = zrow + o + e * jcol_f
    elif mode in ("local",):
        m_init = l_init = u_init = zrow
    elif mode == "fit":
        m_init, l_init, u_init = zrow, zrow + NEG, zrow
    else:  # overlap: single matrix; row0=-inf for cols>=1
        m_init, l_init, u_init = zrow + NEG, zrow, zrow
    j_init = zrow + NEG

    # ANY-space outputs are whole-array refs; this program's batch rows
    # start at g*TILE_B. uint8 DMA slices must be 4-row aligned on the
    # second-minor axis, and Mosaic cannot store to a dynamic sublane
    # index, so the loop body processes FOUR rows per iteration (Python-
    # unrolled — also amortizes per-row overheads), stacks their packed
    # bytes statically, and ships the super-row per iteration
    # (double-buffered DMA).
    b0 = pl.program_id(0) * TILE_B

    def send_srow(srow, packed4):
        slot = jax.lax.rem(srow, 2)

        @pl.when(srow >= 2)
        def _():
            pltpu.make_async_copy(
                stage_ref.at[slot],
                ptr_ref.at[pl.ds(b0, TILE_B), pl.ds((srow - 2) * SROW, SROW), :],
                sem_ref.at[slot],
            ).wait()

        stage_ref[slot] = packed4

        pltpu.make_async_copy(
            stage_ref.at[slot],
            ptr_ref.at[pl.ds(b0, TILE_B), pl.ds(srow * SROW, SROW), :],
            sem_ref.at[slot],
        ).start()

    def row_step(idx, carry):
        mp, lp, up, jpr, acc = carry
        i = idx + 1
        i_f = jnp.float32(idx) + 1.0
        qc = _row_char(qf, iota_col, idx, n_pad)
        sub = jnp.where(t == qc, match, mis)
        if mode == "overlap":
            # arg order LEFT, DIAG, RIGHT (alignment.h:944); LEFT via the
            # slope-o scan; pointers from direct comparisons
            diag = _shift_in(mp, zcol) + sub
            right = mp + o
            dr = jnp.maximum(diag, right)
            cand = dr - o * jcol_f
            m_row = jnp.maximum(
                _cummax_lanes(cand), 0.0
            ) + o * jcol_f
            left = _shift_in(m_row, zcol) + o
            val = jnp.maximum(left, dr)
            code = jnp.where(
                left >= val, 0,
                jnp.where(diag >= right, 1, 2),
            )
            code = jnp.where(val > NEG, code, 3)
            rowmax = jnp.max(
                jnp.where(mask_lt_n, m_row, NEG), axis=1, keepdims=True
            )
            jarg = _first_eq_j(m_row, rowmax, mask_lt_n, jcol)
            score = jnp.maximum(rowmax, 0.0)
            jarg = jnp.where(rowmax > 0.0, jarg, 0)  # j=0 zero-candidate
            latch = i == m_col
            acc = (
                jnp.where(latch, score, acc[0]),
                jnp.where(latch, jarg, acc[1]),
                acc[2],
            )
            return (m_row, lp, up, jpr, acc), code
        # --- affine family ---
        if mode == "global":
            mb = zcol + jnp.where(idx == 0, 0.0, NEG)
            lb = zcol + (o + e * (i_f - 1.0))
            ub = zcol + jnp.where(idx == 0, o, NEG)
            u0 = NEG
        elif mode == "local":
            mb = lb = ub = zcol
            u0 = 0.0
        else:  # fit
            mb = zcol + jnp.where(idx == 0, 0.0, NEG)
            lb = zcol + NEG
            ub = zcol + jnp.where(idx == 0, 0.0, NEG)
            u0 = NEG
        sh_l, sh_m, sh_u = _shift_in(lp, lb), _shift_in(mp, mb), _shift_in(up, ub)
        cands = [sh_l + sub, sh_m + sub, sh_u + sub]
        codes = [PK_LOW, PK_MID, PK_UPP]
        if use_jump:
            cands.append(_shift_in(jpr, zcol + NEG) + sub)
            codes.append(PK_JUMP)
        if mode == "local":
            cands.append(zrow)  # the 0.0 HOME candidate (NO +sub)
            codes.append(K_HOME)
        m_row, pm = _argsel(cands, codes)
        pm = jnp.where(m_row > NEG, pm, K_UNSET)
        la, lb2 = lp + e, mp + o
        l_row = jnp.maximum(la, lb2)
        plbit = jnp.where(la >= lb2, 0, LBIT)
        # _u_row's shift-in border is M(i, 0) of the CURRENT row:
        # global/fit -inf, local 0 (col-0 borders, alignment.h:428-441 /
        # 612-617 / calloc)
        m_border_cur = zcol + (0.0 if mode == "local" else NEG)
        u_row = _u_row(m_row, m_border_cur, u0, o, e, jcol_f)
        ua = _shift_in(m_row, m_border_cur) + o
        ub2 = _shift_in(u_row, zcol + (0.0 if mode == "local" else NEG)) + e
        pubit = jnp.where(ua >= ub2, 0, UBIT)
        if use_jump:
            jc = jnp.where(allow > 0.0, _shift_in(m_row, m_border_cur) + jp,
                           NEG)
            j_row = _cummax_lanes_flat(jc)
            jb = _shift_in(j_row, zcol + NEG)
            pjbit = jnp.where(
                (jc > NEG) & (jc >= jb), 0, PK_J_IS_JUMP
            )
        else:
            j_row = jpr
            pjbit = 0 * pm
        packed = pm | plbit | pubit | pjbit
        # start-info tracking
        if mode == "global":
            ln = jnp.max(jnp.where(mask_eq_n, l_row, NEG), axis=1,
                         keepdims=True)
            mn = jnp.max(jnp.where(mask_eq_n, m_row, NEG), axis=1,
                         keepdims=True)
            un = jnp.max(jnp.where(mask_eq_n, u_row, NEG), axis=1,
                         keepdims=True)
            score = jnp.maximum(jnp.maximum(ln, mn), un)
            st = jnp.where(
                (ln >= mn) & (ln >= un), 0, jnp.where(mn >= un, 1, 2)
            )
            latch = i == m_col
            acc = (
                jnp.where(latch, score, acc[0]),
                jnp.where(latch, st, acc[1]),
                acc[2],
            )
        elif mode == "local":
            rowmax = jnp.max(jnp.where(mask_le_n, m_row, NEG), axis=1,
                             keepdims=True)
            upd = (rowmax > acc[0]) & (i <= m_col)
            jarg = _first_eq_j(m_row, rowmax, mask_le_n, jcol)
            acc = (
                jnp.where(upd, rowmax, acc[0]),
                jnp.where(upd, i, acc[1]),
                jnp.where(upd, jarg, acc[2]),
            )
        else:  # fit
            mbst = jnp.max(jnp.where(mask_lt_n, m_row, NEG), axis=1,
                           keepdims=True)
            lbst = jnp.max(jnp.where(mask_lt_n, l_row, NEG), axis=1,
                           keepdims=True)
            use_l = lbst > mbst
            score = jnp.maximum(mbst, lbst)
            jarg = jnp.where(
                use_l,
                _first_eq_j(l_row, lbst, mask_lt_n, jcol),
                _first_eq_j(m_row, mbst, mask_lt_n, jcol),
            )
            latch = i == m_col
            acc = (
                jnp.where(latch, score, acc[0]),
                jnp.where(latch, use_l.astype(jnp.int32), acc[1]),
                jnp.where(latch, jarg, acc[2]),
            )
        return (m_row, l_row, u_row, j_row, acc), packed

    rows_per_iter = rpb * SROW

    def super_row(srow, carry):
        packs = []
        for sub in range(rows_per_iter):
            carry, packed = row_step(srow * rows_per_iter + sub, carry)
            packs.append(packed)
        if rpb > 1:
            # DP rows rpb*k .. rpb*k+rpb-1 share a byte, row rpb*k in
            # the low bits
            bits = 8 // rpb
            packs = [
                functools.reduce(
                    lambda a, bvv: a | bvv,
                    (packs[rpb * k + r] << (bits * r) for r in range(rpb)),
                )
                for k in range(SROW)
            ]
        packed4 = jnp.stack(
            [pk.astype(jnp.uint8) for pk in packs], axis=1
        )  # (TILE_B, SROW, n_pad)
        send_srow(srow, packed4)
        return carry

    acc0 = (zcol + NEG, zcol_i, zcol_i)
    *_, acc = jax.lax.fori_loop(
        0, m_pad // rows_per_iter, super_row,
        (m_init, l_init, u_init, j_init, acc0),
    )
    # drain the last two in-flight super-row DMAs
    n_srows = m_pad // rows_per_iter
    for sr in (n_srows - 2, n_srows - 1):
        if sr < 0:
            continue
        slot = sr % 2
        pltpu.make_async_copy(
            stage_ref.at[slot],
            ptr_ref.at[pl.ds(b0, TILE_B), pl.ds(sr * SROW, SROW), :],
            sem_ref.at[slot],
        ).wait()
    score_ref[:, :] = acc[0]
    a_ref[:, :] = acc[1]
    b_ref[:, :] = acc[2]


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 11))
def pallas_ptr_fill(mode, use_jump, m_pad, n_pad, interpret,
                    qs, ts, allow, ns, ms, params, rows_per_byte=1):
    """Full fill with packed pointer emission. Returns (score (B,), a (B,),
    b (B,), ptrs uint8 device-resident — (B, m_pad/rows_per_byte, n_pad);
    decode via engine/device_tb). m_pad must be a multiple of
    rows_per_byte * SROW (uint8 DMA super-row alignment). rows_per_byte:
    1 = byte layout (required for fit+jump: 6-bit cells); 2 = nibble
    layout (any mode but fit+jump); 4 = 2-bit layout (overlap only)."""
    rpb = rows_per_byte
    assert rpb in (1, 2, 4) and m_pad % (rpb * SROW) == 0
    assert not (rpb > 1 and use_jump)
    assert rpb < 4 or mode == "overlap"
    B = qs.shape[0]
    r_out = m_pad // rpb
    kern = functools.partial(_ptr_kernel, mode, use_jump, rpb, m_pad, n_pad)
    grid = (B // TILE_B,)
    score, a, b, ptrs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_B, m_pad), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, n_pad), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, n_pad), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda g: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_B, 1), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # whole (B, m_pad, n_pad)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, r_out, n_pad), jnp.uint8),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, TILE_B, SROW, n_pad), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        **(
            {}
            if interpret
            else {
                # live set: ts/allow input blocks + ~8 (TILE_B, n_pad)
                # f32/i32 rows + the 2x(TILE_B, SROW, n_pad) u8 DMA
                # scratch; the Mosaic default 16 MiB scoped limit
                # rejects n_pad 32768 by ~1.3 MiB (v5e has 128 MiB)
                "compiler_params": pltpu.CompilerParams(
                    vmem_limit_bytes=int(min(
                        100 * 2**20,
                        max(16 * 2**20, 48 * TILE_B * n_pad * 4),
                    )),
                ),
            }
        ),
    )(qs, ts, allow, ns, ms, params)
    return score[:, 0], a[:, 0], b[:, 0], ptrs
