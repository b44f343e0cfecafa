"""On-device batched traceback: walk all pairs' pointer matrices in parallel.

Host traceback requires pulling the packed pointer tensor off the device —
B x m x n bytes (1 GB for a 256 x 2048^2 batch). Over fast PCIe that is
~0.1 s, but through this environment's TPU tunnel (0.04 GB/s measured)
it is ~25 s, dwarfing the 45 ms fill. The walk itself is sequential per
pair but embarrassingly parallel ACROSS pairs, so this module runs it on
the device: one ``lax.scan`` over m_pad + n_pad steps, each doing a
B-element gather from the HBM-resident pointer tensor and emitting one
(char1, char2) column per pair. Only the walked rows (B x (m+n) bytes,
~2 MB) ever cross to the host, which reverses, trims, and applies the
per-mode epilogues (global's unconsumed-prefix padding).

Semantics are identical to the host walker (engine/traceback.py) and the
reference routines it mirrors (src/alignment.h:372-412, 558-592, 766-800,
896-922), including local's emit-then-stop HOME behavior and the
fail-fast on unset pointers (the reference's UB / infinite-loop hazards).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aligntools_tpu.engine.scan import (
    PK_J_IS_JUMP,
    PK_L_IS_MID,
    PK_M_UNSET,
    PK_U_IS_UPP,
)

# walk states (match native/aligntools_native.cpp)
_LOW, _MID, _UPP, _JUMP = 0, 1, 2, 3
_DONE, _ERR = 4, 5
_GAP = np.uint8(ord("-"))


def _gather_byte(ptrs, blk_chunk, bidx, row, jc):
    """One pointer byte per pair: ``ptrs`` is (B, R, C) when blk_chunk ==
    0, else the chunked engine's raw packed block layout (nblk, R, B,
    chunk) — global packed column jc decomposes into (block, lane)."""
    if blk_chunk:
        return ptrs[jc // blk_chunk, row, bidx, jc % blk_chunk]
    return ptrs[bidx, row, jc]


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _walk_affine(stop_at_j0, n_steps, col_base, pack4, code3_home,
                 blk_chunk, ptrs, qs, ts, state0, i0, j0):
    """Batched walk for global/local/fit.

    ptrs (B, R, C) uint8 (or (nblk, R, B, chunk) when ``blk_chunk`` > 0;
    see _gather_byte); qs (B, m_pad) i32; ts (B, n_pad) i32;
    state0/i0/j0 (B,) i32. stop_at_j0: True for global/local (while i>0 and
    j>0), False for fit (while i>0). ``pack4``: nibble layout
    (rows_per_byte=2) — two DP rows per byte, pM 2 bits with code 3
    meaning HOME when ``code3_home`` (local) else unset/ERR (global/fit),
    pL/pU at bits 2/3, no jump state (ops/pallas_ptr.py docstring).
    Returns stacked (n_steps, B) char columns (walk order), per-pair
    emitted length, final (i, j), err flag.
    """
    B = qs.shape[0]
    bidx = jnp.arange(B)

    def step(carry, _):
        i, j, state, count, err = carry
        active = (state < _DONE) & (i > 0)
        if stop_at_j0:
            active = active & (j > 0)
        row = jnp.maximum(i - 1, 0)
        jc = jnp.maximum(j - col_base, 0)
        if pack4:
            byte = _gather_byte(ptrs, blk_chunk, bidx, row >> 1, jc)
            byte = byte.astype(jnp.int32)
            byte = jnp.where(row & 1, byte >> 4, byte) & 0xF
            code = byte & 0x3
            code3 = jnp.int32(_DONE if code3_home else _ERR)
            nxt_mid = jnp.where(code == 3, code3, code)
            l_is_mid, u_is_upp = byte & 0x4, byte & 0x8
        else:
            byte = _gather_byte(ptrs, blk_chunk, bidx, row, jc)
            byte = byte.astype(jnp.int32)
            code = byte & 0x7
            # next-state decode per current state
            nxt_mid = jnp.where(
                code == PK_M_UNSET,
                _ERR,
                jnp.where(code <= 3, code, _DONE),  # 0-3 LOW/MID/UPP/JUMP; 4 HOME
            )
            l_is_mid, u_is_upp = byte & PK_L_IS_MID, byte & PK_U_IS_UPP
        nxt = jnp.where(
            state == _MID,
            nxt_mid,
            jnp.where(
                state == _LOW,
                jnp.where(l_is_mid, _MID, _LOW),
                jnp.where(
                    state == _UPP,
                    jnp.where(u_is_upp, _UPP, _MID),
                    jnp.where(byte & PK_J_IS_JUMP, _JUMP, _MID),
                ),
            ),
        )
        is_low = state == _LOW
        is_mid = state == _MID
        takes_q = is_low | is_mid  # consumes a query char
        takes_t = ~is_low  # MID/UPP/JUMP consume a target char
        ni = jnp.where(active & takes_q, i - 1, i)
        nj = jnp.where(active & takes_t, j - 1, j)
        qc = qs[bidx, jnp.maximum(ni, 0)].astype(jnp.uint8)
        tc = ts[bidx, jnp.maximum(nj, 0)].astype(jnp.uint8)
        c1 = jnp.where(active, jnp.where(takes_q, qc, _GAP), jnp.uint8(0))
        c2 = jnp.where(active, jnp.where(takes_t, tc, _GAP), jnp.uint8(0))
        err = err | (active & (nxt == _ERR))
        # inactive steps preserve state: a pause (i or j hit the block/walk
        # boundary) must stay distinguishable from a genuine HOME/_DONE
        # stop so the rescan engine can resume across row blocks
        state = jnp.where(active, nxt, state)
        count = count + active.astype(jnp.int32)
        return (ni, nj, state, count, err), (c1, c2)

    init = (
        i0,
        j0,
        state0,
        jnp.zeros(B, jnp.int32),
        jnp.zeros(B, bool),
    )
    (fi, fj, fstate, count, err), (cols1, cols2) = jax.lax.scan(
        step, init, None, length=n_steps
    )
    return cols1, cols2, count, fi, fj, fstate, err


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _walk_overlap(n_steps, col_base, pause_at_i0, rpb, blk_chunk, ptrs,
                  qs, ts, i0, j0):
    """Batched overlap walk (while j>0; 2-bit codes move directly).

    ``pause_at_i0``: True for the block-resumable rescan walk — at i == 0
    the walk simply stops emitting (the caller resumes in the row block
    above) instead of flagging the reference's i<=0 UB as an error.
    ``rpb``: DP rows per byte (1, 2, or 4; row rpb*k in the low bits).
    ``blk_chunk``: chunked-engine raw block layout (_gather_byte)."""
    B = qs.shape[0]
    bidx = jnp.arange(B)
    bits = 8 // rpb

    def step(carry, _):
        i, j, done, count, err = carry
        active = (~done) & (j > 0)
        if pause_at_i0:
            active = active & (i > 0)
        row = jnp.maximum(i - 1, 0)
        jc = jnp.maximum(j - col_base, 0)
        if rpb > 1:
            byte = _gather_byte(ptrs, blk_chunk, bidx, row // rpb, jc)
            byte = byte.astype(jnp.int32) >> ((row % rpb) * bits)
        else:
            byte = _gather_byte(ptrs, blk_chunk, bidx, row, jc)
        code = (byte & 0x3).astype(jnp.int32)
        bad = active & ((code == 3) | (i <= 0))
        takes_q = code != 0  # DIAG/RIGHT consume query
        takes_t = code != 2  # LEFT/DIAG consume target
        ni = jnp.where(active & takes_q, i - 1, i)
        nj = jnp.where(active & takes_t, j - 1, j)
        qc = qs[bidx, jnp.maximum(ni, 0)].astype(jnp.uint8)
        tc = ts[bidx, jnp.maximum(nj, 0)].astype(jnp.uint8)
        c1 = jnp.where(active, jnp.where(takes_q, qc, _GAP), jnp.uint8(0))
        c2 = jnp.where(active, jnp.where(takes_t, tc, _GAP), jnp.uint8(0))
        err = err | bad
        done = done | bad | (nj == 0)
        count = count + (active & ~bad).astype(jnp.int32)
        return (ni, nj, done, count, err), (c1, c2)

    init = (
        i0, j0, jnp.zeros(B, bool), jnp.zeros(B, jnp.int32),
        jnp.zeros(B, bool),
    )
    (fi, fj, done, count, err), (cols1, cols2) = jax.lax.scan(
        step, init, None, length=n_steps
    )
    return cols1, cols2, count, fi, fj, done, err


def walk_dispatch(mode, ptrs_dev, qs_np, ts_np, starts, col_base=0,
                  pack4=False, blk_chunk=0):
    """Dispatch the device walk WITHOUT any host round trip; returns an
    opaque handle for :func:`walk_collect`.

    ``starts`` is either the legacy list of per-pair (state0, i0, j0)
    tuples or a 3-tuple of device/int32 arrays — the array form lets the
    caller derive walk starts on device straight from the fill outputs,
    so fill -> walk needs NO host sync and consecutive buckets' fills
    and walks overlap on the device queue."""
    if pack4 is True:
        rpb = 2
    elif not pack4:
        rpb = 1
    else:
        rpb = int(pack4)
        assert rpb in (1, 2, 4)
    n_steps = int(qs_np.shape[1] + ts_np.shape[1] + 1)
    qs_d = jnp.asarray(qs_np)
    ts_d = jnp.asarray(ts_np)
    if isinstance(starts, tuple) and len(starts) == 3:
        state0, i0, j0 = (
            jnp.asarray(s).astype(jnp.int32) for s in starts
        )
    else:
        state0 = jnp.asarray([s[0] for s in starts], jnp.int32)
        i0 = jnp.asarray([s[1] for s in starts], jnp.int32)
        j0 = jnp.asarray([s[2] for s in starts], jnp.int32)
    if mode == "overlap":
        res = _walk_overlap(
            n_steps, col_base, False, rpb, blk_chunk, ptrs_dev, qs_d,
            ts_d, i0, j0
        )
        return ("overlap", res, None, None, None)
    stop_j0 = mode != "fit"
    if mode in ("global", "edit"):
        # global walks consume BOTH sequences: length ~ max(m,n) ~
        # n_steps, so a short first segment never finishes and only adds
        # a second compile — run the full walk in one segment
        rung = 0
    else:
        # local/fit paths live in m rows; gap runs are score-penalized,
        # so walks are ~<= 2*m in practice — size the first segment to
        # cover that, paying full n_steps only for pathological pairs
        rung = 1 << (2 * int(qs_np.shape[1]) + 64).bit_length()
    seg2 = rung and n_steps > 2 * rung
    first = rung if seg2 else n_steps
    res = _walk_affine(
        stop_j0, first, col_base, rpb == 2, mode == "local",
        blk_chunk, ptrs_dev, qs_d, ts_d, state0, i0, j0,
    )
    cont = (
        (n_steps - first, col_base, rpb, blk_chunk, ptrs_dev, qs_d,
         ts_d)
        if seg2 else None
    )
    return (mode, res, cont, stop_j0, None)


def walk_collect(handle, pairs):
    """Pull a dispatched walk's results and assemble the final rows on
    the host (running the rare full-length second walk segment when some
    pair was still mid-walk after the first; see batch_traceback)."""
    mode, res, cont, stop_j0, _ = handle

    def _pull(cols1_d, cols2_d, scalar_list):
        both = np.asarray(jnp.stack([cols1_d, cols2_d]))
        sc = np.asarray(
            jnp.stack([s.astype(jnp.int32) for s in scalar_list])
        )
        return both[0], both[1], sc

    if mode == "overlap":
        c1d, c2d, count_d, _, _, _, err_d = res
        cols1, cols2, sc = _pull(c1d, c2d, [count_d, err_d])
        count, err = sc[0], sc[1].astype(bool)
        fi = fj = None
    else:
        c1d, c2d, cnt_d, fi_d, fj_d, fst_d, err_d = res
        cols1, cols2, sc = _pull(
            c1d, c2d, [cnt_d, err_d, fi_d, fj_d, fst_d]
        )
        count, err = sc[0], sc[1].astype(bool)
        fi, fj, fst = sc[2], sc[3], sc[4]
        if cont is not None:
            alive = (fst < _DONE) & (fi > 0)
            if stop_j0:
                alive = alive & (fj > 0)
            if alive.any():
                rest, col_base, rpb, blk_chunk, ptrs_dev, qs_d, ts_d = (
                    cont
                )
                c1b, c2b, cnt2, fi2, fj2, _, err2 = _walk_affine(
                    stop_j0, rest, col_base, rpb == 2,
                    mode == "local", blk_chunk, ptrs_dev, qs_d, ts_d,
                    fst_d, fi_d, fj_d,
                )
                b1, b2, sc2 = _pull(c1b, c2b, [cnt2, err2, fi2, fj2])
                cols1 = np.concatenate([cols1, b1])
                cols2 = np.concatenate([cols2, b2])
                count = count + sc2[0]
                err = err | sc2[1].astype(bool)
                fi, fj = sc2[2], sc2[3]
    out = []
    for b in range(len(pairs)):
        if err[b]:
            raise RuntimeError(
                "traceback hit unset pointer (reference UB) in pair "
                f"{b}"
            )
        ln = int(count[b])
        r1 = bytes(cols1[:ln, b][::-1])
        r2 = bytes(cols2[:ln, b][::-1])
        if mode == "global":
            q, t = pairs[b]
            i, j = int(fi[b]), int(fj[b])
            r1 = q[:i] + b"-" * j + r1
            r2 = b"-" * i + t[:j] + r2
        out.append((r1, r2))
    return out


def batch_traceback(mode, ptrs_dev, qs_np, ts_np, pairs, starts,
                    col_base=0, pack4=False, blk_chunk=0):
    """Walk a whole bucket on-device; assemble final rows on the host.

    ``ptrs_dev``: device (B, R, C) uint8 pointer tensor (stays on device);
    ``qs_np``/``ts_np``: host (B, m_pad)/(B, n_pad) int arrays;
    ``pairs``: [(q_bytes, t_bytes)] true sequences; ``starts``: per-pair
    (state0, i0, j0) ints (state encoding of _walk_affine, ignored for
    overlap). ``col_base``: 0 when the pointer tensor includes column 0
    (XLA engine), 1 when it starts at column 1 (Pallas ptr kernel).
    ``pack4``: packed pointer tensor — truthy means rows_per_byte=2
    (nibble layout); the int 4 selects the 2-bit overlap layout
    (rows_per_byte=4; pallas_ptr.py docstring). ``blk_chunk`` > 0: the
    chunked engine's raw packed block layout (nblk, R, B, chunk), walked
    without ever assembling it (pass col_base=1 — the blocks hold
    columns 1..nblk*chunk). Returns [(row1, row2)] per pair.
    """
    return walk_collect(
        walk_dispatch(mode, ptrs_dev, qs_np, ts_np, starts, col_base,
                      pack4, blk_chunk),
        pairs,
    )
