"""Host-side traceback over packed pointer matrices from the device engine.

The pointer walk is inherently sequential and O(m+n) — tiny next to the
O(m*n) fill — so it runs on the host over the packed uint8 pointer tensor
the device wrote (1 byte/cell vs the reference's four int matrices,
alignment.h:137-146). Each walk replicates the corresponding reference
routine exactly:

  * trace_back_gla (alignment.h:372-412): walk while i>0 and j>0 from the
    chosen final state at (m, n); pad the un-consumed prefix with gaps;
  * trace_back_local_affine (:766-800): start in MID at the running-argmax
    cell; stop on HOME or the border;
  * trace_back_fit_affine_jump (:558-592): walk while i>0 only (the target
    prefix is NOT emitted); JUMP emits '-' over the target char;
  * trace_back_overlap (:896-922): walk while j>0.

Pointer byte layout: see aligntools_tpu.engine.scan module docstring.
``ptrs`` rows are emitted for i = 1..m_pad, so cell (i, j) lives at
``ptrs[i-1, j]``.

A C++ implementation of the same walks (native/) is used when built; this
NumPy/Python version is the always-available fallback and the oracle for it.
"""

from __future__ import annotations

from aligntools_tpu.engine.scan import (
    PK_J_IS_JUMP,
    PK_L_IS_MID,
    PK_M_HOME,
    PK_M_JUMP,
    PK_M_LOW,
    PK_M_MID,
    PK_M_UPP,
    PK_OV_DIAG,
    PK_OV_LEFT,
    PK_OV_RIGHT,
    PK_U_IS_UPP,
)

# walk states
_LOW, _MID, _UPP, _JUMP = 0, 1, 2, 3
_GAP = ord("-")


def _next_state(byte: int, state: int) -> int:
    """Decode the predecessor state recorded for ``state`` at this cell."""
    if state == _MID:
        code = byte & 0x7
        if code == PK_M_LOW:
            return _LOW
        if code == PK_M_MID:
            return _MID
        if code == PK_M_UPP:
            return _UPP
        if code == PK_M_JUMP:
            return _JUMP
        if code == PK_M_HOME:
            return -1  # local HOME: stop
        raise RuntimeError("traceback hit unset M pointer")
    if state == _LOW:
        return _MID if (byte & PK_L_IS_MID) else _LOW
    if state == _UPP:
        return _UPP if (byte & PK_U_IS_UPP) else _MID
    if state == _JUMP:
        return _JUMP if (byte & PK_J_IS_JUMP) else _MID
    raise RuntimeError(f"bad traceback state {state}")


def _walk(q, t, ptrs, state, i, j, stop):
    """Shared walk loop: emit (r1, r2) reversed-at-the-end byte rows.

    ``stop``: 'both' -> while i>0 and j>0 (global/local);
              'i'    -> while i>0 (fit); HOME (-1) also stops (local).
    """
    r1, r2 = bytearray(), bytearray()
    while i > 0 and (j > 0 if stop == "both" else True):
        byte = int(ptrs[i - 1, j])
        nxt = _next_state(byte, state)
        if state == _LOW:
            i -= 1
            r1.append(q[i])
            r2.append(_GAP)
        elif state == _MID:
            # NOTE: a HOME-pointered cell still emits its diagonal pair; the
            # walk stops on the NEXT iteration (reference loop structure,
            # alignment.h:774-787 case MID then case HOME).
            i -= 1
            j -= 1
            r1.append(q[i])
            r2.append(t[j])
        elif state == _UPP:
            j -= 1
            r1.append(_GAP)
            r2.append(t[j])
        elif state == _JUMP:
            j -= 1
            r1.append(_GAP)
            r2.append(t[j])
        state = nxt
        if nxt == -1:
            break
    return r1, r2, i, j


def traceback_global(q, t, ptrs, start_state: int, m: int, n: int):
    """start_state: 0=L 1=M 2=U (the reference's final max5 over L,M,U at
    (m,n), alignment.h:466-469). Unconsumed prefixes padded with gaps,
    un-scored (:398-407)."""
    from aligntools_tpu import native

    if native.available():
        return native.traceback_global_native(q, t, ptrs, start_state, m, n)
    state = (_LOW, _MID, _UPP)[start_state]
    r1, r2, i, j = _walk(q, t, ptrs, state, m, n, "both")
    while j > 0:
        j -= 1
        r1.append(_GAP)
        r2.append(t[j])
    while i > 0:
        i -= 1
        r1.append(q[i])
        r2.append(_GAP)
    return bytes(reversed(r1)), bytes(reversed(r2))


def traceback_local(q, t, ptrs, i_max: int, j_max: int):
    """Start in MID at the argmax cell (alignment.h:770)."""
    from aligntools_tpu import native

    if native.available():
        return native.traceback_local_native(q, t, ptrs, i_max, j_max)
    if i_max == 0:
        return b"", b""
    r1, r2, _, _ = _walk(q, t, ptrs, _MID, i_max, j_max, "both")
    return bytes(reversed(r1)), bytes(reversed(r2))


def traceback_fit(q, t, ptrs, start_state: int, m: int, j_max: int):
    """start_state: 0=MID 1=LOW (bottom-row scan winner, alignment.h:676-690).
    Walk while i>0; remaining target prefix NOT emitted (:562)."""
    from aligntools_tpu import native

    if native.available():
        return native.traceback_fit_native(q, t, ptrs, start_state, m, j_max)
    state = (_MID, _LOW)[start_state]
    r1, r2, _, _ = _walk(q, t, ptrs, state, m, j_max, "i")
    return bytes(reversed(r1)), bytes(reversed(r2))


def traceback_overlap(q, t, ptrs, m: int, j_max: int):
    """Single-matrix walk while j>0 (alignment.h:896-922); unset pointer is
    the reference's infinite-loop hazard (:913-914) — we fail fast."""
    from aligntools_tpu import native

    if native.available():
        return native.traceback_overlap_native(q, t, ptrs, m, j_max)
    r1, r2 = bytearray(), bytearray()
    i, j = m, j_max
    while j > 0:
        code = int(ptrs[i - 1, j]) & 0x3 if i > 0 else None
        if i <= 0 or code == 3:
            raise RuntimeError(f"overlap traceback hit unset pointer at {i},{j}")
        if code == PK_OV_LEFT:
            j -= 1
            r1.append(_GAP)
            r2.append(t[j])
        elif code == PK_OV_DIAG:
            i -= 1
            j -= 1
            r1.append(q[i])
            r2.append(t[j])
        elif code == PK_OV_RIGHT:
            i -= 1
            r1.append(q[i])
            r2.append(_GAP)
    return bytes(reversed(r1)), bytes(reversed(r2))
