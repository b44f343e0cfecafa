"""Batched alignment: length-bucketed, padded, vmapped device execution.

This is the throughput path the reference has no analog of (it processes one
pair per process invocation, alignment.h:503-510): thousands of pairs are
encoded int32, grouped into (m_bucket, n_bucket) shape buckets on a
quarter-octave quantum ladder (worst-case padding 1.25x per dim vs 2x for
pure powers of two; hardware-aligned rungs; coarsened toward powers of
two whenever a workload would exceed MAX_BUCKETS distinct shapes) so
each bucket compiles once, is vmapped over the batch dimension, and
executes as one device program per bucket.
Padding is mask-correct by construction: DP values flow only rightward/
downward so padded rows/columns never feed real cells, and every per-mode
extraction (final-cell gather, running argmax, bottom-row scans) masks to
the pair's true (m, n) inside the kernel — verified by the padding-
invariance tests (tests/test_batch.py).

Pointer tensors (1 byte/cell) are only materialized when alignments are
requested; score-only mode (``traceback=False``) skips them entirely for
benchmark/scale runs. Host traceback walks each pair's pointer matrix
(engine/traceback.py).

Multi-device execution shards the batch axis of each bucket over the mesh
(parallel/mesh.py wraps these same vmapped fills in shard_map).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from aligntools_tpu.backend import on_tpu as _on_tpu

from aligntools_tpu.engine import scan as _scan
from aligntools_tpu.engine import select as _select
from aligntools_tpu.engine import traceback as tb
from aligntools_tpu.params import AlignParams
from aligntools_tpu.spec.engine import AlignResult


def bucket_len(x: int, floor: int, steps: int = 1) -> int:
    """Smallest bucket quantum >= x, floored at the tile quantum.

    ``steps`` per octave: 1 gives the round-1 powers of two (worst-case
    2x padding per dim); 4 gives the quarter-octave ladder p, 1.25p,
    1.5p, 1.75p (worst-case 1.25x), snapped to hardware quanta — every
    rung is a multiple of ``floor``/4 >= 16 so m stays DMA/pack aligned
    (%16) and n stays lane aligned when floor is 128. Above the flat-
    kernel ceiling, rungs snap up to BLOCKED_C_BLK multiples (the
    column-streamed kernel requires n_pad % c_blk == 0).
    """
    b = floor
    while b < x:
        b *= 2
    if steps > 1 and b > floor:
        p = b // 2  # x is in (p, 2p]
        align = 16 if floor <= 64 else 128
        for k in range(1, steps):
            rung = -(-(p + (p * k) // steps) // align) * align
            if x <= rung < b:
                b = rung
                break
    if b > _select.PALLAS_FLAT_MAX_N_PAD:
        c = _select.BLOCKED_C_BLK
        b = -(-b // c) * c
    return b


@dataclasses.dataclass
class _Bucket:
    m_pad: int
    n_pad: int
    idx: list  # original positions
    q: np.ndarray  # [B, m_pad] int32
    t: np.ndarray  # [B, n_pad] int32
    m: np.ndarray  # [B] int32
    n: np.ndarray  # [B] int32
    allowed: np.ndarray | None = None  # [B, n_pad] bool (fit -s)


MAX_BUCKETS = 16  # total-shape budget the ladder may grow a workload to


def _bucket_keys(pairs, m_floor, n_floor, max_buckets=MAX_BUCKETS):
    """Per-pair (m_pad, n_pad) shape keys: powers of two refined by the
    quantum ladder under an explicit compile budget.

    Start from the round-1 pow2 partition (the compile-count baseline),
    then split individual pow2 buckets into finer rungs — each split is
    scored by padded cells saved per extra compiled shape, and splits
    are taken greedily while the total shape count stays within
    ``max(max_buckets, pow2 count)``. Real workloads cluster by length
    (read-length distributions are narrow), so the few buckets holding
    the mass split first: a cluster at n=3000 pads to 3072, not 4096.
    A full log-uniform length spray already spends the budget on its
    pow2 partition and degrades to exactly the round-1 behavior."""
    pow2 = [
        (bucket_len(len(q), m_floor, 1), bucket_len(len(t), n_floor, 1))
        for q, t in pairs
    ]
    groups: dict[tuple, list[int]] = {}
    for i, key in enumerate(pow2):
        groups.setdefault(key, []).append(i)
    budget = max(max_buckets, len(groups)) - len(groups)
    if budget <= 0:
        return pow2
    cands = []  # (saved_per_extra, extra, pow2_key, {idx: fine_key})
    for key, idxs in groups.items():
        base = key[0] * key[1]
        for steps in (4, 2):
            fine = {
                i: (bucket_len(len(pairs[i][0]), m_floor, steps),
                    bucket_len(len(pairs[i][1]), n_floor, steps))
                for i in idxs
            }
            extra = len(set(fine.values())) - 1
            saved = sum(base - mk * nk for mk, nk in fine.values())
            if saved > 0:
                cands.append((saved / (extra + 1), extra, key, fine))
    cands.sort(key=lambda c: -c[0])
    out = list(pow2)
    done = set()
    for _, extra, key, fine in cands:
        if key in done or extra > budget:
            continue
        done.add(key)
        budget -= extra
        for i, fk in fine.items():
            out[i] = fk
    return out


def _bucketize(pairs, sites_list, m_floor=64, n_floor=128):
    buckets: dict[tuple[int, int], _Bucket] = {}
    for k, key in enumerate(_bucket_keys(pairs, m_floor, n_floor)):
        b = buckets.get(key)
        if b is None:
            b = buckets[key] = _Bucket(key[0], key[1], [], None, None, None, None)
        b.idx.append(k)
    for b in buckets.values():
        B = len(b.idx)
        b.q = np.full((B, b.m_pad), -1, dtype=np.int32)
        b.t = np.full((B, b.n_pad), -2, dtype=np.int32)
        b.m = np.zeros(B, dtype=np.int32)
        b.n = np.zeros(B, dtype=np.int32)
        if sites_list is not None:
            b.allowed = np.ones((B, b.n_pad), dtype=bool)
        for r, k in enumerate(b.idx):
            q, t = pairs[k]
            b.q[r, : len(q)] = np.frombuffer(q, dtype=np.uint8)
            b.t[r, : len(t)] = np.frombuffer(t, dtype=np.uint8)
            b.m[r], b.n[r] = len(q), len(t)
            if sites_list is not None and sites_list[k] is not None:
                s = np.asarray(
                    [x for x in sites_list[k] if 0 <= x < b.n_pad], dtype=np.int64
                )
                b.allowed[r, s] = False
    return buckets


# vmapped fills: batch over (q, t, n, params); n_pad / flags static.
@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _vfill(qs, ts, mode, n_pad, emit_ptrs, ns, ps):
    fill = {
        "global": _scan.global_fill,
        "local": _scan.local_fill,
        "overlap": _scan.overlap_fill,
        "edit": _scan.edit_fill,
    }[mode]
    if mode == "edit":
        return jax.vmap(lambda q, t, n, p: fill(q, t, n, p, n_pad))(qs, ts, ns, ps)
    return jax.vmap(lambda q, t, n, p: fill(q, t, n, p, n_pad, emit_ptrs))(
        qs, ts, ns, ps
    )


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _vfill_fit(qs, ts, allowed, n_pad, use_jump, emit_ptrs, ns, ps):
    return jax.vmap(
        lambda q, t, a, n, p: _scan.fit_fill(
            q, t, n, p, a, n_pad, use_jump, emit_ptrs
        )
    )(qs, ts, allowed, ns, ps)


def _params_mat(p: AlignParams, ms: np.ndarray) -> jnp.ndarray:
    out = np.tile(
        np.array(
            [p.match, p.mismatch, p.gap_open, p.gap_extend, p.jump, 0],
            dtype=np.float32,
        ),
        (len(ms), 1),
    )
    out[:, 5] = ms
    return jnp.asarray(out)


def _kernel_arrays(b, params: AlignParams, tile_b: int | None = None):
    """Device input arrays for a Pallas kernel bucket, batch padded to a
    ``tile_b`` multiple (default TILE_B): (qs, ts, allow, ns, ms, pmat) as
    jnp arrays, plus the true batch size B and the host qs/ts (for the
    device walk)."""
    from aligntools_tpu.ops.pallas_scan import TILE_B

    if tile_b is None:
        tile_b = TILE_B
    B = len(b.idx)
    Bp = -(-B // tile_b) * tile_b
    qs = np.full((Bp, b.m_pad), -1, np.int32)
    ts = np.full((Bp, b.n_pad), -2, np.int32)
    qs[:B] = b.q
    ts[:B] = b.t
    ns = np.ones((Bp, 1), np.int32)
    ms = np.ones((Bp, 1), np.int32)
    ns[:B, 0] = b.n
    ms[:B, 0] = b.m
    allow = np.ones((Bp, b.n_pad), np.float32)
    if b.allowed is not None:
        allow[:B] = b.allowed.astype(np.float32)
    pmat = np.zeros((1, 8), np.float32)
    pmat[0, :5] = [params.match, params.mismatch, params.gap_open,
                   params.gap_extend, params.jump]
    dev = tuple(jnp.asarray(a) for a in (qs, ts, allow, ns, ms, pmat))
    return dev, B, qs, ts


def _chunked_bucket_scores(mode, b, params: AlignParams, use_jump: bool):
    """Score a bucket on the column-chunked XLA engine (engine/chunked.py)
    — the large-batch long-target regime (engine/select.py use_chunked)."""
    from aligntools_tpu.engine import chunked as ck

    ps = _params_mat(params, b.m)
    ns = jnp.asarray(b.n)
    qs, ts = jnp.asarray(b.q), jnp.asarray(b.t)
    if mode == "fit":
        allowed = jnp.asarray(
            b.allowed
            if b.allowed is not None
            else np.ones((len(b.idx), b.n_pad), dtype=bool)
        )
        out = ck.chunked_fit_scores(
            use_jump, qs, ts, allowed, ns, ck.DEFAULT_CHUNK, params=ps
        )
    else:
        # static param property: all penalties non-positive lets local
        # skip its per-row latch mask (chunked_scores.decaying_params)
        decay = (
            params.mismatch <= 0
            and params.gap_open <= 0
            and params.gap_extend <= 0
        )
        out = ck.chunked_scores(
            mode, qs, ts, ns, ck.DEFAULT_CHUNK, params=ps,
            decaying_params=decay,
        )
    return np.asarray(out)


def _pallas_bucket_scores(mode, b, params: AlignParams, use_jump: bool):
    """Score a bucket on the Pallas VMEM kernels (flat or column-blocked);
    interpret mode on CPU (tests)."""
    import jax

    from aligntools_tpu.ops import pallas_scan as pk

    interpret = not _on_tpu()
    blocked = _select.use_blocked(mode, b.n_pad)
    tile_b = None if blocked else _select.flat_tile_b(len(b.idx), b.n_pad)
    (qs, ts, allow, ns, ms, pmat), B, _, _ = _kernel_arrays(
        b, params, tile_b
    )
    if blocked:
        from aligntools_tpu.ops.pallas_blocked import blocked_scores

        out = blocked_scores(
            mode, use_jump and mode == "fit", b.m_pad, b.n_pad,
            _select.BLOCKED_C_BLK, interpret, qs, ts, allow, ns, ms, pmat,
        )
    elif mode == "fit":
        out = pk.pallas_fit_scores(
            use_jump, b.m_pad, b.n_pad, interpret,
            qs, ts, allow, ns, ms, pmat, tile_b=tile_b,
        )
    else:
        out = pk.pallas_scores(
            mode, b.m_pad, b.n_pad, interpret, qs, ts, ns, ms, pmat,
            tile_b=tile_b,
        )
    return np.asarray(out)[:B]


def _pallas_bucket_full(mode, b, params, use_jump, pairs, results):
    """Full-alignment bucket on the pointer-emitting Pallas kernel + the
    on-device batched walk: the pointer tensor never leaves the chip."""
    from aligntools_tpu.engine import device_tb
    from aligntools_tpu.ops import pallas_ptr as pp

    args, B, qs_np, ts_np = _kernel_arrays(b, params)
    jump = use_jump and mode == "fit"
    # pack pointers as tightly as the mode allows: overlap cells are 2
    # bits (4 rows/byte), everything else but fit+jump fits a nibble
    # (2 rows/byte) — 2-4x full-alignment capacity before HBM pressure
    if jump:
        pack = 1
    elif mode == "overlap" and b.m_pad % 32 == 0:
        pack = 4
    elif b.m_pad % 16 == 0:
        pack = 2
    else:
        pack = 1
    if _select.use_blocked(mode, b.n_pad):
        from aligntools_tpu.ops.pallas_blocked import blocked_ptr_fill

        score, a, bb, ptrs = blocked_ptr_fill(
            mode, jump, b.m_pad, b.n_pad,
            _select.BLOCKED_C_BLK, False, *args, rows_per_byte=pack
        )
    else:
        score, a, bb, ptrs = pp.pallas_ptr_fill(
            mode, jump, b.m_pad, b.n_pad, False, *args, rows_per_byte=pack
        )
    score = np.asarray(score)[:B]
    a = np.asarray(a)[:B]
    bb = np.asarray(bb)[:B]
    if mode == "fit" and not np.all(np.isfinite(score)):
        raise RuntimeError("fit: no finite traceback start (reference UB)")
    if mode == "global":
        starts = [(int(a[r]), b.m[r], b.n[r]) for r in range(B)]
    elif mode == "local":
        starts = [(1, int(a[r]), int(bb[r])) for r in range(B)]
    elif mode == "fit":
        # a = use_l (1 when L wins) -> walk states _LOW=0 / _MID=1
        starts = [(0 if int(a[r]) else 1, b.m[r], int(bb[r]))
                  for r in range(B)]
    else:  # overlap
        starts = [(0, b.m[r], int(a[r])) for r in range(B)]
    bpairs = [pairs[k] for k in b.idx]
    rows = device_tb.batch_traceback(
        mode, ptrs[:B], qs_np[:B], ts_np[:B], bpairs, starts, col_base=1,
        pack4=pack,
    )
    for r, k in enumerate(b.idx):
        results[k] = AlignResult(float(score[r]), *rows[r])


def align_batch(
    mode: str,
    pairs: Sequence[tuple[bytes, bytes]],
    params: AlignParams = AlignParams(),
    sites_list: Sequence[Sequence[int] | None] | None = None,
    traceback: bool = True,
    engine: str = "auto",
):
    """Align many pairs. Returns a list parallel to ``pairs``:
    AlignResult per pair (int for mode='edit'); with ``traceback=False``,
    AlignResults carry empty rows (score-only, no pointer tensors)."""
    if mode == "fit":
        for q, t in pairs:
            if len(q) > len(t):
                raise ValueError("first sequence must be shorter than the second")
    if pairs:
        worst = max(len(q) + len(t) for q, t in pairs)
        _scan.check_f32_exact(params, worst, 0, mode)
    use_jump = sites_list is not None
    buckets = _bucketize(pairs, sites_list if use_jump else None)
    results: list = [None] * len(pairs)
    for b in buckets.values():
        # Large-batch long-target score buckets: the column-chunked XLA
        # engine (engine/chunked.py) beats both the flat/blocked Pallas
        # kernels and the plain XLA row scan there (engine/select.py
        # use_chunked docstring for the v5e numbers).
        if (
            not traceback
            and engine == "auto"
            and _select.use_chunked(len(b.idx), b.n_pad)
        ):
            vals = _chunked_bucket_scores(mode, b, params, use_jump)
            for r, k in enumerate(b.idx):
                results[k] = (
                    int(vals[r]) if mode == "edit"
                    else AlignResult(float(vals[r]), b"", b"")
                )
            continue
        route_pallas = engine != "xla" and (
            engine == "pallas"
            or _select.use_pallas(len(b.idx), b.m_pad, b.n_pad, mode)
        )
        if not traceback and route_pallas:
            vals = _pallas_bucket_scores(mode, b, params, use_jump)
            for r, k in enumerate(b.idx):
                results[k] = (
                    int(vals[r]) if mode == "edit"
                    else AlignResult(float(vals[r]), b"", b"")
                )
            continue
        if (
            traceback
            and route_pallas
            and mode != "edit"
            and _on_tpu()
        ):
            _pallas_bucket_full(mode, b, params, use_jump, pairs, results)
            continue
        ps = _params_mat(params, b.m)
        ns = jnp.asarray(b.n)
        qs, ts = jnp.asarray(b.q), jnp.asarray(b.t)
        if mode == "edit":
            vals = np.asarray(_vfill(qs, ts, mode, b.n_pad, False, ns, ps))
            for r, k in enumerate(b.idx):
                results[k] = int(vals[r])
            continue
        # Full-alignment fills in the chunked engine's regime ride its
        # faster fill too — the pointer variants return the exact vmapped
        # fill tuples (bit-identical bytes/starts, tests/test_chunked.py),
        # so everything downstream is shared.
        chunked_full = (
            traceback
            and engine == "auto"
            and mode != "edit"
            and _select.use_chunked(len(b.idx), b.n_pad)
        )
        if mode == "fit":
            allowed = jnp.asarray(
                b.allowed
                if b.allowed is not None
                else np.ones((len(b.idx), b.n_pad), dtype=bool)
            )
            if chunked_full:
                from aligntools_tpu.engine import chunked as ck

                out = ck.chunked_fit_ptr_fill(
                    use_jump, qs, ts, allowed, ns, ck.DEFAULT_CHUNK,
                    params=ps,
                )
            else:
                out = _vfill_fit(
                    qs, ts, allowed, b.n_pad, use_jump, traceback, ns, ps
                )
        elif chunked_full:
            from aligntools_tpu.engine import chunked as ck

            out = ck.chunked_ptr_fill(
                mode, qs, ts, ns, ck.DEFAULT_CHUNK, params=ps
            )
        else:
            out = _vfill(qs, ts, mode, b.n_pad, traceback, ns, ps)
        # On TPU, walk tracebacks on the device: pulling the pointer
        # tensor through the host link costs ~25 s/GB in this environment
        # (0.04 GB/s measured); the device walk transfers only the rows.
        use_device_tb = traceback and _on_tpu()
        if use_device_tb and mode in ("global", "local", "fit", "overlap"):
            from aligntools_tpu.engine import device_tb

            bpairs = [pairs[k] for k in b.idx]
            if mode == "global":
                starts = [
                    (int(out[1][r]), b.m[r], b.n[r])
                    for r in range(len(b.idx))
                ]
                # engine start codes 0/1/2 = L/M/U match walk states
            elif mode == "local":
                starts = [
                    (1, int(out[1][r]), int(out[2][r]))
                    for r in range(len(b.idx))
                ]
            elif mode == "fit":
                starts = [
                    (1 if int(out[1][r]) == 0 else 0, b.m[r], int(out[2][r]))
                    for r in range(len(b.idx))
                ]
            else:  # overlap
                starts = [
                    (0, b.m[r], int(out[1][r])) for r in range(len(b.idx))
                ]
            scores = np.asarray(out[0])
            if mode == "fit" and not np.all(np.isfinite(scores)):
                raise RuntimeError(
                    "fit: no finite traceback start (reference UB)"
                )
            rows = device_tb.batch_traceback(
                mode, out[-1], b.q, b.t, bpairs, starts
            )
            for r, k in enumerate(b.idx):
                results[k] = AlignResult(float(scores[r]), *rows[r])
            continue
        out = jax.tree.map(np.asarray, out)
        for r, k in enumerate(b.idx):
            q, t = pairs[k]
            m, n = len(q), len(t)
            if mode == "global":
                score, state, ptrs = out[0][r], out[1][r], out[2]
                if traceback:
                    r1, r2 = tb.traceback_global(q, t, ptrs[r], int(state), m, n)
                else:
                    r1 = r2 = b""
            elif mode == "local":
                score, imax, jmax, ptrs = out[0][r], out[1][r], out[2][r], out[3]
                if traceback:
                    r1, r2 = tb.traceback_local(q, t, ptrs[r], int(imax), int(jmax))
                else:
                    r1 = r2 = b""
            elif mode == "fit":
                score, state, jmax, ptrs = out[0][r], out[1][r], out[2][r], out[3]
                if traceback:
                    if not np.isfinite(float(score)):
                        raise RuntimeError(
                            "fit: no finite traceback start (reference UB)"
                        )
                    r1, r2 = tb.traceback_fit(q, t, ptrs[r], int(state), m, int(jmax))
                else:
                    r1 = r2 = b""
            else:  # overlap
                score, jmax, ptrs = out[0][r], out[1][r], out[2]
                if traceback:
                    r1, r2 = tb.traceback_overlap(q, t, ptrs[r], m, int(jmax))
                else:
                    r1 = r2 = b""
            results[k] = AlignResult(float(score), r1, r2)
    return results


def batch_scores(
    mode: str,
    pairs: Sequence[tuple[bytes, bytes]],
    params: AlignParams = AlignParams(),
    sites_list=None,
    engine: str = "auto",
) -> np.ndarray:
    """Score-only fast path; returns float64 scores (int values for edit)."""
    res = align_batch(
        mode, pairs, params, sites_list, traceback=False, engine=engine
    )
    if mode == "edit":
        return np.asarray(res, dtype=np.int64)
    return np.asarray([r.score for r in res])
