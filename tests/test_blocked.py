"""Column-blocked streaming Pallas kernel (long targets) vs the XLA engine,
interpret mode on CPU — multi-block shapes, all affine modes, fit+jump."""

import numpy as np
import pytest

from aligntools_tpu.batch import batch_scores
from aligntools_tpu.ops.pallas_blocked import blocked_scores
from aligntools_tpu.params import AlignParams

ALPHA = list(b"ACGT")


def _bucket(pairs, m_pad, n_pad, sites=None):
    import jax.numpy as jnp

    B = len(pairs)
    qs = np.full((B, m_pad), -1, np.int32)
    ts = np.full((B, n_pad), -2, np.int32)
    ms = np.zeros((B, 1), np.int32)
    ns = np.zeros((B, 1), np.int32)
    allow = np.ones((B, n_pad), np.float32)
    for k, (q, t) in enumerate(pairs):
        qs[k, : len(q)] = np.frombuffer(q, np.uint8)
        ts[k, : len(t)] = np.frombuffer(t, np.uint8)
        ms[k, 0], ns[k, 0] = len(q), len(t)
        if sites:
            for sx in sites[k]:
                if 0 <= sx < n_pad:
                    allow[k, sx] = 0.0
    return tuple(jnp.asarray(a) for a in (qs, ts, allow, ns, ms))


@pytest.mark.parametrize("mode,use_jump", [
    ("global", False), ("local", False), ("fit", False), ("fit", True),
    ("overlap", False), ("edit", False),
])
def test_blocked_matches_xla(mode, use_jump):
    rng = np.random.default_rng(61)
    m_pad, n_pad, c_blk = 64, 512, 128  # 4 column blocks
    pairs, sites = [], []
    for _ in range(8):
        m = int(rng.integers(1, m_pad + 1))
        n = int(rng.integers(m if mode == "fit" else 1, n_pad + 1))
        if mode == "fit":
            n = max(n, m)
        pairs.append((bytes(rng.choice(ALPHA, m).tolist()),
                      bytes(rng.choice(ALPHA, n).tolist())))
        sites.append(sorted(int(x) for x in rng.integers(0, n, 3)))
    p = AlignParams(match=2, mismatch=-3, gap_open=-4, gap_extend=-1)
    args = _bucket(pairs, m_pad, n_pad, sites if use_jump else None)
    import jax.numpy as jnp

    params = np.zeros((1, 8), np.float32)
    params[0, :5] = [p.match, p.mismatch, p.gap_open, p.gap_extend, p.jump]
    got = np.asarray(blocked_scores(
        mode, use_jump, m_pad, n_pad, c_blk, True, *args, jnp.asarray(params)
    )).astype(np.float64)
    want = batch_scores(mode, pairs, p,
                        sites_list=sites if use_jump else None)
    if mode == "edit":
        got = got.astype(np.int64)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("mode,use_jump,pack", [
    ("global", False, 1), ("local", False, 1),
    ("fit", True, 1), ("overlap", False, 1),
    ("global", False, 2), ("local", False, 2),
    ("fit", False, 2), ("overlap", False, 2), ("overlap", False, 4),
])
def test_blocked_ptr_rows(mode, use_jump, pack):
    """Blocked pointer kernel + device walk (interpret): rows bit-identical
    to the XLA full-alignment path across multiple column blocks."""
    import jax.numpy as jnp
    from aligntools_tpu.batch import align_batch
    from aligntools_tpu.engine import device_tb
    from aligntools_tpu.ops.pallas_blocked import blocked_ptr_fill

    rng = np.random.default_rng(67)
    B, m_pad, n_pad, c_blk = 8, 64, 512, 128
    pairs, sites = [], []
    for _ in range(B):
        m = int(rng.integers(1, m_pad + 1))
        n = int(rng.integers(m if mode == "fit" else 1, n_pad + 1))
        if mode == "fit":
            n = max(n, m)
        pairs.append((bytes(rng.choice(ALPHA, m).tolist()),
                      bytes(rng.choice(ALPHA, n).tolist())))
        sites.append(sorted(int(x) for x in rng.integers(0, n, 3)))
    p = AlignParams(match=2, mismatch=-3, gap_open=-4, gap_extend=-1)
    qs = np.full((B, m_pad), -1, np.int32)
    ts = np.full((B, n_pad), -2, np.int32)
    ms = np.zeros((B, 1), np.int32)
    ns = np.zeros((B, 1), np.int32)
    allow = np.ones((B, n_pad), np.float32)
    for k, (q, t) in enumerate(pairs):
        qs[k, : len(q)] = np.frombuffer(q, np.uint8)
        ts[k, : len(t)] = np.frombuffer(t, np.uint8)
        ms[k, 0], ns[k, 0] = len(q), len(t)
        if use_jump:
            for sx in sites[k]:
                allow[k, sx] = 0.0
    params = np.zeros((1, 8), np.float32)
    params[0, :5] = [p.match, p.mismatch, p.gap_open, p.gap_extend, p.jump]
    args = tuple(jnp.asarray(x) for x in (qs, ts, allow, ns, ms, params))
    score, a, b, ptrs = blocked_ptr_fill(
        mode, use_jump, m_pad, n_pad, c_blk, True, *args, rows_per_byte=pack
    )
    assert ptrs.shape[1] == m_pad // pack
    score, a, b = np.asarray(score), np.asarray(a), np.asarray(b)
    want = align_batch(mode, pairs, p, sites_list=sites if use_jump else None)
    assert np.array_equal(score.astype(np.float64), [w.score for w in want])
    if mode == "global":
        starts = [(int(a[k]), int(ms[k, 0]), int(ns[k, 0])) for k in range(B)]
    elif mode == "local":
        starts = [(1, int(a[k]), int(b[k])) for k in range(B)]
    elif mode == "overlap":
        starts = [(0, int(ms[k, 0]), int(a[k])) for k in range(B)]
    else:
        starts = [(0 if int(a[k]) else 1, int(ms[k, 0]), int(b[k]))
                  for k in range(B)]
    rows = device_tb.batch_traceback(mode, ptrs, qs, ts, pairs, starts,
                                     col_base=1, pack4=pack)
    for k in range(B):
        assert rows[k] == (want[k].row1, want[k].row2), (mode, k)
