"""Adaptive early-exit lane scans (ops/pallas_scan._adaptive_scan).

The adaptive scan must equal the plain Hillis-Steele prefix scan on EVERY
input: the early exit may only fire at the fixpoint. These tests construct
inputs that deterministically take each branch (monotone rows -> early
exit; an early spike propagating the full width -> the lax.cond tail) and
check the kernels end-to-end under both settings of the kill switch.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from aligntools_tpu.ops import pallas_scan as ps


def _np_cummax(v):
    return np.maximum.accumulate(v, axis=1)


@pytest.mark.parametrize("twolevel", [True, False])
@pytest.mark.parametrize("w", [4, 8, 9, 16, 17, 128, 300, 2048])
def test_adaptive_equals_prefix_max(w, twolevel, monkeypatch):
    monkeypatch.setattr(ps, "_TWOLEVEL_OVERRIDE", twolevel)
    rng = np.random.default_rng(w)
    for trial in range(4):
        v = rng.normal(0, 10, (8, w)).astype(np.float32)
        v[0, 0] = 1e6          # spike: max must propagate the full width
        v[1, :] = -np.inf      # all -inf row (global-mode borders)
        if w > 3:
            v[2, 3] = 500.0    # mid spike
        got = np.asarray(
            ps._adaptive_scan(jnp.asarray(v), jnp.maximum, ps.NEG, 3)
        )
        assert np.array_equal(got, _np_cummax(v)), (w, trial)
        gmin = np.asarray(
            ps._adaptive_scan(jnp.asarray(-v), jnp.minimum, float("inf"), 3)
        )
        assert np.array_equal(gmin, np.minimum.accumulate(-v, axis=1))


@pytest.mark.parametrize("w", [256, 384, 2048, 8192])
def test_twolevel_tail_exact(w, monkeypatch):
    """Two-level tail (window-128 passes + narrow cross-block scan +
    exclusive broadcast) vs the flat doubling tail, from every legal
    entry window, on data with block-crossing propagation."""
    rng = np.random.default_rng(w)
    v = rng.normal(0, 10, (8, w)).astype(np.float32)
    v[0, 0] = 1e6
    v[2, 129] = 900.0   # propagates across many blocks
    v[4, :] = -np.inf
    want = _np_cummax(v)
    for k in (1, 8, 128):
        # entry window k means v already holds trailing-k-window maxima
        vin = jnp.asarray(v)
        kk = 1
        while kk < k:
            vin = ps._scan_pass(vin, kk, jnp.maximum, ps.NEG)
            kk *= 2
        got = np.asarray(
            ps._scan_tail_twolevel(vin, k, w, jnp.maximum, ps.NEG)
        )
        assert np.array_equal(got, want), (w, k)
        gmin = np.asarray(
            ps._scan_tail_twolevel(
                -jnp.asarray(v) if k == 1 else ps._scan_tail(
                    jnp.asarray(-v), 1, k, jnp.minimum, float("inf")
                ),
                k, w, jnp.minimum, float("inf"),
            )
        )
        assert np.array_equal(gmin, np.minimum.accumulate(-v, axis=1))


def test_adaptive_mid_distance_propagation():
    """Propagation distance ~50 lanes: fails the first (window-16) check,
    is absorbed by the second-stage window — must still be exact."""
    w = 2048
    base = np.tile(np.arange(w, dtype=np.float32) * 0.1, (8, 1))
    base[:, 100] += 5.0   # carries ~50 lanes before the slope catches up
    base[3, 700] += 11.0  # deeper: ~110 lanes, exercises the full tail
    got = np.asarray(
        ps._adaptive_scan(jnp.asarray(base), jnp.maximum, ps.NEG, 3)
    )
    assert np.array_equal(got, _np_cummax(base))


@pytest.mark.parametrize("w", [32, 2048])
def test_adaptive_early_exit_branch(w):
    """Monotone rows converge before the check pass — the early-exit
    branch must still return the exact prefix max."""
    rng = np.random.default_rng(7)
    m = np.cumsum(np.abs(rng.normal(0, 1, (8, w))), axis=1).astype(np.float32)
    for pre in (2, 3, 4):
        got = np.asarray(
            ps._adaptive_scan(jnp.asarray(m), jnp.maximum, ps.NEG, pre)
        )
        assert np.array_equal(got, _np_cummax(m))


def test_kernels_identical_with_and_without_adaptive(monkeypatch):
    """pallas_scores (interpret mode) must be bit-identical whether the
    adaptive scan is enabled or not, on data that exercises deep
    propagation (long gap chains) in every mode."""
    rng = np.random.default_rng(3)
    B, m_pad, n_pad = 8, 64, 512
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    qs = rng.choice(alpha, (B, m_pad)).astype(np.int32)
    ts = rng.choice(alpha, (B, n_pad)).astype(np.int32)
    # pair 0: query is a substring of the target separated by a huge
    # insert -> optimal path opens a gap spanning most of the row, which
    # forces the in-row scan's max to propagate far
    ts[0, :] = ord("C")
    ts[0, :16] = qs[0, :16]
    ts[0, -48:] = qs[0, 16:]
    ns = np.full((B, 1), n_pad, np.int32)
    ms = np.full((B, 1), m_pad, np.int32)
    pm = np.zeros((1, 8), np.float32)
    pm[0, :5] = [1, -2, -5, -1, -10]
    args = tuple(jnp.asarray(a) for a in (qs, ts, ns, ms, pm))

    results = {}
    for pre in (3, 0):  # adaptive vs unconditional full scan
        monkeypatch.setattr(ps, "_PRE_OVERRIDE", pre)
        ps.pallas_scores.clear_cache()
        results[pre] = {
            mode: np.asarray(
                ps.pallas_scores(mode, m_pad, n_pad, True, *args)
            )
            for mode in ("global", "local", "overlap", "edit")
        }
    ps.pallas_scores.clear_cache()
    for mode in results[3]:
        assert np.array_equal(results[3][mode], results[0][mode]), mode


def test_danger_scan_cap_truncates(monkeypatch):
    """ALIGNTOOLS_DANGER_SCAN_CAP (timing-decomposition knob,
    benchmarks/decompose_flat.py): a full-size cap is a no-op; cap=1
    actually truncates (scores go wrong by design). Guards the plumbing
    so the decomposition measures what it claims."""
    rng = np.random.default_rng(3)
    v = rng.normal(0, 10, (8, 64)).astype(np.float32)
    v[0, 0] = 1e6  # must propagate the full width when uncapped
    want = _np_cummax(v)

    monkeypatch.setenv("ALIGNTOOLS_DANGER_SCAN_CAP", "6")  # log2(64)
    got = np.asarray(ps._scan_tail(jnp.asarray(v), 1, 64, jnp.maximum,
                                   ps.NEG))
    assert np.array_equal(got, want)

    monkeypatch.setenv("ALIGNTOOLS_DANGER_SCAN_CAP", "1")
    got1 = np.asarray(ps._scan_tail(jnp.asarray(v), 1, 64, jnp.maximum,
                                    ps.NEG))
    assert not np.array_equal(got1, want)

    monkeypatch.delenv("ALIGNTOOLS_DANGER_SCAN_CAP")
    got_full = np.asarray(ps._scan_tail(jnp.asarray(v), 1, 64, jnp.maximum,
                                        ps.NEG))
    assert np.array_equal(got_full, want)
