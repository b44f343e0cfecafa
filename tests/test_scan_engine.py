"""Parity: JAX row-scan device engine vs the NumPy spec oracle.

The spec engine is itself differentially tested against the compiled
reference binary (test_differential.py), so spec parity here transitively
gives reference parity. Covers all five modes, randomized lengths/params/
alphabets (including tie-heavy binary alphabets), fit with and without
junction sites, and the golden fixtures.
"""

import numpy as np
import pytest

from aligntools_tpu.engine.scan import scan_align
from aligntools_tpu.io.fasta import read_pair
from aligntools_tpu.params import AlignParams
from aligntools_tpu.spec import engine as spec

ALPHABETS = [b"ACGT", b"AB", b"ACDEFGHIKLMNPQRSTVWY"]


def _rand_seq(rng, lo, hi, alphabet):
    n = int(rng.integers(lo, hi + 1))
    return bytes(rng.choice(list(alphabet), n).tolist())


def _rand_params(rng):
    return AlignParams(
        match=int(rng.integers(1, 5)),
        mismatch=int(rng.integers(-4, 1)),
        gap_open=int(rng.integers(-8, 0)),
        gap_extend=int(rng.integers(-3, 0)),
        jump=int(rng.integers(-12, 0)),
    )


@pytest.mark.parametrize("mode", ["global", "local", "overlap"])
def test_random_pairs(mode):
    rng = np.random.default_rng(hash(mode) % 2**32)
    spec_fn = getattr(spec, f"spec_{mode}")
    for i in range(40):
        alpha = ALPHABETS[i % len(ALPHABETS)]
        q = _rand_seq(rng, 1, 90, alpha)
        t = _rand_seq(rng, 1, 90, alpha)
        p = _rand_params(rng)
        want = spec_fn(q, t, p)
        got = scan_align(mode, q, t, p)
        assert got.score == want.score, (mode, i, q, t, p)
        assert got.row1 == want.row1, (mode, i, q, t, p)
        assert got.row2 == want.row2, (mode, i, q, t, p)


def test_random_fit():
    rng = np.random.default_rng(7)
    for i in range(40):
        alpha = ALPHABETS[i % len(ALPHABETS)]
        q = _rand_seq(rng, 1, 40, alpha)
        t = _rand_seq(rng, len(q), 120, alpha)
        p = _rand_params(rng)
        sites = None
        if i % 2:
            k = int(rng.integers(0, 6))
            sites = sorted(int(x) for x in rng.integers(0, len(t), k))
        want = spec.spec_fit(q, t, p, sites)
        got = scan_align("fit", q, t, p, sites)
        assert got.score == want.score, (i, q, t, p, sites)
        assert got.row1 == want.row1, (i, q, t, p, sites)
        assert got.row2 == want.row2, (i, q, t, p, sites)


def test_random_edit():
    rng = np.random.default_rng(11)
    for i in range(30):
        alpha = ALPHABETS[i % len(ALPHABETS)]
        q = _rand_seq(rng, 1, 120, alpha)
        t = _rand_seq(rng, 1, 120, alpha)
        p = AlignParams(mismatch=int(rng.integers(-3, 3)))
        assert scan_align("edit", q, t, p) == spec.spec_edit(q, t, p)


def test_golden_fixtures(fixtures):
    pg = read_pair(fixtures["global"])
    r = scan_align("global", pg.seq1, pg.seq2, AlignParams())
    assert r.score == 42.0
    r = scan_align(
        "global", pg.seq1, pg.seq2,
        AlignParams(match=1, mismatch=-1, gap_open=-4, gap_extend=-1),
    )
    assert r.score == 49.0

    pl = read_pair(fixtures["local"])
    r = scan_align("local", pl.seq1, pl.seq2, AlignParams())
    assert r.score == 2.0 and r.row1 == b"LEA" and r.row2 == b"MEA"

    pe = read_pair(fixtures["edit"])
    assert scan_align("edit", pe.seq1, pe.seq2, AlignParams()) == 176
    assert scan_align("edit", pe.seq1, pe.seq2, AlignParams(mismatch=1)) == 683

    r = scan_align("overlap", pg.seq1, pg.seq2, AlignParams())
    assert r.score == 16.0

    # micro cases from SURVEY.md §4
    r = scan_align("global", b"ACGT", b"AGT", AlignParams())
    assert r.score == -2.0 and r.row1 == b"ACGT" and r.row2 == b"A-GT"
    r = scan_align("overlap", b"ACGT", b"AGT", AlignParams())
    assert r.score == 0.0 and r.row1 == b"" and r.row2 == b""


def test_golden_fit(fixtures):
    pf = read_pair(fixtures["fit"], want_sites=True)
    p = AlignParams(match=2, mismatch=-2)
    r = scan_align("fit", pf.seq1, pf.seq2, p, pf.sites)
    want = spec.spec_fit(pf.seq1, pf.seq2, p, pf.sites)
    assert r.score == 494.0 == want.score
    assert len(r.row1) == 23762
    assert (r.row1, r.row2) == (want.row1, want.row2)
    r2 = scan_align("fit", pf.seq1, pf.seq2, AlignParams())
    assert r2.score == -75.0


def test_f32_exactness_guard():
    """ADVICE r1: params x lengths past the f32 exact-integer range must
    not silently diverge — scan raises, auto routes to the spec oracle."""
    from aligntools_tpu.api import align_pair
    from aligntools_tpu.batch import align_batch
    from aligntools_tpu.engine.scan import check_f32_exact, f32_exact

    big = AlignParams(gap_open=-10_000_000)
    assert not f32_exact(big, 10, 10)
    with pytest.raises(ValueError):
        scan_align("global", b"ACGT", b"ACG", big)
    with pytest.raises(ValueError):
        align_batch("global", [(b"ACGT", b"ACG")], big)
    # auto falls back to the double-precision spec engine
    r = align_pair("global", b"ACGT", b"ACG", big)
    want = spec.spec_global(b"ACGT", b"ACG", big)
    assert r.score == want.score and r.row1 == want.row1

    # in-range params on realistic lengths stay on the device engine
    check_f32_exact(AlignParams(), 2048, 131072)
    # edit mode only sees the (hardcoded-1, |u|) costs
    assert f32_exact(AlignParams(gap_open=-10_000_000), 100, 100, "edit")
