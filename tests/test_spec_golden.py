"""Golden-output tests for the NumPy spec engine (oracle) against the
captured reference behavior (SURVEY.md §4) — no reference binary needed."""

import numpy as np
import pytest

from aligntools_tpu.io.fasta import read_pair
from aligntools_tpu.params import AlignParams
from aligntools_tpu.spec import engine as spec


def P(**kw):
    return AlignParams().replace(**kw)


# -- micro cases (captured from the compiled reference) ----------------------


def test_global_identical():
    r = spec.spec_global(b"ACGT", b"ACGT")
    assert r.score == 4.0
    assert r.row1 == b"ACGT" and r.row2 == b"ACGT"


def test_global_single_gap():
    r = spec.spec_global(b"ACGT", b"AGT")
    assert r.score == -2.0
    assert r.row1 == b"ACGT" and r.row2 == b"A-GT"


def test_local_micro():
    r = spec.spec_local(b"GATTACA", b"GCATGCU")
    assert r.score == 2.0
    assert r.row1 == b"GAT" and r.row2 == b"CAT"


def test_edit_micro():
    assert spec.spec_edit(b"GATTACA", b"GCATGCU", P(mismatch=1)) == 4


def test_overlap_empty_alignment():
    # j_max=0 start → empty rows, score 0 (alignment.h:954: col 0 is 0.0)
    r = spec.spec_overlap(b"ACGT", b"AGT")
    assert r.score == 0.0
    assert r.row1 == b"" and r.row2 == b""


# -- fixture-based golden outputs --------------------------------------------


def test_global_fixture(fixtures):
    pair = read_pair(fixtures["global"])
    r = spec.spec_global(pair.seq1, pair.seq2)
    assert r.score == 42.0
    assert r.row1 == (
        b"PAKK------FQIFWEKQHMIYHFTFIYVDTLICILFIVAKAGTLRFEHPHSWCRHVV-"
        b"DYSIGNYWSVWTVNEAYRSG"
    )
    assert r.row2 == (
        b"PAKKLCHDCTDPIVWEKQHMIYHFTFIYVDTLICILFIVAKAGTLRDEHPVSWCRHVVE"
        b"DYSIGNYWSVWTVNEAYRSG"
    )


def test_global_fixture_params(fixtures):
    pair = read_pair(fixtures["global"])
    r = spec.spec_global(
        pair.seq1, pair.seq2, P(match=1, mismatch=-1, gap_open=-4, gap_extend=-1)
    )
    assert r.score == 49.0


def test_local_fixture(fixtures):
    pair = read_pair(fixtures["local"])
    r = spec.spec_local(pair.seq1, pair.seq2)
    assert r.score == 2.0
    assert (r.row1, r.row2) == (b"LEA", b"MEA")
    r = spec.spec_local(
        pair.seq1, pair.seq2, P(match=2, mismatch=-2, gap_open=-5, gap_extend=-2)
    )
    assert r.score == 4.0
    assert (r.row1, r.row2) == (b"LEA", b"MEA")


def test_edit_fixture(fixtures):
    pair = read_pair(fixtures["edit"])
    assert spec.spec_edit(pair.seq1, pair.seq2) == 176  # default u=-2 quirk
    assert spec.spec_edit(pair.seq1, pair.seq2, P(mismatch=1)) == 683
    # -o is dead in edit (alignment.h:306-309)
    assert spec.spec_edit(pair.seq1, pair.seq2, P(mismatch=1, gap_open=-99)) == 683


def test_fit_fixture_jump(fixtures):
    pair = read_pair(fixtures["fit"], want_sites=True)
    assert pair.sites == [1036, 3395, 23045, 24611]
    r = spec.spec_fit(pair.seq1, pair.seq2, P(match=2, mismatch=-2), pair.sites)
    assert r.score == 494.0
    assert len(r.row1) == 23762 and len(r.row2) == 23762
    assert r.row1.count(45) == 23762 - 257  # 257 query bases + gaps ('-'==45)
    assert r.row2.count(45) == 0  # target row is gapless


def test_fit_fixture_nojump(fixtures):
    pair = read_pair(fixtures["fit"])
    r = spec.spec_fit(pair.seq1, pair.seq2)
    assert r.score == -75.0


def test_overlap_fixture(fixtures):
    pair = read_pair(fixtures["global"])
    r = spec.spec_overlap(pair.seq1, pair.seq2)
    assert r.score == 16.0
