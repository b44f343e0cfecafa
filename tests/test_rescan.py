"""Checkpoint-rescan traceback vs the whole-matrix engine, byte for byte."""

import numpy as np
import pytest

from aligntools_tpu.engine.rescan import rescan_align
from aligntools_tpu.engine.scan import scan_align
from aligntools_tpu.params import AlignParams

ALPHA = np.frombuffer(b"ACGT", np.uint8)


@pytest.mark.parametrize("mode", ["global", "local", "fit", "overlap"])
@pytest.mark.parametrize("stride", [8, 16])
def test_rescan_matches_scan(mode, stride):
    """Rows byte-identical across several row blocks and both strides."""
    rng = np.random.default_rng(211)
    p = AlignParams(match=2, mismatch=-2, gap_open=-4, gap_extend=-1)
    for i in range(4):
        m = int(rng.integers(3, 5 * stride))  # spans 1..5 blocks
        n = int(rng.integers(max(m, 60), 900))
        q = bytes(rng.choice(ALPHA, m).tolist())
        t = bytes(rng.choice(ALPHA, n).tolist())
        sites = None
        if mode == "fit" and i % 2:
            sites = sorted(int(x) for x in rng.integers(0, n, 4))
        got = rescan_align(mode, q, t, p, sites=sites, stride=stride)
        want = scan_align(mode, q, t, p, sites=sites)
        assert got.score == want.score, (mode, stride, i)
        assert (got.row1, got.row2) == (want.row1, want.row2), (
            mode, stride, i,
        )


def test_rescan_tie_heavy():
    """Binary alphabet maximizes DP ties: block-boundary resumption must
    preserve the reference tie-break order exactly."""
    rng = np.random.default_rng(212)
    p = AlignParams()
    for mode in ("global", "local", "fit", "overlap"):
        for i in range(3):
            m = int(rng.integers(3, 40))
            n = int(rng.integers(max(m, 200), 600))
            q = bytes(rng.choice([65, 66], m).tolist())
            t = bytes(rng.choice([65, 66], n).tolist())
            got = rescan_align(mode, q, t, p, stride=8)
            want = scan_align(mode, q, t, p)
            assert got.score == want.score, (mode, i)
            assert (got.row1, got.row2) == (want.row1, want.row2), (mode, i)


def test_rescan_rejects_edit():
    with pytest.raises(ValueError):
        rescan_align("edit", b"AC", b"ACGT", AlignParams())
