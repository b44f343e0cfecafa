"""Sequence parallelism: target sharded over the 8-virtual-device CPU mesh
must give bit-identical scores to the single-device engines, all modes."""

import numpy as np
import pytest

from aligntools_tpu.batch import batch_scores
from aligntools_tpu.params import AlignParams
from aligntools_tpu.parallel.seqpar import seqpar_score

ALPHA = list(b"ACGT")


@pytest.mark.parametrize("mode", ["global", "local", "overlap", "edit", "fit"])
def test_seqpar_matches_single_device(mode):
    rng = np.random.default_rng(47)
    p = AlignParams(match=2, mismatch=-3, gap_open=-4, gap_extend=-1)
    for i in range(6):
        m = int(rng.integers(1, 90))
        n = int(rng.integers(m if mode == "fit" else 1, 1500))
        if mode == "fit":
            n = max(n, m)
        q = bytes(rng.choice(ALPHA, m).tolist())
        t = bytes(rng.choice(ALPHA, n).tolist())
        sites = None
        if mode == "fit" and i % 2:
            sites = sorted(int(x) for x in rng.integers(0, n, 4))
        got = seqpar_score(mode, q, t, p, sites=sites)
        want = batch_scores(mode, [(q, t)], p,
                            sites_list=[sites] if sites else None)[0]
        assert got == want, (mode, i, m, n)


def test_dp_sp_composition():
    """2D mesh: batch sharded over 'data' x targets sharded over 'seq' —
    both parallel axes composed in one shard_map, bit-identical scores."""
    import jax
    from jax.sharding import Mesh
    from aligntools_tpu.parallel.seqpar import seqpar_batch_scores

    rng = np.random.default_rng(91)
    devs = np.asarray(jax.devices())
    mesh = Mesh(devs.reshape(2, 4), ("data", "seq"))
    for mode in ("global", "local", "fit", "overlap", "edit"):
        pairs, sites = [], []
        for _ in range(5):  # deliberately not a multiple of the data axis
            m = int(rng.integers(1, 40))
            n = int(rng.integers(m, 700))
            pairs.append((bytes(rng.choice(ALPHA, m).tolist()),
                          bytes(rng.choice(ALPHA, n).tolist())))
            sites.append(sorted(int(x) for x in rng.integers(0, n, 3)))
        p = AlignParams(match=2, mismatch=-1, gap_open=-3, gap_extend=-1)
        sl = sites if mode == "fit" else None
        got = seqpar_batch_scores(mode, pairs, p, sites_list=sl, mesh=mesh)
        want = batch_scores(mode, pairs, p, sites_list=sl)
        assert np.array_equal(got, want), mode
