"""Multi-chip sharding on the 8-virtual-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8): sharded results must equal the
single-device batched path bit-for-bit."""

import jax
import numpy as np
import pytest

from aligntools_tpu.batch import batch_scores
from aligntools_tpu.params import AlignParams
from aligntools_tpu.parallel.mesh import batch_scores_sharded, make_mesh

ALPHA = b"ACGT"


def _pairs(rng, count):
    out = []
    for _ in range(count):
        q = bytes(rng.choice(list(ALPHA), int(rng.integers(1, 60))).tolist())
        t = bytes(rng.choice(list(ALPHA), int(rng.integers(1, 200))).tolist())
        out.append((q, t))
    return out


def test_eight_devices_present():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("mode", ["global", "local", "overlap", "edit"])
def test_sharded_matches_unsharded(mode):
    rng = np.random.default_rng(21)
    pairs = _pairs(rng, 19)  # deliberately not a multiple of 8
    p = AlignParams(match=2, mismatch=-1, gap_open=-3, gap_extend=-1)
    mesh = make_mesh()
    got = batch_scores_sharded(mode, pairs, p, mesh)
    want = batch_scores(mode, pairs, p)
    assert np.array_equal(got, want)


def test_mesh_subset():
    rng = np.random.default_rng(23)
    pairs = _pairs(rng, 6)
    mesh = make_mesh(4)
    got = batch_scores_sharded("global", pairs, AlignParams(), mesh)
    want = batch_scores("global", pairs, AlignParams())
    assert np.array_equal(got, want)


@pytest.mark.parametrize("with_sites", [False, True])
def test_sharded_fit_matches_unsharded(with_sites):
    """dp-sharded fit (+jump): the per-pair junction entry mask shards
    alongside the batch; scores bit-equal to the single-device path."""
    rng = np.random.default_rng(27)
    pairs, sites_list = [], []
    for _ in range(11):  # not a multiple of 8
        m = int(rng.integers(1, 40))
        n = int(rng.integers(40, 200))
        pairs.append(
            (bytes(rng.choice(list(ALPHA), m).tolist()),
             bytes(rng.choice(list(ALPHA), n).tolist()))
        )
        sites_list.append(sorted(int(x) for x in rng.integers(0, n, 3)))
    p = AlignParams(match=2, mismatch=-2)
    sl = sites_list if with_sites else None
    got = batch_scores_sharded("fit", pairs, p, make_mesh(), sites_list=sl)
    want = batch_scores("fit", pairs, p, sites_list=sl)
    assert np.array_equal(got, want)
