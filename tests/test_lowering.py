"""Device-free Mosaic lowering regression tests.

jax.export with platforms=["tpu"] runs the Pallas -> Mosaic dialect
conversion on a CPU host — where an unsupported primitive (a strided
vector slice, a vector lax.cond Mosaic can't legalize, an illegal
reshape) fails fast. The full sweep lives in tools/mosaic_lower_check.py;
these cover the riskiest compositions so a regression trips in CI.
"""

import jax
import jax.numpy as jnp
import pytest

from aligntools_tpu.ops import pallas_scan as pk

B, M, N = 8, 64, 512


@pytest.fixture
def flat_args():
    qs = jnp.zeros((B, M), jnp.int32)
    ts = jnp.zeros((B, N), jnp.int32)
    ns = jnp.full((B, 1), N, jnp.int32)
    ms = jnp.full((B, 1), M, jnp.int32)
    pm = jnp.zeros((1, 8), jnp.float32)
    return qs, ts, ns, ms, pm


@pytest.mark.parametrize("pre,tl", [(4, True), (3, False)])
def test_flat_local_lowers_for_tpu(flat_args, monkeypatch, pre, tl):
    monkeypatch.setattr(pk, "_PRE_OVERRIDE", pre)
    monkeypatch.setattr(pk, "_TWOLEVEL_OVERRIDE", tl)
    pk.pallas_scores.clear_cache()
    fn = lambda *a: pk.pallas_scores("local", M, N, False, *a)
    jax.export.export(jax.jit(fn), platforms=["tpu"])(*flat_args)
    pk.pallas_scores.clear_cache()


def test_fit_jump_twolevel_lowers_for_tpu(flat_args, monkeypatch):
    """The jump scan always takes the two-level tail when enabled — the
    composition that needs the reshape-based block extract."""
    qs, ts, ns, ms, pm = flat_args
    allow = jnp.ones((B, N), jnp.float32)
    monkeypatch.setattr(pk, "_PRE_OVERRIDE", 4)
    monkeypatch.setattr(pk, "_TWOLEVEL_OVERRIDE", True)
    pk.pallas_fit_scores.clear_cache()
    fn = lambda *a: pk.pallas_fit_scores(True, M, N, False, *a)
    jax.export.export(jax.jit(fn), platforms=["tpu"])(
        qs, ts, allow, ns, ms, pm
    )
    pk.pallas_fit_scores.clear_cache()
