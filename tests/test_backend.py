"""Backend-probe fault tolerance (VERDICT r2 weak #6 / next-round #4).

On a host whose TPU plugin raises at init (wedged axon tunnel), every
production surface must degrade to the CPU backend with ONE warning —
never die with the plugin's traceback. Simulated by monkeypatching
``jax.default_backend`` to raise the exact error text observed when the
tunnel was down (BENCH_r02.json failure mode).
"""

import jax
import pytest

import aligntools_tpu.backend as bk
from aligntools_tpu.params import AlignParams


@pytest.fixture
def wedged_backend(monkeypatch):
    """jax.default_backend raises UNAVAILABLE, as with the tunnel down."""

    def boom():
        raise RuntimeError(
            "Unable to initialize backend 'axon': UNAVAILABLE: "
            "TPU backend setup/compile error"
        )

    monkeypatch.setattr(jax, "default_backend", boom)
    monkeypatch.setattr(bk, "_fallback", None)
    yield
    # the fixture-scoped monkeypatch undoes the patches; clear the
    # cached degraded state so later tests see the real backend again
    bk._fallback = None


def test_backend_name_degrades_to_cpu(wedged_backend, capsys):
    assert bk.backend_name() == "cpu"
    err = capsys.readouterr().err
    assert "falling back to CPU" in err
    # warning is emitted once, not per call
    assert bk.backend_name() == "cpu"
    assert "falling back" not in capsys.readouterr().err


def test_use_pallas_never_raises(wedged_backend):
    from aligntools_tpu.engine.select import use_pallas

    assert use_pallas(256, 2048, 2048) is False
    assert use_pallas(8, 2048, 65536) is False


def test_batch_align_completes_on_wedged_backend(capsys):
    """`aligntools batch` on a wedged-TPU host: same rows as the CPU run
    (VERDICT r2 #4 done-criterion)."""
    from aligntools_tpu.batch import batch_scores

    pairs = [
        (b"ACGTACGTAC", b"ACGTTACGTAC"),
        (b"GGGGCCCC", b"GGGCCC"),
        (b"TTTTTTTT", b"TTATTTTT"),
    ]
    p = AlignParams()
    want = batch_scores("local", pairs, p)

    import unittest.mock as mock

    def boom():
        raise RuntimeError("UNAVAILABLE: TPU backend setup/compile error")

    with mock.patch.object(jax, "default_backend", boom), \
            mock.patch.object(bk, "_fallback", None):
        got = batch_scores("local", pairs, p)
    bk._fallback = None
    assert (got == want).all()
