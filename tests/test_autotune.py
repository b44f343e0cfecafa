"""Engine-crossover calibration cache (engine/autotune.py).

The measurement itself needs the TPU backend (covered by running
``aligntools calibrate`` on hardware); these tests cover the cache /
fallback plumbing that routing depends on.
"""

import json
import os

import numpy as np

from aligntools_tpu.engine import autotune


def _reset():
    autotune._loaded = None


def test_defaults_without_cache(tmp_path, monkeypatch):
    monkeypatch.setenv(autotune.CACHE_ENV, str(tmp_path))
    _reset()
    t = autotune.table()
    assert t["bmin"] == 128 and t["nmax"] == 4096
    _reset()


def test_cached_table_overrides(tmp_path, monkeypatch):
    monkeypatch.setenv(autotune.CACHE_ENV, str(tmp_path))
    _reset()
    with open(autotune._cache_path(), "w") as f:
        json.dump({"bmin": 64, "nmax": 8192, "device_kind": "x"}, f)
    t = autotune.table()
    assert t["bmin"] == 64 and t["nmax"] == 8192
    _reset()


def test_corrupt_cache_falls_back(tmp_path, monkeypatch):
    monkeypatch.setenv(autotune.CACHE_ENV, str(tmp_path))
    _reset()
    with open(autotune._cache_path(), "w") as f:
        f.write("{not json")
    t = autotune.table()
    assert t == autotune._DEFAULTS | {}
    _reset()


def test_calibrate_requires_tpu(tmp_path, monkeypatch):
    import pytest

    monkeypatch.setenv(autotune.CACHE_ENV, str(tmp_path))
    _reset()
    with pytest.raises(RuntimeError):
        autotune.calibrate(force=True)
    _reset()


def test_table_values_drive_routing(tmp_path, monkeypatch):
    """use_pallas consults the cached table on the TPU backend; on CPU it
    is always False, so exercise the table read directly."""
    monkeypatch.setenv(autotune.CACHE_ENV, str(tmp_path))
    _reset()
    with open(autotune._cache_path(), "w") as f:
        json.dump({"bmin": 32, "nmax": 1024}, f)
    t = autotune.table()
    # the decision rule select.use_pallas applies on TPU:
    assert not (64 >= t["bmin"] and 2048 <= t["nmax"])  # pallas wins
    assert 64 >= t["bmin"] and 1024 <= t["nmax"]  # xla wins
    _reset()


def test_probe_subprocess_parsing(monkeypatch):
    """calibrate's per-probe subprocess wrapper: parses RESULT lines,
    degrades to None on rc!=0 / timeout / garbage (a wedged tunnel probe
    must cost one timeout, not the calibration)."""
    import subprocess
    import types

    from aligntools_tpu.engine import autotune

    def fake_run(cmd, **kw):
        spec = cmd[-1]
        if spec == "ok:1":
            return types.SimpleNamespace(
                returncode=0, stdout='noise\nRESULT {"s": 0.25}\n',
                stderr="")
        if spec == "bad:1":
            return types.SimpleNamespace(returncode=1, stdout="",
                                         stderr="boom")
        raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 0))

    monkeypatch.setattr(autotune.subprocess, "run", fake_run, raising=False)
    logs = []
    assert autotune._probe("ok:1", log=logs.append) == {"s": 0.25}
    assert autotune._probe("bad:1", log=logs.append) is None
    assert autotune._probe("hang:1", log=logs.append) is None
    assert any("TIMED OUT" in m for m in logs)
    assert any("failed rc=1" in m for m in logs)


def test_chunk_width_knob(monkeypatch):
    """default_chunk(): env override wins; CPU falls back to the
    constant (the table is TPU-routing-only)."""
    from aligntools_tpu.engine import chunked as ck

    monkeypatch.delenv("ALIGNTOOLS_CHUNK_WIDTH", raising=False)
    assert ck.default_chunk() == ck.DEFAULT_CHUNK  # CPU backend here
    monkeypatch.setenv("ALIGNTOOLS_CHUNK_WIDTH", "1024")
    assert ck.default_chunk() == 1024
    monkeypatch.setenv("ALIGNTOOLS_CHUNK_WIDTH", "7")  # floored to 128
    assert ck.default_chunk() == 128


def test_blocked_cblk_knob(monkeypatch):
    """blocked_c_blk(): env override wins; CPU falls back to the
    structural 8192 default. Bucket snapping must agree with the knob."""
    from aligntools_tpu import batch as ab
    from aligntools_tpu.engine import select

    monkeypatch.delenv("ALIGNTOOLS_BLOCKED_CBLK", raising=False)
    assert select.blocked_c_blk() == select.BLOCKED_C_BLK
    monkeypatch.setenv("ALIGNTOOLS_BLOCKED_CBLK", "4096")
    assert select.blocked_c_blk() == 4096
    # n snapping above the flat ceiling follows the knob
    n = ab._align_n(select.PALLAS_FLAT_MAX_N_PAD + 1, 128)
    assert n % 4096 == 0


def test_probe_spec_grammar():
    """New calibrate probe specs parse to the right benchers (no device
    work: just verify the spec dispatch rejects junk and accepts the
    stage-8/9 grammars via signature errors, not KeyErrors)."""
    import pytest

    from aligntools_tpu.engine import autotune

    with pytest.raises(ValueError):
        autotune._run_probe_spec("nope:1:2")
