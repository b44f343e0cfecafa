"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (the driver separately dry-runs the multi-chip
path; the bench runs on the real chip). Must set env BEFORE jax is imported.
"""

import os
import subprocess
import sys

# Force CPU with 8 virtual devices. The container presets
# JAX_PLATFORMS=axon (the real-TPU tunnel) and its sitecustomize imports
# jax at interpreter start — before conftest runs — so the env var is
# already baked into jax.config; override via the config API instead
# (backends are not initialized until first use, so this is still in
# time). Set ALIGNTOOLS_TEST_TPU=1 to run the suite on the real chip.
if not os.environ.get("ALIGNTOOLS_TEST_TPU"):
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

REF_DIR = "/root/reference"
REF_TEST = os.path.join(REF_DIR, "test")


@pytest.fixture(scope="session")
def ref_binary(tmp_path_factory):
    """Compile the reference C binary for differential testing (never vendored
    into this repo; built from the read-only reference checkout, Makefile:2)."""
    if not os.path.isdir(REF_DIR):
        pytest.skip("reference checkout not available")
    out = tmp_path_factory.mktemp("refbin") / "alignTools"
    src = [f"{REF_DIR}/src/main.c", f"{REF_DIR}/src/kstring.c"]
    cmd = ["cc", "-g", "-O2", *src, f"-I{REF_DIR}/src", "-lz", "-o", str(out)]
    subprocess.run(cmd, check=True, capture_output=True)
    return str(out)


@pytest.fixture(scope="session")
def fixtures():
    return {
        "global": f"{REF_TEST}/test_global.fa",
        "local": f"{REF_TEST}/test_local.fa",
        "edit": f"{REF_TEST}/test_edit.fa",
        "fit": f"{REF_TEST}/test_fit.fa",
        "tmp": f"{REF_TEST}/tmp.fa",
    }


def run_ref(binary, args):
    """Run the reference binary, return stdout lines (stderr dropped)."""
    r = subprocess.run(
        [binary, *args], capture_output=True, text=True, timeout=600
    )
    return r.stdout.splitlines(), r.returncode


@pytest.fixture(scope="session")
def ref_run(ref_binary):
    def _run(*args):
        return run_ref(ref_binary, list(args))

    return _run
