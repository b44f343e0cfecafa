"""Fault-tolerant backend probing.

``jax.default_backend()`` initializes the configured platform on first
call and RAISES (``RuntimeError: UNAVAILABLE: TPU backend setup/compile
error`` or similar) when the device plugin cannot reach its hardware —
observed when the axon TPU tunnel is down. Production paths (engine
routing, the batch CLI, bench.py) must not die with that traceback: a
host whose accelerator is wedged can still serve every request on the
CPU backend, just slower.

``backend_name()`` is the one sanctioned way to ask "what backend am I
on?" outside of dev tools. On probe failure it emits ONE stderr warning,
re-points the in-process jax platform at CPU (so subsequent direct jax
calls elsewhere in the process agree), and returns the degraded name.
"""

from __future__ import annotations

import sys

# Set once the primary backend probe has failed; also the "warned" flag.
_fallback: str | None = None


def backend_name() -> str:
    """``jax.default_backend()`` that degrades to CPU instead of raising.

    Also the cold-start fast path: when jax has NOT been imported yet and
    the process is already pinned to the CPU platform via the environment
    (the single-pair CLI does this), answer without importing jax at all —
    the import costs ~2.2 s and the NumPy spec engine never needs it."""
    global _fallback
    if _fallback is not None:
        return _fallback
    if "jax" not in sys.modules:
        import os

        if os.environ.get("JAX_PLATFORMS", "").split(",")[0] == "cpu":
            return "cpu"
    import jax

    try:
        return jax.default_backend()
    except Exception as err:  # wedged device plugin: degrade, once
        print(
            f"[aligntools] device backend unavailable "
            f"({type(err).__name__}: {err}); falling back to CPU",
            file=sys.stderr,
        )
        try:
            jax.config.update("jax_platforms", "cpu")
            _fallback = jax.default_backend()
        except Exception:
            _fallback = "cpu"
        return _fallback


def on_tpu() -> bool:
    return backend_name() == "tpu"


_cache_enabled = False


def enable_compile_cache() -> None:
    """Persistent XLA compilation cache for the single-accelerator
    production surfaces (pipeline, benchmarks).

    A chunked-engine bucket shape costs 10-20 s to compile through the
    axon tunnel, and a bucketed pipeline run touches dozens of shapes —
    the first run of a workload pays minutes of compile that every later
    process re-pays without this. jax 0.9 only honors the
    ``jax_compilation_cache_dir`` config knob (the documented env var is
    ignored), so set it programmatically. Single-device only: XLA's
    LoadedExecutable.serialize() can hard-abort on shard_map executables
    (observed under the 8-virtual-device CPU suite), and the multi-chip
    paths are exactly where that risk lives."""
    global _cache_enabled
    if _cache_enabled:
        return
    import os

    import jax

    try:
        if jax.device_count() != 1:
            return
        cache = os.environ.get(
            "ALIGNTOOLS_JAX_CACHE",
            os.path.expanduser("~/.cache/aligntools-jax"),
        )
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.5
        )
        _cache_enabled = True
    except Exception:
        pass
