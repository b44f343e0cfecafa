"""Host<->device link health probe: the axon tunnel's per-call round
trip and h2d bandwidth swing 2-10x between sessions (and within one),
and every latency- or transfer-bound benchmark number swings with them.
Benchmarks stamp this into their JSON so a number can be read against
the link state it was measured under.
"""

from __future__ import annotations

import time


def link_health() -> dict:
    """{'rt_ms': per-call round trip, 'h2d_gbps': 4 MB upload rate} on
    the current backend (one warmup + best of 3 each; ~1 s total)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros(8)
    np.asarray(f(x))
    rt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(x))
        rt = min(rt, time.perf_counter() - t0)
    blob = np.zeros(4 << 20, np.uint8)
    jnp.asarray(blob).block_until_ready()
    up = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        d = jnp.asarray(blob)
        np.asarray(d[:8])  # force the transfer to commit
        up = min(up, time.perf_counter() - t0)
    return {
        "rt_ms": round(rt * 1e3, 1),
        "h2d_gbps": round(len(blob) / up / 1e9, 4),
    }
