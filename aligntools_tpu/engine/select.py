"""Engine selection: route each shape bucket to the fastest exact engine.

Measured on TPU v5e (amortized device time, tunnel latency removed;
local/SW-affine score-only, B=256 pairs):

  | n_pad | XLA lax.scan engine | Pallas VMEM kernel |
  |-------|---------------------|--------------------|
  | 1024  | 40 GCUPS            | 10 GCUPS           |
  | 2048  | 50 GCUPS            | 17 GCUPS           |
  | 8192  | 4.4 GCUPS (spill)   | 36 GCUPS           |

The XLA engine keeps its (B, n_pad) carry rows fused in VMEM up to about
n_pad*B*4states*4B ~ 8 MB and then falls off a bandwidth cliff; the Pallas
kernel is VMEM-resident by construction at any length (its cost is the
log2(n) Hillis-Steele passes of the in-row max-plus scan). Crossover is
around n_pad ~ 4k for full batches, so ``auto`` routes on the carry
working-set size.

Score-only paths route freely; pointer-emitting fills stay on the XLA
engine until the DMA-staged pointer kernel lands.
"""

from __future__ import annotations

import jax

# 4 f32 state rows per pair in the scan engine's carry.
_XLA_CARRY_BYTES_MAX = 8 * 1024 * 1024


def use_pallas(batch: int, m_pad: int, n_pad: int) -> bool:
    """True if the Pallas kernel is the faster engine for this bucket."""
    if jax.default_backend() != "tpu":
        return False  # interpret-mode Pallas is only for tests
    carry = batch * (n_pad + 1) * 4 * 4
    return carry > _XLA_CARRY_BYTES_MAX
