"""Engine selection: route each shape bucket to the fastest exact engine.

Measured on TPU v5e (amortized device time — K fills chained on-device to
cancel the 30-90 ms axon tunnel latency; local/SW-affine score-only):

  | n_pad  | batch | XLA lax.scan engine | Pallas VMEM kernel |
  |--------|-------|---------------------|--------------------|
  | 1024   | 256   | 48.7 GCUPS          |  9.2 GCUPS         |
  | 2048   |  64   |  1.2 GCUPS          | 16.9 GCUPS         |
  | 2048   | 256   | 51.6 GCUPS          | 17.0 GCUPS         |
  | 4096   | 128   | 41.7 GCUPS          | 28.8 GCUPS         |
  | 8192   | 32-64 |  4.4 GCUPS          | 36.2 GCUPS         |
  | 16384  |  16   |  3.6 GCUPS          | 36.1 GCUPS         |

The XLA engine's fused-carry regime holds only for large batches at
moderate row widths (empirically batch >= 128 AND n_pad <= 4096); outside
it the carries spill to HBM and throughput collapses ~10-40x. The Pallas
kernel is VMEM-resident by construction and rises to a steady ~36 GCUPS
as the per-row fixed overheads amortize (its asymptotic cost is the
log2(n) Hillis-Steele passes of the in-row max-plus scan).

Score-only paths route freely. Full-alignment (pointer-emitting) fills
also route to Pallas on TPU (ops/pallas_ptr.py: DMA-staged packed pointer
rows + on-device batched walk; emission measures free — 17.9 vs 17.3
GCUPS score-only at 64x2048^2, where the XLA ptr path gets ~1-4), except
long-target buckets which use the blocked score kernel + the XLA pointer
path.
"""

from __future__ import annotations

# Flat Pallas kernel VMEM budget: 4-5 (8, n_pad) carry rows + temps per
# tile; beyond this the column-blocked kernel (ops/pallas_blocked.py)
# streams the target through VMEM in c_blk-wide blocks.
PALLAS_FLAT_MAX_N_PAD = 32768
BLOCKED_C_BLK = 16384


def blocked_c_blk() -> int:
    """Column-block width for the blocked streaming kernels: env
    ALIGNTOOLS_BLOCKED_CBLK, then the per-device calibrate table
    (``blocked_c_blk`` — measured by ``aligntools calibrate`` stage 9),
    then the 16384 v5e default — benchmarks/probe_blocked.py at fit+jump
    8x(2048x131072): 5.0 / 9.2 / 14.8 GCUPS at c_blk 4096/8192/16384
    (per-row block-edge fixed costs amortize with width; 32768 fails to
    compile on v5e). Bucket n_pad snapping (batch._align_n) reads the
    same function, so fills and bucket shapes always agree."""
    import os

    env = os.environ.get("ALIGNTOOLS_BLOCKED_CBLK")
    if env:
        return max(128, int(env))
    try:
        from aligntools_tpu.engine.autotune import table

        if _on_tpu():
            return int(table().get("blocked_c_blk", BLOCKED_C_BLK))
    except Exception:
        pass
    return BLOCKED_C_BLK


def flat_tile_b(batch: int, n_pad: int) -> int:
    """Batch-tile width for the flat score kernels.

    Measured on v5e (tools/vpu_probe.py): the kernel is per-instruction-
    overhead-bound at narrow tiles — local 256x2048^2 runs 18.5 / 34.6 /
    47.6 / 49.1 GCUPS at tile_b 8/16/32/64 — so widen until either the
    VMEM footprint cap or the bucket's batch size stops paying. The cap
    is tile_b * n_pad <= 512Ki lanes: the kernels size their own Mosaic
    vmem_limit_bytes to the footprint (ops/pallas_scan._grid_call), and
    ~24 live (tile_b, n_pad) f32 rows at 512Ki lanes sit under the 100
    MiB ceiling (32x8192 measured 46.5 GCUPS, 16x32768 fit 28.1).

    The 128 hard ceiling was confirmed by measurement (256 is 4% slower
    at 256x2048 on v5e) but is table-driven so `aligntools calibrate`
    can raise it on a device generation that prefers wider tiles.
    """
    from aligntools_tpu.engine.autotune import table

    hard = table().get("flat_tile_cap", 128) if _on_tpu() else 128
    cap = max(8, 524288 // max(n_pad, 1))
    t = 8
    while t < hard and t * 2 <= cap and t < batch:
        t *= 2
    return t


def _on_tpu() -> bool:
    from aligntools_tpu.backend import on_tpu

    return on_tpu()


def use_pallas(batch: int, m_pad: int, n_pad: int, mode: str = "local") -> bool:
    """True if a Pallas kernel is the faster engine for this bucket.

    The XLA-wins window (batch >= bmin and n_pad <= nmax) comes from the
    per-device-kind calibration cache when one exists (``aligntools
    calibrate``; engine/autotune.py) and falls back to the v5e
    measurements above (bmin=128, nmax=4096) otherwise. Never raises:
    a wedged device plugin degrades to the CPU answer (False) with one
    warning (aligntools_tpu.backend)."""
    if not _on_tpu():
        return False  # interpret-mode Pallas is only for tests
    if n_pad > PALLAS_FLAT_MAX_N_PAD and not use_blocked(mode, n_pad):
        return False  # overlap/edit beyond the flat kernel: XLA engine
    from aligntools_tpu.engine.autotune import table

    t = table()
    return not (batch >= t["bmin"] and n_pad <= t["nmax"])


def use_blocked(mode: str, n_pad: int) -> bool:
    """Column-blocked streaming kernel for long targets — all five modes
    (measured 18.4 GCUPS for fit at 2048x131072 vs ~2-4 on XLA)."""
    return n_pad > PALLAS_FLAT_MAX_N_PAD


def use_chunked(batch: int, n_pad: int) -> bool:
    """Column-chunked XLA score engine (engine/chunked.py): the batched
    row scan in calibrated-width column chunks (v5e: 1024) with carried row edges, which keeps
    XLA's fused-carry regime at ANY target length. It owns the whole
    batch >= bmin score-only regime (v5e round-3 measurements, real
    engine, after the row-latch/best-latch trims):

      256x2048^2  global 82.3 / overlap 79.6 / edit 79.3 / local 77.9
                  GCUPS — vs plain-XLA vmap 63-79 and Pallas flat 48.7
      256x8192^2  local 79.9 (was 20.8 plain XLA fused-carry spill,
                  40 Pallas); other modes 72-78
      128x8192^2  local 74.5;  256x16384^2 local 62.6 (prototype)
      fit+jump 128x(512x32768): 49.7 vs Pallas 28.5

    It collapses at batch 64 (1.3 GCUPS — the same XLA small-batch
    cliff as the plain engine), so the calibrated ``bmin`` still gates
    Pallas vs XLA. Round 4: pointer-emitting fills ride it too
    (chunked_ptr_fill / chunked_fit_ptr_fill, packed nibble/2-bit raw
    block layouts walked by engine/device_tb) — see the TPU routing
    table in docs/DESIGN.md §3. The plain vmap engine (engine/scan.py)
    is the CPU/test engine: its TPU territory is the calibration gap
    ``bmin <= batch < chunked_bmin``, which is EMPTY under the defaults
    (chunked_bmin falls back to bmin) and on calibrated v5e.
    ALIGNTOOLS_NO_CHUNKED=1 disables (escape hatch)."""
    import os

    if os.environ.get("ALIGNTOOLS_NO_CHUNKED") == "1":
        return False
    if not _on_tpu():
        return False
    from aligntools_tpu.engine.autotune import table

    t = table()
    # the chunked engine's own measured batch cliff when calibrate has
    # one (its collapse point is the XLA small-batch layout pathology,
    # which need not track the vmap engine's bmin on another device kind)
    return batch >= t.get("chunked_bmin", t["bmin"])
