"""Device engines: JAX row-scan (scan.py), Pallas kernels (ops/), host
traceback (traceback.py)."""

from aligntools_tpu.engine.scan import scan_align

__all__ = ["scan_align"]
