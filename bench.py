"""Benchmark: batched Smith-Waterman (affine) GCUPS on the current backend.

Prints ONE JSON line:
  {"metric": "sw_affine_gcups", "value": N, "unit": "GCUPS",
   "vs_baseline": R, ...}

Timing methodology: the axon TPU tunnel adds 30-90 ms of per-call latency
(even a jitted elementwise add costs ~75 ms end-to-end), so a single fill
cannot be timed honestly. The benchmark chains K fills on-device inside one
jitted fori_loop with a serial data dependency (scores fed back into the
query tensor as zeros) and reports (T(K2) - T(K1)) / (K2 - K1), which
cancels the constant tunnel/dispatch overhead exactly.

``vs_baseline`` is measured live: the reference C binary
(r3fang/alignTools.C, compiled -O2 from the read-only checkout) timed on
one pair of the same shape on this host's CPU — the reference is strictly
single-core scalar code (SURVEY.md §2.4), so this is its true throughput.

Workload: B x (m=n=2048) random DNA pairs, local (SW) mode, affine gaps,
score-only — the GCUPS configuration named in BASELINE.json. The engine is
the hybrid auto-selection (engine/select.py): XLA scan engine at this
shape; set BENCH_ENGINE=pallas to pin the Pallas kernel.
"""

import functools
import json
import os
import subprocess
import sys
import tempfile
import time

try:
    import numpy as np
except ImportError:  # bare system python: re-exec under the jax venv
    venv = "/opt/venv/bin/python"
    # NB: compare by prefix — the venv python symlinks to the same base
    # interpreter, so realpath comparison would wrongly match
    if os.path.exists(venv) and not sys.executable.startswith("/opt/venv/"):
        os.execv(venv, [venv, os.path.abspath(__file__), *sys.argv[1:]])
    raise

REF_SRC = "/root/reference/src"


def _probe_backend() -> tuple[str, bool]:
    """Name the backend to benchmark on, without ever hanging or raising.

    The axon TPU plugin has two observed failure modes when its tunnel is
    down: ``jax.default_backend()`` raises UNAVAILABLE (BENCH_r02's rc=1),
    or device enumeration hangs for many minutes. Both are absorbed by
    probing in a SUBPROCESS under a timeout, with one retry after a
    backoff. On persistent failure the benchmark degrades to the CPU
    backend (smaller workload, still a valid measurement) instead of
    costing the round its number. Returns (backend, degraded)."""
    if os.environ.get("BENCH_FORCE_CPU"):
        return "cpu", False
    for attempt in range(2):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.default_backend())"],
                capture_output=True, timeout=240, text=True,
            )
            name = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
            if r.returncode == 0 and name:
                return name, False
            print(f"[bench] backend probe attempt {attempt + 1} failed "
                  f"(rc={r.returncode}): {r.stderr.strip()[-300:]}",
                  file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"[bench] backend probe attempt {attempt + 1} timed out "
                  "(240 s) — device enumeration hang", file=sys.stderr)
        if attempt == 0:
            time.sleep(30)
    return "cpu", True


def _force_cpu() -> None:
    """Point the in-process jax platform at CPU (works even after a
    failed axon init — the pytest-conftest pattern)."""
    import jax

    jax.config.update("jax_platforms", "cpu")


def _measure_reference_gcups(q: bytes, t: bytes) -> float | None:
    """Compile and time the reference binary on one pair (same shape)."""
    try:
        tmp = tempfile.mkdtemp(prefix="alignbench")
        binary = os.path.join(tmp, "alignTools")
        subprocess.run(
            ["cc", "-g", "-O2", f"{REF_SRC}/main.c", f"{REF_SRC}/kstring.c",
             f"-I{REF_SRC}", "-lz", "-o", binary],
            check=True, capture_output=True, timeout=120,
        )
        fa = os.path.join(tmp, "pair.fa")
        with open(fa, "wb") as f:
            f.write(b">q\n" + q + b"\n>t\n" + t + b"\n")
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            subprocess.run(
                [binary, "local", fa], check=True, capture_output=True,
                timeout=600,
            )
            best = min(best, time.perf_counter() - t0)
        return len(q) * len(t) / best / 1e9
    except Exception as err:  # no cc / no reference checkout: report absolute
        print(f"[bench] reference baseline unavailable: {err}", file=sys.stderr)
        return None


def main():
    backend, degraded = _probe_backend()
    if backend == "cpu":
        _force_cpu()
    try:
        _run(backend, degraded)
    except Exception as err:
        if backend != "cpu":
            # flaky tunnel: the probe answered but the run died — salvage
            # a CPU-degraded number rather than losing the round's evidence
            print(f"[bench] {backend} run failed ({type(err).__name__}: "
                  f"{err}); retrying on CPU", file=sys.stderr)
            try:
                _force_cpu()
                _run("cpu", True)
                return
            except Exception as err2:
                err = err2
        print(json.dumps({
            "metric": "sw_affine_gcups", "value": None, "unit": "GCUPS",
            "vs_baseline": None, "backend": "unavailable",
            "error": f"{type(err).__name__}: {err}",
        }))


def _run(backend: str, degraded: bool):
    import jax
    import jax.numpy as jnp

    from aligntools_tpu.engine.scan import local_fill
    from aligntools_tpu.engine.select import use_chunked, use_pallas
    from aligntools_tpu.ops.pallas_scan import pallas_scores

    # CPU (native or degraded-fallback) runs shrink the workload: the XLA
    # CPU backend fills ~1-3 GCUPS, so the TPU shape would take >1 h.
    cpu = backend == "cpu"
    B = int(os.environ.get("BENCH_BATCH", "16" if cpu else "256"))
    m_pad = n_pad = int(os.environ.get("BENCH_LEN", "512" if cpu else "2048"))
    eng = os.environ.get("BENCH_ENGINE", "auto")
    if eng == "auto":
        if use_chunked(B, n_pad):
            eng = "chunked"
        else:
            eng = "pallas" if use_pallas(B, m_pad, n_pad) else "xla"

    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    qs = rng.choice(alpha, (B, m_pad)).astype(np.int32)
    ts = rng.choice(alpha, (B, n_pad)).astype(np.int32)

    if eng == "pallas":
        ns = np.full((B, 1), n_pad, np.int32)
        ms = np.full((B, 1), m_pad, np.int32)
        pm = np.zeros((1, 8), np.float32)
        pm[0, :5] = [1, -2, -5, -1, -10]
        extra = tuple(jnp.asarray(a) for a in (ts, ns, ms, pm))

        def one(qs):
            return pallas_scores("local", m_pad, n_pad, False, qs, *extra)
    elif eng == "chunked":
        from aligntools_tpu.engine import chunked as ck

        ns = np.full(B, n_pad, np.int32)
        ps = np.zeros((B, 6), np.float32)
        ps[:, :5] = [1, -2, -5, -1, -10]
        ps[:, 5] = m_pad
        extra = tuple(jnp.asarray(a) for a in (ts, ns, ps))

        def one(qs):
            ts_d, ns_d, ps_d = extra
            return ck.chunked_scores("local", qs, ts_d, ns_d,
                                     ck.DEFAULT_CHUNK, params=ps_d,
                                     decaying_params=True)
    else:
        ns = np.full(B, n_pad, np.int32)
        ps = np.zeros((B, 6), np.float32)
        ps[:, :5] = [1, -2, -5, -1, -10]
        ps[:, 5] = m_pad
        extra = tuple(jnp.asarray(a) for a in (ts, ns, ps))

        def one(qs):
            return jax.vmap(
                lambda q, t, n, p: local_fill(q, t, n, p, n_pad, False)
            )(qs, *extra)[0]

    @functools.partial(jax.jit, static_argnums=(0,))
    def run_k(K, qs):
        def body(k, carry):
            acc, qs = carry
            sc = one(qs)
            return acc + sc, qs + (sc * 0).astype(qs.dtype)[:, None]

        acc, _ = jax.lax.fori_loop(0, K, body, (jnp.zeros(qs.shape[0]), qs))
        return acc

    qs_d = jnp.asarray(qs)

    def timed(K, reps=3):
        np.asarray(run_k(K, qs_d))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run_k(K, qs_d))
            best = min(best, time.perf_counter() - t0)
        return best

    K1, K2 = 1, 9
    per_fill = (timed(K2) - timed(K1)) / (K2 - K1)
    cells = B * m_pad * n_pad
    gcups = cells / per_fill / 1e9
    pairs_per_sec = B / per_fill

    ref_gcups = _measure_reference_gcups(
        bytes(rng.choice(alpha, m_pad).tolist()),
        bytes(rng.choice(alpha, n_pad).tolist()),
    )
    # SAME-RUN VPU roofline (cross-session probes drift up to 2x through
    # the tunnel): fraction = achieved op rate / measured f32 ceiling,
    # at ~19 effective VPU ops per DP cell (docs/DESIGN.md §4)
    roofline_tops = frac_roofline = None
    if not cpu:
        try:
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "tools"))
            from vpu_probe import roofline_ops_per_sec

            roofline_tops = roofline_ops_per_sec("float32") / 1e12
            frac_roofline = gcups * 1e9 * 19 / (roofline_tops * 1e12)
        except Exception as err:
            print(f"[bench] roofline probe failed: {err}", file=sys.stderr)
    # bucketing pad efficiency on a mixed-length synthetic workload
    # (length-clustered like real read sets: m ~ 300 +- 20%, n ~ 3000
    # +- 25%): true cells / padded cells under the quarter-octave
    # ladder, with the round-1 pow2 ratio alongside
    from aligntools_tpu.batch import _bucket_keys, bucket_len

    wms = np.exp(rng.normal(np.log(300), 0.2, 512)).astype(int)
    wns = np.exp(rng.normal(np.log(3000), 0.25, 512)).astype(int)
    wl = [(b"A" * int(a), b"A" * int(bb)) for a, bb in zip(wms, wns)]
    true_cells = sum(len(q) * len(t) for q, t in wl)
    pad_fine = sum(mp * np_ for mp, np_ in _bucket_keys(wl, 64, 128))
    pad_pow2 = sum(
        bucket_len(len(q), 64, 1) * bucket_len(len(t), 128, 1)
        for q, t in wl
    )

    out = {
        "metric": "sw_affine_gcups",
        "value": round(gcups, 2),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / ref_gcups, 1) if ref_gcups else None,
        "pad_efficiency": round(true_cells / pad_fine, 3),
        "pad_efficiency_pow2": round(true_cells / pad_pow2, 3),
        "pairs_per_sec": round(pairs_per_sec, 1),
        "batch": B,
        "shape": [m_pad, n_pad],
        "fill_ms": round(per_fill * 1e3, 3),
        "engine": eng,
        "reference_gcups": round(ref_gcups, 4) if ref_gcups else None,
        "roofline_f32_tops": round(roofline_tops, 3)
        if roofline_tops else None,
        # >1 is possible: 19 ops/cell is the SPEC-engine estimate and
        # the chunked engine's adaptive scan does fewer passes on
        # typical rows, while the ceiling probe itself reads 10-30% low
        # under tunnel load (DESIGN.md §4)
        "fraction_of_roofline": round(frac_roofline, 3)
        if frac_roofline else None,
        "ops_per_cell_assumed": 19 if frac_roofline else None,
        "backend": jax.devices()[0].platform,
        "device": str(jax.devices()[0].device_kind),
    }
    if degraded:
        out["degraded"] = True  # device backend unavailable; CPU fallback
    if not cpu:
        try:
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
            from linkhealth import link_health

            out["link"] = link_health()
        except Exception:
            pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
