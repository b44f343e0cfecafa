"""``aligntools`` CLI — byte-parity result surface over the TPU engine.

Mirrors the reference binary's observable stdout exactly (reference:
src/main.c:6-57 and the five main_* entry points in src/alignment.h):

  * ``score=%f`` + two gapped rows for global/local/fit (alignment.h:509);
  * overlap prints a BARE ``%f`` (no prefix; alignment.h:1000);
  * ``edit_distance=%d`` (alignment.h:345);
  * ``fit -s`` echoes the second record's raw header comment before the
    results (alignment.h:249);
  * success epilogue ``[main] Version:`` / ``[main] CMD:`` on stderr
    (main.c:49-55); unknown command -> ``[main] unrecognized command``.

Documented divergences (QUIRKS.md): options work for ``overlap`` (the
reference reads argv[1] as the filename and dies on any option,
alignment.h:994); fit's stray debug line is not printed; ``edit -e`` takes
a value and is ignored (the reference's optstring makes it UB).

POSIX option parsing (options before the file argument) via getopt, like
the reference.
"""

from __future__ import annotations

import getopt
import os
import sys

from aligntools_tpu.params import AlignParams
from aligntools_tpu.version import __version__

_OPTSTRINGS = {
    # reference optstrings: global/local/overlap "m:u:o:e:j:s" with -j/-s
    # falling through to `default: return 1` (alignment.h:481-488) — we
    # reject them with a message instead of silently; fit takes them for
    # real; edit's broken "m:u:o:e" is fixed to take a (dead) -e value.
    "global": "m:u:o:e:",
    "local": "m:u:o:e:",
    "fit": "m:u:o:e:j:s",
    "overlap": "m:u:o:e:",
    "edit": "m:u:o:e:",
}


def _usage() -> int:
    sys.stderr.write(
        "\n"
        "Program: aligntools (TPU-native pairwise sequence alignment)\n"
        f"Version: {__version__}\n\n"
        "Usage:   aligntools <command> [options] <target.fa>\n\n"
        "Command: global     global (Needleman-Wunsch) alignment, affine gap\n"
        "         local      local (Smith-Waterman) alignment, affine gap\n"
        "         fit        fit alignment, affine gap plus junction jump state\n"
        "         overlap    overlap alignment\n"
        "         edit       edit distance\n"
        "         batch      many-pair batched pipeline (TSV output)\n"
        "         serve      long-lived request loop (stdin/stdout)\n"
        "\n"
    )
    return 1


def _sub_usage(mode: str, p: AlignParams) -> int:
    lines = [
        "",
        f"Usage:   aligntools {mode} [options] <target.fa>",
        "",
        f"Options: -m INT   score for a match [{p.match}]",
        f"         -u INT   mismatch penalty [{p.mismatch}]",
        f"         -o INT   gap open penalty [{p.gap_open}]",
        f"         -e INT   gap extension penalty [{p.gap_extend}]",
    ]
    if mode == "fit":
        lines += [
            f"         -j INT   jump penalty [{p.jump}]",
            "         -s       junction sites from 2nd record's comment",
        ]
    sys.stderr.write("\n".join(lines) + "\n\n")
    return 1


def _c_atoi(s: str) -> int:
    from aligntools_tpu.io.fasta import c_atoi

    return c_atoi(s.encode())


def run_subcommand(mode: str, args: list[str]) -> int:
    p = AlignParams()
    try:
        opts, rest = getopt.getopt(args, _OPTSTRINGS[mode])
    except getopt.GetoptError as err:
        sys.stderr.write(f"aligntools {mode}: {err}\n")
        return 1
    use_sites = False
    for flag, val in opts:
        if flag == "-m":
            p = p.replace(match=_c_atoi(val))
        elif flag == "-u":
            p = p.replace(mismatch=_c_atoi(val))
        elif flag == "-o":
            p = p.replace(gap_open=_c_atoi(val))
        elif flag == "-e":
            p = p.replace(gap_extend=_c_atoi(val))
        elif flag == "-j":
            p = p.replace(jump=_c_atoi(val))
        elif flag == "-s":
            use_sites = True
    if not rest:
        return _sub_usage(mode, p)
    path = rest[-1]
    from aligntools_tpu.api import align_file

    try:
        result, pair = align_file(mode, path, p, use_sites)
    except (OSError, ValueError, RuntimeError) as err:
        sys.stderr.write(f"FATAL ERROR: {err}\n")
        return 255  # the reference's die() -> exit(-1) (alignment.h:69-79)
    out = sys.stdout
    if mode == "edit":
        out.write(f"edit_distance={result}\n")
    elif mode == "overlap":
        out.write(f"{result.score:.6f}\n")
        out.write(result.row1.decode("latin-1") + "\n")
        out.write(result.row2.decode("latin-1") + "\n")
    else:
        if mode == "fit" and use_sites and pair.comment2 is not None:
            # junction echo line (alignment.h:249)
            out.write(pair.comment2.decode("latin-1") + "\n")
        out.write(f"score={result.score:.6f}\n")
        out.write(result.row1.decode("latin-1") + "\n")
        out.write(result.row2.decode("latin-1") + "\n")
    return 0


def _select_backend() -> None:
    """Single-pair CLI runs default to the CPU backend: one pair cannot
    saturate a TPU and the device tunnel adds seconds of dispatch/compile
    latency, so CPU is strictly faster for the reference's one-pair-per-
    invocation usage. Set ALIGNTOOLS_DEVICE=tpu (or any backend name) to
    override — the batch pipeline (pipeline.py) targets the TPU by default.
    """
    want = os.environ.get("ALIGNTOOLS_DEVICE", "cpu")
    if "jax" in sys.modules:
        try:
            import jax

            jax.config.update("jax_platforms", want)
        except Exception:
            pass  # unknown backend names surface on first jax use
    else:
        # jax not loaded yet (axon gate var unset): pin the platform via
        # the environment so a LATER jax import — if any — agrees, without
        # paying the ~2.2 s import now. The numpy spec path (the default
        # single-pair route) then never imports jax at all (VERDICT r2 #7).
        os.environ["JAX_PLATFORMS"] = want
    _enable_compile_cache()


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache: each CLI invocation is a fresh
    process, so without it every run recompiles its bucket kernels.
    CPU-backend only: executables deserialized from the cache fail with
    FAILED_PRECONDITION under the axon remote-compile TPU backend."""
    if "jax" not in sys.modules:
        # Deferred-jax cold path: arrange the cache via the env vars jax
        # reads at import, costing nothing unless jax actually loads.
        # Skip under a forced multi-device host (the shard_map serialize
        # SIGABRT guard below can't be checked without importing jax).
        if os.environ.get("JAX_PLATFORMS", "").split(",")[0] != "cpu":
            return
        if "xla_force_host_platform_device_count" in os.environ.get(
            "XLA_FLAGS", ""
        ):
            return
        cache = os.environ.get(
            "ALIGNTOOLS_JAX_CACHE",
            os.path.expanduser("~/.cache/aligntools-jax"),
        )
        try:
            os.makedirs(cache, exist_ok=True)
        except OSError:
            return
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache)
        os.environ.setdefault(
            "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5"
        )
        return
    try:
        import jax

        if jax.config.jax_platforms not in ("cpu",):
            return
        if jax.device_count() > 1:
            # multi-device (virtual-device test meshes / sharded CPU
            # runs): XLA's LoadedExecutable.serialize() can hard-abort
            # (SIGABRT) on shard_map executables in a long-lived process
            # (observed under the 8-virtual-device suite). The cache only
            # exists to speed cold single-pair CLI processes; skip it.
            return
        cache = os.environ.get(
            "ALIGNTOOLS_JAX_CACHE",
            os.path.expanduser("~/.cache/aligntools-jax"),
        )
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def run_batch(args: list[str]) -> int:
    """``aligntools batch <mode> [options] <pairs.fa>`` — many-pair
    throughput pipeline (records pair consecutively; TSV to stdout).
    New surface (no reference analog); long options, argparse."""
    import argparse

    ap = argparse.ArgumentParser(
        prog="aligntools batch",
        description="Batched alignment of many pairs on TPU/CPU",
    )
    ap.add_argument("mode", choices=["global", "local", "fit", "overlap",
                                     "edit"])
    ap.add_argument("fasta", help="multi-record FASTA/Q (gz ok); records "
                                  "pair up consecutively (q1,t1,q2,t2,...)")
    ap.add_argument("-m", type=int, default=1, help="match score")
    ap.add_argument("-u", type=int, default=-2, help="mismatch penalty")
    ap.add_argument("-o", type=int, default=-5, help="gap open penalty")
    ap.add_argument("-e", type=int, default=-1, help="gap extension penalty")
    ap.add_argument("-j", type=int, default=-10, help="fit jump penalty")
    ap.add_argument("-s", action="store_true",
                    help="fit: junction sites from each target's comment")
    ap.add_argument("--scores-only", action="store_true",
                    help="skip traceback (fastest)")
    ap.add_argument("--cigar", action="store_true",
                    help="emit CIGAR strings instead of gapped rows")
    ap.add_argument("--band", type=int, default=None, metavar="W",
                    help="banded fill, O(m*W) work: full rows (or scores "
                         "with --scores-only); exact when the optimal "
                         "path stays in band")
    ap.add_argument("--sharded", action="store_true",
                    help="data-parallel over all devices (scores only)")
    # 16384 measured optimal through the tunnel (benchmarks/e2e.py):
    # the old 512 default cost 8x in per-chunk dispatch waves + pulls
    ap.add_argument("--chunk-size", type=int, default=16384)
    ap.add_argument("--out", metavar="FILE", default=None,
                    help="output TSV file owned by the pipeline (with "
                         "--resume: crash-atomic chunk checkpointing)")
    ap.add_argument("--resume", metavar="MANIFEST",
                    help="chunk manifest for checkpoint/resume")
    ap.add_argument("--trace", metavar="DIR",
                    help="write a jax.profiler trace to DIR")
    ap.add_argument("--engine", choices=["auto", "xla", "pallas"],
                    default="auto")
    ap.add_argument("--device", default=None,
                    help="jax platform override (default: tpu if available)")
    ns = ap.parse_args(args)
    if ns.device:
        os.environ["ALIGNTOOLS_DEVICE"] = ns.device
        _select_backend()
    from aligntools_tpu.params import AlignParams
    from aligntools_tpu.pipeline import run_pipeline

    p = AlignParams(match=ns.m, mismatch=ns.u, gap_open=ns.o,
                    gap_extend=ns.e, jump=ns.j)
    if ns.resume and not ns.out:
        sys.stderr.write(
            "[batch] note: --resume without --out checkpoints chunk "
            "completion only; add --out FILE for crash-atomic output\n"
        )
    try:
        counters = run_pipeline(
            ns.mode, ns.fasta, p, use_sites=ns.s,
            scores_only=ns.scores_only, sharded=ns.sharded,
            chunk_size=ns.chunk_size, manifest_path=ns.resume,
            out_path=ns.out,
            trace_dir=ns.trace, engine=ns.engine, cigar=ns.cigar,
            band=ns.band,
        )
    except (OSError, ValueError, RuntimeError) as err:
        sys.stderr.write(f"FATAL ERROR: {err}\n")
        return 255
    counters.report()
    return 0


def _maybe_exec_native(argv: list[str]) -> None:
    """Single-pair cold-start fast path: replace this process with the
    native C++ CLI (native/aligntools_cli — byte-identical surface,
    differentially tested in tests/test_native_cli.py) when it can be
    (re)built. ~4 ms per invocation vs ~0.4 s through the numpy spec
    engine — the one workload where interpreter start dominates.

    Mirrors native.py's freshness policy: `make -q` first, so a stale
    binary is rebuilt rather than trusted. Any failure (no make, no
    toolchain, installed without the native tree, ALIGNTOOLS_NO_NATIVE)
    falls through silently to the Python engines."""
    if os.environ.get("ALIGNTOOLS_NO_NATIVE"):
        return
    if os.environ.get("ALIGNTOOLS_DEVICE", "cpu") != "cpu":
        return  # explicit device request: route through the jax engines
    ndir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir, "native"
    )
    binary = os.path.join(ndir, "aligntools_cli")
    if not os.path.isdir(ndir):
        return
    import subprocess

    try:
        q = subprocess.run(
            ["make", "-C", ndir, "-q", "aligntools_cli"],
            capture_output=True, timeout=60,
        )
        if q.returncode != 0:  # out of date (1) — rebuild; errors fall out
            b = subprocess.run(
                ["make", "-C", ndir, "aligntools_cli"],
                capture_output=True, timeout=300,
            )
            if b.returncode != 0:
                return
        if os.access(binary, os.X_OK):
            sys.stderr.flush()
            sys.stdout.flush()
            os.execv(binary, argv)
    except Exception:
        return  # exec itself raising OSError also lands here


def main(argv: list[str] | None = None) -> int:
    # The native exec only fires when we own the process (console-script
    # entry, argv is None); in-process library/test callers pass argv
    # explicitly and must get the Python path, not an execv.
    own_process = argv is None
    argv = list(sys.argv if argv is None else argv)
    if own_process and len(argv) >= 2 and argv[1] in _OPTSTRINGS:
        _maybe_exec_native(argv)
    if len(argv) >= 2 and argv[1] == "serve":
        # long-lived request loop (keeps compiled kernels warm); targets
        # the device by default like `batch`
        if os.environ.get("ALIGNTOOLS_DEVICE"):
            _select_backend()
        else:
            _enable_compile_cache()
        from aligntools_tpu.serve import serve

        return serve()
    if len(argv) >= 2 and argv[1] == "calibrate":
        # one-time engine-crossover measurement on the attached device;
        # cached per device kind next to the compile cache
        from aligntools_tpu.engine.autotune import calibrate

        try:
            calibrate(force="--force" in argv[2:])
        except RuntimeError as err:
            sys.stderr.write(f"FATAL ERROR: {err}\n")
            return 255
        return 0
    if len(argv) >= 2 and argv[1] == "batch":
        # batch is the only surface that targets the device by default
        # (keeps the container's JAX_PLATFORMS, i.e. the TPU when present);
        # ALIGNTOOLS_DEVICE / --device override.
        if os.environ.get("ALIGNTOOLS_DEVICE"):
            _select_backend()
        else:
            _enable_compile_cache()
        return run_batch(argv[2:])
    _select_backend()
    if len(argv) < 2:
        return _usage()
    mode = argv[1]
    if mode not in _OPTSTRINGS:
        sys.stderr.write(f"[main] unrecognized command '{mode}'\n")
        return 1
    ret = run_subcommand(mode, argv[2:])
    if ret == 0:
        sys.stderr.write(f"[main] Version: {__version__}\n")
        sys.stderr.write("[main] CMD: " + " ".join(argv) + "\n")
    return ret


if __name__ == "__main__":
    sys.exit(main())
