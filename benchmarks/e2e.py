"""End-to-end pipeline benchmark: FASTA file -> `aligntools batch` ->
TSV, with the wall-clock decomposed per stage (parse, encode/bucket,
device fill, traceback walk, TSV format) via utils/profiling.Counters.

This measures the PRODUCT surface (pipeline.run_pipeline — the same code
the `aligntools batch` CLI drives), not the kernel: the gap between the
`fill` stage and total wall time is host work plus the axon tunnel's
per-call latency, and the prefetch thread overlaps chunk k+1's
encode+fill with chunk k's formatting.

    /opt/venv/bin/python benchmarks/e2e.py [--pairs 100000] [--mode local]
        [--rows] [--chunk 16384] [--update-results]

Prints one JSON line per run configuration; --update-results rewrites the
"## End-to-end pipeline" section of benchmarks/RESULTS.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

try:
    import numpy as np
except ImportError:  # bare system python: re-exec under the jax venv
    venv = "/opt/venv/bin/python"
    if os.path.exists(venv) and not sys.executable.startswith("/opt/venv/"):
        os.execv(venv, [venv, os.path.abspath(__file__), *sys.argv[1:]])
    raise

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MARK = "## End-to-end pipeline"


def synth_fasta(path: str, P: int, seed: int = 0) -> int:
    """Clustered synthetic read set (same distribution as bench.py's
    pad-efficiency workload): P pairs, m ~ 300 +-20%, n ~ 3000 +-25%,
    random ACGT content. Returns total true cells."""
    rng = np.random.default_rng(seed)
    ms = np.maximum(1, np.exp(rng.normal(np.log(300), 0.2, P)).astype(int))
    ns = np.maximum(1, np.exp(rng.normal(np.log(3000), 0.25, P)).astype(int))
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    cells = 0
    with open(path, "wb") as f:
        for k in range(P):
            q = rng.integers(0, 4, int(ms[k]))
            t = rng.integers(0, 4, int(ns[k]))
            f.write(b">q%d\n" % k)
            f.write(alpha[q].tobytes() + b"\n")
            f.write(b">t%d\n" % k)
            f.write(alpha[t].tobytes() + b"\n")
            cells += int(ms[k]) * int(ns[k])
    return cells


def run_once(mode: str, fa: str, rows: bool, chunk: int):
    from aligntools_tpu.pipeline import run_pipeline

    out = open(os.devnull, "w")
    return run_pipeline(
        mode, fa, scores_only=not rows, chunk_size=chunk, out=out
    )


def main():
    P = 100_000
    mode = "local"
    rows = False
    chunk = 16384
    update = "--update-results" in sys.argv
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--pairs":
            P = int(argv[i + 1])
        elif a == "--mode":
            mode = argv[i + 1]
        elif a == "--rows":
            rows = True
        elif a == "--chunk":
            chunk = int(argv[i + 1])

    tmp = tempfile.mkdtemp(prefix="aligne2e")
    fa = os.path.join(tmp, "pairs.fa")
    t0 = time.perf_counter()
    cells = synth_fasta(fa, P)
    gen_s = time.perf_counter() - t0

    # cold run = compile + warm caches; then best-of-N warm runs — the
    # tunnel adds up to 2x run-to-run variance on rows runs (round-4
    # e2e_rows.jsonl: 628-916 pairs/s at one config), so a single warm
    # run is not a stable number. All warm walls are reported.
    n_warm = 3 if rows else 2
    run_once(mode, fa, rows, chunk)
    c = run_once(mode, fa, rows, chunk)
    warm_walls = [c.seconds]
    for _ in range(n_warm - 1):
        c2 = run_once(mode, fa, rows, chunk)
        warm_walls.append(c2.seconds)
        if c2.seconds < c.seconds:
            c = c2

    device_rate = c.pairs / c.fill_seconds if c.fill_seconds else None
    rec = {
        "bench": "pipeline_e2e",
        "mode": mode,
        "rows": rows,
        "pairs": c.pairs,
        "true_gcells": round(cells / 1e9, 3),
        "wall_s": round(c.seconds, 3),
        "pairs_per_sec": round(c.pairs_per_sec, 1),
        "effective_gcups": round(c.gcups, 2),
        "pad_efficiency": round(c.pad_efficiency, 3),
        "parse_s": round(c.io_seconds, 3),
        "encode_s": round(c.encode_seconds, 3),
        "fill_s": round(c.fill_seconds, 3),
        "walk_s": round(c.walk_seconds, 3),
        "format_s": round(c.format_seconds, 3),
        "device_rate_pairs_per_sec": round(device_rate, 1)
        if device_rate else None,
        "fraction_of_device_rate": round(
            c.fill_seconds / c.seconds, 3) if c.fill_seconds else None,
        "chunk": chunk,
        "synth_s": round(gen_s, 2),
        "warm_walls_s": [round(w, 3) for w in warm_walls],
    }
    import jax

    rec["backend"] = jax.devices()[0].platform
    try:
        from benchmarks.linkhealth import link_health

        rec["link"] = link_health()
    except Exception:
        pass
    print(json.dumps(rec), flush=True)

    if update:
        _update_results(rec)


def _update_results(rec):
    """Regenerate the e2e section of RESULTS.md from the jsonl sidecar
    (latest record per (mode, rows, pairs) configuration wins)."""
    here = os.path.dirname(os.path.abspath(__file__))
    side = os.path.join(here, "e2e_rows.jsonl")
    with open(side, "a") as f:
        f.write(json.dumps(rec) + "\n")
    latest: dict = {}
    with open(side) as f:
        for ln in f:
            r = json.loads(ln)
            latest[(r["mode"], r["rows"], r["pairs"])] = r

    path = os.path.join(here, "RESULTS.md")
    with open(path) as f:
        text = f.read()
    tail = ""
    if MARK in text:
        head, _, rest = text.partition(MARK)
        # this writer owns ONLY its own section: preserve any later
        # "## " sections (serve mode etc.)
        nxt = rest.find("\n## ")
        if nxt >= 0:
            tail = rest[nxt:]
        text = head.rstrip() + "\n"
    lines = [
        "",
        MARK,
        "",
        "`pipeline.run_pipeline` (the `aligntools batch` CLI path) on the "
        "clustered synthetic read set (m~300, n~3000), warm run, output "
        "to /dev/null. `fill` is device time incl. dispatch+sync; the "
        "prefetch thread overlaps encode+fill of chunk k+1 with "
        "format/write of chunk k, so stages can sum past the wall.",
        "",
        "| mode | rows | pairs | wall s | pairs/s | eff GCUPS | pad eff "
        "| parse | encode | fill | walk | format | fill/wall |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in latest.values():
        lines.append(
            f"| {r['mode']} | {'yes' if r['rows'] else 'score'} | "
            f"{r['pairs']} | {r['wall_s']} | {r['pairs_per_sec']} | "
            f"{r['effective_gcups']} | {r['pad_efficiency']} | "
            f"{r['parse_s']} | {r['encode_s']} | {r['fill_s']} | "
            f"{r['walk_s']} | {r['format_s']} | "
            f"{r['fraction_of_device_rate']} |"
        )
    lines += [
        "",
        "Where the remaining wall goes (measured, rounds 4-5): the axon "
        "host->device link moves 0.05 GB/s and every separate "
        "dispatch/sync round-trips in ~30 ms, so the pipeline ships raw "
        "uint8 chars (2-bit packed when the workload alphabet has <= 4 "
        "letters), widens on device, dispatches every bucket's fill "
        "before syncing any, and pulls one concatenated score vector "
        "per chunk. After that the fill stage is 83-90% of wall and is "
        "itself link-dominated: the chained on-device probes "
        "(probe_chunkgrid.py) put the same fills at 26-78 GCUPS vs the "
        "~7 effective GCUPS seen through the link. Run-to-run variance "
        "through the tunnel is +-20%. The warm in-process rate was "
        "1,338 pairs/s in round 2, 7,711 in round 4, and 8,180 in "
        "round 5 (one-blob bucket transport; rows went 628-916 -> "
        "2,791 pairs/s — early-exit walks, wave collection).",
    ]
    with open(path, "w") as f:
        f.write(text + "\n".join(lines) + "\n" + tail)


if __name__ == "__main__":
    main()
