"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR.

Prints TWO JSON lines, each valid on its own:
  1. the full evidence line — queries, per-run spread, per-window canaries
  2. a final COMPACT line — queries + worst-of canaries only

The driver keeps only a bounded stdout TAIL (~2 KiB): r10 lost one
query's timing because the single verbose line outgrew the tail and was
cut mid-entry. The compact final line is sized to always fit whole at
the tail's end; tools/bench_history.py prefers it for the query set and
scavenges the runs spread from whatever survives of the verbose line.

Each query is timed as a full action (noop-sink write of the result) after a
warm-up of the session. The headline metric is the sum of per-query
wall times — lower is better.

Wall clock on shared VMs swings several-fold with neighbor I/O, so each
query is run SPARK_GRAFT_BENCH_RUNS times (default 3) and the minimum
is reported — the timeit convention: the min is the least-noise
observation of the plan's true cost; means/medians fold the neighbors'
I/O into our number.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        import __spark_entry__ as entrymod
    except ModuleNotFoundError:  # not pip-installed: resolve next to this file
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import __spark_entry__ as entrymod
    from etl_dagster_service_crawler_spark.session import get_spark

    spark = get_spark(app_name="bench")

    # Warm the JVM/codegen path so the first timed query isn't paying
    # session startup.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    bench_names = entrymod.bench_queries() if hasattr(entrymod, "bench_queries") else None
    qs = entrymod.queries()
    if bench_names is None:
        bench_names = list(qs)

    # Steady-state warm-up: run each benched plan once at the smallest
    # SF so the timed pass measures execution, not first-run JIT/codegen
    # compilation of each operator family.
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.001")
    if warm_dir:
        for name in bench_names:
            try:
                qs[name](spark, warm_dir).count()
            except Exception as e:  # noqa: BLE001 - warm-up is best-effort
                print(f"# warmup {name} failed: {e}", file=sys.stderr)

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

    # Environment canaries: fixed workloads whose cost depends only on
    # the machine, never on engine code. A later reader comparing two
    # bench rounds divides their canaries to separate "the machine was
    # slower" from "the plan got slower" (bench_history annotates its
    # REGRESSION flags with exactly that ratio). One CPU-bound codegen
    # loop, one cold-ish parquet scan (neighbor I/O is the dominant
    # noise source on this VM), and — r10, after the r9 adjudication
    # showed the single-threaded probes under-measuring load that hit
    # 32-way-parallel queries 3-5x while the canaries moved only 1.5x —
    # one PARALLEL probe: a fixed 32-task shuffle+aggregate that
    # contends for every core and the shuffle disk exactly like the
    # benched queries do, so bench_history normalizes with a ratio
    # measured at the same parallelism the queries run at.
    def _canary(fn) -> float:
        runs = []
        for _ in range(3):
            t0 = time.time()
            fn()
            runs.append(time.time() - t0)
        return round(min(runs), 3)

    doc_path = os.path.join(sf_dir, "documents.parquet")

    def _cpu_probe():
        spark.range(100_000_000).selectExpr("sum(id * 2 + 1)").collect()

    def _io_probe():
        spark.read.parquet(doc_path).selectExpr("sum(length(text))").collect()

    def _par_probe():
        # 32 map tasks -> hash exchange -> aggregate: saturates the
        # thread pool and the shuffle path with a code-independent,
        # data-independent workload (spark.range is synthesized).
        (
            spark.range(0, 16_000_000, 1, 32)
            .selectExpr("id % 250000 AS k", "id AS v")
            .groupBy("k")
            .agg({"v": "sum"})
            .selectExpr("sum(`sum(v)`)")
            .collect()
        )

    _PROBES = {"cpu": _cpu_probe, "io": _io_probe, "par": _par_probe}
    # one untimed pass per probe first: a probe's first invocation pays
    # whole-stage codegen for ITS plan shape (~2x, measured), which
    # would bias every pre-run window high relative to post-run
    for fn in _PROBES.values():
        fn()
    # pre- and post-run windows are published SEPARATELY (plus the
    # worst-of for back-compat with older bench_history parsers): the
    # post-run probe executes after the full battery (warm page cache,
    # GC-pressured heap), so part of a high post reading can be
    # self-inflicted — the adjudicator should see both windows, not
    # only their max.
    canary_pre = {k: _canary(fn) for k, fn in _PROBES.items()}
    print(f"# canaries (pre-run): {canary_pre}", file=sys.stderr)

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in bench_names:
        fn = qs[name]
        runs: list[float] = []
        for _ in range(n_runs):
            # isolate queries: drop caches persisted by earlier ones
            # (and by this query's previous run)
            spark.catalog.clearCache()
            t0 = time.time()
            df = fn(spark, sf_dir)
            # Force FULL execution without driver-side materialization:
            # the noop sink evaluates every output column JVM-side.
            # count() is NOT a full action — Catalyst prunes unreferenced
            # projections and aggregate value expressions beneath it
            # (a map-only scoring query times as ~0 under count()).
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        n = fn(spark, sf_dir).count()  # row count reported, not timed
        runs.sort()
        timings[name] = round(runs[0], 3)
        # keep every observation so a regression (min creeping up) is
        # distinguishable from one noisy neighbor-I/O run (max spiking)
        spread[name] = [round(t, 3) for t in runs]
        print(
            f"# {name}: {timings[name]}s ({n} rows, min of {n_runs}, "
            f"runs={spread[name]})",
            file=sys.stderr,
        )

    # Re-probe AFTER the query loop: a neighbor-load burst that arrives
    # mid-bench inflates every query it overlaps while a start-only
    # canary stays clean — r9 saw exactly that (10 untouched queries
    # flagged 1.3-2.0x under a best-ever pre-run canary). The flat
    # canary_* keys keep the worst-of-both convention for back-compat;
    # the per-window keys let bench_history adjudicate from each window
    # on its own.
    canary_post = {k: _canary(fn) for k, fn in _PROBES.items()}
    canary_worst = {
        k: max(canary_pre[k], canary_post[k]) for k in _PROBES
    }
    print(
        f"# canaries (post-run): {canary_post}; "
        f"worst-of-both: {canary_worst}",
        file=sys.stderr,
    )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "sum_query_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "runs": spread,
        "sf": sf_val,
        "canary_cpu": canary_worst["cpu"],
        "canary_io": canary_worst["io"],
        "canary_par": canary_worst["par"],
        "canary_pre": canary_pre,
        "canary_post": canary_post,
    }
    print(json.dumps(out))
    # Sidecar file (r15, VERDICT r14 item 5): the driver keeps only a
    # ~2 KiB stdout tail, which truncated most per-query `runs` spreads
    # exactly when a noisy window needed them for adjudication. Persist
    # the FULL evidence line (runs + both canary windows) to a JSONL
    # sidecar next to this file — one appended line per invocation, so
    # consecutive windows stay comparable. Additions-only: stdout is
    # unchanged, and a read-only checkout degrades to a warning.
    sidecar = os.environ.get(
        "SPARK_GRAFT_BENCH_SIDECAR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_runs.jsonl"),
    )
    if sidecar:
        try:
            rec = dict(out)
            rec["wall_clock_utc"] = time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
            )
            with open(sidecar, "a") as fh:
                fh.write(json.dumps(rec, separators=(",", ":")) + "\n")
        except OSError as e:
            print(f"# bench sidecar not written ({sidecar}): {e}", file=sys.stderr)
    # Final compact line: no runs spread, no canary windows, minimal
    # separators — the per-query map itself must survive the driver's
    # stdout-tail capture intact. bench_history merges runs back in
    # from the verbose line (local files) or its surviving tail suffix
    # (driver artifacts); medians degrade gracefully where truncated.
    compact = {
        k: out[k]
        for k in (
            "metric", "value", "unit", "queries", "sf",
            "canary_cpu", "canary_io", "canary_par",
        )
    }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1800:  # tail budget sentinel: split point is queries
        print(
            f"# WARNING: compact bench line is {len(line)} bytes — "
            "approaching the driver's ~2 KiB tail; shard the battery "
            "or shorten query keys",
            file=sys.stderr,
        )
    print(line)


if __name__ == "__main__":
    main()
