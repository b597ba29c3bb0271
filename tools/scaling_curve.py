"""Measure wall-time SCALING EXPONENTS per query across fixture scales.

Usage:
    python tools/scaling_curve.py [query ...]        # default subset
    python tools/scaling_curve.py --all-bench        # the bench set

Runs each query (min of REPS) at every available scale point —
/root/testdata/sf0.01, /root/testdata/sf0.1, and the x10 replica
/tmp/spark_graft_sf1 when built (tools/make_scale.py) — and prints the
fitted log-log exponent between consecutive points:

    exponent = log(t_hi / t_lo) / log(rows_hi / rows_lo)

~1.0 = linear (the target for map/agg shapes), ~1.5 = the IVF candidate
envelope, ~2.0 = quadratic (only the declared brute-force shapes may
show it). Row counts come from the documents table footer (the corpus
axis all LLM ops scale on); TPC-H-shape queries scale on lineitem,
reported separately.

Caveats printed with the table: sub-second timings are
stage-overhead-bound, so their exponents UNDERSTATE the data term —
judge exponents on the largest pair of points, and only when the
larger time is >= 1 s. One JSON line per query goes to stdout at the
end for machine diffing.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 2
DEFAULT_QUERIES = [
    "agg_hash_group",
    "window_rank_topk",
    "dedup_exact",
    "dedup_minhash_assign",
    "text_quality_score",
    "token_count_bpe",
    "quality_classifier_score",
    "tokenizer_apply_bpe_udf",
    "bpe_train_merges_batched",
    "similarity_pair_histogram",
    "knn_join_auto",
]

SCALE_DIRS = [
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
    "/tmp/spark_graft_sf1",
]


def _rows(sf_dir: str, table: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    from etl_dagster_service_crawler_spark.session import get_spark
    from etl_dagster_service_crawler_spark.workloads import registry

    reg = registry()
    if "--all-bench" in sys.argv:
        names = [n for n, s in reg.items() if s.bench]
    else:
        names = args or DEFAULT_QUERIES
    unknown = [n for n in names if n not in reg]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 1
    dirs = [d for d in SCALE_DIRS if os.path.isdir(d)]
    if len(dirs) < 2:
        print("need at least two scale dirs", file=sys.stderr)
        return 1
    spark = get_spark(app_name="scaling-curve")
    axis = {d: _rows(d, "documents") for d in dirs}
    print(f"# scale points: {[(d, axis[d]) for d in dirs]} (documents rows)")
    out = []
    for name in names:
        fn = reg[name].fn
        times = []
        for d in dirs:
            best = math.inf
            for _ in range(REPS):
                t0 = time.time()
                fn(spark, d).count()
                best = min(best, time.time() - t0)
            times.append(best)
        exps = []
        for i in range(1, len(dirs)):
            ratio_t = times[i] / times[i - 1]
            ratio_n = axis[dirs[i]] / axis[dirs[i - 1]]
            exps.append(math.log(ratio_t) / math.log(ratio_n))
        cells = "  ".join(f"{t:7.2f}s" for t in times)
        ecells = "  ".join(f"{e:+.2f}" for e in exps)
        trust = "ok" if times[-1] >= 1.0 else "overhead-bound"
        print(f"{name:32s} {cells}  exp {ecells}  [{trust}]")
        out.append(
            {"query": name, "times": [round(t, 3) for t in times],
             "exponents": [round(e, 3) for e in exps], "trust": trust}
        )
    print(json.dumps({"scaling": out, "axis": axis}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
