"""Local mimic of the driver's oracle-differential check.

Runs every entry of __spark_entry__.queries() on a chosen sf dir, runs
the matching oracle_sql() through DuckDB on the same parquet files, and
compares row count, schema (column names sorted), and an
order-insensitive value hash. This is the pre-flight for
CORRECTNESS_r{N}.json — any mismatch here is a mismatch there.

Usage: python tools/verify_local.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

import duckdb
import pandas as pd

# __spark_entry__ lives at the repo root (this file's parent dir); the
# package itself resolves installed-first via __spark_entry__'s fallback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # full round-trip precision: the driver hashes exact values, so
        # the pre-flight must too (the r01 %.6g norm let two driver
        # hash-misses pass locally)
        return repr(v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def frame_fingerprint(pdf: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(
        "|".join(_norm_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    )
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(pdf), cols, h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    if os.environ.get("SPARK_GRAFT_PLAIN"):
        # closest mimic of the driver: a bare session with none of
        # get_spark()'s confs — loaders must set what they need
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .appName("verify-local-plain")
            .getOrCreate()
        )
    else:
        from etl_dagster_service_crawler_spark.session import get_spark

        spark = get_spark(app_name="verify-local")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures: list[str] = []
    checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        t0 = time.time()
        try:
            # queries may persist intermediates for their own multi-use
            # plans (minhash hv, verified pairs); over a 300-query sweep
            # those caches would accumulate and pressure executor memory
            # — same isolation rule bench.py applies per query
            spark.catalog.clearCache()
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(spdf)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            opdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {e}")
            continue
        sn, sc, sh = frame_fingerprint(spdf)
        on, oc, oh = frame_fingerprint(opdf)
        ok = (sn, sc, sh) == (on, oc, oh)
        status = "OK  " if ok else "FAIL"
        print(f"{status} {name}: spark({sn} rows, {sh}) oracle({on} rows, {oh})  ({time.time()-t0:.1f}s)")
        if not ok:
            failures.append(name)
            if sc != oc:
                print(f"      columns spark={sc} oracle={oc}")
            if sn == on and sc == oc:
                merged = spdf[sorted(spdf.columns)].copy()
                omerged = opdf[sorted(opdf.columns)].copy()
                srows = sorted(
                    "|".join(_norm_cell(v) for v in r)
                    for r in merged.itertuples(index=False, name=None)
                )
                orows = sorted(
                    "|".join(_norm_cell(v) for v in r)
                    for r in omerged.itertuples(index=False, name=None)
                )
                diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
                for a, b in diffs:
                    print(f"      spark : {a[:200]}")
                    print(f"      oracle: {b[:200]}")

    print(f"\n{checked - len(failures)}/{checked} checked OK; failures: {failures or 'none'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
