"""Synthesize a larger benchmark replica of an sf fixture dir.

Usage: python tools/make_scale.py [src_sf_dir] [out_dir] [factor]
Default: /root/testdata/sf0.1 -> /tmp/spark_graft_sf1, factor 10.

The fixtures only go up to sf0.1; the scaling-curve bench (is any
query super-linear in rows?) needs one larger point. This replicates
each table `factor` times with CONSISTENT key shifts:

- orders.o_orderkey and lineitem.l_orderkey shift together (10x the
  order/lineitem volume over the same customer/part/supplier base —
  the realistic growth axis).
- events.event_id shifts; ts/user_id stay (10x event volume, same
  users and time range — hot keys keep their skew).
- documents.doc_id shifts and copy k>0 appends a ' c{k}' token, so
  texts are near-dup (jaccard ~0.97) across copies, not byte-equal:
  exact dedup sees 10x distinct rows, MinHash sees 10-doc clusters —
  a re-crawl-heavy corpus, the honest hard case for the dedup family.
- embeddings.vec_id shifts, vectors repeat (cost of similarity ops is
  row-count-bound, not value-bound).
- dimension tables (region nation customer supplier part) copy as-is.

Each table lands as ONE parquet file named {table}.parquet to mirror
the fixture layout (the streaming symlink staging expects that name).
This is a BENCH input, never an oracle fixture — correctness stays at
the driver scales.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

SHIFT = 100_000_000


def _write_single_file(df: DataFrame, out_dir: str, name: str) -> None:
    stage = f"{out_dir}/.stage_{name}"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(f"{stage}/part-*.parquet")[0]
    shutil.move(part, f"{out_dir}/{name}.parquet")
    shutil.rmtree(stage)


def scale(spark, src: str, out: str, factor: int) -> None:
    from etl_dagster_service_crawler_spark.io.tables import TABLES, load_table

    os.makedirs(out, exist_ok=True)
    plans: dict[str, DataFrame] = {}
    for name in TABLES:
        base = load_table(spark, src, name)
        if name in ("region", "nation", "customer", "supplier", "part"):
            plans[name] = base
            continue
        if name == "events":
            # write ts as NTZ micros (the fixture's micros generation):
            # the default writer would emit INT96, which pyarrow reports
            # as timestamp[ns] and the stream reader's nanos detection
            # then mis-types the column
            base = base.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        copies = []
        for k in range(factor):
            c = base
            if name == "orders":
                c = c.withColumn("o_orderkey", F.col("o_orderkey") + k * SHIFT)
            elif name == "lineitem":
                c = c.withColumn("l_orderkey", F.col("l_orderkey") + k * SHIFT)
            elif name == "events":
                c = c.withColumn("event_id", F.col("event_id") + k * SHIFT)
            elif name == "documents":
                c = c.withColumn("doc_id", F.col("doc_id") + k * SHIFT)
                if k > 0:
                    c = c.withColumn(
                        "text", F.concat(F.col("text"), F.lit(f" c{k}"))
                    ).withColumn("n_chars", F.length("text"))
            elif name == "embeddings":
                c = c.withColumn("vec_id", F.col("vec_id") + k * SHIFT)
            copies.append(c)
        out_df = copies[0]
        for c in copies[1:]:
            out_df = out_df.unionByName(c)
        plans[name] = out_df
    for name, df in plans.items():
        _write_single_file(df, out, name)
        print(f"wrote {name}", flush=True)


def main() -> None:
    from etl_dagster_service_crawler_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark(app_name="make_scale")
    scale(spark, src, out, factor)


if __name__ == "__main__":
    main()
