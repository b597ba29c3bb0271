"""Python-extension operator surface (SURVEY.md §2.B udf_scalar,
udaf_grouped; reference P9's per-value Python, e.g. is_similar_rgb
test.py:36-39).

UDFs are the engine's slow path (SURVEY §4): anything expressible as a
built-in column expression stays JVM-side. These two queries exist to
prove the Arrow-vectorized escape hatch — pandas_udf for scalar work
and applyInPandas for grouped work — with batch-at-a-time transfer,
never row-at-a-time pickling. Semantics are kept arithmetic-exact
(IEEE add/mul only, no libm) so the DuckDB oracle hashes identically.

At 100 TB: pandas UDFs parallelize per-partition with Arrow batches of
spark.sql.execution.arrow.maxRecordsPerBatch rows; applyInPandas
shuffles by the grouping key, so key cardinality must exceed the
executor count (user_id here: ~unbounded) and groups must fit in
executor memory — both hold for per-user event histories.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from etl_dagster_service_crawler_spark.core import QuerySpec
from etl_dagster_service_crawler_spark.io.tables import load_table


@pandas_udf(T.DoubleType())
def _priority_score(value: pd.Series, user_id: pd.Series) -> pd.Series:
    """Vectorized scalar: a weighted score. Pure IEEE mul/add so Spark,
    numpy, and DuckDB produce bit-identical doubles."""
    return value * 0.7 + (user_id % 10) * 3.5


def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        _priority_score(F.col("value"), F.col("user_id")).alias("score"),
    )


SQL_UDF_SCALAR = """
SELECT event_id, value * 0.7 + (user_id % 10) * 3.5 AS score
FROM events
"""


_USER_STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("max_gap_s", T.DoubleType()),
    ]
)


def _user_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped pandas agg: per-user event count, value sum, and the max
    gap (seconds) between consecutive events — the sessionization
    primitive that needs ordered within-group state."""
    pdf = pdf.sort_values("ts")
    gaps = pdf["ts"].diff().dt.total_seconds()
    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "cnt": [len(pdf)],
            # exact fixed-point sum: float sums depend on row arrival
            # order inside the group; 4-dp cents are order-independent.
            # floor(x*1e4+0.5) is the same per-term snap the engine-side
            # to_cents()/sql_to_cents() use, and floor(x*100+0.5)/100
            # matches fround()/sql_fround().
            "sum_value": [
                (
                    np.floor(pdf["value"] * 1e4 + 0.5).astype("int64").sum()
                    / 1e4
                    * 100.0
                    + 0.5
                )
                // 1
                / 100.0
            ],
            "max_gap_s": [None if len(pdf) < 2 else float(gaps.max())],
        }
    )


def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    return ev.groupBy("user_id").applyInPandas(_user_stats, _USER_STATS_SCHEMA)


SQL_UDAF_GROUPED = """
SELECT user_id,
       count(*) AS cnt,
       floor((CAST(sum(CAST(floor(value * 1e4 + 0.5) AS BIGINT)) AS DOUBLE) / 1e4) * 100.0 + 0.5) / 100.0 AS sum_value,
       max(date_diff('microsecond', prev_ts, ts)) / 1e6 AS max_gap_s
FROM (
  SELECT user_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
)
GROUP BY user_id
"""


def q_udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input row -> many output rows,
    registered and invoked via LATERAL — the P2 list-rows explode as a
    user-defined table function rather than built-in explode. The UDTF
    runs Arrow-batched per partition; no shuffle is introduced."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="i int")
    class ExpandRange:
        def eval(self, n):  # noqa: ANN001 - UDTF eval signature is positional
            for i in range(int(n) + 1):
                yield (i,)

    spark.udtf.register("expand_range", ExpandRange)
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_v")
    return spark.sql(
        """
        SELECT p_partkey, t.i
        FROM part_v, LATERAL expand_range(p_size % 3) t
        """
    )


SQL_UDTF_PYTHON = """
SELECT p_partkey, CAST(unnest(range(0, p_size % 3 + 1)) AS INT) AS i
FROM part
"""


SPECS = [
    QuerySpec("udf_scalar", q_udf_scalar, SQL_UDF_SCALAR),
    QuerySpec("udaf_grouped", q_udaf_grouped, SQL_UDAF_GROUPED),
    QuerySpec("udtf_python", q_udtf_python, SQL_UDTF_PYTHON),
]
