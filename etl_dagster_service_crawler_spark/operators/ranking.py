"""Distributed global ranking: exact ``ntile`` over a total ordering
without the single-task global-sort window.

``Window.orderBy(...)`` with no partition key — the way ``ntile`` is
usually written — serializes the WHOLE frame through one task; at
100 TB that one executor is the pipeline. This module implements the
same exact semantics with the distributed prefix-sum idiom already
proven by ``q_pareto_customer_share`` (analytics_wl.py):

  1. ``repartitionByRange`` on the ordering — globally ordered across
     partitions, parallel within;
  2. per-partition ``row_number`` (hash-partitioned window on the
     range-partition id, all partitions in parallel);
  3. per-partition row counts cumulated over the partition-id frame —
     the only serial window, ``num_parts`` rows, constant-sized —
     broadcast back as offsets; global rank = offset + local rank;
  4. the closed-form ntile bucket from (rank, n, k), in exact integer
     arithmetic.

Exactness: ntile(k) over n rows puts ``n % k`` buckets of size
``n div k + 1`` first, then buckets of size ``n div k`` (SQL standard,
matched by both Spark and DuckDB), so the bucket is a pure function of
the global 1-based rank — no interpolation, no approximation, ties
broken by whatever tiebreak the caller puts in ``order_by``. Range
boundaries never affect the output: the range sampler seeds per input
partition index, so re-evaluating the ranged frame inside one query
yields consistent partition ids (same guarantee pareto relies on).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_RANGE_PARTS = 16

_INTERNAL = ("__dnt_pid", "__dnt_rank", "__dnt_n")


def global_rank(
    df: DataFrame,
    order_by: list[Column],
    num_parts: int = DEFAULT_RANGE_PARTS,
    sum_col: Column | None = None,
) -> DataFrame:
    """Add exact global 1-based ``__dnt_rank`` and total-count
    ``__dnt_n`` columns under the ``order_by`` total ordering, fully
    distributed (no unpartitioned window). ``order_by`` must be a
    total order (include a unique tiebreak) for deterministic output.

    When ``sum_col`` is given, additionally emit ``__dnt_cum`` — the
    running sum of that expression in rank order (inclusive of the
    current row) — by the same two-level decomposition: the
    per-partition local cumsum rides the SAME partitioned window as the
    rank, and the constant-size offsets frame carries one extra column
    (r12: the vocab_coverage_curve fix; any global ``sum() OVER
    (ORDER BY ...)`` gets this shape for free). The input type is
    PRESERVED: integer columns sum exactly; fractional columns sum
    with partition-order association, so integerize first (the repo's
    float discipline) when cross-engine exactness matters.
    """
    ranged = df.repartitionByRange(num_parts, *order_by).withColumn(
        "__dnt_pid", F.spark_partition_id()
    )
    if sum_col is not None:
        ranged = ranged.withColumn("__dnt_val", sum_col)
    # NB (r14, measured): do NOT persist `ranged` — although two
    # branches consume it (offsets aggregate + ranked join), both read
    # the IDENTICAL range exchange and Spark plans the second as a
    # ReusedExchange, so the upstream already executes once. An eager
    # persist added a count job per call and measured slightly SLOWER
    # on the 3-deep rfm nesting (2.60 s vs 2.45 s interleaved mins).
    aggs = [F.count(F.lit(1)).alias("__dnt_pcnt")]
    if sum_col is not None:
        aggs.append(F.sum("__dnt_val").alias("__dnt_psum"))
    part_counts = ranged.groupBy("__dnt_pid").agg(*aggs)
    prior = Window.orderBy("__dnt_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    everything = Window.orderBy("__dnt_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off_cols = [
        F.col("__dnt_pid"),
        F.coalesce(F.sum("__dnt_pcnt").over(prior), F.lit(0)).alias(
            "__dnt_off"
        ),
        F.sum("__dnt_pcnt").over(everything).alias("__dnt_n"),
    ]
    if sum_col is not None:
        off_cols.append(
            F.coalesce(F.sum("__dnt_psum").over(prior), F.lit(0)).alias(
                "__dnt_soff"
            )
        )
    offsets = part_counts.select(*off_cols)
    wp = Window.partitionBy("__dnt_pid").orderBy(*order_by)
    out = (
        ranged.join(F.broadcast(offsets), "__dnt_pid")
        .withColumn(
            "__dnt_rank",
            F.row_number().over(wp).cast("bigint") + F.col("__dnt_off"),
        )
        .drop("__dnt_off")
    )
    if sum_col is not None:
        out = (
            out.withColumn(
                "__dnt_cum",
                F.sum("__dnt_val").over(
                    wp.rowsBetween(Window.unboundedPreceding, 0)
                )
                + F.col("__dnt_soff"),
            )
            .drop("__dnt_soff", "__dnt_val")
        )
    return out


def distributed_ntile(
    df: DataFrame,
    k: int,
    order_by: list[Column],
    out_col: str,
    num_parts: int = DEFAULT_RANGE_PARTS,
) -> DataFrame:
    """Exact ``ntile(k) OVER (ORDER BY order_by)`` as a new column
    ``out_col``, computed distributed. Output columns = input columns
    + ``out_col`` (internal pid/rank columns are dropped), so calls
    compose: three RFM quintiles are three successive calls, each one
    range exchange over the frame, all parallel."""
    ranked = global_rank(df, order_by, num_parts=num_parts)
    r, n = F.col("__dnt_rank"), F.col("__dnt_n")
    # SQL-standard ntile: rem = n % k big buckets of size q+1 first.
    big = F.expr(f"(__dnt_n % {k}) * ((__dnt_n div {k}) + 1)")
    bucket = (
        F.when(
            r <= big,
            F.expr(f"(__dnt_rank - 1) div ((__dnt_n div {k}) + 1) + 1"),
        ).otherwise(
            F.expr(
                f"(__dnt_n % {k}) + ("
                f"(__dnt_rank - (__dnt_n % {k}) * ((__dnt_n div {k}) + 1) - 1)"
                f" div (__dnt_n div {k})) + 1"
            )
        )
    ).cast("int")
    return ranked.withColumn(out_col, bucket).drop(*_INTERNAL)
