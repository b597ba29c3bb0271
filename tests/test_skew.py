"""Skew hardening of the LSH label-propagation dedup path.

The 100 TB failure mode: a near-constant corpus (boilerplate pages) puts
a large fraction of all docs into ONE band bucket, and the bucket->label
join funnels that key through a single task. Salting must bound the
per-key fan-in WITHOUT changing any result.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etl_dagster_service_crawler_spark.operators.dedup import (
    _salt_bucket_members,
    minhash_assign_representatives,
    minhash_cluster_cc,
)


def _skewed_corpus(spark, n=1000, hot_every=5):
    """20% of docs are byte-identical (one mega bucket in every band),
    the rest are unique word soup."""
    rng = random.Random(7)
    words = [f"w{i}" for i in range(60)]
    hot_text = "boilerplate terms of service page " + " ".join(words[:20])
    rows = []
    for i in range(n):
        if i % hot_every == 0:
            rows.append((i, hot_text))
        else:
            rows.append((i, " ".join(rng.sample(words, 12)) + f" unique{i}"))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_salting_bounds_hot_bucket_task_input(spark):
    """Max member rows per (bh, salt) join key — one task's input for
    the hot key — must drop from the full bucket size to ~bucket/salts."""
    n_salts = 8
    edges = spark.createDataFrame(
        [(i, 777) for i in range(200)]  # one mega bucket: 200 members
        + [(1000 + i, i) for i in range(100)],  # 100 singleton buckets
        "doc_id bigint, bh bigint",
    )
    hot = spark.createDataFrame([(777, True)], "bh bigint, is_hot boolean")
    salted = _salt_bucket_members(edges, hot, "doc_id", n_salts)
    per_key = salted.groupBy("bh", "salt").count()
    hot_max = (
        per_key.where(F.col("bh") == 777).agg(F.max("count")).first()[0]
    )
    # xxhash spread over 8 salts: expect ~25, assert a generous bound
    # far below the unsalted 200
    assert hot_max <= 200 // n_salts * 3
    assert per_key.where(F.col("bh") == 777).count() == n_salts
    # cold buckets: untouched, salt 0
    assert salted.where((F.col("bh") != 777) & (F.col("salt") != 0)).count() == 0


def test_cc_labels_identical_with_salting_active(spark):
    """Connected-components output is bit-identical whether the mega
    bucket is salted (threshold below its size) or not (threshold
    above) — salting is pure execution strategy."""
    df = _skewed_corpus(spark)
    plain = minhash_cluster_cc(
        df, "doc_id", "text", hot_bucket_rows=10**9
    ).orderBy("doc_id")
    salted = minhash_cluster_cc(
        df, "doc_id", "text", hot_bucket_rows=50, n_salts=8
    ).orderBy("doc_id")
    assert [tuple(r) for r in plain.collect()] == [
        tuple(r) for r in salted.collect()
    ]
    # the mega cluster exists and is labeled by its min id (0)
    hot_rows = [tuple(r) for r in salted.where(F.col("label") == 0).collect()]
    assert len(hot_rows) == 200


def test_assign_labels_identical_with_salting_active(spark):
    df = _skewed_corpus(spark)
    plain = minhash_assign_representatives(
        df, "doc_id", "text", hot_bucket_rows=10**9
    ).orderBy("doc_id")
    salted = minhash_assign_representatives(
        df, "doc_id", "text", hot_bucket_rows=50, n_salts=8
    ).orderBy("doc_id")
    assert [tuple(r) for r in plain.collect()] == [
        tuple(r) for r in salted.collect()
    ]


def test_knn_cells_identical_with_salting_active(spark):
    """A hot IVF cell (many co-located vectors) must produce the SAME
    top-k under forced salting, with the hot cell's members spread over
    the salt sub-keys."""
    import random as _r

    from etl_dagster_service_crawler_spark.operators.similarity import (
        knn_join_cells,
    )

    rng = _r.Random(11)
    rows = []
    # 60 vectors clustered near one direction (one hot cell) + 40 spread
    for i in range(60):
        rows.append((i, [1.0 + rng.gauss(0, 0.01) for _ in range(8)]))
    for i in range(60, 100):
        rows.append((i, [rng.gauss(0, 1.0) for _ in range(8)]))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    plain = knn_join_cells(
        emb, k=3, n_centroids=4, nprobe=2, hot_cell_rows=10**9
    )
    salted = knn_join_cells(
        emb, k=3, n_centroids=4, nprobe=2, hot_cell_rows=20, n_salts=4
    )
    a = {(r["qid"], r["rn"]): r["nid"] for r in plain.collect()}
    b = {(r["qid"], r["rn"]): r["nid"] for r in salted.collect()}
    assert a == b
