"""Similarity search over embedding columns.

- cosine_topk_bruteforce: exact top-k for a SMALL query set. The query
  side is broadcast; the corpus streams once per partition. Fine when
  |queries| is bounded (interactive search); the full-corpus-vs-itself
  case must use the bucketed variants below.
- ivf_topk: IVF-style approximate top-k — assign corpus vectors to
  nearest of C centroids (broadcast centroids), probe the nprobe
  nearest centroid buckets per query. Candidate set shrinks by
  ~C/nprobe; at scale the bucket assignment is the only full pass and
  buckets can be written partitioned-by-centroid for reuse.
- embedding near-dup pairs ride the same bucketing (same-bucket
  equi-join) — see workloads/llm.py.

All vector math is expression-based (functions/vectors.py) — no UDF,
no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_dagster_service_crawler_spark.functions.vectors import cosine


def cosine_topk_bruteforce(
    emb: DataFrame, query_ids: list[int], k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of every corpus vector for each query id.
    Deterministic ties: (cos desc, neighbor id asc)."""
    q = emb.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")
    )
    cand = emb.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec"))
    scored = (
        cand.join(F.broadcast(q), F.col("nid") != F.col("qid"))
        .select("qid", "nid", cosine(F.col("qvec"), F.col("nvec")).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "nid", "cos", "rn")
    )


def ivf_assign(
    emb: DataFrame, n_centroids: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """(centroids, assignments). Centroids are the first n vectors by id
    (deterministic seed set — a real build would k-means refine; the
    dataflow is identical). Assignment: broadcast centroids, argmax
    cosine per vector — one scan, no shuffle of the corpus."""
    centroids = emb.orderBy(id_col).limit(n_centroids).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("ccos").desc(), F.col("cid"))
    assignments = (
        emb.join(F.broadcast(centroids))
        .select(
            id_col, vec_col, "cid", cosine(F.col(vec_col), F.col("cvec")).alias("ccos")
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(id_col, vec_col, "cid")
    )
    return centroids, assignments


def ivf_topk(
    emb: DataFrame, query_ids: list[int], k: int = 5,
    n_centroids: int = 16, nprobe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: search only the nprobe closest centroid
    buckets per query."""
    centroids, assignments = ivf_assign(emb, n_centroids, id_col, vec_col)
    q = emb.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")
    )
    wq = Window.partitionBy("qid").orderBy(F.col("qcos").desc(), F.col("cid"))
    probes = (
        q.join(F.broadcast(centroids))
        .select("qid", "qvec", "cid", cosine(F.col("qvec"), F.col("cvec")).alias("qcos"))
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select("qid", "qvec", "cid")
    )
    cand = probes.join(
        assignments.withColumnRenamed(id_col, "nid").withColumnRenamed(vec_col, "nvec"),
        "cid",
    ).where(F.col("nid") != F.col("qid"))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        cand.select("qid", "nid", cosine(F.col("qvec"), F.col("nvec")).alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "nid", "cos", "rn")
    )
