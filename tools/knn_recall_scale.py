"""Recall@5 of knn_join_ivf on a scale replica (VERDICT r4 item 6).

The sqrt(n) centroid sizing changes cell populations as n grows, so the
fixture-scale recall test (tests/test_corpus.py) does not by itself
bound recall at scale. This harness measures it on a make_scale
replica: sample query vectors, brute-force their exact top-5 against
the FULL replica corpus, run the real q_knn_join_ivf, compare.

Usage: python tools/knn_recall_scale.py [replica_dir] [n_sample]
Prints one line `recall@5 = X.XX (floor 0.80)`; exit 1 below floor.
The pytest wrapper (tests/test_corpus.py::test_knn_recall_on_scale_
replica) runs this automatically when the replica dir exists.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# nprobe is calibrated per corpus to KNN_TARGET_RECALL (0.85); the
# floor leaves a small margin for query-sample noise
RECALL_FLOOR = 0.8


def measure(spark, replica_dir: str, n_sample: int = 40) -> float:
    from pyspark.sql import functions as F

    from etl_dagster_service_crawler_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )
    from etl_dagster_service_crawler_spark.workloads.corpus_wl import (
        q_knn_join_ivf,
    )

    emb = spark.read.parquet(f"{replica_dir}/embeddings.parquet")
    # deterministic spread of query ids across the id range (shifted
    # replica copies included), not just the head
    sample_ids = [
        r["vec_id"]
        for r in emb.select("vec_id")
        .where(F.col("vec_id") % 9973 == 0)
        .limit(n_sample)
        .collect()
    ]
    assert sample_ids, "replica has no vec_id divisible by 9973"
    exact = cosine_topk_bruteforce(emb, sample_ids, k=5)
    truth = {(r["qid"], r["nid"]) for r in exact.collect()}
    approx = q_knn_join_ivf(spark, replica_dir).where(
        F.col("qid").isin(sample_ids)
    )
    got = {(r["qid"], r["nid"]) for r in approx.collect()}
    return len(truth & got) / len(truth)


def main() -> int:
    replica = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    n_sample = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    from etl_dagster_service_crawler_spark.session import get_spark

    spark = get_spark(app_name="knn-recall-scale")
    recall = measure(spark, replica, n_sample)
    print(f"recall@5 = {recall:.2f} (floor {RECALL_FLOOR:.2f})")
    return 0 if recall >= RECALL_FLOOR else 1


if __name__ == "__main__":
    sys.exit(main())
