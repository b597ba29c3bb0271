"""Runnable tour of the engine: flagship query, an LLM-pipeline op, and
a streaming drain — the three capability families in ~40 lines.

    python examples/demo.py [sf_dir]     # default /root/testdata/sf0.001
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import etl_dagster_service_crawler_spark as eng


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = eng.get_spark(app_name="demo")

    # 1. Relational: the flagship revenue-by-nation plan
    from etl_dagster_service_crawler_spark.plans.flagship import revenue_by_nation

    print("== revenue by nation (top 5)")
    revenue_by_nation(spark, sf_dir).show(5, truncate=False)

    # 2. LLM pipeline: near-dup cluster assignment over documents
    docs = eng.load_table(spark, sf_dir, "documents")
    assigned = eng.minhash_assign_representatives(docs, "doc_id", "text")
    n_docs = docs.count()
    n_clusters = assigned.select("rep_id").distinct().count()
    print(f"== dedup: {n_docs} docs -> {n_clusters} near-dup clusters")

    # 3. Crawl extraction: render a job page and pull the fields back
    # out with the pure-expression chains (reference test.py:168-374)
    from etl_dagster_service_crawler_spark.workloads.sources_wl import (
        q_html_extract_fields,
    )

    print("== markup extraction (3 docs, selected fields)")
    q_html_extract_fields(spark, sf_dir).select(
        "doc_id", "job_name", "salary", "location", "tools"
    ).show(3, truncate=False)

    # 4. Streaming: drain the events stream through a tumbling window
    from etl_dagster_service_crawler_spark.streaming.ingest import (
        run_available_now,
        stream_events,
    )
    from etl_dagster_service_crawler_spark.streaming.windows import tumbling_counts

    print("== streaming tumbling counts (first 5 windows)")
    out = run_available_now(tumbling_counts(stream_events(spark, sf_dir)), "complete")
    out.orderBy("window_start", "event_type").show(5, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
