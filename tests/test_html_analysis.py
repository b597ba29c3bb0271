"""The 應徵分析 analysis page (r11 verdict item 1; reference
test.py:414-524) and the composed final record (item 2;
test.py:517-534, 577-580).

Same pinning layers as test_html_extract:
- template equality Python == Spark == DuckDB over the fixture corpus;
- reference semantics: title-dispatched charts survive container
  reorder, the ±5-RGB tolerance assigns gender labels independent of
  block position, the exact-colour replace chain IS the language
  legend_map, entity decode, percentages sum to 100;
- messy markup: absent sections yield '' (never raise, never
  mis-grab);
- the two gender realizations (broadcast theta join vs zero-shuffle
  expression) agree value-for-value;
- the composed record: to_json == concat-built JSON (via the shared
  oracle), from_json round-trips every field, dual sinks land.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_dagster_service_crawler_spark.functions.html_analysis import (
    ANALYSIS_EXTRACT_SQL,
    ANALYSIS_PAGE_SQL,
    GENDER_DIST_SQL,
    GENDER_LEGEND,
    LANG_LEGEND,
    analysis_page_transport,
    render_analysis_page,
)


def _extract_one(spark, html: str) -> dict:
    df = spark.createDataFrame([(html,)], "html string")
    cols = [
        F.expr(e.format(h="html")).alias(f)
        for f, e in ANALYSIS_EXTRACT_SQL.items()
    ]
    return df.select(*cols).collect()[0].asDict()


def _dist_pcts(s: str) -> list[int]:
    return [int(part.split(":")[1].rstrip("%")) for part in s.split("、")]


def test_python_spark_duckdb_render_identical(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.expr(ANALYSIS_PAGE_SQL).alias("html"))
        .collect()
    )
    assert rows
    con = duckdb.connect()
    duck = dict(
        con.sql(
            f"SELECT doc_id, {ANALYSIS_PAGE_SQL} AS html FROM "
            f"'{sf_dir}/documents.parquet'"
        ).fetchall()
    )
    for r in rows:
        py = render_analysis_page(r["doc_id"])
        assert r["html"] == py, f"spark != python for doc {r['doc_id']}"
        assert duck[r["doc_id"]] == py, f"duckdb != python for doc {r['doc_id']}"


def test_transport_serves_the_rendered_page():
    url = "https://example.com/jobs/apply/analysis/42"
    assert analysis_page_transport(url) == render_analysis_page(42)


def test_distributions_sum_to_100_and_gender_assigns_by_rgb(spark):
    from etl_dagster_service_crawler_spark.functions.html import _h_py

    con = duckdb.connect()
    for doc_id in range(24):
        got = _extract_one(spark, render_analysis_page(doc_id))
        for f in ("edu_dist", "age_dist", "exp_dist", "major_dist",
                  "skill_dist", "cert_dist"):
            pcts = _dist_pcts(got[f])
            assert sum(pcts) == 100, (doc_id, f, got[f])
            assert all(p >= 1 for p in pcts), (doc_id, f)
        # language: every level percentage sums to 100 per language
        for part in got["lang_skills"].split("、"):
            name, desc = part.split("=", 1)
            assert name in ("英文", "日文")
            levels = desc.split(",")
            assert [lv[:2] for lv in levels] == ["不會", "略懂", "中等", "精通"]
            assert sum(int(lv[2:].rstrip("%")) for lv in levels) == 100
        # gender blocks parse to ints inside the ±5 band of exactly one
        # legend target each, and male is identified by COLOUR: the
        # male pct is pm regardless of block order (doc parity)
        pm = 10 + _h_py(doc_id, "gen", 81)
        gd = GENDER_DIST_SQL.format(
            **{k: str(got[k]) if got[k] is not None else "NULL"
               for k in ("g1_r", "g1_g", "g1_b", "g2_r", "g2_g", "g2_b")},
            g1_pct=f"'{got['g1_pct']}'",
            g2_pct=f"'{got['g2_pct']}'",
        )
        val = con.sql(f"SELECT {gd}").fetchone()[0]
        assert val == f"男性:{pm}%、女性:{100 - pm}%", (doc_id, val)


def test_entity_decode_and_title_dispatch_survive_reorder(spark):
    # doc 3: %3 == 0 -> 工作經驗 container precedes 年齡; %2 == 1 ->
    # female block first + compact rgb + flipped style attr order
    got = _extract_one(spark, render_analysis_page(3))
    assert got["major_dist"].startswith("資訊工程:")
    assert "AI&資料:" in got["major_dist"]  # &amp; decoded
    assert got["age_dist"].startswith("20~25歲:")  # title-anchored
    assert got["exp_dist"].startswith("1年以下:")
    # doc 3 is odd: block 1 is FEMALE — raw ints near the female target
    assert abs(got["g1_r"] - 255) <= 5 and abs(got["g1_b"] - 199) <= 5
    assert abs(got["g2_r"] - 78) <= 5 and abs(got["g2_b"] - 255) <= 5


def test_one_vs_two_language_items(spark):
    from etl_dagster_service_crawler_spark.functions.html import _h_py

    two = [d for d in range(16) if _h_py(d, "nlang", 2) == 1]
    one = [d for d in range(16) if _h_py(d, "nlang", 2) == 0]
    assert two and one
    got2 = _extract_one(spark, render_analysis_page(two[0]))
    assert got2["lang_skills"].count("、") == 1
    assert got2["lang_skills"].startswith("英文=") and "日文=" in got2["lang_skills"]
    got1 = _extract_one(spark, render_analysis_page(one[0]))
    assert "日文" not in got1["lang_skills"]
    assert got1["lang_skills"].startswith("英文=不會")


def test_messy_markup_absent_sections_yield_empty_never_raise(spark):
    for html in ("", "<html>", "no tags", '<div class="chart-title">年齡</div>'):
        got = _extract_one(spark, html)
        for f in ("edu_dist", "age_dist", "lang_skills"):
            assert got[f] == "", (html, f)
    # a decoy title in a DIFFERENT container must not satisfy the
    # title+body anchor
    got = _extract_one(
        spark,
        '<span>年齡</span><div class="chart-title">證照</div>'
        '<div class="chart-body"><div class="data-line">X<br>100%</div>'
        "</div></div>",
    )
    assert got["age_dist"] == ""
    assert got["cert_dist"] == "X:100%"


def test_gender_join_equals_expression(spark, sf_dir):
    """The broadcast theta join (q_html_extract_analysis) and the
    zero-shuffle expression twin (GENDER_DIST_SQL, used by the record
    pipeline) must assign identical labels on every doc."""
    from etl_dagster_service_crawler_spark.workloads.sources_wl import (
        _analysis_extracted,
        q_html_extract_analysis,
    )

    joined = {
        r["doc_id"]: r["gender_dist"]
        for r in q_html_extract_analysis(spark, sf_dir).collect()
    }
    gcols = {k: k for k in ("g1_r", "g1_g", "g1_b", "g1_pct",
                            "g2_r", "g2_g", "g2_b", "g2_pct")}
    expr = {
        r["doc_id"]: r["gd"]
        for r in _analysis_extracted(spark, sf_dir)
        .select("doc_id", F.expr(GENDER_DIST_SQL.format(**gcols)).alias("gd"))
        .collect()
    }
    assert joined == expr
    assert len(joined) > 0


def test_lang_legend_matches_reference_map():
    # the reference's legend_map (test.py:471-478), exact strings
    assert dict(LANG_LEGEND) == {
        "rgb(255, 231, 217)": "不會",
        "rgb(255, 213, 189)": "略懂",
        "rgb(255, 195, 161)": "中等",
        "rgb(204, 156, 129)": "精通",
    }
    assert [lab for lab, *_ in GENDER_LEGEND] == ["男性", "女性"]
    assert GENDER_LEGEND[0][1:] == (78, 145, 255)
    assert GENDER_LEGEND[1][1:] == (255, 144, 199)


@pytest.mark.parametrize("field", sorted(ANALYSIS_EXTRACT_SQL))
def test_extract_exprs_are_dialect_neutral(field):
    expr = ANALYSIS_EXTRACT_SQL[field]
    assert "\\" not in expr, f"{field} uses a backslash"
    con = duckdb.connect()
    page = render_analysis_page(5).replace("'", "''")
    val = con.sql(
        f"SELECT {expr.format(h='html')} AS v FROM (SELECT '{page}' AS html)"
    ).fetchone()[0]
    assert val is not None


def test_record_roundtrips_from_json_and_lands_dual_sinks(spark, sf_dir):
    from pyspark.sql import types as T

    from etl_dagster_service_crawler_spark.functions.html_analysis import (
        ANALYSIS_FIELDS,
    )
    from etl_dagster_service_crawler_spark.workloads.sources_wl import (
        RECORD_FIELDS,
        q_html_extract_fields,
        q_pipeline_crawl_record,
    )
    from etl_dagster_service_crawler_spark.workloads.io_wl import _scratch

    back = q_pipeline_crawl_record(spark, sf_dir)
    schema = T.StructType(
        [T.StructField(k, T.StringType()) for k, _c in RECORD_FIELDS]
        + [
            T.StructField(
                "應徵分析",
                T.StructType(
                    [T.StructField(k, T.StringType()) for k, _c in ANALYSIS_FIELDS]
                ),
            )
        ]
    )
    parsed = back.select(
        "doc_id", F.from_json("record", schema).alias("rec")
    ).collect()
    detail = {
        r["doc_id"]: r for r in q_html_extract_fields(spark, sf_dir).collect()
    }
    assert len(parsed) == len(detail)
    for row in parsed:
        rec = row["rec"]
        assert rec is not None, "record failed to parse as JSON"
        d = detail[row["doc_id"]]
        for key, col in RECORD_FIELDS:
            assert rec[key] == d[col], (row["doc_id"], key)
        info = rec["應徵分析"]
        assert sum(_dist_pcts(info["學歷"])) == 100
        assert sum(_dist_pcts(info["性別"])) == 100
        assert info["性別"].startswith("男性:")
        assert info["語言能力"].startswith("英文=")
    # the side projection (the reference's com_url list) landed too
    side = spark.read.schema("company_url string").json(
        f"{_scratch(sf_dir, 'crawl_record')}/com_url"
    )
    urls = {r["company_url"] for r in side.collect()}
    assert urls == {d["job_url"] for d in detail.values()}


def test_analysis_plan_single_exchange_and_2row_bnlj(spark, sf_dir):
    """Scale pin: render+extract fuse into the scan; the only exchange
    is the doc_id regroup after the 2-row legend BNLJ."""
    from etl_dagster_service_crawler_spark.workloads.sources_wl import (
        q_html_extract_analysis,
    )

    plan = (
        q_html_extract_analysis(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan
