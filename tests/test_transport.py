"""The REAL network transports (operators/transport.py) against a
local fixture HTTP server — the first second implementation behind the
crawl/enrich seams (r5/r6 VERDICT "What's missing" #1). The contract
under test is the one the retry/budget machinery assumes: transient
delivery failures retry, permanent ones fail fast, and a crawl through
HTTP equals a crawl through the deterministic fake."""

from __future__ import annotations

import pytest

from etl_dagster_service_crawler_spark.operators.enrich import (
    PermanentFetchError,
    TransientFetchError,
    http_enrich,
)
from etl_dagster_service_crawler_spark.operators.transport import (
    http_page_transport,
    http_transport,
)
from tools.fixture_http_server import start_fixture_server


@pytest.fixture(scope="module")
def httpd():
    srv, base = start_fixture_server()
    yield base
    srv.shutdown()


def test_http_transport_ok(httpd):
    fetch = http_transport()
    assert fetch(f"{httpd}/detail/abc") == "payload-for-abc"


def test_http_transport_404_is_permanent(httpd):
    fetch = http_transport()
    with pytest.raises(PermanentFetchError):
        fetch(f"{httpd}/gone/anything")


def test_http_transport_5xx_is_transient(httpd):
    fetch = http_transport()
    with pytest.raises(TransientFetchError):
        fetch(f"{httpd}/flaky/x?fails=99")


def test_http_transport_connection_refused_is_transient():
    fetch = http_transport(timeout_s=2.0)
    # an unroutable local port: delivery failure, retryable by contract
    with pytest.raises(TransientFetchError):
        fetch("http://127.0.0.1:1/detail/never")


def test_http_enrich_over_real_transport(spark, httpd):
    """End-to-end through the mapInPandas stage: ok rows fetch, a
    flaky URL succeeds on retry (n_attempts > 1), a 404 fails in ONE
    attempt (PermanentFetchError short-circuits the retry loop), and
    no row is ever dropped."""
    df = spark.createDataFrame(
        [
            (1, f"{httpd}/detail/one"),
            (2, f"{httpd}/flaky/two?fails=1"),
            (3, f"{httpd}/gone/three"),
        ],
        "id int, url string",
    )
    out = {
        r["id"]: r
        for r in http_enrich(
            df, "url", transport=http_transport(), max_retries=3, backoff_s=0.01
        ).collect()
    }
    assert len(out) == 3
    assert out[1]["fetch_status"] == "ok"
    assert out[1]["payload"] == "payload-for-one"
    assert out[1]["n_attempts"] == 1
    assert out[2]["fetch_status"] == "ok"
    assert out[2]["payload"] == "payload-for-two"
    assert out[2]["n_attempts"] == 2  # one 503, then success
    assert out[3]["fetch_status"] == "error"
    assert out[3]["payload"] is None
    assert out[3]["n_attempts"] == 1  # permanent: no wasted retries


def test_page_transport_rows_match_fake(httpd):
    rows = http_page_transport(f"{httpd}/listing")(1, "etl", 2, 3)
    assert rows == [
        ("etl", 2, 0, 10200, "job-etl-10200", "https://example.com/company/25"),
        ("etl", 2, 1, 10201, "job-etl-10201", "https://example.com/company/26"),
        ("etl", 2, 2, 10202, "job-etl-10202", "https://example.com/company/27"),
    ]


def test_crawl_source_over_http_equals_fake(spark, httpd):
    """The registered DataSource with an http:// transport spec must
    produce exactly the fake-transport scan (the fixture endpoint
    implements the same arithmetic), resolving the transport
    worker-side from the option string."""
    from etl_dagster_service_crawler_spark.sources.crawl_source import register

    register(spark)
    via_http = (
        spark.read.format("crawl")
        .option("transport", f"{httpd}/listing")
        .load()
    )
    via_fake = spark.read.format("crawl").load()
    assert sorted(map(tuple, via_http.collect())) == sorted(
        map(tuple, via_fake.collect())
    )


def test_crawl_source_http_error_budget(spark, httpd):
    """A listing page that always 500s: within budget the page is
    skipped (its rows are simply absent); with a zero budget the scan
    raises after exhausting retries."""
    from etl_dagster_service_crawler_spark.sources.crawl_source import register

    register(spark)
    reader = (
        spark.read.format("crawl")
        .option("transport", f"{httpd}/badlisting")
        .option("keywords", "spark")
        .option("fetch_retries", 1)
    )
    ok = reader.option("error_budget", 1).load()
    pages = sorted(r["page"] for r in ok.select("page").distinct().collect())
    assert pages == [0, 2]  # page 1 failed its budgeted attempts -> skipped
    with pytest.raises(Exception, match="error budget"):
        reader.option("error_budget", 0).load().collect()


def test_ua_rotation_round_robin(httpd):
    """user_agents=[...] rotates per fetch (reference parity with
    fake-useragent, test.py:67-68), observed by the fixture /ua echo;
    without the option the pinned engine UA is sent every time."""
    uas = ["ua-alpha/1", "ua-beta/2", "ua-gamma/3"]
    fetch = http_transport(user_agents=uas)
    seen = [fetch(f"{httpd}/ua") for _ in range(7)]
    assert seen == (uas * 3)[:7]
    plain = http_transport()
    assert {plain(f"{httpd}/ua") for _ in range(3)} == {
        "spark-graft-crawler/1.0"
    }


def test_render_transport_contract():
    """The JS-rendering seam (r7 'What's missing' #1): driver reuse
    across fetches, transient classification + driver teardown on a
    wedged browser, fail-fast with guidance when no factory is given."""
    from etl_dagster_service_crawler_spark.operators.transport import (
        render_transport,
    )

    class FakeDriver:
        launches = 0

        def __init__(self):
            FakeDriver.launches += 1
            self.quit_called = False
            self.fail_next = False

        def get(self, url):
            if self.fail_next:
                raise RuntimeError("tab crashed")
            self.page_source = f"<html>rendered:{url}</html>"

        def quit(self):
            self.quit_called = True

    made = []

    def factory():
        d = FakeDriver()
        made.append(d)
        return d

    fetch = render_transport(factory, wait_s=0.0)
    assert fetch("http://x/1") == "<html>rendered:http://x/1</html>"
    assert fetch("http://x/2") == "<html>rendered:http://x/2</html>"
    assert FakeDriver.launches == 1  # one driver, reused
    # a wedged driver: transient error, driver torn down, next fetch
    # gets a FRESH browser instead of the poisoned one
    made[0].fail_next = True
    with pytest.raises(TransientFetchError):
        fetch("http://x/3")
    assert made[0].quit_called
    assert fetch("http://x/4") == "<html>rendered:http://x/4</html>"
    assert FakeDriver.launches == 2
    # no browser supplied: fail fast at BUILD time, naming the seam
    with pytest.raises(NotImplementedError, match="driver_factory"):
        render_transport()


def test_synth_user_agents_deterministic_pool(httpd):
    """Generated UA pool (reference parity: fake-useragent,
    requirements.txt:8): n DISTINCT plausible browser UAs from a seed,
    rerun-stable (same seed => identical pool, different seed =>
    different pool), and the fixture /ua echo sees every one when fed
    through http_transport's rotation."""
    from etl_dagster_service_crawler_spark.operators.transport import (
        synth_user_agents,
    )

    pool = synth_user_agents(8, seed=42)
    assert len(pool) == 8 and len(set(pool)) == 8
    assert pool == synth_user_agents(8, seed=42)  # rerun-stable
    assert pool != synth_user_agents(8, seed=43)
    assert all(ua.startswith("Mozilla/5.0 (") for ua in pool)
    assert any("Chrome/" in ua for ua in pool)
    assert any("Firefox/" in ua for ua in pool)

    fetch = http_transport(user_agents=pool)
    seen = [fetch(f"{httpd}/ua") for _ in range(8)]
    assert seen == pool  # every synthesized UA went over the wire


def test_render_transport_real_chromium_smoke(httpd):
    """Browser-integration smoke (r8 'What's missing' #1): drive the
    REAL WebDriver contract against the fixture HTTP server. Runs only
    where selenium + a chromium binary exist (the reference container
    ships both, Dockerfile:10; this sandbox does not — skip cleanly).
    docker build --target browser provides the environment."""
    import shutil

    selenium = pytest.importorskip("selenium")
    chrome_bin = next(
        (
            p
            for c in ("chromium", "chromium-browser", "google-chrome")
            if (p := shutil.which(c))
        ),
        None,
    )
    if chrome_bin is None or shutil.which("chromedriver") is None:
        pytest.skip("no chromium/chromedriver on PATH")

    from selenium.webdriver.chrome.options import Options
    from selenium.webdriver.chrome.service import Service

    from etl_dagster_service_crawler_spark.operators.transport import (
        render_transport,
    )

    made = []

    def factory():
        opts = Options()
        opts.binary_location = chrome_bin
        for flag in ("--headless=new", "--no-sandbox",
                     "--disable-dev-shm-usage", "--disable-gpu"):
            opts.add_argument(flag)
        drv = selenium.webdriver.Chrome(
            service=Service(shutil.which("chromedriver")), options=opts
        )
        made.append(drv)
        return drv

    fetch = render_transport(factory)
    try:
        # page_source is the parsed DOM: the fixture detail payload
        # must round-trip through the real renderer
        body = fetch(f"{httpd}/detail/smoke7")
        assert "payload-for-smoke7" in body
        body2 = fetch(f"{httpd}/detail/smoke8")
        assert "payload-for-smoke8" in body2
        assert len(made) == 1  # one browser launch, reused across fetches
    finally:
        for drv in made:
            try:
                drv.quit()
            except Exception:  # noqa: BLE001 - teardown best-effort
                pass


def test_synth_user_agents_caps_pool_size():
    """The finite template space must fail loudly, never spin: n past
    the 4096 cap raises (post-review fix)."""
    from etl_dagster_service_crawler_spark.operators.transport import (
        synth_user_agents,
    )

    with pytest.raises(ValueError, match="4096"):
        synth_user_agents(400_000)
    assert len(synth_user_agents(4096, seed=1)) == 4096


def test_extraction_pipeline_over_real_http(spark, sf_dir, httpd):
    """The r11 markup pipeline through a REAL network fetch: documents
    -> /jobpage URLs -> http_transport (urllib, retries, UA) ->
    EXTRACT_SQL — the extracted fields must equal the static
    html_extract_fields result row-for-row. Proves the synthesizer
    transport, the SQL oracle, and an actual HTTP server all serve the
    same bytes, and the parse chain is transport-agnostic."""
    from pyspark.sql import functions as F

    from etl_dagster_service_crawler_spark.functions.html import EXTRACT_SQL
    from etl_dagster_service_crawler_spark.workloads.sources_wl import (
        q_html_extract_fields,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source", "lang")
        .limit(40)
    )
    with_url = docs.withColumn(
        "url",
        F.concat(
            F.lit(f"{httpd}/jobpage/"),
            F.col("doc_id").cast("string"),
            F.lit("?s="), F.col("source"),
            F.lit("&l="), F.col("lang"),
        ),
    )
    enriched = http_enrich(with_url, "url", transport=http_transport())
    got = {
        r["doc_id"]: r
        for r in enriched.where(F.col("fetch_status") == "ok")
        .select(
            "doc_id",
            *[F.expr(e.format(h="payload")).alias(f)
              for f, e in EXTRACT_SQL.items()],
        )
        .collect()
    }
    want = {
        r["doc_id"]: r
        for r in q_html_extract_fields(spark, sf_dir).collect()
        if r["doc_id"] in got
    }
    assert len(got) == 40
    for doc_id, w in want.items():
        for f in EXTRACT_SQL:
            assert got[doc_id][f] == w[f], (doc_id, f)
