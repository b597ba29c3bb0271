"""Deployment entry point (deploy.py): one cron tick == run_once +
dual K1/K3 sinks + run_history ledger row — the containerized parity
of the reference's Dockerfile:22 scheduler process. The end-to-end
path including session bootstrap is deploy/smoke.sh."""

from __future__ import annotations

from tests.conftest import reset_ledger

import glob


def test_run_tick_writes_dual_sinks_and_ledger(spark, sf_dir, tmp_path):
    from etl_dagster_service_crawler_spark.deploy import DEFAULT_JOB, run_tick
    from etl_dagster_service_crawler_spark.streaming.jobs import (
        RUN_HISTORY_TABLE,
    )

    out = str(tmp_path / "out")
    reset_ledger(spark, RUN_HISTORY_TABLE)
    try:
        ok = run_tick(spark, DEFAULT_JOB, sf_dir, out, ["doc_id"])
        assert ok
        assert glob.glob(f"{out}/main/*.parquet")
        assert glob.glob(f"{out}/side/*.parquet")
        side = spark.read.parquet(f"{out}/side")
        assert side.columns == ["doc_id"]
        ledger = spark.sql(
            f"SELECT job, status FROM {RUN_HISTORY_TABLE}"
        ).collect()
        assert len(ledger) == 1
        assert ledger[0]["job"] == DEFAULT_JOB
        assert ledger[0]["status"] == "ok"
    finally:
        reset_ledger(spark, RUN_HISTORY_TABLE)


def test_append_job_ticks_do_not_duplicate(spark, sf_dir, tmp_path):
    """Two deploy ticks of the APPEND-mode events job: the second tick
    must process nothing new (checkpointed resume), so the main sink
    holds each event exactly once — the duplicate-ingest trap of
    running availableNow without a checkpoint."""
    from etl_dagster_service_crawler_spark.deploy import run_tick
    from etl_dagster_service_crawler_spark.io.tables import load_table
    from etl_dagster_service_crawler_spark.streaming.jobs import (
        RUN_HISTORY_TABLE,
    )

    out = str(tmp_path / "out")
    reset_ledger(spark, RUN_HISTORY_TABLE)
    try:
        run_tick(spark, "events_ingest_2min", sf_dir, out, ["event_id"])
        run_tick(spark, "events_ingest_2min", sf_dir, out, ["event_id"])
        n_events = load_table(spark, sf_dir, "events").count()
        got = spark.read.parquet(f"{out}/main")
        assert got.count() == n_events  # no duplicates across ticks
        ledger = spark.sql(
            f"SELECT n_rows FROM {RUN_HISTORY_TABLE} ORDER BY started_at"
        ).collect()
        assert len(ledger) == 2
        assert ledger[0]["n_rows"] == n_events
        assert ledger[1]["n_rows"] == 0  # second tick found nothing new
    finally:
        reset_ledger(spark, RUN_HISTORY_TABLE)


def test_crawl_scan_job_tick_and_http_transport(spark, sf_dir, tmp_path):
    """The reference's actual scheduled unit — the crawl — as a deploy
    tick: one availableNow run drains one listing page per keyword
    into the dual sinks, and --transport swaps the fetch seam to the
    urllib endpoint with identical rows."""
    from etl_dagster_service_crawler_spark.deploy import run_tick
    from etl_dagster_service_crawler_spark.streaming.jobs import (
        RUN_HISTORY_TABLE,
    )
    from tools.fixture_http_server import start_fixture_server

    reset_ledger(spark, RUN_HISTORY_TABLE)
    srv, base = start_fixture_server()
    try:
        out_fake = str(tmp_path / "fake")
        ok = run_tick(
            spark, "crawl_scan_2min", sf_dir, out_fake, ["keyword", "job_id"]
        )
        assert ok
        fake_rows = sorted(
            map(tuple, spark.read.parquet(f"{out_fake}/main").collect())
        )
        assert len(fake_rows) == 30  # page 0: 3 keywords x 10 slots
        side = spark.read.parquet(f"{out_fake}/side")
        assert sorted(side.columns) == ["job_id", "keyword"]

        out_http = str(tmp_path / "http")
        ok = run_tick(
            spark, "crawl_scan_2min", sf_dir, out_http,
            ["keyword", "job_id"], transport=f"{base}/listing",
        )
        assert ok
        http_rows = sorted(
            map(tuple, spark.read.parquet(f"{out_http}/main").collect())
        )
        assert http_rows == fake_rows
    finally:
        srv.shutdown()
        reset_ledger(spark, RUN_HISTORY_TABLE)


def test_status_report_after_ticks(spark, sf_dir, tmp_path, capsys):
    """--status is the run-control surface (r5/r6 VERDICT missing #2):
    it must show per-status counts, the recent runs with their jobs,
    and sink freshness — and degrade gracefully with no ledger."""
    from etl_dagster_service_crawler_spark.deploy import (
        DEFAULT_JOB,
        print_status,
        run_tick,
    )
    from etl_dagster_service_crawler_spark.streaming.jobs import (
        RUN_HISTORY_TABLE,
    )

    out = str(tmp_path / "out")
    reset_ledger(spark, RUN_HISTORY_TABLE)
    try:
        assert print_status(spark, out) == 2  # nothing ledgered yet
        assert "no `run_history` table" in capsys.readouterr().out

        run_tick(spark, DEFAULT_JOB, sf_dir, out, ["doc_id"])
        assert print_status(spark, out) == 0
        text = capsys.readouterr().out
        assert "run_history: 1 run(s) — ok=1" in text
        assert DEFAULT_JOB in text
        assert "main: " in text and "side: " in text
        assert "<absent>" not in text
    finally:
        reset_ledger(spark, RUN_HISTORY_TABLE)


def test_cron_mode_waits_for_first_match(monkeypatch):
    """--cron mode must fire ONLY on schedule matches — including the
    FIRST tick. The reference's ScheduleDefinition never runs a
    catch-up tick at process start, so an immediate tick could land two
    runs inside the first window (r8 advice)."""
    from etl_dagster_service_crawler_spark import deploy

    events = []

    class FakeSpark:
        def stop(self):
            events.append("stop")

    monkeypatch.setattr(deploy, "build_session", lambda: FakeSpark())
    monkeypatch.setattr(
        deploy,
        "run_tick",
        lambda *a, **k: events.append("tick") or True,
    )
    monkeypatch.setattr(
        deploy.time, "sleep", lambda s: events.append(("sleep", s))
    )

    rc = deploy.main(
        ["--cron", "*/2 * * * *", "--max-ticks", "2", "--source", "x",
         "--output", "y"]
    )
    assert rc == 0
    ticks = [i for i, e in enumerate(events) if e == "tick"]
    sleeps = [i for i, e in enumerate(events) if isinstance(e, tuple)]
    assert len(ticks) == 2
    # a sleep-until-match precedes the FIRST tick, and one separates
    # the two ticks: sleep, tick, sleep, tick
    assert sleeps[0] < ticks[0] < sleeps[1] < ticks[1]
    # each requested sleep is bounded by the */2 cadence
    assert all(0.0 <= e[1] <= 120.0 for e in events if isinstance(e, tuple))


def test_serve_status_http_surface(spark, sf_dir, tmp_path):
    """deploy --serve: the web runs screen (reference webserver
    parity) serves the SAME report the CLI prints — JSON at
    /status.json with the ledgered tick, HTML at /, 404 elsewhere."""
    import json
    import threading
    import urllib.request

    from etl_dagster_service_crawler_spark.deploy import (
        DEFAULT_JOB,
        run_tick,
        serve_status,
    )
    from etl_dagster_service_crawler_spark.streaming.jobs import (
        RUN_HISTORY_TABLE,
    )

    out = str(tmp_path / "out")
    reset_ledger(spark, RUN_HISTORY_TABLE)
    srv = None
    try:
        assert run_tick(spark, DEFAULT_JOB, sf_dir, out, ["doc_id"])
        srv = serve_status(spark, out, port=0)  # ephemeral port
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        rep = json.loads(
            urllib.request.urlopen(f"{base}/status.json", timeout=30).read()
        )
        assert rep["have_ledger"] is True
        assert rep["counts"].get("ok") == 1
        assert rep["recent"][0]["job"] == DEFAULT_JOB
        assert rep["recent"][0]["status"] == "ok"
        html = urllib.request.urlopen(f"{base}/", timeout=30).read().decode()
        assert "spark-graft runs" in html and DEFAULT_JOB in html
        import urllib.error

        try:
            urllib.request.urlopen(f"{base}/nope", timeout=30)
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        if srv is not None:
            srv.shutdown()
            srv.server_close()
        reset_ledger(spark, RUN_HISTORY_TABLE)


def test_serve_run_trigger_endpoint(spark, sf_dir, tmp_path):
    """deploy --serve run trigger (reference parity: the webserver's
    launch button, definitions.py:27-30): POST /run executes one
    availableNow tick synchronously — the response carries the ok
    flag, and /status.json then shows the new ledger row. A server
    started WITHOUT run config refuses the POST (403), and unknown
    POST routes 404."""
    import json
    import threading
    import urllib.error
    import urllib.request

    from etl_dagster_service_crawler_spark.deploy import (
        DEFAULT_JOB,
        serve_status,
    )
    from etl_dagster_service_crawler_spark.streaming.jobs import (
        RUN_HISTORY_TABLE,
    )

    def post(url):
        return urllib.request.urlopen(
            urllib.request.Request(url, method="POST", data=b""), timeout=120
        )

    out = str(tmp_path / "out")
    reset_ledger(spark, RUN_HISTORY_TABLE)
    srv = ro_srv = None
    try:
        srv = serve_status(
            spark, out, port=0, run_job=DEFAULT_JOB, run_source=sf_dir,
            side_cols=["doc_id"],
        )
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{srv.server_address[1]}"

        # empty ledger before the trigger
        rep = json.loads(
            urllib.request.urlopen(f"{base}/status.json", timeout=30).read()
        )
        assert rep["counts"].get("ok") is None

        body = json.loads(post(f"{base}/run").read())
        assert body["ok"] is True and body["job"] == DEFAULT_JOB

        rep = json.loads(
            urllib.request.urlopen(f"{base}/status.json", timeout=30).read()
        )
        assert rep["counts"].get("ok") == 1
        assert rep["recent"][0]["job"] == DEFAULT_JOB
        assert rep["recent"][0]["status"] == "ok"

        try:
            post(f"{base}/nope")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404

        # a status-only server (no run config) refuses the trigger
        ro_srv = serve_status(spark, out, port=0)
        threading.Thread(target=ro_srv.serve_forever, daemon=True).start()
        ro = f"http://127.0.0.1:{ro_srv.server_address[1]}"
        try:
            post(f"{ro}/run")
            raise AssertionError("expected 403")
        except urllib.error.HTTPError as e:
            assert e.code == 403
    finally:
        reset_ledger(spark, RUN_HISTORY_TABLE)
        for s in (srv, ro_srv):
            if s is not None:
                s.shutdown()
                s.server_close()


def test_serve_daemon_combined_mode(spark, sf_dir, tmp_path, monkeypatch):
    """--serve --daemon (r10, reference Dockerfile:22 parity): ONE
    process serves the status surface AND fires scheduled ticks.
    E2E: the server answers /status.json while the tick loop lands
    real ledger rows; a POST /run while the scheduled tick holds the
    shared lock returns 409; the loop's --max-ticks exit shuts the
    server down cleanly."""
    import json
    import threading
    import time as _time
    import urllib.error
    import urllib.request

    from etl_dagster_service_crawler_spark import deploy
    from etl_dagster_service_crawler_spark.streaming.jobs import (
        RUN_HISTORY_TABLE,
    )

    out = str(tmp_path / "out")
    reset_ledger(spark, RUN_HISTORY_TABLE)

    # main() owns its session and stops it on exit; hand it the pytest
    # session through a stop-proof proxy so the fixture survives.
    class _NoStop:
        def __getattr__(self, name):
            if name == "stop":
                return lambda: None
            return getattr(spark, name)

    monkeypatch.setattr(deploy, "build_session", lambda: _NoStop())

    captured = {}
    real_serve = deploy.serve_status

    def capture(*a, **k):
        srv = real_serve(*a, **k)
        # grab the shared tick lock HERE, before main() starts the tick
        # loop: on a loaded VM both 0.2s ticks can otherwise complete
        # and shut the server down before the test thread reaches its
        # probes (observed full-suite flake — the probes then retry
        # 'connection refused' against a dead server until deadline).
        # threading.Lock may be released by a different thread, so the
        # test body releases it after probing.
        srv.tick_lock.acquire()
        captured["srv"] = srv
        return srv

    monkeypatch.setattr(deploy, "serve_status", capture)

    rcs = []
    t = threading.Thread(
        target=lambda: rcs.append(deploy.main(
            ["--serve", "0", "--daemon", "--interval-seconds", "0.2",
             "--max-ticks", "2", "--source", sf_dir, "--output", out]
        )),
        daemon=True,
    )
    t.start()
    deadline = _time.time() + 60
    while "srv" not in captured and _time.time() < deadline:
        _time.sleep(0.05)
    srv = captured["srv"]
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    # The shared tick lock is ALREADY HELD (acquired in capture, before
    # the tick loop started): the loop cannot run any tick, so it
    # cannot shut the server down under the probes — deterministic, no
    # sleep-tuning and no race against fast ticks.
    def _probe(req, deadline_s=30.0):
        # bounded retry on transport-level resets only: the single-
        # threaded HTTP server can drop a connection under VM load
        # (observed flake in a full-suite run); HTTPError (a real
        # response, e.g. the expected 409) always propagates
        end = _time.time() + deadline_s
        while True:
            try:
                return urllib.request.urlopen(req, timeout=30).read()
            except urllib.error.HTTPError:
                raise
            except (ConnectionResetError, urllib.error.URLError, OSError):
                if _time.time() >= end:
                    raise
                _time.sleep(0.3)

    try:
        # the status surface answers WHILE the tick loop runs
        rep = json.loads(_probe(f"{base}/status.json"))
        assert "counts" in rep and "sinks" in rep

        # a web trigger while the tick lock is held is refused with 409
        try:
            _probe(
                urllib.request.Request(f"{base}/run", method="POST", data=b"")
            )
            raise AssertionError("expected 409")
        except urllib.error.HTTPError as e:
            assert e.code == 409
    finally:
        srv.tick_lock.release()  # let the scheduled ticks proceed

    t.join(timeout=600)
    assert not t.is_alive() and rcs == [0]
    # both scheduled ticks landed real ledger rows
    n = spark.sql(
        f"SELECT count(*) AS n FROM {RUN_HISTORY_TABLE}"
    ).collect()[0]["n"]
    assert n == 2
    # server is down after the loop exits
    try:
        urllib.request.urlopen(f"{base}/status.json", timeout=5)
        raise AssertionError("server should be shut down")
    except (urllib.error.URLError, OSError):
        pass
    reset_ledger(spark, RUN_HISTORY_TABLE)


def test_failed_tick_log_tail_readable_over_http(spark, sf_dir, tmp_path):
    """r11 (VERDICT r10 item 7): a FAILED tick's error text — the full
    traceback captured into the ledger's bounded log_tail — must be
    readable through /status.json and visible (escaped) in the HTML
    runs table; an ok tick carries its start/finish log lines."""
    import json
    import threading
    import urllib.request

    from etl_dagster_service_crawler_spark.deploy import (
        DEFAULT_JOB,
        run_tick,
        serve_status,
    )
    from etl_dagster_service_crawler_spark.streaming.jobs import (
        RUN_HISTORY_TABLE,
    )

    out = str(tmp_path / "out")
    reset_ledger(spark, RUN_HISTORY_TABLE)
    srv = None
    try:
        assert run_tick(spark, DEFAULT_JOB, sf_dir, out, ["doc_id"])
        # a tick over a CORRUPT source file fails mid-stream and
        # ledgers 'error' (a missing dir is just an empty stream)
        bad_sf = tmp_path / "badsf"
        bad_sf.mkdir()
        (bad_sf / "documents.parquet").write_bytes(b"not a parquet file")
        try:
            run_tick(spark, DEFAULT_JOB, str(bad_sf), out, ["doc_id"])
            raise AssertionError("tick over a corrupt source should raise")
        except AssertionError:
            raise
        except Exception:
            pass
        srv = serve_status(spark, out, port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        rep = json.loads(
            urllib.request.urlopen(f"{base}/status.json", timeout=60).read()
        )
        by_status = {r["status"]: r for r in rep["recent"]}
        failed = by_status["error"]
        assert failed["log_tail"], "failed tick must carry a log tail"
        # the bounded tail always ENDS with the error summary (class +
        # message head), whatever the traceback's size
        assert "== error ==" in failed["log_tail"]
        assert "Exception" in failed["log_tail"].rsplit("== error ==", 1)[1]
        assert len(failed["log_tail"]) <= 4096
        ok = by_status["ok"]
        assert ok["log_tail"] and "finished ok=True" in ok["log_tail"]
        html = urllib.request.urlopen(f"{base}/", timeout=60).read().decode()
        assert "<details>" in html and "== error ==" in html
        # escaped, not raw markup, inside the <pre>
        assert "<pyspark" not in html
    finally:
        if srv is not None:
            srv.shutdown()
            srv.server_close()
        reset_ledger(spark, RUN_HISTORY_TABLE)


def test_record_run_degrades_to_pre_log_tail_warehouse(spark):
    """A warehouse created before the log_tail column existed must
    keep accepting ledger rows (restart against an old mounted
    warehouse) — the row degrades to the 10-column schema."""
    import time

    from etl_dagster_service_crawler_spark.streaming.jobs import record_run

    table = "run_history_oldschema"
    reset_ledger(spark, table)
    try:
        old_schema = (
            "run_id string, job string, mode string, started_at timestamp, "
            "finished_at timestamp, n_batches bigint, n_rows bigint, "
            "n_bad bigint, status string, error string"
        )
        import datetime

        now = datetime.datetime.now(datetime.timezone.utc)
        spark.createDataFrame(
            [("r0", "j", "m", now, now, 1, 1, 0, "ok", None)], old_schema
        ).write.mode("append").format("parquet").saveAsTable(table)
        record_run(
            spark, run_id="r1", job="j", mode="m",
            started_at=time.time(), finished_at=time.time(),
            n_batches=1, n_rows=2, n_bad=0, status="ok",
            log_tail="this cannot land in a 10-column table",
            table=table,
        )
        rows = spark.table(table).collect()
        assert {r["run_id"] for r in rows} == {"r0", "r1"}
        assert "log_tail" not in spark.table(table).schema.fieldNames()
    finally:
        reset_ledger(spark, table)


def test_crawl_extract_job_tick(spark, sf_dir, tmp_path):
    """The r11 extraction pipeline as a scheduled deploy job: one tick
    lands the typed field table in the dual sinks, ledgered ok, and
    the extracted rows equal the batch html_extract_fields result."""
    from etl_dagster_service_crawler_spark.deploy import run_tick
    from etl_dagster_service_crawler_spark.streaming.jobs import (
        RUN_HISTORY_TABLE,
    )
    from etl_dagster_service_crawler_spark.workloads.sources_wl import (
        q_html_extract_fields,
    )

    out = str(tmp_path / "out")
    reset_ledger(spark, RUN_HISTORY_TABLE)
    try:
        assert run_tick(
            spark, "crawl_extract_2min", sf_dir, out, ["doc_id", "job_name"]
        )
        got = {
            r["doc_id"]: r for r in spark.read.parquet(f"{out}/main").collect()
        }
        want = {
            r["doc_id"]: r for r in q_html_extract_fields(spark, sf_dir).collect()
        }
        assert set(got) == set(want)
        for d, w in want.items():
            assert got[d]["job_name"] == w["job_name"]
            assert got[d]["salary"] == w["salary"]
        side = spark.read.parquet(f"{out}/side")
        assert set(side.columns) == {"doc_id", "job_name"}
        row = spark.sql(
            f"SELECT status FROM {RUN_HISTORY_TABLE}"
        ).collect()
        assert [r["status"] for r in row] == ["ok"]
    finally:
        reset_ledger(spark, RUN_HISTORY_TABLE)
