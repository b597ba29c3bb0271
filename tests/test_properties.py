"""Property-based tests (SURVEY §5): roundtrip and null-safety
invariants of the scalar parse/lookup functions, driven by Hypothesis
through one shared SparkSession on tiny single-column frames."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_dagster_service_crawler_spark.functions.cleaning import (
    clean_tokens,
    extract_url_key,
    parse_range,
)

_slow = settings(
    max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


@_slow
@given(lo=st.integers(0, 10**6), hi=st.integers(0, 10**6))
def test_parse_range_roundtrips_ints(spark, lo, hi):
    df = spark.createDataFrame([Row(s=f"{lo}~{hi}")])
    plo, phi = parse_range(F.col("s"))
    row = df.select(plo.alias("lo"), phi.alias("hi")).first()
    assert (row["lo"], row["hi"]) == (lo, hi)


@_slow
@given(
    snap=st.dictionaries(st.integers(0, 30), st.integers(-100, 100), max_size=12),
    upd=st.dictionaries(st.integers(0, 30), st.integers(-100, 100), max_size=12),
)
def test_upsert_merge_is_dict_merge(spark, snap, upd):
    """upsert_merge(snapshot, updates) must equal Python's
    {**snap, **upd}: snapshot-only keys survive, overlaps take the
    update, update-only keys insert."""
    from etl_dagster_service_crawler_spark.operators.joins import upsert_merge

    schema = "k int, v int"
    sdf = spark.createDataFrame(list(snap.items()) or [], schema)
    udf_ = spark.createDataFrame(list(upd.items()) or [], schema)
    got = {r["k"]: r["v"] for r in upsert_merge(sdf, udf_, "k", ["v"]).collect()}
    assert got == {**snap, **upd}


@_slow
@given(s=st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40))
def test_parse_range_never_raises_on_garbage(spark, s):
    df = spark.createDataFrame([Row(s=s)])
    plo, phi = parse_range(F.col("s"))
    df.select(plo.alias("lo"), phi.alias("hi")).collect()  # must not raise


@_slow
@given(
    key=st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
        min_size=1,
        max_size=20,
    ),
    query=st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Nd")), max_size=10
    ),
)
def test_extract_url_key_inverts_url_build(spark, key, query):
    url = f"https://example.com/job/{key}" + (f"?{query}" if query else "")
    row = spark.createDataFrame([Row(u=url)]).select(
        extract_url_key(F.col("u")).alias("k")
    ).first()
    assert row["k"] == key


@_slow
@given(
    body=st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Zs")), max_size=40
    )
)
def test_clean_tokens_strips_all_occurrences(spark, body):
    noisy = f"更新 {body} 更新"
    row = spark.createDataFrame([Row(s=noisy)]).select(
        clean_tokens(F.col("s"), ["更新"]).alias("c")
    ).first()
    assert "更新" not in row["c"]
    assert row["c"] == row["c"].strip()


@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),                      # user bucket
            st.integers(0, 6 * 3600),               # seconds offset
            st.sampled_from(["click", "purchase", "error"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_stream_tumbling_equals_batch(spark, rows):
    """Batch-stream equivalence: an availableNow complete-mode drain of
    the windowed agg must equal the same plan run in batch."""
    import datetime as dt

    from etl_dagster_service_crawler_spark.streaming.ingest import run_available_now
    from etl_dagster_service_crawler_spark.streaming.windows import tumbling_counts

    base = dt.datetime(2024, 1, 1)
    data = [
        (i, base + dt.timedelta(seconds=off), u, et, float(i))
        for i, (u, off, et) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )
    batch = {tuple(r) for r in tumbling_counts(df).collect()}

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(d)
        s = spark.readStream.schema(df.schema).parquet(d)
        streamed = {tuple(r) for r in run_available_now(tumbling_counts(s), "complete").collect()}
    assert streamed == batch


def test_money_sums_invariant_under_partitioning(spark, sf_dir):
    """The r01 driver hash-miss class: a double sum's last ulp depends
    on partition layout, so fround could land either side of a cent
    boundary. The decimal-sum formulation must yield bit-identical
    results under any shuffle partitioning."""
    from etl_dagster_service_crawler_spark.plans.flagship import revenue_by_nation
    from etl_dagster_service_crawler_spark.workloads.relational import (
        q_agg_hash_group,
    )

    def run(q):
        return sorted(map(tuple, q(spark, sf_dir).collect()))

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        flag2, q1_2 = run(revenue_by_nation), run(q_agg_hash_group)
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        flag29, q1_29 = run(revenue_by_nation), run(q_agg_hash_group)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert flag2 == flag29
    assert q1_2 == q1_29


def test_clean_tokens_treats_metacharacters_as_literals(spark):
    """ADVICE r01: tokens like 'C++' or '0~5?' must strip as literals,
    not corrupt output as regex patterns."""
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(s="skill C++ and (人) and 0~5? left")])
    out = df.select(
        clean_tokens(F.col("s"), ["C++", "(人)", "0~5?"]).alias("c")
    ).first()["c"]
    assert "C++" not in out and "(人)" not in out and "0~5?" not in out
    assert out.startswith("skill") and out.endswith("left")


@_slow
@given(
    gaps=st.lists(st.integers(1, 7200), min_size=1, max_size=20),
)
def test_sessionize_gap_invariants(spark, gaps):
    """For ONE user with arbitrary inter-event gaps (seconds): within a
    session every gap <= 60 min, across a session boundary > 60 min,
    session ids start at 1 and increase by exactly 1, and the per-
    session event counts sum to the event count — recomputed
    independently in Python."""
    import datetime

    from pyspark.sql import Row

    from etl_dagster_service_crawler_spark.workloads.relational import (
        SESSION_GAP_MIN,
    )

    t0 = datetime.datetime(2024, 1, 1)
    ts, cur = [], t0
    for g in gaps:
        cur = cur + datetime.timedelta(seconds=g)
        ts.append(cur)
    rows = [
        Row(event_id=i, ts=t, user_id=1, event_type="x", value=1.0, props="{}")
        for i, t in enumerate([t0] + ts)
    ]
    df = spark.createDataFrame(rows)

    # expected sessions recomputed independently
    expected, n = [], 0
    for g in [None] + gaps:
        if g is None or g > SESSION_GAP_MIN * 60:
            if n:
                expected.append(n)
            n = 1
        else:
            n += 1
    expected.append(n)

    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_sess = F.when(
        gap_us.isNull() | (gap_us > SESSION_GAP_MIN * 60 * 1_000_000), 1
    ).otherwise(0)
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    out = (
        df.select(
            "user_id",
            F.sum(new_sess).over(wcum).cast("int").alias("session_id"),
        )
        .groupBy("user_id", "session_id")
        .count()
        .orderBy("session_id")
        .collect()
    )
    assert [r["session_id"] for r in out] == list(range(1, len(expected) + 1))
    assert [r["count"] for r in out] == expected


@_slow
@given(words=st.lists(st.sampled_from(["a", "b", "c", "dd"]), min_size=1, max_size=30))
def test_repetition_score_bounds_and_exactness(spark, words):
    """0 <= dup_word_frac < 1; dup_word_frac == 0 iff all words
    distinct; top_bigram_n recomputed independently in Python."""
    from collections import Counter

    from pyspark.sql import Row

    from etl_dagster_service_crawler_spark.workloads.llm import repetition_exprs

    text = " ".join(words)
    df = spark.createDataFrame(
        [Row(doc_id=1, text=text, lang="en", source="src0", n_chars=len(text))]
    )
    w, bg, top_bg = repetition_exprs(F.col("text"))
    n = F.size(w)
    row = df.select(
        (n - F.size(F.array_distinct(w))).cast("double").alias("dups"),
        n.cast("double").alias("n"),
        top_bg.alias("top_bg"),
    ).first()
    frac = row["dups"] / row["n"]
    assert 0.0 <= frac < 1.0
    assert (frac == 0.0) == (len(set(words)) == len(words))
    bigrams = Counter(
        " ".join(p) for p in zip(words, words[1:])
    )
    assert row["top_bg"] == (max(bigrams.values()) if bigrams else 0)


@_slow
@given(words=st.lists(st.sampled_from(["x", "yy", "z0", "w"]), min_size=1, max_size=200))
def test_chunk_transform_covers_and_reconstructs(spark, words):
    """Chunks cover every token exactly once at stride offsets; gluing
    the first CHUNK_STRIDE tokens of each chunk plus the tail of the
    last reconstructs the document byte-for-byte."""
    from pyspark.sql import Row

    from etl_dagster_service_crawler_spark.workloads.corpus_wl import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        chunk_transform,
    )

    text = " ".join(words)
    df = spark.createDataFrame(
        [Row(doc_id=1, text=text, lang="en", source="s", n_chars=len(text))]
    )
    got = (
        chunk_transform(df).orderBy("chunk_idx").collect()
    )
    n = len(words)
    expect_starts = list(range(0, max(n, 1), CHUNK_STRIDE))
    assert [r["chunk_idx"] for r in got] == list(range(len(expect_starts)))
    for r, s in zip(got, expect_starts):
        assert r["chunk_text"] == " ".join(words[s : s + CHUNK_TOKENS])
        assert r["n_tokens"] == min(CHUNK_TOKENS, n - s)
    # reconstruction: non-overlapping prefixes + the final chunk's tail
    rebuilt: list[str] = []
    for r in got:
        rebuilt.extend(r["chunk_text"].split(" ")[:CHUNK_STRIDE])
    last = got[-1]
    rebuilt.extend(last["chunk_text"].split(" ")[CHUNK_STRIDE:])
    assert rebuilt == words


@_slow
@given(
    revs=st.lists(st.integers(1, 10**9), min_size=1, max_size=60),
)
def test_pareto_prefix_sum_matches_python(spark, revs):
    """The distributed prefix sum (range partition + per-partition
    cumsum + broadcast offsets) must reproduce a plain Python
    cumulative sum over the globally sorted order, for any revenue
    multiset — including ties, which break on the key."""
    from pyspark.sql import Row

    from etl_dagster_service_crawler_spark.workloads.analytics_wl import (
        PARETO_BP,
        q_pareto_customer_share,
    )

    # build a tiny orders-shaped frame (full fixture schema — the
    # loader's drift guard checks it): one order per customer with
    # o_totalprice = rev dollars (cents = rev * 100 exactly)
    import datetime as _dt

    df = spark.createDataFrame(
        [
            Row(
                o_orderkey=i,
                o_custkey=i,
                o_orderstatus="O",
                o_totalprice=float(r),
                o_orderdate=_dt.datetime(2024, 1, 1),
                o_orderpriority="1-URGENT",
            )
            for i, r in enumerate(revs)
        ]
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/orders.parquet")
        got = {
            r["o_custkey"]: (r["rnk"], r["cum_bp"])
            for r in q_pareto_customer_share(spark, d).collect()
        }

    cents = {i: r * 100 for i, r in enumerate(revs)}
    order = sorted(cents, key=lambda k: (-cents[k], k))
    total = sum(cents.values())
    cum = 0
    expect = {}
    for rnk, k in enumerate(order, start=1):
        cum += cents[k]
        bp = (10000 * cum) // total
        if bp <= PARETO_BP:
            expect[k] = (rnk, bp)
    assert got == expect


@given(
    n=st.integers(min_value=0, max_value=97),
    k=st.sampled_from([1, 2, 3, 5, 10, 16]),
    seed=st.integers(min_value=0, max_value=5),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_distributed_ntile_matches_window_ntile(spark, n, k, seed):
    """distributed_ntile must reproduce SQL-standard ntile exactly —
    including tie groups, n < k, and n not divisible by k — while
    planning zero unpartitioned sorts of the frame (plan pinned in
    test_plans.py; this pins values)."""
    import random

    from pyspark.sql import Window

    from etl_dagster_service_crawler_spark.operators.ranking import (
        distributed_ntile,
    )

    rng = random.Random(seed)
    rows = [Row(id=i, v=rng.randint(0, 9)) for i in range(n)]
    df = spark.createDataFrame(rows, schema="id int, v int")
    order = [F.asc("v"), F.asc("id")]
    got = {
        r["id"]: r["b"]
        for r in distributed_ntile(df, k, order, "b", num_parts=4).collect()
    }
    want = {
        r["id"]: r["b"]
        for r in df.select(
            "id", F.ntile(k).over(Window.orderBy(*order)).alias("b")
        ).collect()
    }
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),   # basket
            st.integers(min_value=0, max_value=9),   # item
        ),
        min_size=0,
        max_size=60,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_basket_pairs_match_combinations(spark, rows):
    """basket_pair_counts == itertools.combinations over the distinct
    items of each basket (pairs ordered p1 < p2, multiset counts)."""
    from collections import Counter
    from itertools import combinations

    from etl_dagster_service_crawler_spark.workloads.analytics_wl import (
        basket_pair_counts,
    )

    df = spark.createDataFrame(
        rows or [(0, 0)], "basket int, item int"
    )
    if not rows:
        df = df.limit(0)
    got = {
        (r["p1"], r["p2"]): r["cnt"]
        for r in basket_pair_counts(df, "basket", "item").collect()
    }
    baskets: dict[int, set[int]] = {}
    for b, i in rows:
        baskets.setdefault(b, set()).add(i)
    want = Counter(
        pair
        for items in baskets.values()
        for pair in combinations(sorted(items), 2)
    )
    assert got == dict(want)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),    # user
            st.integers(min_value=0, max_value=5000), # ts offset seconds
            st.sampled_from(["click", "view", "purchase", "error"]),
        ),
        min_size=0,
        max_size=40,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_last_touch_attribution_matches_replay(spark, rows):
    """last_touch_attribution == a pure-Python replay: for each
    purchase, the latest strictly-prior click/view of the same user
    under the (ts, event_id) order; 'none' when no touch exists.
    Duplicate timestamps break ties on event_id — both paths."""
    import datetime

    base = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    data = [
        (i, u, t, base + datetime.timedelta(seconds=off))
        for i, (u, off, t) in enumerate(rows)
    ]
    from etl_dagster_service_crawler_spark.workloads.analytics_wl import (
        last_touch_attribution,
    )

    df = spark.createDataFrame(
        data or [(0, 0, "error", base)],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    if not data:
        df = df.limit(0)
    got = {
        r["purchase_id"]: (r["touch_type"], r["touch_event_id"], r["gap_s"])
        for r in last_touch_attribution(df).collect()
    }

    want = {}
    by_user: dict[int, list] = {}
    for i, u, t, ts in data:
        by_user.setdefault(u, []).append((ts, i, t))
    for u, evs in by_user.items():
        evs.sort()
        for idx, (ts, i, t) in enumerate(evs):
            if t != "purchase":
                continue
            touches = [
                (pts, pi, pt)
                for pts, pi, pt in evs[:idx]
                if pt in ("click", "view")
            ]
            if not touches:
                want[i] = ("none", None, None)
            else:
                pts, pi, pt = max(touches)
                want[i] = (pt, pi, int((ts - pts).total_seconds()))
    assert got == want


@_slow
@given(days=st.sets(st.integers(0, 40), max_size=25))
def test_activity_streaks_fold_matches_python(spark, days):
    """The HOF gaps-and-islands fold (activity_streaks) must agree
    with a direct Python computation of (active days, streak count,
    longest run) on arbitrary day sets — including empty, singleton,
    and fully-consecutive shapes."""
    import datetime

    from etl_dagster_service_crawler_spark.workloads.relational import (
        q_activity_streaks,
    )

    if not days:
        return  # a user with no events has no row at all
    # route through the real query by staging a one-user events table
    epoch = datetime.datetime(2024, 1, 1)
    rows = [
        (i, epoch + datetime.timedelta(days=d, hours=3), 7, "view", 1.0, "{}")
        for i, d in enumerate(sorted(days))
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    df.createOrReplaceTempView("_streak_events_v")

    import etl_dagster_service_crawler_spark.io.tables as tables

    orig = tables.load_table
    try:
        tables.load_table = lambda sp, sf, name: sp.table("_streak_events_v")
        # the workload module binds load_table at import; patch there too
        import etl_dagster_service_crawler_spark.workloads.relational as rel

        rel_orig = rel.load_table
        rel.load_table = tables.load_table
        try:
            got = q_activity_streaks(spark, "unused").collect()
        finally:
            rel.load_table = rel_orig
    finally:
        tables.load_table = orig

    ds = sorted(days)
    runs, cur = [], 1
    for a, b in zip(ds, ds[1:]):
        if b == a + 1:
            cur += 1
        else:
            runs.append(cur)
            cur = 1
    runs.append(cur)
    assert len(got) == 1
    r = got[0]
    assert r["n_active_days"] == len(ds)
    assert r["n_streaks"] == len(runs)
    assert r["max_streak_d"] == max(runs)


@_slow
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=0, max_size=8
        ).map(" ".join),
        min_size=1,
        max_size=4,
    )
)
def test_signature_exports_match_hashlib(spark, texts):
    """minhash/simhash signature exports must equal a direct hashlib
    recompute of their documented constructions — including short-doc
    sentinels and empty-token edge shapes."""
    import hashlib as hl

    from etl_dagster_service_crawler_spark.workloads import llm

    rows = [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.createOrReplaceTempView("_sig_docs_v")
    orig = llm.load_table
    llm.load_table = lambda sp, sf, name: sp.table("_sig_docs_v")
    try:
        mh = {
            (r["doc_id"], r["seed"]): r["sig"]
            for r in llm.q_minhash_signature_export(spark, "x").collect()
        }
        sh = {
            r["doc_id"]: (r["n_tokens"], r["sig16"])
            for r in llm.q_simhash_signature_export(spark, "x").collect()
        }
    finally:
        llm.load_table = orig

    P = llm.MINHASH_EXPORT_P
    for i, t in enumerate(texts):
        toks = t.split(" ")
        shingles = list(
            dict.fromkeys("\x1f".join(toks[j : j + 3]) for j in range(len(toks) - 2))
        )
        hv = [int(hl.md5(s.encode()).hexdigest()[:15], 16) % P for s in shingles]
        for k in range(llm.MINHASH_EXPORT_SEEDS):
            a, b = llm.MINHASH_EXPORT_A[k], llm.MINHASH_EXPORT_B[k]
            want = min(((a * h + b) % P for h in hv), default=P)
            assert mh[(i, k)] == want, (i, k, t)
        # simhash: distinct tokens, 16-bit vote sign
        dtoks = list(dict.fromkeys(toks))
        hvs = [int(hl.md5(s.encode()).hexdigest()[:15], 16) for s in dtoks]
        sig = 0
        for bit in range(llm.SIMHASH_EXPORT_BITS):
            vote = sum(1 if (h >> bit) & 1 else -1 for h in hvs)
            if vote > 0:
                sig |= 1 << bit
        assert sh[i] == (len(dtoks), sig), (i, t)


def _with_events_view(spark, rows, fn):
    """Stage an events-shaped temp view and run fn with relational's
    load_table patched to return it."""
    import etl_dagster_service_crawler_spark.workloads.relational as rel

    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    df.createOrReplaceTempView("_prop_events_v")
    orig = rel.load_table
    rel.load_table = lambda sp, sf, name: sp.table("_prop_events_v")
    try:
        return fn()
    finally:
        rel.load_table = orig


@_slow
@given(
    series=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 300)),  # (day, cents)
        min_size=2,
        max_size=30,
    )
)
def test_change_point_matches_python(spark, series):
    """change_point_detect's exact integer argmax must equal a direct
    Python scan over all split points (cross-multiplied means, floor
    division, shift DESC / day ASC tiebreak)."""
    import datetime

    from etl_dagster_service_crawler_spark.workloads.analytics_wl import (
        q_change_point_detect,
    )

    epoch = datetime.datetime(2024, 1, 1)
    rows = [
        (i, epoch + datetime.timedelta(days=d, hours=2), 1, "view", c / 100.0, "{}")
        for i, (d, c) in enumerate(series)
    ]
    import etl_dagster_service_crawler_spark.workloads.analytics_wl as awl

    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    df.createOrReplaceTempView("_cp_events_v")
    orig = awl.load_table
    awl.load_table = lambda sp, sf, name: sp.table("_cp_events_v")
    try:
        got = q_change_point_detect(spark, "x").collect()
    finally:
        awl.load_table = orig

    # python reference
    daily: dict[str, list[int]] = {}
    for d, c in series:
        day = (epoch + datetime.timedelta(days=d)).strftime("%Y-%m-%d")
        daily.setdefault(day, []).append(c)
    days = sorted(daily)
    if len(days) < 2:
        assert got == []
        return
    cnts = [len(daily[d]) for d in days]
    sums = [sum(daily[d]) for d in days]
    best = None
    for i in range(len(days) - 1):
        pre_c, pre_s = sum(cnts[: i + 1]), sum(sums[: i + 1])
        post_c, post_s = sum(cnts[i + 1 :]), sum(sums[i + 1 :])
        shift = abs(pre_s * post_c - post_s * pre_c) // (pre_c * post_c)
        key = (-shift, days[i])
        if best is None or key < best[0]:
            best = (key, days[i], shift, pre_c, post_c)
    assert len(got) == 1
    r = got[0]
    assert (r["split_day"], r["shift_c"], r["pre_cnt"], r["post_cnt"]) == (
        best[1],
        best[2],
        best[3],
        best[4],
    )


@_slow
@given(
    days=st.dictionaries(st.integers(0, 20), st.integers(1, 10**6), max_size=15)
)
def test_ewma_matches_python(spark, days):
    """ewma_revenue_daily's integer halving-weight mean must equal the
    Python recompute, including gap days (absent lags drop out of both
    numerator and denominator)."""
    import datetime

    import etl_dagster_service_crawler_spark.workloads.analytics_wl as awl
    from etl_dagster_service_crawler_spark.workloads.analytics_wl import (
        _EWMA_W,
        q_ewma_revenue_daily,
    )

    if not days:
        return
    epoch = datetime.datetime(1995, 1, 1)
    rows = [
        (
            i,
            i,
            "O",
            c / 100.0,
            epoch + datetime.timedelta(days=d),
            "1-URGENT",
        )
        for i, (d, c) in enumerate(sorted(days.items()))
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.createOrReplaceTempView("_ewma_orders_v")
    orig = awl.load_table
    awl.load_table = lambda sp, sf, name: sp.table("_ewma_orders_v")
    try:
        got = {r["day"]: r["ewma_c"] for r in q_ewma_revenue_daily(spark, "x").collect()}
    finally:
        awl.load_table = orig

    day_list = sorted(days)
    rev = {d: days[d] for d in day_list}
    for pos, d in enumerate(day_list):
        num = den = 0
        for k, w in enumerate(_EWMA_W):
            if pos - k >= 0:
                lag_day = day_list[pos - k]
                num += w * rev[lag_day]
                den += w
        day_str = (epoch + datetime.timedelta(days=d)).strftime("%Y-%m-%d")
        assert got[day_str] == num // den, (d, got[day_str], num, den)


@_slow
@given(
    events=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50000)),  # (hour, cents)
        min_size=1,
        max_size=25,
    )
)
def test_ohlc_matches_python(spark, events):
    """events_ohlc_hourly must equal the Python recompute: open/close
    by the composite (micros, event_id) total order, high/low/volume
    exact — including same-timestamp ties broken by event_id."""
    import datetime

    from etl_dagster_service_crawler_spark.workloads.relational import (
        q_events_ohlc_hourly,
    )

    epoch = datetime.datetime(2024, 1, 1)
    rows = [
        (i, epoch + datetime.timedelta(hours=h, microseconds=(c % 3)), 1, "view", c / 100.0, "{}")
        for i, (h, c) in enumerate(events)
    ]
    got = {
        (r["event_type"], r["hour"]): (
            r["open_c"], r["high_c"], r["low_c"], r["close_c"], r["volume"]
        )
        for r in _with_events_view(
            spark, rows, lambda: q_events_ohlc_hourly(spark, "x").collect()
        )
    }

    by_hour: dict[str, list[tuple]] = {}
    for i, (h, c) in enumerate(events):
        ts = epoch + datetime.timedelta(hours=h, microseconds=(c % 3))
        hour = ts.strftime("%Y-%m-%d %H:00")
        # composite key mirrors the op: (epoch_micros, event_id)
        key = (int(ts.timestamp() * 1_000_000), i)
        by_hour.setdefault(hour, []).append((key, c))
    for hour, vals in by_hour.items():
        vals.sort()
        cents = [c for _, c in vals]
        want = (vals[0][1], max(cents), min(cents), vals[-1][1], len(vals))
        assert got[("view", hour)] == want, (hour, got[("view", hour)], want)


@_slow
@given(
    obs=st.dictionaries(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 12)),
        st.integers(-500, 500),
        min_size=1,
        max_size=15,
    )
)
def test_fill_forward_locf_matches_python(spark, obs):
    """LOCF over a per-type daily spine: gap days inherit the last
    observed total, days before a type's first observation stay NULL.
    The sf0.01 fixture happens to have NO (type, day) gaps, so the
    oracle alone never exercises the fill — this test stages gaps."""
    import datetime

    from etl_dagster_service_crawler_spark.workloads.relational import (
        q_fill_forward_locf,
    )

    epoch = datetime.datetime(2024, 1, 1)
    rows = []
    i = 0
    for (typ, d), c in obs.items():
        rows.append(
            (i, epoch + datetime.timedelta(days=d, hours=1), 1, typ, c / 100.0, "{}")
        )
        i += 1
    got = {
        (r["event_type"], r["day"]): (r["day_c"], r["filled_c"])
        for r in _with_events_view(
            spark, rows, lambda: q_fill_forward_locf(spark, "x").collect()
        )
    }

    days_present = sorted({d for (_, d) in obs})
    lo, hi = days_present[0], days_present[-1]
    types = sorted({t for (t, _) in obs})
    spine = range(lo, hi + 1)
    for t in types:
        last = None
        for d in spine:
            day = (epoch + datetime.timedelta(days=d)).strftime("%Y-%m-%d")
            day_c = obs.get((t, d))
            if day_c is not None:
                last = day_c
            assert got[(t, day)] == (day_c, last), (t, day)
    # grid covers every (type in events) x (spine day)
    assert len(got) == len(types) * len(range(lo, hi + 1))


@_slow
@given(
    pairs=st.sets(
        st.tuples(st.integers(0, 9), st.integers(0, 12)), min_size=1, max_size=30
    )
)
def test_cumulative_distinct_matches_python(spark, pairs):
    """First-seen prefix-sum rewrite == brute-force expanding distinct
    on arbitrary (user, day) activity sets."""
    import datetime

    from etl_dagster_service_crawler_spark.workloads.relational import (
        q_cumulative_distinct_users,
    )

    epoch = datetime.datetime(2024, 1, 1)
    rows = [
        (i, epoch + datetime.timedelta(days=d, hours=2), u, "view", 1.0, "{}")
        for i, (u, d) in enumerate(sorted(pairs))
    ]
    got = {
        r["day"]: (r["new_users"], r["cum_users"])
        for r in _with_events_view(
            spark, rows, lambda: q_cumulative_distinct_users(spark, "x").collect()
        )
    }
    days = sorted({d for (_, d) in pairs})
    seen: set[int] = set()
    for d in days:
        before = len(seen)
        seen |= {u for (u, dd) in pairs if dd == d}
        day = (epoch + datetime.timedelta(days=d)).strftime("%Y-%m-%d")
        # every ACTIVE day has a row, new_users = 0 when nobody debuts
        assert got[day] == (len(seen) - before, len(seen)), day
    assert len(got) == len(days)


@_slow
@given(
    bals=st.lists(
        st.tuples(st.integers(0, 2), st.integers(-10**6, 10**6)),
        min_size=1,
        max_size=40,
    )
)
def test_top_decile_threshold_matches_python(spark, bals):
    """Per-group p90 threshold filter == Python recompute with linear
    interpolation over sorted integer cents (both engines interpolate
    identically on integer inputs; the floor(+0.5) snap pins the
    boundary)."""
    import etl_dagster_service_crawler_spark.workloads.relational as rel
    from etl_dagster_service_crawler_spark.workloads.relational import (
        q_top_decile_by_group,
    )

    rows = [
        (i, f"c{i}", nk, c / 100.0, "BUILDING") for i, (nk, c) in enumerate(bals)
    ]
    df = spark.createDataFrame(
        rows,
        "c_custkey bigint, c_name string, c_nationkey bigint,"
        " c_acctbal double, c_mktsegment string",
    )
    df.createOrReplaceTempView("_td_cust_v")
    orig = rel.load_table
    rel.load_table = lambda sp, sf, name: sp.table("_td_cust_v")
    try:
        got = {r["c_custkey"] for r in q_top_decile_by_group(spark, "x").collect()}
    finally:
        rel.load_table = orig

    import math

    def pctl_linear(sorted_vals, q):
        # identical to Spark percentile / DuckDB quantile_cont
        pos = (len(sorted_vals) - 1) * q
        lo, hi = math.floor(pos), math.ceil(pos)
        if lo == hi:
            return float(sorted_vals[lo])
        frac = pos - lo
        return sorted_vals[lo] * (1 - frac) + sorted_vals[hi] * frac

    by_group: dict[int, list[int]] = {}
    cents = {}
    for i, (nk, c) in enumerate(bals):
        # the op snaps c_acctbal to cents with floor(x*100+0.5); the
        # inputs here are exact cent doubles so the snap is identity
        cents[i] = c
        by_group.setdefault(nk, []).append(c)
    want = set()
    for i, (nk, c) in enumerate(bals):
        thr = math.floor(pctl_linear(sorted(by_group[nk]), 0.9) + 0.5)
        if c >= thr:
            want.add(i)
    assert got == want


@_slow
@given(
    keys=st.lists(st.integers(0, 6), min_size=1, max_size=60)
)
def test_skew_report_matches_python(spark, keys):
    """Heavy-key shares and hot factors == Python recompute, pinned
    (cnt DESC, key) tie order."""
    import etl_dagster_service_crawler_spark.workloads.relational as rel
    from etl_dagster_service_crawler_spark.workloads.relational import (
        SKEW_TOP_K,
        q_skew_diagnose_report,
    )

    rows = [
        (1, 1, k, i, 1.0, 0.0, 0.0, 0.0, "N", "O", None)
        for i, k in enumerate(keys)
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber bigint, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    )
    df.createOrReplaceTempView("_skew_li_v")
    orig = rel.load_table
    rel.load_table = lambda sp, sf, name: sp.table("_skew_li_v")
    try:
        got = [
            (r["l_suppkey"], r["cnt"], r["share_bp"], r["hot_bp"])
            for r in q_skew_diagnose_report(spark, "x")
            .orderBy("l_suppkey")
            .collect()
        ]
    finally:
        rel.load_table = orig

    from collections import Counter

    cnt = Counter(keys)
    total, n_keys = len(keys), len(cnt)
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:SKEW_TOP_K]
    want = sorted(
        (k, c, (10000 * c) // total, (10000 * c * n_keys) // total)
        for k, c in top
    )
    assert got == want


@_slow
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["x", "y", "zz"]), min_size=0, max_size=6
        ).map(" ".join),
        min_size=1,
        max_size=5,
    )
)
def test_bigram_coverage_matches_python(spark, texts):
    """Coverage-ppm == Python recompute of the documented construction
    (corpus top-K bigrams by (cnt DESC, bigram), per-doc membership
    count, floor-div ppm) — including zero-bigram docs."""
    import etl_dagster_service_crawler_spark.workloads.corpus_wl as cwl
    from etl_dagster_service_crawler_spark.workloads.corpus_wl import (
        BIGRAM_COVERAGE_K,
        q_bigram_lm_coverage,
    )

    rows = [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.createOrReplaceTempView("_bg_docs_v")
    orig = cwl.load_table
    cwl.load_table = lambda sp, sf, name: sp.table("_bg_docs_v")
    try:
        got = {
            r["doc_id"]: (r["n_bigrams"], r["in_top"], r["coverage_ppm"])
            for r in q_bigram_lm_coverage(spark, "x").collect()
        }
    finally:
        cwl.load_table = orig

    from collections import Counter

    def bigrams(t):
        toks = t.split(" ")
        return [f"{a} {b}" for a, b in zip(toks, toks[1:])] if len(toks) >= 2 else []

    corpus = Counter()
    for t in texts:
        corpus.update(bigrams(t))
    top = {
        bg
        for bg, _ in sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[
            :BIGRAM_COVERAGE_K
        ]
    }
    for i, t in enumerate(texts):
        bgs = bigrams(t)
        in_top = sum(1 for b in bgs if b in top)
        ppm = (1000000 * in_top) // len(bgs) if bgs else 0
        assert got[i] == (len(bgs), in_top, ppm), (i, t)


# ---------------------------------------------------------------- BPE encoding


def _wrap(syms: list[str]) -> str:
    from etl_dagster_service_crawler_spark.workloads.corpus_wl import _BPE_SEP

    return "".join(_BPE_SEP + s + _BPE_SEP for s in syms)


def _unwrap(r: str) -> list[str]:
    from etl_dagster_service_crawler_spark.workloads.corpus_wl import _BPE_SEP

    return [s for s in r.split(_BPE_SEP) if s != ""]


def _greedy_merge(syms: list[str], left: str, right: str) -> list[str]:
    """Textbook greedy left-to-right non-overlapping pair merge."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@settings(deadline=None)
@given(
    st.lists(st.sampled_from(["a", "b", "ab", "ba", "aa"]), min_size=0, max_size=12),
    st.sampled_from(["a", "b", "ab", "ba", "aa"]),
    st.sampled_from(["a", "b", "ab", "ba", "aa"]),
)
def test_wrapped_replace_equals_textbook_greedy_merge(syms, left, right):
    """The load-bearing claim behind bpe_train_merges' oracle: on the
    SEP||sym||SEP encoding, standard replace() (left-to-right,
    non-overlapping, continue after the replacement) implements
    textbook greedy BPE pair merging EXACTLY — including adversarial
    symbol sets where one symbol is a prefix/suffix/concatenation of
    others ('a', 'ab', 'aa', ...) and repeated runs. Pure Python:
    str.replace has the same semantics as Spark's and DuckDB's
    replace."""
    from etl_dagster_service_crawler_spark.workloads.corpus_wl import _BPE_SEP

    pat = _BPE_SEP + left + _BPE_SEP + _BPE_SEP + right + _BPE_SEP
    rep = _BPE_SEP + left + right + _BPE_SEP
    via_replace = _unwrap(_wrap(syms).replace(pat, rep))
    assert via_replace == _greedy_merge(syms, left, right)
    # and the round-trip itself is lossless
    assert _unwrap(_wrap(syms)) == syms


@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(
        st.lists(st.sampled_from(list("abcdef")), min_size=0, max_size=40),
        min_size=2,
        max_size=6,
    )
)
def test_dup_span_coverage_matches_python_recompute(spark, tmp_path_factory, docs):
    """dup_span_coverage's interval-union fold equals a brute-force
    Python recompute (mark every covered token position) on random
    small-alphabet corpora — small alphabets force heavy cross-doc
    window collisions, the hard case for the union math."""
    import pandas as pd

    from etl_dagster_service_crawler_spark.workloads.corpus_wl import (
        DUP_SPAN_WINDOW,
        q_dup_span_coverage,
    )

    w = DUP_SPAN_WINDOW
    texts = [" ".join(toks) for toks in docs]
    tmp = tmp_path_factory.mktemp("dupspan")
    pd.DataFrame(
        {
            "doc_id": pd.array(range(len(texts)), dtype="int64"),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
        }
    ).to_parquet(f"{tmp}/documents.parquet", index=False)

    # brute-force recompute: window -> set of docs; covered positions
    toks = [t.split(" ") for t in texts]
    owners: dict[tuple, set] = {}
    for d, ts in enumerate(toks):
        for s0 in range(len(ts) - w + 1):
            owners.setdefault(tuple(ts[s0:s0 + w]), set()).add(d)
    want = {}
    for d, ts in enumerate(toks):
        covered = set()
        ndup = 0
        for s0 in range(len(ts) - w + 1):
            if len(owners[tuple(ts[s0:s0 + w])]) >= 2:
                ndup += 1
                covered.update(range(s0, s0 + w))
        want[d] = (len(ts), ndup, len(covered))

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_windows"], r["covered_tokens"])
        for r in q_dup_span_coverage(spark, str(tmp)).collect()
    }
    assert got == want


@settings(max_examples=50, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    gray=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_codec_roundtrip_property(h, w, gray, seed):
    """Any uint8 image round-trips the pure-python PNG codec exactly
    (gray broadcasts to RGB); encoding is deterministic."""
    import numpy as np

    from etl_dagster_service_crawler_spark.operators.png_codec import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    data = encode_png(arr)
    assert data == encode_png(arr)
    back = decode_png(data)
    want = np.repeat(arr[:, :, None], 3, axis=2) if gray else arr
    assert back.shape == want.shape and (back == want).all()


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 10), w=st.integers(1, 10),
    oh=st.integers(1, 10), ow=st.integers(1, 10),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_resize_nearest_properties(h, w, oh, ow, seed):
    """Nearest-neighbor resize: output shape is exactly (oh, ow, 3),
    every output pixel is SOME input pixel, and the top-left corner is
    preserved."""
    import numpy as np

    from etl_dagster_service_crawler_spark.operators.png_codec import (
        resize_nearest,
    )

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = resize_nearest(arr, ow, oh)
    assert out.shape == (oh, ow, 3)
    assert (out[0, 0] == arr[0, 0]).all()
    pixels = {tuple(p) for row in arr for p in row}
    assert all(tuple(p) in pixels for row in out for p in row)


@_slow
@given(
    title=st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters=" &<>-"
        ),
        min_size=1,
        max_size=40,
    ),
    url_n=st.integers(0, 10**6),
    perm=st.permutations(["href", "title", "class"]),
    gap=st.sampled_from(["", " ", "  ", "\t"]),
    mgmt=st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters=" ~-"
        ),
        max_size=30,
    ),
)
def test_html_extract_survives_arbitrary_markup_variation(
    spark, title, url_n, perm, gap, mgmt
):
    """For ANY attribute order, inter-tag whitespace, and
    entity-bearing title text, the extractor must recover the exact
    logical values (entities decoded, whitespace-tolerant) — the
    property behind the hand-picked messy-markup cases."""
    from pyspark.sql import functions as F

    from etl_dagster_service_crawler_spark.functions.html import EXTRACT_SQL

    title_clean = title.strip()
    esc = (
        title_clean.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )
    url = f"https://example.com/job/{url_n}?s=x"
    attrs = {
        "href": f'href="{url}"',
        "title": f'title="{esc}"',
        "class": 'class="info-job__text"',
    }
    anchor = "<a " + " ".join(attrs[k] for k in perm) + f">{esc}</a>"
    mgmt_clean = mgmt.strip()
    html = (
        f"<html><body><h2>{anchor}</h2>"
        f'<div class="list-row"><h3>管理責任</h3>{gap}'
        f'<div class="list-row__data">{mgmt_clean}</div></div>'
        "</body></html>"
    )
    df = spark.createDataFrame([(html,)], "html string")
    row = df.select(
        F.expr(EXTRACT_SQL["job_name"].format(h="html")).alias("name"),
        F.expr(EXTRACT_SQL["job_url"].format(h="html")).alias("url"),
        F.expr(EXTRACT_SQL["management"].format(h="html")).alias("mgmt"),
    ).first()
    assert row["name"] == title_clean
    assert row["url"] == url
    assert row["mgmt"] == mgmt_clean


@_slow
@given(doc_id=st.integers(0, 10**9))
def test_analysis_render_extract_roundtrips_shares(spark, doc_id):
    """For ANY doc_id, extracting the rendered analysis page recovers
    exactly the shares the generator drew — every distribution string
    parses back to the _shares_py values, and the gender expression
    twin names 男性 with the male percentage regardless of block order
    or rgb spacing (the extraction is inverse to the renderer on the
    whole id domain, not just the fixture corpus)."""
    from etl_dagster_service_crawler_spark.functions.html import _h_py
    from etl_dagster_service_crawler_spark.functions.html_analysis import (
        _BAR_CHARTS,
        _EDU_SPREADS,
        _shares_py,
        ANALYSIS_EXTRACT_SQL,
        GENDER_DIST_SQL,
        render_analysis_page,
    )

    df = spark.createDataFrame([Row(html=render_analysis_page(doc_id))])
    gcols = {k: k for k in ("g1_r", "g1_g", "g1_b", "g1_pct",
                            "g2_r", "g2_g", "g2_b", "g2_pct")}
    cols = [
        F.expr(e.format(h="html")).alias(f)
        for f, e in ANALYSIS_EXTRACT_SQL.items()
    ]
    got = (
        df.select(*cols)
        .withColumn("gender_dist", F.expr(GENDER_DIST_SQL.format(**gcols)))
        .first()
        .asDict()
    )

    def pcts(s):
        return [int(p.split(":")[1].rstrip("%")) for p in s.split("、")]

    assert pcts(got["edu_dist"]) == _shares_py(doc_id, "edu", 3, _EDU_SPREADS)
    for _t, field, labels, prefix, spreads in _BAR_CHARTS:
        assert pcts(got[field]) == _shares_py(
            doc_id, prefix, len(labels), spreads
        ), field
    pm = 10 + _h_py(doc_id, "gen", 81)
    assert got["gender_dist"] == f"男性:{pm}%、女性:{100 - pm}%"


@_slow
@given(s=st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200))
def test_analysis_extract_never_raises_on_garbage(spark, s):
    """Arbitrary non-page text through every extraction chain must
    yield ''/NULL, never raise — the ANSI-cast guard (nullif) and the
    no-match regexp semantics hold on the whole input domain (this
    property would have caught the CAST('' AS INT) crash the fixture
    tests missed until the messy-markup case)."""
    from etl_dagster_service_crawler_spark.functions.html_analysis import (
        ANALYSIS_EXTRACT_SQL,
    )

    df = spark.createDataFrame([Row(html=s)])
    cols = [
        F.expr(e.format(h="html")).alias(f)
        for f, e in ANALYSIS_EXTRACT_SQL.items()
    ]
    df.select(*cols).collect()  # must not raise
