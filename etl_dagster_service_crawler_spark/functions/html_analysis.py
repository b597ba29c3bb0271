"""Deterministic 應徵分析 (apply-analysis) HTML pages + pure-expression
extraction of the reference's 8 distribution maps — the SECOND fetch of
the reference's crawl loop made real end-to-end (reference
test.py:414-524: education legend divs, the ±5-RGB gender match
test.py:36-39 + 436-449, the exact-colour language legend 471-487, and
the five horizontal-bar charts dispatched BY TITLE 501-524).

Same two-halves/one-source-of-truth discipline as functions/html.py
(the r11 detail page):

- RENDER: ``ANALYSIS_PAGE_SQL`` produces a complete analysis page from
  a documents row in DIALECT-NEUTRAL SQL (the same string runs under
  Spark ``F.expr`` and DuckDB), so the fixture generator is itself
  value-hash-checked per round. ``render_analysis_page`` is the Python
  mirror (byte-equality Python == Spark == DuckDB pinned by test).
- EXTRACT: ``ANALYSIS_EXTRACT_SQL`` maps each distribution to a
  dialect-neutral regexp/replace chain over an ``html`` column. The
  gender blocks are deliberately NOT extracted to labels here: they
  parse to RAW (r, g, b, pct) ints (``g1_r`` … ``g2_pct``) so the
  label assignment happens the reference's way — a ±5 tolerance match
  against the male/female legend (``GENDER_LEGEND``), composed either
  as a broadcast theta join (q_html_extract_analysis, the
  join_theta_tolerance shape) or as the zero-shuffle expression twin
  (``GENDER_DIST_SQL``, used by the composed record pipeline); a test
  pins join ≡ expression.

Messiness the extractor must survive (all rendered, all tested):
inter-section whitespace by parity, 年齡/工作經驗 container ORDER swap
(doc_id % 3 — extraction must dispatch by title, like the reference's
``fields`` dict, never by position), rgb spacing ``rgb(r, g, b)`` vs
``rgb(r,g,b)`` by parity, style attribute order swap around the
gender rgb, an entity-escaped label (AI&amp;資料), an unclosed
trailing <p>. The four language-legend colours are byte-exact fixed
strings — the reference's ``legend_map`` is an exact-string lookup
(test.py:471-478), so the replace-chain that maps colour → level IS
that legend.

Dialect-neutrality rules inherited from functions/html.py: only ||,
concat(), CASE WHEN, %, md5, ascii, substr, trim, replace, abs,
CAST(x AS STRING/INT), regexp_extract(s, re, group), LIKE — and
regexes without backslash classes ([0-9] not \\d, [(] not \\().
"""

from __future__ import annotations

from etl_dagster_service_crawler_spark.functions.html import _h_py, _h_sql

# --- the reference's target legend (test.py:443-445) -------------------------

GENDER_LEGEND = [("男性", 78, 145, 255), ("女性", 255, 144, 199)]
RGB_TOLERANCE = 5

# the reference's exact-string colour legend (test.py:471-478)
LANG_LEGEND = [
    ("rgb(255, 231, 217)", "不會"),
    ("rgb(255, 213, 189)", "略懂"),
    ("rgb(255, 195, 161)", "中等"),
    ("rgb(204, 156, 129)", "精通"),
]

EDU_LABELS = ["高中以下", "大學", "碩士以上"]
AGE_LABELS = ["20~25歲", "26~30歲", "31~35歲", "36歲以上"]
EXP_LABELS = ["1年以下", "1~3年", "3年以上"]
MAJOR_LABELS = ["資訊工程", "統計學", "AI&資料"]  # '&' -> &amp; in markup
SKILL_LABELS = ["資料分析", "機器學習", "網路爬蟲"]
CERT_LABELS = ["TQC 證照", "AWS 認證"]
LANG_NAMES = ["英文", "日文"]

# (title, field, labels, hash-key prefix, per-label spreads): first
# n-1 shares are lo + h(key, span), the last is the remainder — every
# percentage an exact integer, identical in SQL and Python.
_BAR_CHARTS = [
    ("年齡", "age_dist", AGE_LABELS, "age", [(5, 26), (5, 26), (5, 26)]),
    ("工作經驗", "exp_dist", EXP_LABELS, "exp", [(10, 41), (5, 31)]),
    ("科系", "major_dist", MAJOR_LABELS, "maj", [(10, 41), (5, 31)]),
    ("技能", "skill_dist", SKILL_LABELS, "skl", [(10, 41), (5, 31)]),
    ("證照", "cert_dist", CERT_LABELS, "crt", [(10, 81)]),
]
_EDU_SPREADS = [(10, 41), (5, 31)]
_LANG_SPREADS = [(5, 31), (5, 26), (5, 21)]


def _shares_sql(prefix: str, n_labels: int, spreads) -> list[str]:
    """n_labels integer percentage expressions summing to 100."""
    parts = [
        f"({lo} + {_h_sql(f'{prefix}{i}', span)})"
        for i, (lo, span) in enumerate(spreads)
    ]
    assert len(parts) == n_labels - 1
    rest = "100" + "".join(f" - {p}" for p in parts)
    return parts + [f"({rest})"]


def _shares_py(doc_id: int, prefix: str, n_labels: int, spreads) -> list[int]:
    parts = [
        lo + _h_py(doc_id, f"{prefix}{i}", span)
        for i, (lo, span) in enumerate(spreads)
    ]
    return parts + [100 - sum(parts)]


def _esc(label: str) -> str:
    return label.replace("&", "&amp;")


# --- render -------------------------------------------------------------------

_WS_SQL = "CASE WHEN doc_id % 2 = 0 THEN '' ELSE ' ' END"


def _bar_container_sql(title: str, labels: list[str], prefix: str, spreads) -> str:
    """One horizontal-bar-chart container: title div + data lines
    (<label><br><pct>%) — the shape extract_age_distribution /
    extract_experience_distribution read via line.text.split('\\n')
    (reference test.py:41-59)."""
    shares = _shares_sql(prefix, len(labels), spreads)
    lines = " || ".join(
        f"'<div class=\"data-line\">{_esc(lab)}<br>' || "
        f"CAST({sh} AS STRING) || '%</div>'"
        for lab, sh in zip(labels, shares)
    )
    return (
        "'<div class=\"chart-container d-flex flex-column bg-white "
        "overflow-hidden horizontal-bar-chart\">"
        f"<div class=\"chart-title\">{title}</div>"
        f"<div class=\"chart-body\">' || {lines} || '</div></div>'"
    )


def _gender_leg_sql(which: str) -> tuple[str, str]:
    """(style_sql, pct_sql) for one gender block. Jittered within the
    ±5 tolerance of the reference targets; channels at 255 jitter only
    downward. rgb spacing and style attribute order vary by parity."""
    if which == "m":
        r = f"(78 + {_h_sql('gjr', 11)} - 5)"
        g = f"(145 + {_h_sql('gjg', 11)} - 5)"
        b = f"(255 - {_h_sql('gjb', 6)})"
        pct = f"(10 + {_h_sql('gen', 81)})"
    else:
        r = f"(255 - {_h_sql('gfr', 6)})"
        g = f"(144 + {_h_sql('gfg', 11)} - 5)"
        b = f"(199 + {_h_sql('gfb', 11)} - 5)"
        pct = f"(100 - (10 + {_h_sql('gen', 81)}))"
    sep = "CASE WHEN doc_id % 2 = 0 THEN ', ' ELSE ',' END"
    rgb = (
        f"'rgb(' || CAST({r} AS STRING) || {sep} || CAST({g} AS STRING)"
        f" || {sep} || CAST({b} AS STRING) || ')'"
    )
    pct_s = f"CAST({pct} AS STRING) || '%'"
    style = (
        f"CASE WHEN doc_id % 2 = 0 THEN 'background: ' || {rgb} ||"
        f" '; width: ' || {pct_s}"
        f" ELSE 'width: ' || {pct_s} || '; background: ' || {rgb} END"
    )
    return style, pct_s


def _gender_sql() -> str:
    ms, mp = _gender_leg_sql("m")
    fs, fp = _gender_leg_sql("f")
    block = (
        "'<div class=\"stack-bar__text__block\" style=\"' || {s} || "
        "'\"><div>' || {p} || '</div></div>'"
    )
    mb = block.format(s=ms, p=mp)
    fb = block.format(s=fs, p=fp)
    # male-first on even docs, female-first on odd: position carries no
    # meaning — only the rgb tolerance match assigns the label
    return (
        "'<div class=\"stack-bar gender\">' || "
        f"CASE WHEN doc_id % 2 = 0 THEN {mb} || {fb} "
        f"ELSE {fb} || {mb} END || '</div>'"
    )


def _lang_item_sql(idx: int, name: str) -> str:
    shares = _shares_sql(f"l{idx}", 4, _LANG_SPREADS)
    bars = " || ".join(
        f"'<div class=\"stack-bar__text__block\" style=\"background: "
        f"{color};\">' || CAST({sh} AS STRING) || '%</div>'"
        for (color, _lvl), sh in zip(LANG_LEGEND, shares)
    )
    return (
        f"'<div class=\"mb-4\" data-idx=\"{idx}\">"
        f"<span class=\"text-truncate\">{name}</span>' || {bars} || '</div>'"
    )


def _edu_sql() -> str:
    shares = _shares_sql("edu", 3, _EDU_SPREADS)
    pairs = " || ".join(
        f"'<div class=\"legend__text\">{lab}</div>"
        f"<div class=\"legend__value\">' || CAST({sh} AS STRING) || '%</div>'"
        for lab, sh in zip(EDU_LABELS, shares)
    )
    return (
        "'<div class=\"chart-container pie\">"
        "<div class=\"chart-title\">學歷</div>"
        "<div class=\"chart-container__body\" data-kind=\"edu\">' || "
        f"{pairs} || '</div></div>'"
    )


def _analysis_page_sql() -> str:
    age = _bar_container_sql(*_chart_args("年齡"))
    exp = _bar_container_sql(*_chart_args("工作經驗"))
    tail_charts = [
        _bar_container_sql(*_chart_args(t)) for t in ("科系", "技能", "證照")
    ]
    lang2 = _lang_item_sql(2, LANG_NAMES[1])
    lang = (
        "'<div class=\"chart-container lang\">"
        "<div class=\"chart-title\">語言能力</div>"
        "<div class=\"chart-container__body\" data-kind=\"language\">' || "
        f"{_lang_item_sql(1, LANG_NAMES[0])} || "
        f"CASE WHEN {_h_sql('nlang', 2)} = 1 THEN {lang2} ELSE '' END"
        " || '</div></div>'"
    )
    parts = [
        "'<html><head><title>應徵分析 ' || CAST(doc_id AS STRING) || "
        "'</title></head><body data-page=\"apply-analysis\">'",
        _edu_sql(),
        _WS_SQL,
        _gender_sql(),
        _WS_SQL,
        lang,
        _WS_SQL,
        # 年齡/工作經驗 swap order on doc_id % 3 = 0: extraction must
        # dispatch by chart TITLE (the reference's fields dict), never
        # by container position
        f"CASE WHEN doc_id % 3 = 0 THEN {exp} || {_WS_SQL} || {age} "
        f"ELSE {age} || {_WS_SQL} || {exp} END",
        _WS_SQL,
        *tail_charts,
        "'<p class=\"note\">此頁為系統產生之分析頁</body></html>'",
    ]
    # flat variadic concat (the PAGE_SQL rule: a || chain overflows
    # DuckDB's 128-frame binder)
    return "concat(" + ", ".join(parts) + ")"


def _chart_args(title: str):
    for t, _f, labels, prefix, spreads in _BAR_CHARTS:
        if t == title:
            return t, labels, prefix, spreads
    raise KeyError(title)


ANALYSIS_PAGE_SQL = _analysis_page_sql()


def render_analysis_page(doc_id: int) -> str:
    """Python mirror of ANALYSIS_PAGE_SQL — the page the analysis
    transport serves; byte-equality with the Spark/DuckDB evaluations
    is pinned by test so the duplication cannot drift."""
    ws = "" if doc_id % 2 == 0 else " "

    def shares(prefix, n, spreads):
        return _shares_py(doc_id, prefix, n, spreads)

    def bar_container(title):
        _t, labels, prefix, spreads = _chart_args(title)
        sh = shares(prefix, len(labels), spreads)
        lines = "".join(
            f'<div class="data-line">{_esc(lab)}<br>{p}%</div>'
            for lab, p in zip(labels, sh)
        )
        return (
            '<div class="chart-container d-flex flex-column bg-white '
            'overflow-hidden horizontal-bar-chart">'
            f'<div class="chart-title">{title}</div>'
            f'<div class="chart-body">{lines}</div></div>'
        )

    e = shares("edu", 3, _EDU_SPREADS)
    edu_pairs = "".join(
        f'<div class="legend__text">{lab}</div>'
        f'<div class="legend__value">{p}%</div>'
        for lab, p in zip(EDU_LABELS, e)
    )
    edu = (
        '<div class="chart-container pie"><div class="chart-title">學歷</div>'
        f'<div class="chart-container__body" data-kind="edu">{edu_pairs}'
        "</div></div>"
    )

    sep = ", " if doc_id % 2 == 0 else ","
    pm = 10 + _h_py(doc_id, "gen", 81)

    def leg(which):
        if which == "m":
            r = 78 + _h_py(doc_id, "gjr", 11) - 5
            g = 145 + _h_py(doc_id, "gjg", 11) - 5
            b = 255 - _h_py(doc_id, "gjb", 6)
            pct = pm
        else:
            r = 255 - _h_py(doc_id, "gfr", 6)
            g = 144 + _h_py(doc_id, "gfg", 11) - 5
            b = 199 + _h_py(doc_id, "gfb", 11) - 5
            pct = 100 - pm
        rgb = f"rgb({r}{sep}{g}{sep}{b})"
        if doc_id % 2 == 0:
            style = f"background: {rgb}; width: {pct}%"
        else:
            style = f"width: {pct}%; background: {rgb}"
        return (
            f'<div class="stack-bar__text__block" style="{style}">'
            f"<div>{pct}%</div></div>"
        )

    blocks = leg("m") + leg("f") if doc_id % 2 == 0 else leg("f") + leg("m")
    gender = f'<div class="stack-bar gender">{blocks}</div>'

    def lang_item(idx, name):
        sh = shares(f"l{idx}", 4, _LANG_SPREADS)
        bars = "".join(
            f'<div class="stack-bar__text__block" style="background: '
            f'{color};">{p}%</div>'
            for (color, _lvl), p in zip(LANG_LEGEND, sh)
        )
        return (
            f'<div class="mb-4" data-idx="{idx}">'
            f'<span class="text-truncate">{name}</span>{bars}</div>'
        )

    items = lang_item(1, LANG_NAMES[0])
    if _h_py(doc_id, "nlang", 2) == 1:
        items += lang_item(2, LANG_NAMES[1])
    lang = (
        '<div class="chart-container lang">'
        '<div class="chart-title">語言能力</div>'
        f'<div class="chart-container__body" data-kind="language">{items}'
        "</div></div>"
    )

    age, exp = bar_container("年齡"), bar_container("工作經驗")
    mid = f"{exp}{ws}{age}" if doc_id % 3 == 0 else f"{age}{ws}{exp}"
    return (
        f"<html><head><title>應徵分析 {doc_id}</title></head>"
        '<body data-page="apply-analysis">'
        + edu + ws + gender + ws + lang + ws + mid + ws
        + bar_container("科系") + bar_container("技能") + bar_container("證照")
        + '<p class="note">此頁為系統產生之分析頁</body></html>'
    )


def analysis_page_transport(url: str) -> str:
    """Transport for the analysis fetch: 'downloads'
    ``https://example.com/jobs/apply/analysis/<doc_id>`` by rendering
    deterministically — the reference's second window.open
    (test.py:419-421), swap point for a real HTTP client."""
    return render_analysis_page(int(url.rsplit("/", 1)[1]))


# --- extraction ---------------------------------------------------------------

_DECODE = (
    "replace(replace(replace({x}, '&lt;', '<'), '&gt;', '>'), '&amp;', '&')"
)


def _bar_extract(title: str) -> str:
    """title-anchored data-line pairs -> 'label:pct%、label:pct%' —
    the reference's per-container title dispatch + line.text.split."""
    inner = (
        "regexp_extract({h}, '<div class=\"chart-title\">" + title +
        "</div>[^<]*<div class=\"chart-body\">(.*?)</div></div>', 1)"
    )
    x = f"replace({inner}, '</div><div class=\"data-line\">', '、')"
    x = f"replace({x}, '<div class=\"data-line\">', '')"
    x = f"replace({x}, '<br>', ':')"
    return _DECODE.format(x=x)


def _edu_extract() -> str:
    inner = (
        "regexp_extract({h}, 'data-kind=\"edu\">(.*?)</div></div>', 1)"
    )
    x = f"replace({inner}, '</div><div class=\"legend__value\">', ':')"
    x = f"replace({x}, '</div><div class=\"legend__text\">', '、')"
    x = f"replace({x}, '<div class=\"legend__text\">', '')"
    return x


_GSEC = "regexp_extract({h}, '<div class=\"stack-bar gender\">(.*?)</div></div></div>', 1)"
_G1_STYLE = f"regexp_extract({_GSEC}, 'style=\"([^\"]*)\"', 1)"
_G2_STYLE = (
    f"regexp_extract({_GSEC}, '</div><div class=\"stack-bar__text__block\" "
    "style=\"([^\"]*)\"', 1)"
)
# no trailing </div> in the pct patterns: the outer gender capture
# consumes the final close, so block2's pct runs to end-of-capture
_G1_PCT = f"regexp_extract({_GSEC}, 'style=\"[^\"]*\"><div>([^<]*)', 1)"
_G2_PCT = (
    f"regexp_extract({_GSEC}, '</div><div class=\"stack-bar__text__block\" "
    "style=\"[^\"]*\"><div>([^<]*)', 1)"
)
# rgb channel from a style string: tolerate both spacings via [^0-9]+
_RGB_RE = "'rgb[(]([0-9]+)[^0-9]+([0-9]+)[^0-9]+([0-9]+)[)]'"


def _rgb_channel(style_sql: str, group: int) -> str:
    # nullif guards the absent-section case: ANSI CAST('' AS INT)
    # throws on BOTH engines; NULL channels match no legend row
    return (
        f"CAST(nullif(regexp_extract({style_sql}, {_RGB_RE}, {group}), '')"
        " AS INT)"
    )


def _lang_desc(idx: int) -> str:
    """bars of one mb-4 item -> '不會12%,略懂38%,中等30%,精通20%' — the
    replace of each exact legend colour string with its level IS the
    reference's legend_map lookup (exact-string keyed, test.py:471)."""
    inner = (
        "regexp_extract({h}, 'data-idx=\"" + str(idx) +
        "\"><span class=\"text-truncate\">[^<]*</span>(.*?)</div></div>', 1)"
    )
    first_color, first_lvl = LANG_LEGEND[0]
    x = inner
    for color, lvl in LANG_LEGEND[1:]:
        x = (
            f"replace({x}, '</div><div class=\"stack-bar__text__block\" "
            f"style=\"background: {color};\">', ',{lvl}')"
        )
    x = (
        f"replace({x}, '<div class=\"stack-bar__text__block\" "
        f"style=\"background: {first_color};\">', '{first_lvl}')"
    )
    return x


def _lang_name(idx: int) -> str:
    return (
        "regexp_extract({h}, 'data-idx=\"" + str(idx) +
        "\"><span class=\"text-truncate\">([^<]*)</span>', 1)"
    )


def _lang_skills() -> str:
    one = f"{_lang_name(1)} || '=' || {_lang_desc(1)}"
    two = f" || '、' || {_lang_name(2)} || '=' || {_lang_desc(2)}"
    return (
        f"CASE WHEN {{h}} LIKE '%data-idx=\"2\"%' THEN {one}{two} "
        f"WHEN {{h}} LIKE '%data-idx=\"1\"%' THEN {one} "
        "ELSE '' END"
    )


def _extract_sql() -> dict[str, str]:
    out: dict[str, str] = {"edu_dist": _edu_extract()}
    out["lang_skills"] = _lang_skills()
    for title, field, _labels, _prefix, _spreads in _BAR_CHARTS:
        out[field] = _bar_extract(title)
    # gender parses to RAW ints + the percentage text: the label
    # assignment is the ±5 tolerance match done downstream (join or
    # expression), never here
    out["g1_r"] = _rgb_channel(_G1_STYLE, 1)
    out["g1_g"] = _rgb_channel(_G1_STYLE, 2)
    out["g1_b"] = _rgb_channel(_G1_STYLE, 3)
    out["g1_pct"] = _G1_PCT
    out["g2_r"] = _rgb_channel(_G2_STYLE, 1)
    out["g2_g"] = _rgb_channel(_G2_STYLE, 2)
    out["g2_b"] = _rgb_channel(_G2_STYLE, 3)
    out["g2_pct"] = _G2_PCT
    return out


#: field -> dialect-neutral extraction expression over an ``{h}``
#: html column (format before use). Gender fields are raw parsed ints.
ANALYSIS_EXTRACT_SQL = _extract_sql()


def _match_sql(r: str, g: str, b: str, tr: int, tg: int, tb: int) -> str:
    t = RGB_TOLERANCE
    return (
        f"abs({r} - {tr}) <= {t} AND abs({g} - {tg}) <= {t} "
        f"AND abs({b} - {tb}) <= {t}"
    )


def _gender_dist_sql() -> str:
    """Zero-shuffle expression twin of the tolerance JOIN: '男性:P、
    女性:P' from the parsed block ints — one CASE over which block
    matches the male target (blocks are a male/female pair by
    construction; the canonical output orders 男性 first regardless of
    block order). The composed record pipeline uses this; a test pins
    it ≡ the broadcast theta join of q_html_extract_analysis."""
    (_ml, mr, mg, mb_), (_fl, fr, fg, fb) = GENDER_LEGEND
    m1 = _match_sql("{g1_r}", "{g1_g}", "{g1_b}", mr, mg, mb_)
    f2 = _match_sql("{g2_r}", "{g2_g}", "{g2_b}", fr, fg, fb)
    return (
        f"CASE WHEN {m1} AND {f2} "
        "THEN '男性:' || {g1_pct} || '、女性:' || {g2_pct} "
        "ELSE '男性:' || {g2_pct} || '、女性:' || {g1_pct} END"
    )


#: expression template over the 8 parsed gender columns (format with
#: g1_r=..., etc. — column names or full expressions)
GENDER_DIST_SQL = _gender_dist_sql()

#: the 8 job_info keys in the reference's record order (test.py:517-524)
ANALYSIS_FIELDS = [
    ("學歷", "edu_dist"),
    ("性別", "gender_dist"),
    ("年齡", "age_dist"),
    ("工作經驗", "exp_dist"),
    ("科系", "major_dist"),
    ("語言能力", "lang_skills"),
    ("技能", "skill_dist"),
    ("證照", "cert_dist"),
]
