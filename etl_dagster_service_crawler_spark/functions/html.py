"""Deterministic job-detail HTML pages + pure-expression field
extraction — the reference's single most characteristic operation made
real end-to-end (reference test.py:168-215 CSS field selection,
test.py:217-374 the 13-key h3-title pivot, test.py:375-412 the
benefits legend spans).

Two halves, one source of truth:

- RENDER: ``PAGE_SQL`` produces a complete job-detail page from a
  documents row (doc_id, source, lang). The expression is
  DIALECT-NEUTRAL SQL — the same string runs verbatim under Spark
  (``F.expr``) and DuckDB (the oracle), so the fixture generator
  itself is value-hash-checked per round, not trusted.
  ``render_job_page`` is the Python mirror used by the enrich
  transport (the page a fetch "downloads" in pipeline_crawl_extract);
  a test pins Python == Spark == DuckDB over the fixture corpus.
- EXTRACT: ``EXTRACT_SQL`` maps each of the reference's ~25 fields to
  a dialect-neutral regexp/replace chain over an ``html`` column.
  Extraction is deliberately NOT anchored to the render template's
  quirks: attribute ORDER is matched two-step (grab the tag by class,
  then the attribute within the tag), inter-tag whitespace is
  tolerated ([^<]*), entities are decoded, and void/unclosed tags
  (<br>, a stray trailing <p>) don't derail the non-greedy captures —
  the messy-markup unit tests feed hand-mangled pages.

Dialect-neutrality rules (enforced by construction, verified by the
per-round oracle): only ``||``, CASE WHEN, %, md5, ascii, substr,
trim, replace, CAST(x AS STRING), regexp_extract(s, re, group) —
identical names and semantics in Spark SQL and DuckDB — and regexes
without backslash classes ([0-9] not \\d) so string-literal escape
handling can never diverge.

Selenium-parity notes: the reference's ``.text`` collapses a <br> to
a newline; this extractor maps it to one space (a fixture-defined
choice, asserted in tests). The reference reads 工作性質 positionally
(div.list-row:nth-child(4)); here it is the first list-row and is
read through the same h3 pivot as the other 13 keys.
"""

from __future__ import annotations

import hashlib

# --- deterministic value tables (single source for SQL AND Python) ---

LOCATIONS = ["台北市內湖區", "新北市板橋區", "台中市西屯區", "高雄市前鎮區", "遠端工作"]
CATEGORIES_A = ["軟體工程師", "資料工程師", "後端工程師", "數據分析師"]
CATEGORIES_B = ["大數據分析", "雲端服務", "系統整合"]
JOB_TYPES = ["全職", "兼職", "約聘"]
MANAGEMENT = ["不需負擔管理責任", "管理 5 人以下", "管理 6~10 人"]
BUSINESS_TRIP = ["無需出差外派", "一年累積出差時間約一個月以下"]
WORK_TIME = ["日班", "日班、夜班輪班", "彈性工時"]
VACATION = ["週休二日", "依公司規定"]
START_WORK = ["不限", "一個月內", "兩週內"]
WORK_EXP = ["不拘", "1年以上", "3年以上", "5年以上"]
EDUCATION = ["不拘", "大學以上", "碩士以上"]
MAJOR = ["不拘", "資訊工程相關", "統計學相關"]
LANGUAGE = ["不拘", "英文 -- 聽/說/讀/寫 略懂", "英文 -- 聽/說/讀/寫 精通"]
TOOLS_POOL = ["Python", "SQL", "Spark", "Excel", "Tableau"]
SKILLS_POOL = ["資料分析", "ETL 開發", "網路爬蟲", "機器學習"]
CERTS_POOL = ["TQC 證照", "AWS 認證"]
LEGAL_POOL = ["勞保", "健保", "勞退提撥"]
OTHER_POOL = ["年終獎金", "彈性上下班", "免費零食"]

# the 13 h3-pivot keys of reference test.py:217-374, plus 工作性質
# (read positionally there, through the same pivot here)
KV_SIMPLE = [
    ("job_type", "工作性質", JOB_TYPES, "type"),
    ("management", "管理責任", MANAGEMENT, "mgmt"),
    ("business_trip", "出差外派", BUSINESS_TRIP, "trip"),
    ("work_time", "上班時段", WORK_TIME, "time"),
    ("vacation", "休假制度", VACATION, "vac"),
    ("start_work", "可上班日", START_WORK, "start"),
    ("work_exp", "工作經歷", WORK_EXP, "exp"),
    ("education", "學歷要求", EDUCATION, "edu"),
    ("major", "科系要求", MAJOR, "maj"),
    ("language", "語文條件", LANGUAGE, "lang"),
]
# u-list pivot keys: (field, h3 key, pool, idx hash key, count hash
# key, min items, max items)
KV_ULIST = [
    ("tools", "擅長工具", TOOLS_POOL, "tool", "ntool", 1, 3),
    ("skills", "工作技能", SKILLS_POOL, "skill", "nskill", 1, 2),
    ("certificates", "具備證照", CERTS_POOL, "cert", "ncert", 0, 2),
]


def _h_sql(key: str, mod: int) -> str:
    """Dialect-neutral deterministic bucket in [0, mod): two md5 hex
    chars of doc_id:key mixed — ascii() and substr() agree between
    Spark and DuckDB (both 1-indexed, both codepoints)."""
    m = f"md5(CAST(doc_id AS STRING) || ':{key}')"
    return f"((ascii(substr({m}, 1, 1)) * 31 + ascii(substr({m}, 2, 1))) % {mod})"


def _h_py(doc_id: int, key: str, mod: int) -> int:
    m = hashlib.md5(f"{doc_id}:{key}".encode()).hexdigest()
    return (ord(m[0]) * 31 + ord(m[1])) % mod


def _lit(s: str) -> str:
    if "'" in s or "\\" in s:
        raise ValueError(f"unsafe literal for dual-dialect SQL: {s!r}")
    return f"'{s}'"


def _case_sql(idx_sql: str, options: list[str]) -> str:
    whens = " ".join(f"WHEN {i} THEN {_lit(o)}" for i, o in enumerate(options[:-1]))
    return f"CASE {idx_sql} {whens} ELSE {_lit(options[-1])} END"


def _items_sql(ikey: str, nkey: str, pool: list[str], lo: int, hi: int,
               open_t: str, close_t: str) -> str:
    """count = lo + h(nkey, hi-lo+1) items; item i = pool[(h(ikey)+i) %
    len]. Emitted as a concat of CASE-guarded wrapped items so the SQL
    needs no loop constructs."""
    parts = []
    for i in range(hi):
        item = _case_sql(f"(({_h_sql(ikey, len(pool))} + {i}) % {len(pool)})", pool)
        wrapped = f"{_lit(open_t)} || {item} || {_lit(close_t)}"
        if i < lo:
            parts.append(wrapped)
        else:
            guard = f"{_h_sql(nkey, hi - lo + 1)} >= {i - lo + 1}"
            parts.append(f"CASE WHEN {guard} THEN {wrapped} ELSE '' END")
    return " || ".join(parts)


def _items_py(doc_id: int, ikey: str, nkey: str, pool: list[str], lo: int,
              hi: int, open_t: str, close_t: str) -> str:
    n = lo + _h_py(doc_id, nkey, hi - lo + 1)
    base = _h_py(doc_id, ikey, len(pool))
    return "".join(
        f"{open_t}{pool[(base + i) % len(pool)]}{close_t}" for i in range(n)
    )


# --- shared scalar fragments ------------------------------------------------

_NAME_SQL = "'R&D ' || source || '-工程師-' || CAST(doc_id AS STRING)"
_NAME_ESC_SQL = f"replace({_NAME_SQL}, '&', '&amp;')"
_URL_SQL = "'https://example.com/job/' || CAST(doc_id AS STRING) || '?s=' || source"
_DATE_SQL = (
    "'2024-' || substr(CAST(101 + doc_id % 12 AS STRING), 2, 2)"
    " || '-' || substr(CAST(101 + doc_id % 28 AS STRING), 2, 2)"
)
_APPL_SQL = "CAST(doc_id % 30 AS STRING) || '~' || CAST(doc_id % 30 + 5 AS STRING)"
_SALARY_SQL = (
    f"CASE WHEN {_h_sql('sal', 4)} = 0 THEN '待遇面議' "
    "ELSE '月薪' || CAST(28000 + doc_id % 50 * 1000 AS STRING) || '元' END"
)
_LOC_SQL = _case_sql(_h_sql("loc", 5), LOCATIONS)
_C1_SQL = _case_sql(_h_sql("cat1", 4), CATEGORIES_A)
_C2_SQL = _case_sql(_h_sql("cat2", 3), CATEGORIES_B)
_TOOL0_SQL = _case_sql(_h_sql("tool", len(TOOLS_POOL)), TOOLS_POOL)
_DESC_SQL = (
    f"'工作內容：負責' || {_C1_SQL} || '與' || {_C2_SQL} || "
    f"'之開發與維運。<br>熟悉 ' || {_TOOL0_SQL} || ' 者佳。[' || lang || ']'"
)
# inter-tag whitespace varies by parity: extractors must tolerate it
_WS_SQL = "CASE WHEN doc_id % 2 = 0 THEN '' ELSE ' ' END"


def _anchor_sql() -> str:
    """The title anchor with attribute ORDER varying by doc parity —
    the messiness that forces two-step (tag, then attribute)
    extraction instead of a single positional regex."""
    a = (
        f"'<a href=\"' || {_URL_SQL} || '\" title=\"' || {_NAME_ESC_SQL} || "
        f"'\" class=\"info-job__text\">' || {_NAME_ESC_SQL} || '</a>'"
    )
    b = (
        f"'<a title=\"' || {_NAME_ESC_SQL} || '\" class=\"info-job__text\" "
        f"href=\"' || {_URL_SQL} || '\">' || {_NAME_ESC_SQL} || '</a>'"
    )
    return f"CASE WHEN doc_id % 2 = 0 THEN {a} ELSE {b} END"


def _kv_row_sql(key: str, val_sql: str) -> str:
    return (
        f"'<div class=\"list-row\"><h3>{key}</h3>' || {_WS_SQL} || "
        f"'<div class=\"list-row__data\">' || {val_sql} || '</div></div>'"
    )


def _page_sql() -> str:
    kv_rows = [
        _kv_row_sql(key, _case_sql(_h_sql(hk, len(pool)), pool))
        for _f, key, pool, hk in KV_SIMPLE
    ]
    kv_rows.append(_kv_row_sql(
        "需求人數", "CAST(1 + doc_id % 5 AS STRING) || ' 人'"))
    for _f, key, pool, ik, nk, lo, hi in KV_ULIST:
        kv_rows.append(_kv_row_sql(
            key, _items_sql(ik, nk, pool, lo, hi, "<u>", "</u>")))
    legal = _items_sql("leg", "nleg", LEGAL_POOL, 2, 3,
                       '<span class="tag--text"><a>', "</a></span>")
    other = _items_sql("oth", "noth", OTHER_POOL, 1, 3,
                       '<span class="tag--text"><a>', "</a></span>")
    hiring = (
        "CASE WHEN doc_id % 3 = 0 THEN "
        "'<div class=\"actively-hiring-tag\">積極徵才中</div>' ELSE '' END"
    )
    parts = [
        f"'<html><head><title>' || {_NAME_ESC_SQL} || ' - 測試人力銀行</title>"
        "</head><body data-page=\"job-detail\">'",
        "'<div class=\"job-header\"><h2>'",
        _anchor_sql(),
        f"'</h2><span class=\"text-gray-darker\" title=\"更新 ' || {_DATE_SQL} || "
        f"'\">' || {_DATE_SQL} || ' 更新</span>'",
        hiring,
        f"'<a class=\"d-flex align-items-center font-weight-bold\">應徵人數 ' || "
        f"{_APPL_SQL} || ' 人</a></div>'",
        f"'<p class=\"text-primary font-weight-bold\">' || {_SALARY_SQL} || '</p>'",
        f"'<div class=\"job-address\"><span>' || {_LOC_SQL} || '</span></div>'",
        f"'<div class=\"category-item\"><u>' || {_C1_SQL} || '</u></div>"
        f"<div class=\"category-item\"><u>' || {_C2_SQL} || '</u></div>'",
        f"'<p class=\"job-description__content\">' || {_DESC_SQL} || '</p>'",
        *kv_rows,
        f"'<div class=\"benefits-labels legal\">' || {legal} || '</div>'",
        f"'<div class=\"benefits-labels other\">' || {other} || '</div>'",
        # deliberately-unclosed trailing <p>: robustness fodder
        "'<p class=\"note\">本頁為系統產生之測試頁</body></html>'",
    ]
    # flat variadic concat, NOT a || chain: DuckDB's binder recurses
    # per || node and a ~60-part chain blows its 128-frame limit;
    # concat() is one flat call in both dialects (no NULLs here, so
    # the engines' NULL-handling difference is moot)
    return "concat(" + ", ".join(parts) + ")"


PAGE_SQL = _page_sql()


def render_job_page(doc_id: int, source: str, lang: str) -> str:
    """Python mirror of PAGE_SQL — the page the enrich transport
    serves. A test asserts byte-equality with the Spark and DuckDB
    evaluations over the fixture corpus, so this duplication cannot
    drift silently."""
    name = f"R&D {source}-工程師-{doc_id}"
    name_esc = name.replace("&", "&amp;")
    url = f"https://example.com/job/{doc_id}?s={source}"
    date = f"2024-{(doc_id % 12) + 1:02d}-{(doc_id % 28) + 1:02d}"
    appl = f"{doc_id % 30}~{doc_id % 30 + 5}"
    salary = (
        "待遇面議" if _h_py(doc_id, "sal", 4) == 0
        else f"月薪{28000 + doc_id % 50 * 1000}元"
    )
    loc = LOCATIONS[_h_py(doc_id, "loc", 5)]
    c1 = CATEGORIES_A[_h_py(doc_id, "cat1", 4)]
    c2 = CATEGORIES_B[_h_py(doc_id, "cat2", 3)]
    tool0 = TOOLS_POOL[_h_py(doc_id, "tool", len(TOOLS_POOL))]
    desc = (
        f"工作內容：負責{c1}與{c2}之開發與維運。<br>熟悉 {tool0} 者佳。[{lang}]"
    )
    ws = "" if doc_id % 2 == 0 else " "
    if doc_id % 2 == 0:
        anchor = (
            f'<a href="{url}" title="{name_esc}" class="info-job__text">'
            f"{name_esc}</a>"
        )
    else:
        anchor = (
            f'<a title="{name_esc}" class="info-job__text" href="{url}">'
            f"{name_esc}</a>"
        )
    hiring = (
        '<div class="actively-hiring-tag">積極徵才中</div>'
        if doc_id % 3 == 0 else ""
    )

    def kv(key: str, val: str) -> str:
        return (
            f'<div class="list-row"><h3>{key}</h3>{ws}'
            f'<div class="list-row__data">{val}</div></div>'
        )

    rows = [kv(key, pool[_h_py(doc_id, hk, len(pool))])
            for _f, key, pool, hk in KV_SIMPLE]
    rows.append(kv("需求人數", f"{1 + doc_id % 5} 人"))
    for _f, key, pool, ik, nk, lo, hi in KV_ULIST:
        rows.append(kv(key, _items_py(doc_id, ik, nk, pool, lo, hi,
                                      "<u>", "</u>")))
    legal = _items_py(doc_id, "leg", "nleg", LEGAL_POOL, 2, 3,
                      '<span class="tag--text"><a>', "</a></span>")
    other = _items_py(doc_id, "oth", "noth", OTHER_POOL, 1, 3,
                      '<span class="tag--text"><a>', "</a></span>")
    return (
        f"<html><head><title>{name_esc} - 測試人力銀行</title></head>"
        '<body data-page="job-detail">'
        f'<div class="job-header"><h2>{anchor}</h2>'
        f'<span class="text-gray-darker" title="更新 {date}">{date} 更新</span>'
        f"{hiring}"
        f'<a class="d-flex align-items-center font-weight-bold">應徵人數 '
        f"{appl} 人</a></div>"
        f'<p class="text-primary font-weight-bold">{salary}</p>'
        f'<div class="job-address"><span>{loc}</span></div>'
        f'<div class="category-item"><u>{c1}</u></div>'
        f'<div class="category-item"><u>{c2}</u></div>'
        f'<p class="job-description__content">{desc}</p>'
        + "".join(rows)
        + f'<div class="benefits-labels legal">{legal}</div>'
        f'<div class="benefits-labels other">{other}</div>'
        '<p class="note">本頁為系統產生之測試頁</body></html>'
    )


def job_page_transport(url: str) -> str:
    """Transport for pipeline_crawl_extract: 'fetches' the job-detail
    page for ``https://example.com/job/<doc_id>?s=<source>&l=<lang>``
    by rendering it deterministically — the swap point where a real
    deployment plugs operators/transport.http_transport()."""
    tail = url.rsplit("/", 1)[1]
    id_part, qs = tail.split("?", 1)
    params = dict(p.split("=", 1) for p in qs.split("&"))
    return render_job_page(int(id_part), params["s"], params["l"])


# --- extraction --------------------------------------------------------------

_DECODE = (
    "replace(replace(replace({x}, '&lt;', '<'), '&gt;', '>'), '&amp;', '&')"
)
_UJOIN = (
    "replace(replace(replace({x}, '</u><u>', '、'), '<u>', ''), '</u>', '')"
)
_SPANJOIN = (
    "replace(replace(replace({x}, '</a></span><span class=\"tag--text\"><a>',"
    " '、'), '<span class=\"tag--text\"><a>', ''), '</a></span>', '')"
)
_ANCHOR_TAG = (
    "regexp_extract({h}, '<a [^>]*class=\"info-job__text\"[^>]*>', 0)"
)


def _kv_extract(key: str) -> str:
    return (
        "trim(regexp_extract({h}, '<h3>" + key + "</h3>[^<]*"
        "<div class=\"list-row__data\">([^<]*)</div>', 1))"
    )


def _kv_extract_ulist(key: str) -> str:
    inner = (
        "regexp_extract({h}, '<h3>" + key + "</h3>[^<]*"
        "<div class=\"list-row__data\">(.*?)</div>', 1)"
    )
    return _UJOIN.format(x=inner)


def _extract_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out["job_name"] = _DECODE.format(
        x=f"regexp_extract({_ANCHOR_TAG}, 'title=\"([^\"]*)\"', 1)"
    )
    out["job_url"] = f"regexp_extract({_ANCHOR_TAG}, 'href=\"([^\"]*)\"', 1)"
    out["update_date"] = (
        "trim(replace(regexp_extract({h}, '<span class=\"text-gray-darker\" "
        "title=\"([^\"]*)\"', 1), '更新', ''))"
    )
    out["actively_hiring"] = (
        "CASE WHEN regexp_extract({h}, '<div class=\"actively-hiring-tag\">"
        "([^<]*)</div>', 1) = '積極徵才中' THEN '是' ELSE '否' END"
    )
    out["applicants"] = (
        "trim(replace(replace(regexp_extract({h}, '<a class=\"d-flex "
        "align-items-center font-weight-bold\">([^<]*)</a>', 1), "
        "'應徵人數', ''), '人', ''))"
    )
    out["salary"] = (
        "trim(regexp_extract({h}, '<p class=\"text-primary "
        "font-weight-bold\">([^<]*)</p>', 1))"
    )
    out["location"] = (
        "trim(regexp_extract({h}, '<div class=\"job-address\">"
        "<span>([^<]*)</span>', 1))"
    )
    out["job_category"] = (
        "regexp_extract({h}, '<div class=\"category-item\"><u>([^<]*)</u>"
        "</div><div class=\"category-item\"><u>[^<]*</u></div>', 1)"
        " || '、' || "
        "regexp_extract({h}, '<div class=\"category-item\"><u>[^<]*</u>"
        "</div><div class=\"category-item\"><u>([^<]*)</u></div>', 1)"
    )
    out["description"] = (
        "replace(regexp_extract({h}, '<p class=\"job-description__content\">"
        "(.*?)</p>', 1), '<br>', ' ')"
    )
    for field, key, _pool, _hk in KV_SIMPLE:
        out[field] = _kv_extract(key)
    out["headcount"] = _kv_extract("需求人數")
    for field, key, _pool, _ik, _nk, _lo, _hi in KV_ULIST:
        out[field] = _kv_extract_ulist(key)
    out["legal_benefits"] = _SPANJOIN.format(
        x="regexp_extract({h}, '<div class=\"benefits-labels legal\">"
          "(.*?)</div>', 1)"
    )
    out["other_benefits"] = _SPANJOIN.format(
        x="regexp_extract({h}, '<div class=\"benefits-labels other\">"
          "(.*?)</div>', 1)"
    )
    return out


#: field -> dialect-neutral extraction expression; ``{h}`` is the
#: placeholder for the html column/expression (format before use).
EXTRACT_SQL = _extract_sql()
