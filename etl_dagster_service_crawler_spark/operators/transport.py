"""Real network transports for the two fetch seams.

The reference fetches the live web (chromedriver, reference test.py:84;
`driver.get` per listing page at test.py:135; detail tabs at
test.py:176-178). The engine's operators take a pluggable transport at
exactly those seams — `operators/enrich.http_enrich(transport=...)` for
per-row detail fetches and the crawl DataSource's
`option("transport", ...)` for listing pages — and until this module
the only implementation was the deterministic no-network fake. These
are the urllib-backed second implementations, honoring the same
error-classification contract the retry/budget machinery is built on:

- transient (timeouts, connection errors, HTTP 5xx/408/429) raises
  TransientFetchError -> retried with backoff up to the caller's
  budget;
- permanent (any other 4xx) raises PermanentFetchError -> failed
  immediately, no retry (re-fetching a 404 burns the politeness budget
  for nothing).

Both transports are closures over plain config (no Spark objects), so
they pickle into mapInPandas workers and resolve worker-side in the
DataSource readers.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Callable

from etl_dagster_service_crawler_spark.operators.enrich import (
    PermanentFetchError,
    TransientFetchError,
)

DEFAULT_TIMEOUT_S = 10.0
# bound the body read: a misbehaving endpoint must not balloon one
# task's memory (payloads land in an Arrow string column)
DEFAULT_MAX_BYTES = 4_000_000
_USER_AGENT = "spark-graft-crawler/1.0"

# retryable HTTP statuses besides 5xx: request-timeout and throttling
_TRANSIENT_STATUSES = {408, 429}

# UA synthesis templates (reference parity: the crawler synthesizes a
# fresh UA per session via fake-useragent, reference requirements.txt:8
# + test.py:67-68). Component pools are public, current-ish browser/OS
# strings; the synthesizer combines them DETERMINISTICALLY from a seed
# so a crawl run is reproducible — same seed, same pool, same rotation
# order — unlike fake-useragent's network-fetched randomness.
_UA_OSES = (
    "Windows NT 10.0; Win64; x64",
    "Macintosh; Intel Mac OS X 10_15_7",
    "X11; Linux x86_64",
    "Windows NT 11.0; Win64; x64",
    "X11; Ubuntu; Linux x86_64",
)
_UA_CHROME_MAJORS = tuple(range(118, 132))
_UA_FIREFOX_MAJORS = tuple(range(118, 134))
_UA_SAFARI_VERSIONS = ("16.6", "17.0", "17.2", "17.4")


def synth_user_agents(n: int, seed: int = 0) -> list[str]:
    """Synthesize ``n`` plausible browser User-Agent strings from a
    seed — the deterministic stand-in for the reference's
    fake-useragent pool. Chrome/Firefox/Safari shapes over the OS pool,
    with every draw derived from ``md5(seed:i)`` digest bytes — the
    same hash-derived-draw idiom the repo's oracle-checked samplers use
    (mix_weighted_sample, sample_deterministic), so the pool is
    bit-stable across processes AND interpreter versions (stdlib
    ``random.Random.choice``/``randrange`` draw paths have changed
    across CPython releases before; only ``random()`` itself is
    documented stable). Deduplicated preserving draw order. Feed the
    result straight into ``http_transport(user_agents=...)``.

    n caps at 4096: the template space is finite (the Safari arm alone
    has a handful of shapes), and near capacity the dedup loop would
    spin re-drawing collisions forever (post-review fix). No crawl
    rotation needs more — politeness comes from variety, not
    cardinality."""
    if n > 4096:
        raise ValueError(
            f"synth_user_agents caps at 4096 distinct UAs (asked {n})"
        )
    out: list[str] = []
    seen: set[str] = set()
    i = 0
    while len(out) < n:
        h = hashlib.md5(f"{seed}:{i}".encode()).digest()
        i += 1
        kind = h[0] % 3
        os_part = _UA_OSES[h[1] % len(_UA_OSES)]
        if kind == 0:
            major = _UA_CHROME_MAJORS[h[2] % len(_UA_CHROME_MAJORS)]
            build = 1000 + int.from_bytes(h[3:6], "big") % 5500
            ua = (
                f"Mozilla/5.0 ({os_part}) AppleWebKit/537.36 "
                f"(KHTML, like Gecko) Chrome/{major}.0.{build}.0 "
                "Safari/537.36"
            )
        elif kind == 1:
            major = _UA_FIREFOX_MAJORS[h[2] % len(_UA_FIREFOX_MAJORS)]
            ua = (
                f"Mozilla/5.0 ({os_part}; rv:{major}.0) "
                f"Gecko/20100101 Firefox/{major}.0"
            )
        else:
            ver = _UA_SAFARI_VERSIONS[h[2] % len(_UA_SAFARI_VERSIONS)]
            ua = (
                "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) "
                f"AppleWebKit/605.1.15 (KHTML, like Gecko) "
                f"Version/{ver} Safari/605.1.15"
            )
        if ua not in seen:
            seen.add(ua)
            out.append(ua)
    return out


def http_transport(
    timeout_s: float = DEFAULT_TIMEOUT_S,
    headers: dict[str, str] | None = None,
    max_bytes: int = DEFAULT_MAX_BYTES,
    user_agents: list[str] | None = None,
) -> Callable[[str], str]:
    """str -> str GET transport for the enrich seam (http_enrich).

    Returns the decoded body (response charset, utf-8 fallback,
    replacement on bad bytes — a fetch stage must never throw on
    payload CONTENT, only on delivery).

    ``user_agents``: optional UA ROTATION (reference parity — the
    crawler rotates via fake-useragent, test.py:67-68): successive
    fetches round-robin through the list, per worker (the counter is
    closure state, so each mapInPandas worker rotates independently —
    what matters for politeness is that one worker's request stream
    varies, not global coordination). Default: the pinned engine UA."""
    _ua_state = {"i": 0}

    def _next_ua() -> str:
        if not user_agents:
            return _USER_AGENT
        ua = user_agents[_ua_state["i"] % len(user_agents)]
        _ua_state["i"] += 1
        return ua

    def fetch(url: str) -> str:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            url, headers={"User-Agent": _next_ua(), **(headers or {})}
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                body = resp.read(max_bytes)
                charset = resp.headers.get_content_charset() or "utf-8"
                return body.decode(charset, errors="replace")
        except urllib.error.HTTPError as e:
            if e.code >= 500 or e.code in _TRANSIENT_STATUSES:
                raise TransientFetchError(f"HTTP {e.code} for {url}") from e
            raise PermanentFetchError(f"HTTP {e.code} for {url}") from e
        except urllib.error.URLError as e:
            # DNS failures, refused connections, socket timeouts — all
            # delivery problems, all worth a retry
            raise TransientFetchError(f"{e.reason} for {url}") from e
        except TimeoutError as e:
            raise TransientFetchError(f"timeout after {timeout_s}s for {url}") from e

    return fetch


def http_page_transport(
    base_url: str,
    timeout_s: float = DEFAULT_TIMEOUT_S,
    headers: dict[str, str] | None = None,
    user_agents: list[str] | None = None,
) -> Callable[[int, str, int, int], list[tuple]]:
    """Listing-page transport for the crawl DataSource seam
    (sources/crawl_source.py `option("transport", "http://...")`).

    One listing fetch = GET
    ``{base_url}?kidx=&keyword=&page=&slots=`` returning a JSON array
    of [keyword, page, slot, job_id, title, company_url] rows — the
    row shape of CRAWL_SCHEMA. Delivery errors classify exactly like
    http_transport (the _Fetcher retry/budget wrapper decides policy);
    a non-JSON body raises PermanentFetchError (re-fetching won't fix
    a wrong endpoint)."""
    get = http_transport(
        timeout_s=timeout_s, headers=headers, user_agents=user_agents
    )

    def fetch(kidx: int, keyword: str, page: int, slots: int) -> list[tuple]:
        from urllib.parse import urlencode

        q = urlencode(
            {"kidx": kidx, "keyword": keyword, "page": page, "slots": slots}
        )
        sep = "&" if "?" in base_url else "?"
        body = get(f"{base_url}{sep}{q}")
        try:
            rows = json.loads(body)
        except ValueError as e:
            raise PermanentFetchError(
                f"non-JSON listing body from {base_url} (page {page}): {e}"
            ) from e
        return [tuple(r) for r in rows]

    return fetch


def render_transport(
    driver_factory: Callable[[], object] | None = None,
    wait_s: float = 0.0,
) -> Callable[[str], str]:
    """JS-RENDERING transport contract for the enrich/crawl seams —
    the parity point for the reference's headless-Chromium fetch (the
    target site is JS-rendered, reference test.py:66-84, Dockerfile
    chromium+chromedriver): a static GET returns an empty shell there,
    so the fetch must drive a browser.

    This engine does not depend on a browser (none exists in the
    build/test environment); instead the seam takes an injected
    ``driver_factory`` producing a WebDriver-SHAPED object:

    - ``get(url)``    — navigate (raising on delivery failure),
    - ``page_source`` — the post-JS DOM as str,
    - ``quit()``      — teardown.

    ``selenium.webdriver.Chrome`` satisfies it as-is, so wiring a real
    browser is ``render_transport(lambda: webdriver.Chrome(opts))`` —
    no engine change. Contract honored here (and tested against a fake
    driver, the multimodal-stub discipline):

    - ONE driver per worker, created lazily on first fetch and reused
      across fetches (a browser launch per row would dwarf the fetch);
    - delivery failures from the driver classify TRANSIENT (navigation
      timeouts/crashes are retryable by the same budget machinery as
      http_transport) unless the driver itself raises a
      Permanent/TransientFetchError, which passes through;
    - ``wait_s``: optional post-navigation settle delay for pages that
      render after load (the reference's implicit-wait move).

    With no ``driver_factory`` the factory fails FAST at build time —
    plan-time, not inside a worker — naming what to supply."""
    if driver_factory is None:
        raise NotImplementedError(
            "render_transport needs a browser: pass driver_factory="
            "lambda: selenium.webdriver.Chrome(options) (any object "
            "with .get/.page_source/.quit). No browser is bundled "
            "with the engine."
        )
    state: dict[str, object] = {}

    def fetch(url: str) -> str:
        import time as _time

        drv = state.get("driver")
        if drv is None:
            drv = driver_factory()
            state["driver"] = drv
        try:
            drv.get(url)
            if wait_s:
                _time.sleep(wait_s)
            return str(drv.page_source)
        except (TransientFetchError, PermanentFetchError):
            raise
        except Exception as e:  # noqa: BLE001 - classify driver failures
            # a wedged browser must not poison every later fetch on
            # this worker: tear it down so the retry gets a fresh one
            try:
                drv.quit()
            finally:
                state.pop("driver", None)
            raise TransientFetchError(f"render failure for {url}: {e}") from e

    return fetch
