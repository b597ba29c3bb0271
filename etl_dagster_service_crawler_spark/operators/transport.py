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


def http_transport(
    timeout_s: float = DEFAULT_TIMEOUT_S,
    headers: dict[str, str] | None = None,
    max_bytes: int = DEFAULT_MAX_BYTES,
) -> Callable[[str], str]:
    """str -> str GET transport for the enrich seam (http_enrich).

    Returns the decoded body (response charset, utf-8 fallback,
    replacement on bad bytes — a fetch stage must never throw on
    payload CONTENT, only on delivery)."""

    def fetch(url: str) -> str:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            url, headers={"User-Agent": _USER_AGENT, **(headers or {})}
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
    get = http_transport(timeout_s=timeout_s, headers=headers)

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
