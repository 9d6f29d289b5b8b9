"""Paginated HTTP API source (reference: odibi/connections/api_fetcher.py
1,349 LoC; pagination config odibi/config.py:1121-1303; engine hook
spark_engine.py:744-792).

Pagination styles reproduced: page-number, offset/limit, cursor field,
RFC-5988 Link header. Retry with exponential backoff; driver-side fetch
-> records -> ``spark.createDataFrame`` (Arrow), exactly the reference's
strategy — an API source is inherently driver-bound; scale comes from
what happens AFTER the frame exists.

The transport is injectable (``fetch(url, params) -> (json, headers)``)
so pagination/retry logic is unit-testable without network; the default
transport uses urllib at call time.
"""

from __future__ import annotations

import json as _json
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

Transport = Callable[[str, dict], tuple[object, dict]]


def _default_transport(url: str, params: dict) -> tuple[object, dict]:
    import urllib.parse
    import urllib.request

    full = url
    if params:
        sep = "&" if "?" in url else "?"
        full = url + sep + urllib.parse.urlencode(params)
    with urllib.request.urlopen(full, timeout=30) as resp:  # noqa: S310
        return _json.loads(resp.read().decode()), dict(resp.headers)


def fetch_all(
    url: str,
    *,
    transport: Transport | None = None,
    pagination: str = "none",            # none | page | offset | cursor | link
    records_path: str | None = None,     # dot-path to the record list
    page_param: str = "page",
    start_page: int = 1,
    offset_param: str = "offset",
    limit_param: str = "limit",
    page_size: int = 100,
    cursor_param: str = "cursor",
    cursor_field: str = "next_cursor",
    max_pages: int = 1000,
    params: dict | None = None,
    retries: int = 3,
    backoff_s: float = 0.5,
) -> list[dict]:
    """Fetch every page; returns the flat record list."""
    transport = transport or _default_transport
    out: list[dict] = []
    base = dict(params or {})
    cursor = None
    for page_no in range(max_pages):
        p = dict(base)
        if pagination == "page":
            p[page_param] = start_page + page_no
        elif pagination == "offset":
            p[offset_param] = page_no * page_size
            p[limit_param] = page_size
        elif pagination == "cursor" and cursor is not None:
            p[cursor_param] = cursor

        body, headers = _fetch_with_retry(transport, url, p, retries, backoff_s)
        records = _extract(body, records_path)
        out.extend(records)

        if pagination == "none":
            break
        if pagination in ("page", "offset") and len(records) < (
            page_size if pagination == "offset" else 1
        ):
            break
        if pagination == "page" and not records:
            break
        if pagination == "cursor":
            cursor = _dig(body, cursor_field)
            if not cursor:
                break
        if pagination == "link":
            url_next = _parse_link_next(headers.get("Link", ""))
            if not url_next:
                break
            url, base = url_next, {}
    return out


def read_api(
    spark: SparkSession, url: str, *, schema: str | None = None, **kwargs
) -> DataFrame:
    """Driver-side paginated fetch -> Spark DataFrame."""
    records = fetch_all(url, **kwargs)
    if schema:
        return spark.createDataFrame(records, schema)
    if not records:
        raise ValueError("API returned no records and no schema was given")
    return spark.createDataFrame(records)


def _fetch_with_retry(transport, url, params, retries, backoff_s):
    last = None
    for attempt in range(retries + 1):
        try:
            return transport(url, params)
        except Exception as ex:  # noqa: BLE001
            last = ex
            if attempt < retries:
                time.sleep(backoff_s * (2**attempt))
    raise last


def _dig(body: object, path: str | None):
    if path is None:
        return body
    cur = body
    for part in path.split("."):
        if not isinstance(cur, dict):
            return None
        cur = cur.get(part)
    return cur


def _extract(body: object, records_path: str | None) -> list[dict]:
    found = _dig(body, records_path)
    if found is None:
        return []
    if isinstance(found, list):
        return found
    raise ValueError(f"records path '{records_path}' did not yield a list")


def _parse_link_next(link_header: str) -> str | None:
    """RFC-5988: <url>; rel="next" (reference link-header pagination)."""
    for part in link_header.split(","):
        if 'rel="next"' in part:
            start = part.find("<") + 1
            end = part.find(">")
            if start > 0 and end > start:
                return part[start:end]
    return None
