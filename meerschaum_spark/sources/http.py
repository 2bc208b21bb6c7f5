"""HTTP/JSON source (reference S9: the API connector,
meerschaum/connectors/api/_pipes.py, against the FastAPI routes in
meerschaum/api/routes/_pipes.py:356-887).

The client half re-expressed: a pipe fetches newly-arrived docs from an
HTTP endpoint with ``begin``/``end`` bounds in the query string (the
server is expected to filter server-side, like the reference's
``get_pipe_data`` route). stdlib-only (urllib) — no extra deps.

Scale note: the HTTP hop happens on the driver and should stay
metadata-to-modest sized (it is a *source* protocol, like the reference's
chunked JSON sync, not a table scan). Large backfills belong on a
parquet/JDBC source; this exists for API-shaped upstreams.
"""

from __future__ import annotations

import datetime
import json
import urllib.parse
import urllib.request
from typing import Any, Callable

import pandas as pd


def fetch_http_json(
    url: str,
    begin: Any = None,
    end: Any = None,
    params: dict[str, Any] | None = None,
    timeout: float = 30.0,
    headers: dict[str, str] | None = None,
) -> pd.DataFrame:
    """GET ``url`` with bound/params query args; expect a JSON array of
    row objects (or ``{"docs": [...]}``)."""
    query: dict[str, str] = {}
    if begin is not None:
        query["begin"] = _fmt_bound(begin)
    if end is not None:
        query["end"] = _fmt_bound(end)
    if params:
        query["params"] = json.dumps(params, sort_keys=True, default=str)
    full = url + ("?" + urllib.parse.urlencode(query) if query else "")
    req = urllib.request.Request(full, headers=headers or {})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        payload = json.loads(resp.read().decode("utf-8"))
    if isinstance(payload, dict):
        payload = payload.get("docs", [])
    return pd.DataFrame(payload)


def _fmt_bound(bound: Any) -> str:
    if isinstance(bound, datetime.datetime):
        return bound.isoformat()
    return str(bound)


def http_fetch_fn(url: str, timeout: float = 30.0,
                  headers: dict[str, str] | None = None) -> Callable:
    """Build a ``Pipe(fetch_fn=...)``-protocol callable for an HTTP
    endpoint: the pipe passes begin = last sync time − backtrack, and the
    diff engine absorbs the overlap."""
    def fetch(pipe, begin=None, end=None, params=None):
        return fetch_http_json(url, begin=begin, end=end, params=params,
                               timeout=timeout, headers=headers)
    return fetch
