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
import urllib.error
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


def http_request_json(
    url: str,
    method: str = "GET",
    body: Any = None,
    timeout: float = 30.0,
    headers: dict[str, str] | None = None,
) -> tuple[int, Any]:
    """One JSON request/response round-trip, returning (status, payload).
    4xx/5xx responses are returned (with their JSON body), not raised —
    the management routes use 409 for already/not-registered."""
    data = (json.dumps(body, default=str).encode("utf-8")
            if body is not None else None)
    hdrs = {"Content-Type": "application/json", **(headers or {})}
    req = urllib.request.Request(url, data=data, method=method, headers=hdrs)
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, json.loads(resp.read().decode("utf-8"))
    except urllib.error.HTTPError as e:
        try:
            payload = json.loads(e.read().decode("utf-8"))
        except Exception:
            payload = {"error": str(e)}
        return e.code, payload


def http_login(base_url: str, username: str, password: str,
               timeout: float = 30.0) -> str:
    """POST /login and return the session bearer token (reference
    connectors/api/_login.py login flow). The token slots straight into
    ``RemotePipe(auth_token=...)`` — session tokens and the shared
    secret ride the same Authorization header."""
    code, payload = http_request_json(
        base_url.rstrip("/") + "/login", method="POST",
        body={"username": username, "password": password}, timeout=timeout)
    if code != 200:
        raise PermissionError(
            f"login failed ({code}): {payload.get('error', payload)}")
    return payload["access_token"]


def http_register_user(base_url: str, username: str, password: str,
                       auth_token: str | None = None,
                       timeout: float = 30.0) -> tuple[int, Any]:
    """POST /users/register (reference connectors/api/_users.py
    register_user). ``auth_token``: admin session when the server
    requires one (any token is ignored for the bootstrap admin)."""
    headers = ({"Authorization": f"Bearer {auth_token}"}
               if auth_token else None)
    return http_request_json(
        base_url.rstrip("/") + "/users/register", method="POST",
        body={"username": username, "password": password},
        timeout=timeout, headers=headers)


class RemotePipe:
    """Client for one pipe on a ``PipeHTTPServer`` — the reference's API
    connector surface (connectors/api/_pipes.py): register / edit /
    delete / sync / attributes / data, purely over HTTP."""

    def __init__(self, base_url: str, connector: str, metric: str,
                 location: str | None = None, timeout: float = 30.0,
                 auth_token: str | None = None):
        keys = [connector, metric] + ([location] if location else [])
        self.url = base_url.rstrip("/") + "/pipes/" + "/".join(
            urllib.parse.quote(k) for k in keys)
        self.timeout = timeout
        #: shared-secret bearer token matching the server's ``auth_token``
        self.auth_token = auth_token
        #: locally staged parameters (the ``Pipe.copy_to`` duck seam
        #: writes ``parameters['columns']`` here before syncing) — pushed
        #: to the server via register() on the next DataFrame sync
        self.parameters: dict = {}

    def _headers(self) -> dict[str, str]:
        if self.auth_token is None:
            return {}
        return {"Authorization": f"Bearer {self.auth_token}"}

    def _call(self, action: str, method: str, body: Any = None,
              **query: str) -> tuple[int, Any]:
        url = f"{self.url}/{action}"
        if query:
            url += "?" + urllib.parse.urlencode(query)
        return http_request_json(url, method=method, body=body,
                                 timeout=self.timeout,
                                 headers=self._headers())

    def register(self, parameters: dict | None = None) -> tuple[int, Any]:
        return self._call("register", "POST",
                          {"parameters": parameters or {}})

    def edit(self, parameters: dict, patch: bool = False) -> tuple[int, Any]:
        return self._call("edit", "PATCH", {"parameters": parameters},
                          patch=str(patch).lower())

    def delete(self) -> tuple[int, Any]:
        return self._call("delete", "DELETE")

    def drop(self) -> tuple[int, Any]:
        """Drop the target table, keep the registration (reference
        api/routes/_pipes.py:734 drop_pipe)."""
        return self._call("drop", "DELETE")

    def clear(self, begin: str | None = None, end: str | None = None,
              params: dict | None = None) -> tuple[int, Any]:
        """Bounded server-side delete (reference api/routes/_pipes.py:755
        clear_pipe)."""
        query: dict[str, str] = {}
        if begin is not None:
            query["begin"] = begin
        if end is not None:
            query["end"] = end
        body = {"params": params} if params is not None else None
        return self._call("clear", "DELETE", body=body, **query)

    #: docs per POST when shipping a DataFrame (bounded request bodies —
    #: the reference API connector chunks its sync the same way,
    #: connectors/api/_pipes.py sync chunking)
    SYNC_CHUNK_DOCS = 10_000

    def sync(self, docs: "list[dict] | Any") -> tuple[int, Any]:
        """POST docs to the remote pipe. Also accepts a Spark or pandas
        DataFrame — the ``Pipe.copy_to(remote)`` duck seam (reference
        cross-instance sync, connectors/api/_pipes.py): the frame is
        serialized with the canonical JSON export and shipped in bounded
        chunks; staged ``parameters`` are registered remotely first so
        column roles arrive before the first batch. Returns the last
        response with inserted/updated summed across chunks."""
        from itertools import islice
        if not isinstance(docs, (list, tuple)):
            docs = self._df_to_docs(docs)
            if self.parameters:
                # 409 (already registered) is fine — columns then come
                # from the existing remote registration
                self.register(self.parameters)
        # chunk LAZILY: a Spark frame streams through toLocalIterator, so
        # driver memory stays O(chunk) however large the table is
        it = iter(docs)
        total_ins = total_upd = 0
        code, out = 200, {"success": True, "message": "Empty batch.",
                          "inserted": 0, "updated": 0}
        while True:
            chunk = list(islice(it, self.SYNC_CHUNK_DOCS))
            if not chunk:
                break
            code, out = self._call("data", "POST", {"docs": chunk})
            if code != 200:
                # a mid-stream failure discards nothing already committed:
                # surface the landed totals (and a partial marker) with the
                # failing chunk's payload so callers (copy_to) can report
                # how much of the copy actually landed
                out = dict(out) if isinstance(out, dict) else {"error": out}
                out["inserted"] = total_ins
                out["updated"] = total_upd
                out["partial"] = True
                return code, out
            total_ins += int(out.get("inserted") or 0)
            total_upd += int(out.get("updated") or 0)
            out = dict(out)
            out["inserted"], out["updated"] = total_ins, total_upd
        return code, out

    @staticmethod
    def _df_to_docs(df: Any):
        """Serialize a Spark or pandas DataFrame to canonical JSON docs
        (ISO datetimes, base64 bytes — the same rules the server's export
        uses, so a round-trip re-ingests to identical rows). Returns an
        ITERATOR for Spark frames (toLocalIterator — never materializes
        the table driver-side) and a list for pandas."""
        try:
            from pyspark.sql import DataFrame as _SparkDF
        except ImportError:  # pragma: no cover
            _SparkDF = ()
        if isinstance(df, _SparkDF):
            from meerschaum_spark.export import iter_json_docs
            return iter_json_docs(df)
        if isinstance(df, pd.DataFrame):
            from meerschaum_spark.export import _clean_value

            def _conv(v: Any) -> Any:
                if v is None or v is pd.NaT:
                    return None
                if isinstance(v, pd.Timestamp):
                    return _clean_value(v.to_pydatetime())
                if isinstance(v, float) and v != v:  # NaN
                    return None
                if hasattr(v, "item") and not isinstance(v, (bytes, str)):
                    try:
                        v = v.item()  # numpy scalars → python
                    except (AttributeError, ValueError):
                        pass
                return _clean_value(v)

            return [{k: _conv(v) for k, v in rec.items()}
                    for rec in df.to_dict("records")]
        raise TypeError(f"cannot sync {type(df).__name__} to a RemotePipe")

    @property
    def columns(self) -> dict:
        """Remote column-role mapping (duck-compatible with
        ``Pipe.columns``; staged parameters win until pushed)."""
        staged = self.parameters.get("columns")
        if staged:
            return staged
        attrs = self.attributes() or {}
        return (attrs.get("parameters") or {}).get("columns") or {}

    def attributes(self) -> dict:
        return self._call("attributes", "GET")[1]

    def exists(self) -> bool:
        return bool(self._call("exists", "GET")[1].get("exists"))

    def get_data(self, **query: str) -> pd.DataFrame:
        code, payload = self._call("data", "GET", **query)
        return pd.DataFrame(payload.get("docs", []))

    def get_sync_time(self, newest: bool = True,
                      params: dict | None = None):
        """Remote newest/oldest dt (reference connectors/api/_pipes.py
        get_sync_time) as a naive-UTC datetime, or None."""
        import datetime as _dt
        query = {"newest": str(newest).lower()}
        if params is not None:
            query["params"] = json.dumps(params)
        st = self._call("sync_time", "GET", **query)[1].get("sync_time")
        if st is None:
            return None
        try:
            parsed = _dt.datetime.fromisoformat(st)
        except (TypeError, ValueError):
            return st  # integer dt axis
        if parsed.tzinfo is not None:
            # engine convention: naive UTC
            parsed = parsed.astimezone(_dt.timezone.utc) \
                           .replace(tzinfo=None)
        return parsed

    def get_rowcount(self, begin: str | None = None,
                     end: str | None = None,
                     params: dict | None = None) -> int:
        query: dict[str, str] = {}
        if begin is not None:
            query["begin"] = begin
        if end is not None:
            query["end"] = end
        if params is not None:
            query["params"] = json.dumps(params)
        return int(self._call("rowcount", "GET", **query)[1]["rowcount"])

    def dtypes(self) -> dict[str, str]:
        return self._call("columns/types", "GET")[1].get("dtypes", {})

    def chunk_bounds(self, begin: str | None = None,
                     end: str | None = None,
                     chunk_minutes: int | None = None) -> list:
        """Server-computed epoch-aligned verify windows — a remote
        worker pool can claim disjoint chunks without seeing the data."""
        query: dict[str, str] = {}
        if begin is not None:
            query["begin"] = begin
        if end is not None:
            query["end"] = end
        if chunk_minutes is not None:
            query["chunk_minutes"] = str(chunk_minutes)
        return self._call("chunk_bounds", "GET",
                          **query)[1].get("chunk_bounds", [])

    def get_rollup(self, name: str, gapfill: bool = False,
                   **query: str) -> pd.DataFrame:
        """Read a server-side rollup table (continuous-aggregate
        analogue) over HTTP. Non-200 responses raise (an unknown rollup
        name must not masquerade as an empty table)."""
        code, payload = self._call(
            "rollup", "GET", name=name,
            **({"gapfill": "true"} if gapfill else {}), **query)
        if code != 200:
            raise KeyError(payload.get("error", f"rollup read HTTP {code}"))
        return pd.DataFrame(payload.get("docs", []))


def http_fetch_fn(url: str, timeout: float = 30.0,
                  headers: dict[str, str] | None = None) -> Callable:
    """Build a ``Pipe(fetch_fn=...)``-protocol callable for an HTTP
    endpoint: the pipe passes begin = last sync time − backtrack, and the
    diff engine absorbs the overlap."""
    def fetch(pipe, begin=None, end=None, params=None):
        return fetch_http_json(url, begin=begin, end=end, params=params,
                               timeout=timeout, headers=headers)
    return fetch
