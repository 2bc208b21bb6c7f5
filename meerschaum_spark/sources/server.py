"""Pipe-over-HTTP server: the server half of S9 (reference FastAPI routes
in meerschaum/api/routes/_pipes.py:64-1240), stdlib-only.

Serves an instance directory's pipes over the same JSON shapes the client
half (``sources/http.py``) consumes, so two engines can chain: pipe B on
machine 2 fetches from pipe A's endpoint with begin/end bounds, and the
incremental-sync diff machinery absorbs the overlap.

Routes (mirroring the reference's route table):
  GET  /pipes                                    → registered pipe keys
  GET  /pipes/{conn}/{metric}[/{loc}]/data       → bounded docs (begin/end/params/limit)
  GET  /pipes/{conn}/{metric}[/{loc}]/sync_time  → newest/oldest dt
  GET  /pipes/{conn}/{metric}[/{loc}]/rowcount   → bounded count
  GET  /pipes/{conn}/{metric}[/{loc}]/attributes → parameters doc
  GET  /pipes/{conn}/{metric}[/{loc}]/exists     → bool
  GET  /pipes/{conn}/{metric}[/{loc}]/columns/types → dtypes
  GET  /pipes/{conn}/{metric}[/{loc}]/csv        → bounded CSV text
  GET  /pipes/{conn}/{metric}[/{loc}]/chunk_bounds → epoch-aligned windows
  GET  /pipes/{conn}/{metric}[/{loc}]/size       → stored bytes + rowcount
  POST /pipes/{conn}/{metric}[/{loc}]/data       → sync posted docs
  POST   /pipes/{conn}/{metric}[/{loc}]/register → register (body: parameters)
  PATCH  /pipes/{conn}/{metric}[/{loc}]/edit     → edit parameters
                                                   (?patch=true merges)
  DELETE /pipes/{conn}/{metric}[/{loc}]/delete   → unregister (keeps data)
  DELETE /pipes/{conn}/{metric}[/{loc}]/drop     → drop the target table
  DELETE /pipes/{conn}/{metric}[/{loc}]/clear    → bounded delete (begin/end/params)
  POST /login, POST /logout, /users[...]         → accounts + sessions (user_auth)

The management trio mirrors reference api/routes/_pipes.py:64 (register),
:118 (edit), :175 (delete): register 409s when already registered,
edit/delete 409 when not — so a remote client can create a pipe before
syncing into it. PATCH/DELETE also accept POST (stdlib-client
convenience).

Scale note: this is a metadata/modest-data control surface exactly like
the reference's API connector — bulk table movement belongs on
parquet/JDBC sources; the server streams bounded reads only (the reference
likewise chunks its API sync, api/_pipes.py).
"""

from __future__ import annotations

import datetime
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from pyspark.sql import SparkSession

from meerschaum_spark.export import iter_json_docs
from meerschaum_spark.pipe import Pipe
from meerschaum_spark.registry import PipeRegistry


class PipeHTTPServer:
    """Serve one instance directory's pipes over HTTP (threaded stdlib
    server; the Spark driver is the process serving — handlers run
    driver-side jobs, matching the reference's in-process API server)."""

    def __init__(self, spark: SparkSession, instance: str,
                 host: str = "127.0.0.1", port: int = 0,
                 max_data_rows: int = 100_000,
                 auth_token: str | None = None,
                 user_auth: bool = False,
                 session_minutes: float = 60.0,
                 allow_registration: bool = False,
                 _now=None):
        """Auth modes (both optional, composable):

        ``auth_token``: shared-secret bearer token. When set, routes
        accept ``Authorization: Bearer <token>`` — the single-secret
        mode from r5.

        ``user_auth``: per-user accounts + login sessions (reference
        api/routes/_login.py:17-154, _users.py:42-236,
        dash/sessions.py). Accounts live in ``users.json`` beside the
        pipe registry (PBKDF2-SHA256, per-user salt); ``POST /login``
        with {username, password} issues an expiring bearer token that
        then authorizes every route. The FIRST registered account is
        the admin (bootstrap registration is always open);
        ``allow_registration`` opens self-service signup after that,
        else registration/deletion require an admin session (deletion:
        admin or self). ``_now`` injects a clock for expiry tests.

        With neither mode set, the server stays open (test harness)."""
        from meerschaum_spark.sources.users import (
            SessionManager,
            UserRegistry,
        )
        self.spark = spark
        self.instance = instance
        self.max_data_rows = max_data_rows
        self.auth_token = auth_token
        self.user_auth = user_auth
        self.allow_registration = allow_registration
        self.users = UserRegistry(instance) if user_auth else None
        self.sessions = SessionManager(
            ttl_seconds=session_minutes * 60.0,
            **({"_now": _now} if _now is not None else {})) \
            if user_auth else None
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet
                pass

            def do_GET(self):
                outer._handle(self, "GET")

            def do_POST(self):
                outer._handle(self, "POST")

            def do_PATCH(self):
                outer._handle(self, "PATCH")

            def do_DELETE(self):
                outer._handle(self, "DELETE")

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    # ------------------------------------------------------------ lifecycle

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "PipeHTTPServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)

    # ------------------------------------------------------------- routing

    def _authorized(self, handler: BaseHTTPRequestHandler) -> str | None:
        """The authenticated principal: a username (session token), the
        sentinel ``"*token*"`` (shared secret, acts as admin), ``"*"``
        when the server runs open, or None (reject with 401)."""
        if self.auth_token is None and not self.user_auth:
            return "*"
        import hmac
        header = handler.headers.get("Authorization", "")
        if self.auth_token is not None:
            # constant-time compare: no timing oracle on the token
            if hmac.compare_digest(header, f"Bearer {self.auth_token}"):
                return "*token*"
        if self.user_auth and header.startswith("Bearer "):
            username = self.sessions.validate(header[len("Bearer "):])
            # belt-and-braces beside revoke_user: a session whose account
            # no longer exists authorizes nothing
            if username is not None and self.users.get(username) is None:
                return None
            return username
        return None

    def _is_admin(self, principal: str) -> bool:
        if principal in ("*", "*token*"):
            return True
        return bool(self.users) and self.users.is_admin(principal)

    def _handle(self, handler: BaseHTTPRequestHandler, method: str) -> None:
        try:
            parsed = urllib.parse.urlparse(handler.path)
            parts = [p for p in parsed.path.split("/") if p]
            args = {k: v[0] for k, v in
                    urllib.parse.parse_qs(parsed.query).items()}
            # /login and bootstrap/self-service /users/register are the
            # only routes reachable without credentials (reference
            # _login.py login endpoint, _users.py register)
            if self.user_auth and parts == ["login"] and method == "POST":
                return self._send(handler, *self._login(handler))
            if self.user_auth and parts == ["logout"] and method == "POST":
                header = handler.headers.get("Authorization", "")
                tok = header[len("Bearer "):] \
                    if header.startswith("Bearer ") else ""
                ok = self.sessions.logout(tok)
                return self._send(handler, 200 if ok else 401,
                                  {"success": ok})
            if parts and parts[0] == "users":
                return self._send(
                    handler, *self._users_route(handler, parts[1:], method))
            principal = self._authorized(handler)
            if principal is None:
                return self._send(
                    handler, 401,
                    {"error": "unauthorized: missing or bad bearer token"})
            if not parts or parts[0] != "pipes":
                return self._send(handler, 404, {"error": "not found"})
            if len(parts) == 1:
                return self._send(handler, 200, self._list_pipes(args))
            # /pipes/{conn}/{metric}[/{loc}]/{action...} — parse from the
            # END so a pipe whose keys collide with an action word
            # ('data', 'size', ...) still routes
            tail = parts[1:]
            known = {"data", "sync_time", "rowcount", "attributes",
                     "exists", "columns", "csv", "chunk_bounds", "size",
                     "register", "edit", "delete", "rollup", "drop",
                     "clear"}
            if tail[-2:] == ["columns", "types"]:
                keys, action = tail[:-2], tail[-2:]
            elif tail and tail[-1] in known:
                keys, action = tail[:-1], tail[-1:]
            else:
                keys, action = tail, []
            if not 2 <= len(keys) <= 3:
                return self._send(handler, 404, {"error": "bad pipe keys"})
            pipe = Pipe(keys[0], keys[1],
                        keys[2] if len(keys) == 3 else None,
                        instance=self.instance, spark=self.spark)
            if method != "GET":
                length = int(handler.headers.get("Content-Length", 0))
                body = json.loads(handler.rfile.read(length) or b"null")
                return self._send(
                    handler, *self._mutate(pipe, action, args, body, method,
                                           principal))
            return self._send(handler, *self._get(pipe, action, args))
        except Exception as e:  # surface, don't kill the server thread
            self._send(handler, 500, {"error": f"{type(e).__name__}: {e}"})

    # ------------------------------------------------------- users / login

    @staticmethod
    def _read_body(handler: BaseHTTPRequestHandler) -> Any:
        length = int(handler.headers.get("Content-Length", 0))
        return json.loads(handler.rfile.read(length) or b"null")

    def _login(self, handler: BaseHTTPRequestHandler) -> tuple[int, Any]:
        """POST /login {username, password} → expiring bearer token
        (reference api/routes/_login.py:109-154 login endpoint)."""
        body = self._read_body(handler) or {}
        username = str(body.get("username", ""))
        if not self.users.verify(username, str(body.get("password", ""))):
            return 401, {"error": "invalid credentials"}
        token = self.sessions.login(username)
        return 200, {"access_token": token, "token_type": "bearer",
                     "expires_in": int(self.sessions.ttl)}

    def _users_route(self, handler: BaseHTTPRequestHandler,
                     tail: list[str], method: str) -> tuple[int, Any]:
        """/users routes (reference api/routes/_users.py:42-236):
        register, list, me, attributes, edit, delete. Bootstrap
        registration (empty registry) and ``allow_registration``
        self-signup skip auth; everything else needs a session."""
        if not self.user_auth:
            return 404, {"error": "user auth is not enabled"}
        if tail == ["register"] and method == "POST":
            body = self._read_body(handler) or {}
            username = str(body.get("username", ""))
            open_signup = len(self.users) == 0 or self.allow_registration
            principal = self._authorized(handler)
            by_admin = principal is not None and self._is_admin(principal)
            if not open_signup and principal is None:
                return 401, {"error": "unauthorized"}
            if not open_signup and not by_admin:
                return 403, {"error":
                             "registration requires an admin session"}
            # only an admin may grant a type; anonymous self-signup is
            # ALWAYS a plain user (a client-supplied {"type": "admin"}
            # would otherwise be privilege escalation). The bootstrap
            # account still becomes admin inside the registry.
            user_type = str(body.get("type", "user")) if by_admin else "user"
            try:
                created = self.users.register(
                    username, str(body.get("password", "")),
                    user_type=user_type,
                    attributes=body.get("attributes"))
            except ValueError as e:
                return 400, {"error": str(e)}
            if not created:
                return 409, {"success": False,
                             "message": f"user {username!r} already exists"}
            return 200, {"success": True,
                         "message": f"Registered user {username!r}."}
        principal = self._authorized(handler)
        if principal is None:
            return 401, {"error": "unauthorized"}
        if not tail and method == "GET":
            return 200, {"users": self.users.list_users()}
        if tail == ["me"] and method == "GET":
            if principal in ("*", "*token*"):
                return 200, {"username": principal, "type": "admin"}
            rec = self.users.get(principal)
            return (200, rec) if rec else (401, {"error": "unauthorized"})
        if tail == ["edit"] and method in ("POST", "PATCH"):
            body = self._read_body(handler) or {}
            target = str(body.get("username", principal))
            if not (self._is_admin(principal) or principal == target):
                return 403, {"error": "admin or self required"}
            ok = self.users.edit(target,
                                 password=body.get("password"),
                                 attributes=body.get("attributes"))
            if ok and body.get("password"):
                # a password change invalidates existing sessions
                self.sessions.revoke_user(target)
            return (200, {"success": True,
                          "message": f"Edited user {target!r}."}) if ok \
                else (404, {"error": f"no user {target!r}"})
        if len(tail) == 2 and tail[1] == "attributes" and method == "GET":
            rec = self.users.get(urllib.parse.unquote(tail[0]))
            return (200, rec) if rec else (
                404, {"error": f"no user {tail[0]!r}"})
        if len(tail) == 2 and tail[1] == "delete" \
                and method in ("DELETE", "POST"):
            target = urllib.parse.unquote(tail[0])
            if not (self._is_admin(principal) or principal == target):
                return 403, {"error": "admin or self required"}
            ok = self.users.delete(target)
            if ok:
                # deletion revokes the account's live sessions NOW —
                # without this the stale bearer token keeps full access
                # until its TTL expires
                self.sessions.revoke_user(target)
            return (200, {"success": True,
                          "message": f"Deleted user {target!r}."}) if ok \
                else (404, {"error": f"no user {target!r}"})
        return 404, {"error": "unknown users route"}

    def _pipe_owner(self, pipe: Pipe) -> str | None:
        doc = pipe.registry.load(pipe.target) or {}
        return (doc.get("parameters") or {}).get("owner")

    def _can_write(self, principal: str, pipe: Pipe) -> bool:
        """Ownership gate for mutating pipe routes in ``user_auth`` mode
        (reference permission model: api/routes/_pipes.py checks
        ``pipe_belongs_to_user`` / ``is_user_allowed_to_execute`` before
        edit/drop/delete/sync). Admins (and the shared-secret token) may
        mutate anything; a plain user only pipes they own. Pipes with no
        recorded owner (registered out-of-band, pre-auth data) are
        admin-only — the conservative default, since granting every
        authenticated user write access to unowned pipes would let a
        low-privilege account destroy instance data (the r6 advisory)."""
        if self._is_admin(principal):
            return True
        if not self.user_auth:
            return True
        return self._pipe_owner(pipe) == principal

    def _mutate(self, pipe: Pipe, action: list[str], args: dict[str, str],
                body: Any, method: str, principal: str = "*",
                ) -> tuple[int, Any]:
        """POST/PATCH/DELETE routes (reference api/routes/_pipes.py:64-175
        register/edit/delete + :1055 sync). PATCH and DELETE also accept
        POST so bare stdlib clients can drive the full lifecycle.

        Every mutating route (sync/edit/drop/clear/delete) is
        ownership-gated via ``_can_write``; ``register`` is open to any
        authenticated principal and stamps the registrant as the pipe's
        owner (in ``parameters['owner']``, where the reference keeps its
        user-id column on the pipes table)."""
        registered = pipe.registry.load(pipe.target) is not None
        if registered and action != ["register"] \
                and not self._can_write(principal, pipe):
            return 403, {"error": f"user {principal!r} does not own "
                                  f"{pipe.target} (admin required)"}
        if not registered and self.user_auth \
                and not self._is_admin(principal) and pipe.exists():
            # out-of-band data can exist without a registry doc; letting
            # any authenticated user claim it via sync auto-registration
            # (or register) would hand them ownership — and with it
            # drop/clear rights — over data they never wrote. Unowned
            # data-bearing targets are admin-only, mirroring _can_write's
            # no-recorded-owner default.
            return 403, {"error": f"{pipe.target} holds unregistered data; "
                                  "admin required to claim or mutate it"}
        if action == ["data"] and method == "POST":
            docs = body if body is not None else []
            if isinstance(docs, dict):
                docs = docs.get("docs", [])
            if not registered and self.user_auth \
                    and principal not in ("*", "*token*"):
                # sync auto-registers a new pipe — the registrant owns it
                pipe.parameters.setdefault("owner", principal)
            res = pipe.sync(docs)
            return 200 if res.success else 409, {
                "success": res.success, "message": res.message,
                "inserted": res.inserted, "updated": res.updated,
            }
        if action == ["register"] and method == "POST":
            if registered:
                return 409, {"success": False,
                             "message": f"{pipe.target} already registered."}
            if isinstance(body, dict):
                # merge over constructor defaults (columns/dtypes/tags all
                # ride in the parameters doc, as in the reference)
                pipe.parameters.update(body.get("parameters", body))
            if self.user_auth and principal not in ("*", "*token*"):
                # a client-supplied 'owner' would be ownership spoofing
                pipe.parameters["owner"] = principal
            pipe.register()
            return 200, {"success": True,
                         "message": f"Registered {pipe.target}."}
        if action == ["edit"] and method in ("PATCH", "POST"):
            if not registered:
                return 409, {"success": False,
                             "message": f"{pipe.target} is not registered."}
            new_params = (body.get("parameters", body)
                          if isinstance(body, dict) else {})
            patch = args.get("patch", "false").lower() == "true"
            owner = self._pipe_owner(pipe)
            if patch:
                pipe.parameters.update(new_params)
            else:
                pipe.parameters = dict(new_params)
            if owner is not None:
                if self.user_auth and not self._is_admin(principal):
                    # a non-admin edit must not reassign or clear
                    # ownership (only an admin may transfer a pipe)
                    pipe.parameters["owner"] = owner
                else:
                    # a routine edit (admin, or auth off) whose body
                    # doesn't mention ownership must not silently WIPE
                    # it — a full-replace edit would otherwise strand
                    # the pipe as admin-only (explicit 'owner' in the
                    # body is an intentional admin transfer)
                    pipe.parameters.setdefault("owner", owner)
            pipe.register()
            return 200, {"success": True, "message": f"Edited {pipe.target}."}
        if action == ["drop"] and method in ("DELETE", "POST"):
            # reference api/routes/_pipes.py:734 drop_pipe: drop the
            # target table, keep the registration. Unknown pipe → 409,
            # matching the sibling delete route (a key typo must not
            # read as a successful drop of the real pipe)
            if not registered:
                return 409, {"success": False,
                             "message": f"{pipe.target} is not registered."}
            pipe.drop()
            return 200, {"success": True,
                         "message": f"Dropped {pipe.target}."}
        if action == ["clear"] and method in ("DELETE", "POST"):
            # reference api/routes/_pipes.py:755 clear_pipe: bounded
            # delete by begin/end (+ params filter)
            if not registered:
                return 409, {"success": False,
                             "message": f"{pipe.target} is not registered."}
            body_args = body if isinstance(body, dict) else {}
            begin = args.get("begin", body_args.get("begin"))
            end = args.get("end", body_args.get("end"))
            params = body_args.get("params")
            if "params" in args:
                params = json.loads(args["params"])
            if (begin is not None or end is not None) \
                    and pipe.dt_col is None:
                # Pipe.clear would silently DISCARD the bounds (no time
                # axis to bound on) — an unbounded delete where the
                # client asked for a window; reject instead
                return 400, {"error": "begin/end bounds require the pipe "
                                      "to have a datetime column"}
            n = pipe.clear(begin=begin, end=end, params=params)
            return 200, {"success": True,
                         "message": f"Cleared {n} rows from {pipe.target}.",
                         "rows_deleted": n}
        if action == ["delete"] and method in ("DELETE", "POST"):
            if not registered:
                return 409, {"success": False,
                             "message": f"{pipe.target} is not registered."}
            pipe.registry.delete(pipe.target)
            return 200, {"success": True,
                         "message": f"Deleted {pipe.target} (data retained)."}
        return 405, {"error": f"{method} {'/'.join(action)!r} not supported"}

    def _get(self, pipe: Pipe, action: list[str],
             args: dict[str, str]) -> tuple[int, Any]:
        begin = args.get("begin")
        end = args.get("end")
        params = json.loads(args["params"]) if "params" in args else None
        if action == ["data"]:
            limit = min(int(args.get("limit", self.max_data_rows)),
                        self.max_data_rows)
            df = pipe.get_data(begin=begin, end=end, params=params,
                               limit=limit)
            return 200, {"docs": list(iter_json_docs(df))}
        if action == ["sync_time"]:
            newest = args.get("newest", "true").lower() != "false"
            st = pipe.get_sync_time(newest=newest, params=params)
            return 200, {"sync_time": st.isoformat()
                         if isinstance(st, datetime.datetime) else st}
        if action == ["rowcount"]:
            return 200, {"rowcount": pipe.get_rowcount(
                begin=begin, end=end, params=params)}
        if action == ["attributes"]:
            doc = pipe.registry.load(pipe.target) or {}
            return 200, {"keys": pipe.keys,
                         "parameters": doc.get("parameters", pipe.parameters)}
        if action == ["exists"]:
            return 200, {"exists": pipe.exists()}
        if action == ["columns", "types"]:
            return 200, {"dtypes": pipe.dtypes}
        if action == ["chunk_bounds"]:
            from meerschaum_spark.chunks import get_chunk_bounds
            b = pipe._parse_bound(begin) if begin else \
                pipe.get_sync_time(newest=False)
            e = pipe._parse_bound(end) if end else pipe.get_sync_time()
            if b is None or e is None:
                return 200, {"chunk_bounds": []}
            cm = int(args.get("chunk_minutes", pipe.chunk_minutes))
            bounds = [
                [x.isoformat() if isinstance(x, datetime.datetime) else x
                 for x in be]
                for be in get_chunk_bounds(b, e, cm,
                                           unit=pipe.precision_unit)
            ]
            return 200, {"chunk_bounds": bounds}
        if action == ["rollup"]:
            name = args.get("name")
            if not name:
                return 400, {"error": "rollup requires ?name=<rollup>"}
            try:
                df = pipe.get_rollup(
                    name,
                    gapfill=args.get("gapfill", "").lower() == "true")
            except KeyError as exc:
                return 404, {"error": str(exc)}
            limit = min(int(args.get("limit", self.max_data_rows)),
                        self.max_data_rows)
            if pipe.dt_col and pipe.dt_col in df.columns:
                df = df.orderBy(pipe.dt_col)
            return 200, {"docs": list(iter_json_docs(df.limit(limit)))}
        if action == ["size"]:
            return 200, {"bytes": pipe.get_size(),
                         "rowcount": pipe.get_rowcount()}
        if action == ["csv"]:
            limit = min(int(args.get("limit", self.max_data_rows)),
                        self.max_data_rows)
            df = pipe.get_data(begin=begin, end=end, params=params,
                               limit=limit)
            import csv as _csv
            import io as _io
            buf = _io.StringIO()
            writer = _csv.DictWriter(buf, fieldnames=df.columns)
            writer.writeheader()
            for doc in iter_json_docs(df):
                writer.writerow(doc)
            return 200, _RawText(buf.getvalue(), "text/csv")
        return 404, {"error": f"unknown action {'/'.join(action)!r}"}

    def _list_pipes(self, args: dict[str, str]) -> list[dict[str, Any]]:
        reg = PipeRegistry.for_instance(self.instance)
        tags = json.loads(args["tags"]) if "tags" in args else None
        keys = reg.fetch_pipes_keys(connector=args.get("connector"),
                                    metric=args.get("metric"),
                                    location=args.get("location"),
                                    tags=tags)
        return [{"connector": c, "metric": m, "location": l}
                for c, m, l in keys]

    # --------------------------------------------------------------- utils

    def _send(self, handler: BaseHTTPRequestHandler, code: int,
              payload: Any) -> None:
        if isinstance(payload, _RawText):
            body = payload.text.encode("utf-8")
            ctype = payload.content_type
        else:
            body = json.dumps(payload, default=str).encode("utf-8")
            ctype = "application/json"
        handler.send_response(code)
        handler.send_header("Content-Type", ctype)
        handler.send_header("Content-Length", str(len(body)))
        handler.end_headers()
        handler.wfile.write(body)


class _RawText:
    def __init__(self, text: str, content_type: str):
        self.text = text
        self.content_type = content_type
