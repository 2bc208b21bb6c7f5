"""HTTP source against a real local server: incremental bounds reach the
server; overlapping refetches stay idempotent through the diff engine."""

import datetime
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from meerschaum_spark.pipe import Pipe
from meerschaum_spark.sources.http import http_fetch_fn

UTC = datetime.timezone.utc
ROWS = [{"dt": datetime.datetime(2024, 1, 1, h, tzinfo=UTC), "id": 1,
         "val": float(h)} for h in range(12)]


class Handler(BaseHTTPRequestHandler):
    requests: list[dict] = []

    def do_GET(self):
        q = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query)
        begin = (datetime.datetime.fromisoformat(q["begin"][0])
                 if "begin" in q else None)
        Handler.requests.append({"begin": begin})
        docs = [
            {**r, "dt": r["dt"].isoformat()} for r in ROWS
            if begin is None or r["dt"] >= begin
        ]
        body = json.dumps({"docs": docs}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture()
def server():
    Handler.requests = []
    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/pipe"
    srv.shutdown()


def test_http_pipe_incremental_sync(spark, instance_dir, server):
    pipe = Pipe("api", "remote", instance=instance_dir, spark=spark,
                columns={"datetime": "dt", "id": "id"},
                parameters={"fetch": {"backtrack_minutes": 120}},
                fetch_fn=http_fetch_fn(server))
    res = pipe.sync()
    assert res.success and res.inserted == 12
    assert Handler.requests[0]["begin"] is None   # first sync: full pull

    res2 = pipe.sync()
    assert res2.success and res2.inserted == 0 and res2.updated == 0
    # second sync asked the SERVER for only the backtrack window
    second_begin = Handler.requests[-1]["begin"]
    assert second_begin == ROWS[-1]["dt"] - datetime.timedelta(minutes=120)
    assert pipe.get_rowcount() == 12


def test_pipe_http_server_roundtrip(spark, instance_dir, tmp_path):
    """S9 both halves live: serve pipe A over HTTP, sync pipe B from the
    endpoint with bounds, push docs back via POST, and hit the metadata
    routes."""
    import datetime
    import json
    import urllib.request

    import pandas as pd

    from meerschaum_spark.pipe import Pipe
    from meerschaum_spark.sources import PipeHTTPServer, http_fetch_fn

    UTC = datetime.timezone.utc
    rows = [{"dt": datetime.datetime(2024, 1, 1 + i, tzinfo=UTC),
             "id": i, "val": float(i)} for i in range(5)]
    served = Pipe("api", "events", instance=instance_dir, spark=spark,
                  columns={"datetime": "dt", "id": "id"})
    served.sync(pd.DataFrame(rows))

    server = PipeHTTPServer(spark, instance_dir).start()
    try:
        base = f"{server.url}/pipes/api/events"
        # metadata routes
        with urllib.request.urlopen(f"{base}/exists") as r:
            assert json.load(r)["exists"] is True
        with urllib.request.urlopen(f"{base}/rowcount") as r:
            assert json.load(r)["rowcount"] == 5
        with urllib.request.urlopen(f"{base}/sync_time") as r:
            assert json.load(r)["sync_time"].startswith("2024-01-05")
        with urllib.request.urlopen(f"{base}/columns/types") as r:
            assert json.load(r)["dtypes"]["val"].startswith("float")
        with urllib.request.urlopen(f"{server.url}/pipes?connector=api") as r:
            listed = json.load(r)
            assert {"connector": "api", "metric": "events",
                    "location": None} in listed
        # bounded data route
        with urllib.request.urlopen(
                f"{base}/data?begin=2024-01-02&end=2024-01-04") as r:
            docs = json.load(r)["docs"]
            assert sorted(d["id"] for d in docs) == [1, 2]

        # client half: a second pipe fetches FROM the server
        dest_dir = str(tmp_path / "dest")
        dest = Pipe("local", "copy", instance=dest_dir, spark=spark,
                    columns={"datetime": "dt", "id": "id"},
                    fetch_fn=http_fetch_fn(f"{base}/data"))
        res = dest.sync()
        assert res.success and dest.get_rowcount() == 5
        # incremental refetch is a no-op
        res2 = dest.sync()
        assert res2.inserted == 0 and res2.updated == 0

        # POST sync: push a new doc to the server
        payload = json.dumps({"docs": [
            {"dt": "2024-01-09T00:00:00+00:00", "id": 9, "val": 9.0}
        ]}).encode()
        req = urllib.request.Request(f"{base}/data", data=payload,
                                     headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            out = json.load(r)
            assert out["success"] and out["inserted"] == 1
        assert served.get_rowcount() == 6
    finally:
        server.stop()


def test_pipe_http_server_management_lifecycle(spark, instance_dir):
    """Register, sync, edit, and delete a pipe purely over HTTP
    (reference api/routes/_pipes.py:64 register, :118 edit, :175 delete):
    a remote client can create a pipe before POSTing data into it."""
    from meerschaum_spark.pipe import Pipe
    from meerschaum_spark.sources import PipeHTTPServer
    from meerschaum_spark.sources.http import RemotePipe

    server = PipeHTTPServer(spark, instance_dir).start()
    try:
        rp = RemotePipe(server.url, "mgmt", "lifecycle")

        # registering a new pipe (with columns riding in parameters)
        code, out = rp.register({"columns": {"datetime": "dt", "id": "id"},
                                 "tags": ["remote"]})
        assert code == 200 and out["success"]
        # double-register conflicts
        code, out = rp.register()
        assert code == 409 and not out["success"]

        # the registration is immediately visible to sync
        code, out = rp.sync([
            {"dt": "2024-01-01T00:00:00+00:00", "id": 1, "val": 1.0},
            {"dt": "2024-01-02T00:00:00+00:00", "id": 2, "val": 2.0},
        ])
        assert code == 200 and out["inserted"] == 2
        attrs = rp.attributes()
        assert attrs["parameters"]["columns"] == {"datetime": "dt",
                                                  "id": "id"}
        assert attrs["parameters"]["tags"] == ["remote"]

        # PATCH-merge keeps existing parameters
        code, out = rp.edit({"tags": ["remote", "gold"]}, patch=True)
        assert code == 200 and out["success"]
        attrs = rp.attributes()
        assert attrs["parameters"]["tags"] == ["remote", "gold"]
        assert attrs["parameters"]["columns"]  # merge preserved columns

        # the edit is visible server-side (driver-side Pipe object)
        local = Pipe("mgmt", "lifecycle", instance=instance_dir,
                     spark=spark)
        assert local.parameters.get("tags") == ["remote", "gold"]
        assert local.get_rowcount() == 2

        # bounded clear over HTTP (reference :755 clear_pipe)
        code, out = rp.clear(begin="2024-01-02T00:00:00")
        assert code == 200 and out["rows_deleted"] == 1
        assert local.get_rowcount() == 1

        # drop removes the data, keeps the registration (reference :734)
        code, out = rp.drop()
        assert code == 200 and out["success"]
        assert rp.exists() is False

        # delete unregisters (data already dropped here)
        code, out = rp.delete()
        assert code == 200 and out["success"]
        code, out = rp.delete()
        assert code == 409
        # editing/dropping an unregistered pipe conflicts
        code, out = rp.edit({"tags": []})
        assert code == 409
        code, out = rp.drop()
        assert code == 409
    finally:
        server.stop()


def test_pipe_http_server_bearer_auth(spark, instance_dir):
    """With auth_token set, every route rejects missing/wrong tokens with
    401 and accepts the right one (reference protects its pipe routes
    behind login/session auth, api/routes/_login.py:17+)."""
    import json
    import urllib.request

    from meerschaum_spark.sources import PipeHTTPServer
    from meerschaum_spark.sources.http import RemotePipe, http_request_json

    server = PipeHTTPServer(spark, instance_dir,
                            auth_token="s3cret-token").start()
    try:
        base = f"{server.url}/pipes/authed/metric"

        # no token → 401 on management, sync, and read routes alike
        for method, action, body in [
            ("POST", "register", {"parameters": {}}),
            ("POST", "data", {"docs": [{"dt": "2024-01-01T00:00:00", "id": 1}]}),
            ("DELETE", "delete", None),
            ("GET", "exists", None),
        ]:
            code, out = http_request_json(f"{base}/{action}", method=method,
                                          body=body)
            assert code == 401, (action, code, out)
        # wrong token → 401
        code, _ = http_request_json(
            f"{base}/exists", headers={"Authorization": "Bearer wrong"})
        assert code == 401
        # pipe listing is covered too
        code, _ = http_request_json(f"{server.url}/pipes")
        assert code == 401

        # right token → full lifecycle works
        rp = RemotePipe(server.url, "authed", "metric",
                        auth_token="s3cret-token")
        code, out = rp.register({"columns": {"datetime": "dt", "id": "id"}})
        assert code == 200 and out["success"]
        code, out = rp.sync([{"dt": "2024-01-01T00:00:00+00:00", "id": 1,
                              "val": 1.0}])
        assert code == 200 and out["inserted"] == 1
        assert rp.exists() is True
        code, out = rp.delete()
        assert code == 200
    finally:
        server.stop()


def test_pipe_http_server_csv(spark, instance_dir):
    import datetime
    import urllib.request

    import pandas as pd

    from meerschaum_spark.pipe import Pipe
    from meerschaum_spark.sources import PipeHTTPServer

    UTC = datetime.timezone.utc
    pipe = Pipe("api", "csvsrc", instance=instance_dir, spark=spark,
                columns={"datetime": "dt", "id": "id"})
    pipe.sync(pd.DataFrame([
        {"dt": datetime.datetime(2024, 1, 1, tzinfo=UTC), "id": 1, "val": 1.5},
        {"dt": datetime.datetime(2024, 1, 2, tzinfo=UTC), "id": 2, "val": 2.5},
    ]))
    server = PipeHTTPServer(spark, instance_dir).start()
    try:
        with urllib.request.urlopen(
                f"{server.url}/pipes/api/csvsrc/csv") as r:
            assert r.headers["Content-Type"].startswith("text/csv")
            lines = r.read().decode().strip().splitlines()
        assert lines[0].split(",")[:2] == ["dt", "id"] or "id" in lines[0]
        assert len(lines) == 3
    finally:
        server.stop()


def test_pipe_http_server_chunk_bounds_and_size(spark, instance_dir):
    import datetime
    import json
    import urllib.request

    import pandas as pd

    from meerschaum_spark.pipe import Pipe
    from meerschaum_spark.sources import PipeHTTPServer

    UTC = datetime.timezone.utc
    pipe = Pipe("api", "cb", instance=instance_dir, spark=spark,
                columns={"datetime": "dt", "id": "id"})
    pipe.sync(pd.DataFrame([
        {"dt": datetime.datetime(2024, 1, 1, tzinfo=UTC), "id": 1, "val": 1.0},
        {"dt": datetime.datetime(2024, 3, 1, tzinfo=UTC), "id": 2, "val": 2.0},
    ]))
    server = PipeHTTPServer(spark, instance_dir).start()
    try:
        base = f"{server.url}/pipes/api/cb"
        with urllib.request.urlopen(f"{base}/chunk_bounds") as r:
            bounds = json.load(r)["chunk_bounds"]
        assert len(bounds) >= 2
        assert bounds[0][0].startswith("2023-12") or \
            bounds[0][0].startswith("2024-01")
        with urllib.request.urlopen(f"{base}/size") as r:
            out = json.load(r)
        assert out["rowcount"] == 2 and out["bytes"] > 0
    finally:
        server.stop()


def test_pipe_http_server_action_named_metric(spark, instance_dir):
    """A pipe whose metric equals an action word ('size') must still
    route: the action is parsed from the END of the path."""
    import datetime
    import json
    import urllib.request

    import pandas as pd

    from meerschaum_spark.pipe import Pipe
    from meerschaum_spark.sources import PipeHTTPServer

    UTC = datetime.timezone.utc
    pipe = Pipe("plugin", "size", instance=instance_dir, spark=spark,
                columns={"datetime": "dt", "id": "id"})
    pipe.sync(pd.DataFrame([{"dt": datetime.datetime(2024, 1, 1, tzinfo=UTC),
                             "id": 1, "val": 1.0}]))
    server = PipeHTTPServer(spark, instance_dir).start()
    try:
        with urllib.request.urlopen(
                f"{server.url}/pipes/plugin/size/data") as r:
            assert len(json.load(r)["docs"]) == 1
        with urllib.request.urlopen(
                f"{server.url}/pipes/plugin/size/rowcount") as r:
            assert json.load(r)["rowcount"] == 1
    finally:
        server.stop()


def test_rollup_over_http(spark, instance_dir):
    """The rollup side table serves over HTTP and through RemotePipe."""
    import datetime
    import json
    import urllib.request

    import pandas as pd

    from meerschaum_spark.pipe import Pipe
    from meerschaum_spark.sources import PipeHTTPServer
    from meerschaum_spark.sources.http import RemotePipe

    UTC = datetime.timezone.utc
    rows = [{"dt": datetime.datetime(2024, 1, 1, i, tzinfo=UTC),
             "id": i, "val": float(i)} for i in range(6)]
    served = Pipe("api", "roll", instance=instance_dir, spark=spark,
                  columns={"datetime": "dt", "id": "id"},
                  parameters={"rollups": [{"name": "hourly",
                                           "interval": "hour",
                                           "values": ["val"]}]})
    served.sync(pd.DataFrame(rows))
    import pytest

    server = PipeHTTPServer(spark, instance_dir).start()
    try:
        base = f"{server.url}/pipes/api/roll"
        with urllib.request.urlopen(f"{base}/rollup?name=hourly") as r:
            docs = json.load(r)["docs"]
        assert len(docs) == 6 and all(d["n_rows"] == 1 for d in docs)
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(f"{base}/rollup?name=missing")
        assert exc.value.code == 404
        remote = RemotePipe(server.url, "api", "roll")
        pdf = remote.get_rollup("hourly")
        assert len(pdf) == 6 and set(pdf["n_rows"]) == {1}
        with pytest.raises(KeyError):
            remote.get_rollup("missing")
        # gapfill over HTTP: served rows form a dense hourly spine
        dense = remote.get_rollup("hourly", gapfill=True)
        assert len(dense) == 6  # contiguous hours -> spine == observed
    finally:
        server.stop()


def test_pipe_http_server_multi_user_auth(spark, instance_dir):
    """Per-user accounts + login sessions (reference _login.py /
    _users.py): bootstrap admin, credentialed login, session-token
    access to pipe routes, admin-gated registration, self/admin delete,
    expiry, and logout."""
    from meerschaum_spark.sources import PipeHTTPServer
    from meerschaum_spark.sources.http import (
        RemotePipe,
        http_login,
        http_register_user,
        http_request_json,
    )

    clock = [1_000.0]
    server = PipeHTTPServer(spark, instance_dir, user_auth=True,
                            session_minutes=1.0,
                            _now=lambda: clock[0]).start()
    try:
        # no session → 401 on pipe routes
        code, _ = http_request_json(f"{server.url}/pipes")
        assert code == 401
        # bootstrap: first registration is open and becomes admin
        code, out = http_register_user(server.url, "alice", "wonderland")
        assert code == 200, out
        # after bootstrap, anonymous registration is rejected
        code, out = http_register_user(server.url, "mallory", "pw")
        assert code == 401, out
        # bad credentials → 401
        import pytest as _pytest
        with _pytest.raises(PermissionError):
            http_login(server.url, "alice", "wrong")
        admin_tok = http_login(server.url, "alice", "wonderland")
        # admin session registers a normal user
        code, out = http_register_user(server.url, "bob", "builder",
                                       auth_token=admin_tok)
        assert code == 200, out
        # duplicate username conflicts
        code, _ = http_register_user(server.url, "bob", "x",
                                     auth_token=admin_tok)
        assert code == 409
        bob_tok = http_login(server.url, "bob", "builder")
        # bob's session authorizes the pipe surface
        rp = RemotePipe(server.url, "authed", "users_m", auth_token=bob_tok)
        code, out = rp.register({"columns": {"datetime": "dt", "id": "id"}})
        assert code == 200 and out["success"]
        code, out = rp.sync([{"dt": "2024-01-01T00:00:00+00:00", "id": 1}])
        assert code == 200 and out["inserted"] == 1
        # identity + listing
        hdr = {"Authorization": f"Bearer {bob_tok}"}
        code, me = http_request_json(f"{server.url}/users/me", headers=hdr)
        assert code == 200 and me["username"] == "bob" and me["type"] == "user"
        code, out = http_request_json(f"{server.url}/users", headers=hdr)
        assert out["users"] == ["alice", "bob"]
        # bob cannot delete alice; alice (admin) can delete bob
        code, _ = http_request_json(f"{server.url}/users/alice/delete",
                                    method="DELETE", headers=hdr)
        assert code == 403
        # expiry: advance the injected clock past the TTL
        clock[0] += 120.0
        code, _ = http_request_json(f"{server.url}/users/me", headers=hdr)
        assert code == 401
        admin_tok = http_login(server.url, "alice", "wonderland")
        ahdr = {"Authorization": f"Bearer {admin_tok}"}
        code, out = http_request_json(f"{server.url}/users/bob/delete",
                                      method="DELETE", headers=ahdr)
        assert code == 200 and out["success"]
        # deleted user can no longer log in
        with _pytest.raises(PermissionError):
            http_login(server.url, "bob", "builder")
        # logout invalidates the session immediately
        code, out = http_request_json(f"{server.url}/logout", method="POST",
                                      headers=ahdr)
        assert code == 200 and out["success"]
        code, _ = http_request_json(f"{server.url}/users/me", headers=ahdr)
        assert code == 401
    finally:
        server.stop()


def test_http_user_auth_no_escalation_and_revocation(spark, instance_dir):
    """Open self-signup must not honor a client-supplied admin type, and
    deleting an account (or changing its password) revokes its live
    sessions immediately — a stale bearer token authorizes nothing."""
    from meerschaum_spark.sources import PipeHTTPServer
    from meerschaum_spark.sources.http import http_login, http_request_json

    server = PipeHTTPServer(spark, instance_dir, user_auth=True,
                            allow_registration=True).start()
    try:
        # bootstrap admin
        code, _ = http_request_json(
            f"{server.url}/users/register", method="POST",
            body={"username": "root", "password": "rootpw"})
        assert code == 200
        # anonymous signup asking for admin: accepted, but as plain user
        code, _ = http_request_json(
            f"{server.url}/users/register", method="POST",
            body={"username": "mallory", "password": "pw",
                  "type": "admin"})
        assert code == 200
        mtok = http_login(server.url, "mallory", "pw")
        mhdr = {"Authorization": f"Bearer {mtok}"}
        code, me = http_request_json(f"{server.url}/users/me", headers=mhdr)
        assert me["type"] == "user"
        # ...so mallory cannot delete the admin
        code, _ = http_request_json(f"{server.url}/users/root/delete",
                                    method="DELETE", headers=mhdr)
        assert code == 403
        # an admin session CAN grant a type
        rtok = http_login(server.url, "root", "rootpw")
        rhdr = {"Authorization": f"Bearer {rtok}"}
        code, _ = http_request_json(
            f"{server.url}/users/register", method="POST",
            body={"username": "ops", "password": "opspw", "type": "admin"},
            headers=rhdr)
        assert code == 200
        otok = http_login(server.url, "ops", "opspw")
        code, me = http_request_json(
            f"{server.url}/users/me",
            headers={"Authorization": f"Bearer {otok}"})
        assert me["type"] == "admin"
        # deletion revokes mallory's live session at once
        code, _ = http_request_json(f"{server.url}/users/mallory/delete",
                                    method="DELETE", headers=rhdr)
        assert code == 200
        code, _ = http_request_json(f"{server.url}/users/me", headers=mhdr)
        assert code == 401
        code, _ = http_request_json(f"{server.url}/pipes", headers=mhdr)
        assert code == 401
        # a password change revokes the old session too
        code, _ = http_request_json(
            f"{server.url}/users/edit", method="POST",
            body={"username": "ops", "password": "newpw"}, headers=rhdr)
        assert code == 200
        code, _ = http_request_json(
            f"{server.url}/users/me",
            headers={"Authorization": f"Bearer {otok}"})
        assert code == 401
        assert http_login(server.url, "ops", "newpw")
    finally:
        server.stop()


def test_http_drop_clear_error_contract(spark, instance_dir):
    """drop/clear on an unknown pipe must 409 like delete (a key typo
    must not read as success), and a BOUNDED clear on a pipe with no
    datetime axis must 400 rather than silently discarding the bounds."""
    from meerschaum_spark.sources import PipeHTTPServer
    from meerschaum_spark.sources.http import RemotePipe

    server = PipeHTTPServer(spark, instance_dir).start()
    try:
        ghost = RemotePipe(server.url, "mgmt", "no_such_pipe")
        code, out = ghost.drop()
        assert code == 409 and not out["success"]
        code, out = ghost.clear()
        assert code == 409 and not out["success"]

        nodt = RemotePipe(server.url, "mgmt", "no_dt")
        code, _ = nodt.register({"columns": {"id": "k"}})
        assert code == 200
        code, out = nodt.sync([{"k": 1, "v": 1.0}, {"k": 2, "v": 2.0}])
        assert code == 200
        code, out = nodt.clear(begin="2024-01-01T00:00:00")
        assert code == 400, out
        # unbounded clear on the same pipe is legitimate and explicit
        code, out = nodt.clear()
        assert code == 200 and out["rows_deleted"] == 2
    finally:
        server.stop()


def test_remote_pipe_full_instance_surface(spark, instance_dir):
    """RemotePipe as the api-instance connector equivalent (reference
    connectors/api/_pipes.py): a client that never touches the instance
    directory drives the full metadata + data surface — sync_time,
    rowcount (bounded + params), dtypes, chunk_bounds — over HTTP."""
    import datetime as dt

    from meerschaum_spark.sources import PipeHTTPServer
    from meerschaum_spark.sources.http import RemotePipe

    server = PipeHTTPServer(spark, instance_dir).start()
    try:
        rp = RemotePipe(server.url, "api_inst", "events")
        code, _ = rp.register({"columns": {"datetime": "ts", "id": "id"}})
        assert code == 200
        docs = [{"ts": f"2024-01-0{d}T00:00:00+00:00", "id": d,
                 "event_type": "click" if d % 2 else "view",
                 "val": float(d)} for d in range(1, 6)]
        code, out = rp.sync(docs)
        assert code == 200 and out["inserted"] == 5
        assert rp.get_sync_time() == dt.datetime(2024, 1, 5)
        assert rp.get_sync_time(newest=False) == dt.datetime(2024, 1, 1)
        assert rp.get_rowcount() == 5
        assert rp.get_rowcount(begin="2024-01-02", end="2024-01-04") == 2
        assert rp.get_rowcount(params={"event_type": "click"}) == 3
        assert rp.dtypes()["val"].startswith("float")
        cb = rp.chunk_bounds(chunk_minutes=1440)
        assert len(cb) >= 4
        first_b, first_e = cb[0]
        assert first_b.startswith("2024-01-01")
        # the windows tile: each end equals the next begin
        assert all(cb[i][1] == cb[i + 1][0] for i in range(len(cb) - 1))
    finally:
        server.stop()


def test_http_pipe_ownership_gating(spark, instance_dir):
    """In user_auth mode, mutating pipe routes (sync/edit/drop/clear/
    delete) are ownership-gated (the r7 advisory): a plain user may only
    mutate pipes they registered; other users' pipes and unowned pipes
    (created out-of-band) are admin-only. Reads stay open to any
    authenticated session, and an edit cannot reassign ownership."""
    from meerschaum_spark.pipe import Pipe
    from meerschaum_spark.sources import PipeHTTPServer
    from meerschaum_spark.sources.http import (
        RemotePipe,
        http_login,
        http_register_user,
        http_request_json,
    )

    # a pipe created OUT-OF-BAND (no owner recorded) before the server
    unowned = Pipe("own", "legacy", instance=instance_dir, spark=spark,
                   columns={"datetime": "dt", "id": "id"})
    unowned.sync([{"dt": "2024-01-01T00:00:00+00:00", "id": 1}])

    server = PipeHTTPServer(spark, instance_dir, user_auth=True).start()
    try:
        code, _ = http_register_user(server.url, "admin", "adminpw")
        assert code == 200
        atok = http_login(server.url, "admin", "adminpw")
        for u in ("alice", "bob"):
            code, _ = http_register_user(server.url, u, u + "pw",
                                         auth_token=atok)
            assert code == 200
        alice = http_login(server.url, "alice", "alicepw")
        bob = http_login(server.url, "bob", "bobpw")

        # alice registers + syncs her own pipe
        ap = RemotePipe(server.url, "own", "alice_m", auth_token=alice)
        code, out = ap.register({"columns": {"datetime": "dt", "id": "id"}})
        assert code == 200, out
        code, out = ap.sync([{"dt": "2024-01-01T00:00:00+00:00", "id": 1}])
        assert code == 200 and out["inserted"] == 1

        # bob can READ alice's pipe but not mutate it
        bp = RemotePipe(server.url, "own", "alice_m", auth_token=bob)
        assert bp.get_rowcount() == 1
        code, out = bp.sync([{"dt": "2024-01-02T00:00:00+00:00", "id": 2}])
        assert code == 403, out
        for fn in (bp.drop, bp.clear, bp.delete):
            code, out = fn()
            assert code == 403, (fn, out)
        code, _ = http_request_json(
            f"{server.url}/pipes/own/alice_m/edit", method="POST",
            body={"parameters": {"owner": "bob"}},
            headers={"Authorization": f"Bearer {bob}"})
        assert code == 403

        # alice cannot strip her own ownership via a full-replace edit
        code, _ = http_request_json(
            f"{server.url}/pipes/own/alice_m/edit", method="POST",
            body={"parameters": {"columns": {"datetime": "dt", "id": "id"}}},
            headers={"Authorization": f"Bearer {alice}"})
        assert code == 200
        code, out = ap.sync([{"dt": "2024-01-03T00:00:00+00:00", "id": 3}])
        assert code == 200 and out["inserted"] == 1

        # the unowned pipe is admin-only for mutation, readable by all
        bu = RemotePipe(server.url, "own", "legacy", auth_token=bob)
        assert bu.get_rowcount() == 1
        code, out = bu.drop()
        assert code == 403, out
        au = RemotePipe(server.url, "own", "legacy", auth_token=atok)
        code, out = au.clear()
        assert code == 200, out

        # a sync that auto-registers a NEW pipe records the syncer as owner
        np_bob = RemotePipe(server.url, "own", "bob_new", auth_token=bob)
        code, out = np_bob.sync([{"dt": "2024-01-01T00:00:00+00:00",
                                  "id": 1}])
        assert code == 200 and out["inserted"] == 1
        np_alice = RemotePipe(server.url, "own", "bob_new", auth_token=alice)
        code, out = np_alice.drop()
        assert code == 403, out
        code, out = np_bob.drop()
        assert code == 200, out
    finally:
        server.stop()


def test_http_unregistered_data_bearing_target_is_admin_only(
        spark, instance_dir):
    """Out-of-band data can exist WITHOUT a registry doc (r7 advisory):
    a plain user must not be able to claim such a target via sync
    auto-registration or register (ownership would carry drop/clear
    rights over data they never wrote); an admin can."""
    from meerschaum_spark.pipe import Pipe
    from meerschaum_spark.sources import PipeHTTPServer
    from meerschaum_spark.sources.http import (
        RemotePipe,
        http_login,
        http_register_user,
    )

    orphan = Pipe("own", "orphan", instance=instance_dir, spark=spark,
                  columns={"datetime": "dt", "id": "id"})
    orphan.sync([{"dt": "2024-01-01T00:00:00+00:00", "id": 1}])
    orphan.registry.delete(orphan.target)  # data stays, registration gone

    server = PipeHTTPServer(spark, instance_dir, user_auth=True).start()
    try:
        code, _ = http_register_user(server.url, "admin", "adminpw")
        assert code == 200
        atok = http_login(server.url, "admin", "adminpw")
        code, _ = http_register_user(server.url, "eve", "evepw",
                                     auth_token=atok)
        assert code == 200
        eve = http_login(server.url, "eve", "evepw")

        ep = RemotePipe(server.url, "own", "orphan", auth_token=eve)
        # reads stay open to authenticated sessions
        assert ep.get_rowcount() == 1
        # claiming via sync auto-registration or register is forbidden
        code, out = ep.sync([{"dt": "2024-01-02T00:00:00+00:00", "id": 2}])
        assert code == 403, out
        code, out = ep.register({"columns": {"datetime": "dt", "id": "id"}})
        assert code == 403, out
        # the admin can adopt and mutate it
        ap = RemotePipe(server.url, "own", "orphan", auth_token=atok)
        code, out = ap.sync([{"dt": "2024-01-02T00:00:00+00:00", "id": 2}])
        assert code == 200, out
    finally:
        server.stop()


def test_copy_to_remote_pipe_over_http(spark, instance_dir, tmp_path):
    """pipe.copy_to(RemotePipe) — the reference's cross-INSTANCE sync
    (connectors/api/_pipes.py): a local pipe's stored rows land in a
    SECOND instance served over HTTP, column roles travel with them,
    bounded copies work, and the copy is idempotent (the remote diff
    absorbs the overlap)."""
    import datetime as dtm

    import pandas as pd

    from meerschaum_spark.pipe import Pipe
    from meerschaum_spark.sources import PipeHTTPServer
    from meerschaum_spark.sources.http import RemotePipe

    src = Pipe("copy", "src", instance=instance_dir, spark=spark,
               columns={"datetime": "ts", "id": "id"})
    rows = [{"ts": dtm.datetime(2024, 1, 1) + dtm.timedelta(hours=i),
             "id": i, "kind": "a" if i % 2 else "b", "v": float(i)}
            for i in range(48)]
    src.sync(pd.DataFrame(rows))

    remote_instance = str(tmp_path / "remote_instance")
    server = PipeHTTPServer(spark, remote_instance).start()
    try:
        dest = RemotePipe(server.url, "copy", "dest")
        res = src.copy_to(dest)
        assert res.success and res.inserted == 48, res.message
        # column roles traveled: the remote registration has them
        attrs = dest.attributes()
        assert attrs["parameters"]["columns"]["datetime"] == "ts"
        assert dest.get_rowcount() == 48
        # idempotent: the remote diff absorbs the full overlap
        res2 = src.copy_to(dest)
        assert res2.success and res2.inserted == 0 and res2.updated == 0
        # bounded copy into a fresh remote pipe
        dest2 = RemotePipe(server.url, "copy", "dest_bounded")
        res3 = src.copy_to(dest2, begin=dtm.datetime(2024, 1, 2))
        assert res3.success and res3.inserted == 24
        assert dest2.get_rowcount() == 24
        assert dest2.get_sync_time(newest=False) == dtm.datetime(2024, 1, 2)
        # the copied VALUES round-tripped exactly
        got = {(d["id"], d["kind"], d["v"])
               for d in dest.get_data().to_dict("records")}
        assert got == {(r["id"], r["kind"], r["v"]) for r in rows}
    finally:
        server.stop()


def test_admin_edit_preserves_ownership(spark, instance_dir):
    """A routine full-replace edit by an ADMIN (body without 'owner')
    must not wipe the pipe's ownership; an explicit owner in the body IS
    an admin transfer."""
    from meerschaum_spark.sources import PipeHTTPServer
    from meerschaum_spark.sources.http import (
        RemotePipe,
        http_login,
        http_register_user,
        http_request_json,
    )

    server = PipeHTTPServer(spark, instance_dir, user_auth=True).start()
    try:
        http_register_user(server.url, "root", "rootpw")
        atok = http_login(server.url, "root", "rootpw")
        http_register_user(server.url, "carol", "carolpw", auth_token=atok)
        ctok = http_login(server.url, "carol", "carolpw")
        cp = RemotePipe(server.url, "own2", "m", auth_token=ctok)
        code, _ = cp.register({"columns": {"datetime": "dt", "id": "id"}})
        assert code == 200
        # admin full-replace edit WITHOUT owner: ownership survives
        code, _ = http_request_json(
            f"{server.url}/pipes/own2/m/edit", method="POST",
            body={"parameters": {"columns": {"datetime": "dt", "id": "id"},
                                 "note": "edited"}},
            headers={"Authorization": f"Bearer {atok}"})
        assert code == 200
        code, out = cp.sync([{"dt": "2024-01-01T00:00:00+00:00", "id": 1}])
        assert code == 200 and out["inserted"] == 1, out
        # explicit transfer by admin: carol loses write access
        code, _ = http_request_json(
            f"{server.url}/pipes/own2/m/edit", method="POST",
            body={"parameters": {"columns": {"datetime": "dt", "id": "id"},
                                 "owner": "root"}},
            headers={"Authorization": f"Bearer {atok}"})
        assert code == 200
        code, _ = cp.sync([{"dt": "2024-01-02T00:00:00+00:00", "id": 2}])
        assert code == 403
    finally:
        server.stop()
