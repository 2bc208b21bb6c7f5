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
