from meerschaum_spark.sources.tables import (
    TABLE_NAMES, canonicalize_ts, load_table, register_views,
)

__all__ = ["TABLE_NAMES", "load_table", "register_views",
           "fetch_http_json", "http_fetch_fn", "PipeHTTPServer"]


def __getattr__(name):
    # lazy: the http client/server pull in Pipe; avoid import cycles
    if name in ("fetch_http_json", "http_fetch_fn"):
        from meerschaum_spark.sources import http as _http
        return getattr(_http, name)
    if name == "PipeHTTPServer":
        from meerschaum_spark.sources.server import PipeHTTPServer
        return PipeHTTPServer
    raise AttributeError(name)
