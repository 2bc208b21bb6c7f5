"""Parity odds and ends: grid repartition, plugin sync protocol,
definition guard, dict-valued params (canonical-JSON equality)."""

import datetime

import pandas as pd
import pytest

from meerschaum_spark.params import params_to_filter
from meerschaum_spark.pipe import Pipe

UTC = datetime.timezone.utc


def dtm(*args):
    return datetime.datetime(*args, tzinfo=UTC)


def test_repartition_grid(spark, instance_dir):
    pipe = Pipe("misc", "grid", instance=instance_dir, spark=spark,
                columns={"datetime": "dt", "id": "id"})
    pipe.sync(pd.DataFrame([
        {"dt": dtm(2024, 1, 1) + datetime.timedelta(days=10 * k), "id": 1,
         "val": float(k)} for k in range(6)]))
    before = len(pipe.store.partition_values())
    res = pipe.repartition_grid(7 * 24 * 60)   # 30-day → 7-day grid
    assert res.success
    after = len(pipe.store.partition_values())
    assert after > before
    assert pipe.get_rowcount() == 6
    assert pipe.chunk_minutes == 7 * 24 * 60
    # reads and sync still work on the new grid
    assert pipe.get_data(begin=dtm(2024, 1, 15)).count() == 4


def test_plugin_sync_protocol(spark, instance_dir):
    calls = {}

    def plugin_sync(pipe, begin=None, end=None, params=None):
        calls["seen"] = True
        inner = pipe.sync(pd.DataFrame([
            {"dt": dtm(2024, 1, 1), "id": 1, "val": 1.0}]))
        return inner

    pipe = Pipe("misc", "plugin", instance=instance_dir, spark=spark,
                columns={"datetime": "dt", "id": "id"}, sync_fn=plugin_sync)
    res = pipe.sync()
    assert res.success and calls.get("seen")
    assert pipe.get_rowcount() == 1


def test_definition_guard(spark, instance_dir):
    pipe = Pipe("misc", "guard", instance=instance_dir, spark=spark,
                columns={"datetime": "dt"},
                parameters={"fetch": {"definition":
                                      "SELECT 1; DROP TABLE x"}})
    with pytest.raises(ValueError, match="Unsafe token"):
        pipe.fetch()


def test_dict_param_json_equality(spark):
    df = spark.createDataFrame(
        [(1, '{"a":1,"b":2}'), (2, '{"a":9}')], "id long, props string")
    cond = params_to_filter({"props": {"b": 2, "a": 1}})  # key order differs
    got = [r["id"] for r in df.filter(cond).collect()]
    assert got == [1]


def test_exists_ttl_cache(spark, instance_dir, monkeypatch):
    """Repeated exists() calls within the TTL hit no filesystem listing;
    local writes keep the cache truthful without waiting for expiry."""
    import os as _os
    import pandas as pd
    from meerschaum_spark.pipe import Pipe
    pipe = Pipe("cache", "exists", instance=instance_dir, spark=spark,
                columns={"id": "id"})
    assert pipe.exists() is False
    pipe.sync(pd.DataFrame([{"id": 1, "val": 1}]))
    assert pipe.exists() is True

    calls = {"n": 0}
    real_scandir = _os.scandir

    def counting_scandir(*a, **kw):
        calls["n"] += 1
        return real_scandir(*a, **kw)

    monkeypatch.setattr(_os, "scandir", counting_scandir)
    for _ in range(20):
        assert pipe.exists() is True
    assert calls["n"] == 0
    # drop updates the cache immediately (no stale True)
    pipe.drop()
    assert pipe.exists() is False


def test_registry_ttl_cache(spark, instance_dir, monkeypatch):
    """Repeated attribute loads within the TTL hit no JSON re-read; saves
    refresh the cache in place."""
    import builtins
    import pandas as pd
    from meerschaum_spark.pipe import Pipe
    pipe = Pipe("cache", "reg", instance=instance_dir, spark=spark,
                columns={"id": "id"})
    pipe.sync(pd.DataFrame([{"id": 1, "val": 1}]))

    opens = {"n": 0}
    real_open = builtins.open
    reg_dir = pipe.registry.registry_dir

    def counting_open(path, *a, **kw):
        if isinstance(path, str) and path.startswith(reg_dir) \
                and "w" not in (a[0] if a else kw.get("mode", "r")):
            opens["n"] += 1
        return real_open(path, *a, **kw)

    monkeypatch.setattr(builtins, "open", counting_open)
    for _ in range(10):
        assert pipe.registry.load(pipe.target) is not None
    assert opens["n"] == 0
    pipe.edit(tags=["x"])  # save → cache refreshed, still no re-read
    doc = pipe.registry.load(pipe.target)
    assert doc["parameters"]["tags"] == ["x"]
    assert opens["n"] == 0


def test_instance_bulk_actions(spark, instance_dir):
    """sync/verify/dedup/drop across all registered pipes with key/tag
    filters (the reference's action layer)."""
    import datetime

    import pandas as pd

    from meerschaum_spark import instance as inst
    from meerschaum_spark.pipe import Pipe

    UTC = datetime.timezone.utc
    rows = [{"dt": datetime.datetime(2024, 1, 1, tzinfo=UTC),
             "id": 1, "val": 1.0}]
    spark.createDataFrame(pd.DataFrame(rows)) \
        .createOrReplaceTempView("bulk_src")

    for metric in ("a", "b"):
        p = Pipe("bulk", metric, instance=instance_dir, spark=spark,
                 columns={"datetime": "dt", "id": "id"},
                 parameters={"tags": ["bulkt"],
                             "definition": "SELECT * FROM bulk_src"})
        p.sync(pd.DataFrame(rows))

    pipes = inst.get_pipes(spark, instance_dir, connector="bulk")
    assert {p.metric for p in pipes} == {"a", "b"}
    assert len(inst.get_pipes(spark, instance_dir, tags=["bulkt"])) == 2
    assert inst.get_pipes(spark, instance_dir, tags=["nope"]) == []

    results = inst.sync_pipes(spark, instance_dir, connector="bulk",
                              workers=2)
    assert len(results) == 2 and all(r.success for r in results.values())

    dd = inst.deduplicate_pipes(spark, instance_dir, connector="bulk")
    assert all(r.success for r in dd.values())

    dropped = inst.drop_pipes(spark, instance_dir, connector="bulk",
                              metric="a")
    assert all(dropped.values())
    assert set(dropped) == {("bulk", "a", None)}
    remaining = [p for p in inst.get_pipes(spark, instance_dir,
                                           connector="bulk") if p.exists()]
    assert {p.metric for p in remaining} == {"b"}

    # delete removes data AND registration (drop-vs-delete split)
    deleted = inst.delete_pipes(spark, instance_dir, connector="bulk",
                                metric="b")
    assert deleted == {("bulk", "b", None): True}
    assert inst.get_pipes(spark, instance_dir, connector="bulk",
                          metric="b") == []


def test_bulk_results_keyed_by_pipe_keys(spark, instance_dir):
    """Two pipes sharing an explicit target must BOTH report results —
    keying by target would silently drop one (VERDICT r2 What's wrong #5)."""
    import datetime

    import pandas as pd

    from meerschaum_spark import instance as inst
    from meerschaum_spark.pipe import Pipe

    UTC = datetime.timezone.utc
    rows = pd.DataFrame([{"dt": datetime.datetime(2024, 1, 1, tzinfo=UTC),
                          "id": 1, "val": 1.0}])
    p1 = Pipe("shared", "x", instance=instance_dir, spark=spark,
              columns={"datetime": "dt", "id": "id"}, target="shared_tgt")
    p2 = Pipe("shared", "y", instance=instance_dir, spark=spark,
              columns={"datetime": "dt", "id": "id"}, target="shared_tgt")
    p1.sync(rows)
    res = inst._run_over([p1, p2], lambda p: p.deduplicate(), workers=2)
    assert set(res) == {("shared", "x", None), ("shared", "y", None)}
    assert all(r.success for r in res.values())


def test_clear_vacuum_tag_bulk_actions(spark, instance_dir):
    """r4 bulk verbs: bounded clear across pipes, staging GC, and bulk
    tag editing that round-trips through the registry's tag filters."""
    import datetime

    import pandas as pd

    from meerschaum_spark import instance as inst
    from meerschaum_spark.pipe import Pipe

    UTC = datetime.timezone.utc
    rows = [{"dt": datetime.datetime(2024, 1, d, tzinfo=UTC),
             "id": d, "val": float(d)} for d in (1, 2, 3)]
    for metric in ("x", "y"):
        p = Pipe("bulk2", metric, instance=instance_dir, spark=spark,
                 columns={"datetime": "dt", "id": "id"})
        p.sync(pd.DataFrame(rows))

    cleared = inst.clear_pipes(
        spark, instance_dir, connector="bulk2",
        begin=datetime.datetime(2024, 1, 3, tzinfo=UTC))
    assert cleared == {("bulk2", "x", None): 1, ("bulk2", "y", None): 1}
    for p in inst.get_pipes(spark, instance_dir, connector="bulk2"):
        assert p.get_rowcount() == 2

    assert set(inst.vacuum_pipes(spark, instance_dir, connector="bulk2")) \
        == {("bulk2", "x", None), ("bulk2", "y", None)}

    tagged = inst.tag_pipes(spark, instance_dir, add=["gold"],
                            connector="bulk2", metric="x")
    assert tagged == {("bulk2", "x", None): ["gold"]}
    assert [p.metric for p in
            inst.get_pipes(spark, instance_dir, tags=["gold"])] == ["x"]
    # remove round-trips too
    inst.tag_pipes(spark, instance_dir, remove=["gold"], connector="bulk2")
    assert inst.get_pipes(spark, instance_dir, tags=["gold"]) == []


def test_canonicalize_ts_branches(spark):
    """The loader normalizer must handle every physical shape the events
    timestamp has shipped with: int64-ns → µs TIMESTAMP (integer DIV,
    no float drift), TIMESTAMP_NTZ → TIMESTAMP (UTC value-preserving),
    TIMESTAMP passthrough, missing column no-op."""
    import datetime

    from pyspark.sql import functions as F

    from meerschaum_spark.sources.tables import canonicalize_ts

    ns = 1_704_067_200_123_456_789           # 2024-01-01 00:00:00.123456789
    df = spark.createDataFrame([(ns,)], "ts long")
    out = canonicalize_ts(df, ["ts"]).first()["ts"]
    assert out == datetime.datetime(2024, 1, 1, 0, 0, 0, 123456)

    ntz = spark.sql(
        "SELECT TIMESTAMP_NTZ'2024-06-01 12:34:56.789' AS ts")
    got = canonicalize_ts(ntz, ["ts"])
    assert got.schema["ts"].dataType.typeName() == "timestamp"
    assert got.first()["ts"] == datetime.datetime(2024, 6, 1, 12, 34, 56,
                                                  789000)

    ltz = spark.sql("SELECT TIMESTAMP'2024-06-01 01:02:03' AS ts")
    assert canonicalize_ts(ltz, ["ts"]).first()["ts"] == \
        datetime.datetime(2024, 6, 1, 1, 2, 3)
    # absent column is a no-op, not an error
    assert canonicalize_ts(ltz, ["nope"]).columns == ["ts"]


def test_catalog_guards():
    """The catalog's import-time safety rails: duplicate @query names
    hard-error (a later module would silently shadow the original's
    green correctness history — this caught two real collisions in r8),
    and ordered() rejects HEAD_ORDER dups / >50 entries (the driver
    records exactly the first 50, so a 51st pinned entry would silently
    never land a row)."""
    import pytest

    from meerschaum_spark import catalog
    from meerschaum_spark.catalog import QUERIES, ordered, query

    import meerschaum_spark.queries  # noqa: F401 — populate the registry

    existing = next(iter(QUERIES))
    with pytest.raises(ValueError, match="registered twice"):
        @query(existing)
        def _dup(spark, sf_dir):  # pragma: no cover
            return None

    orig = catalog.HEAD_ORDER
    try:
        catalog.HEAD_ORDER = [existing, existing]
        with pytest.raises(ValueError, match="duplicate"):
            ordered(dict(QUERIES))
        catalog.HEAD_ORDER = list(QUERIES)[:51]
        with pytest.raises(ValueError, match="first 50"):
            ordered(dict(QUERIES))
        catalog.HEAD_ORDER = ["no_such_query"]
        with pytest.raises(KeyError):
            ordered(dict(QUERIES))
    finally:
        catalog.HEAD_ORDER = orig
