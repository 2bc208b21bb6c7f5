"""Metadata caching + sync-path cache-safety semantics.

Mirrors the reference's attributes/exists caches
(core/Pipe/_cache.py, config/_default.py:244-258): attributes served
from a shared TTL cache across Pipe objects, while write-path decisions
(first-sync append vs diff) always probe fresh.
"""

import datetime

import pandas as pd
import pytest

from meerschaum_spark.pipe import Pipe
from meerschaum_spark.registry import PipeRegistry

UTC = datetime.timezone.utc


def dtm(*args):
    return datetime.datetime(*args, tzinfo=UTC)


ROWS = [
    {"dt": dtm(2024, 1, 1), "id": 1, "val": 1.0},
    {"dt": dtm(2024, 1, 2), "id": 2, "val": 2.0},
]


def test_registry_shared_across_pipe_objects(spark, instance_dir):
    p1 = Pipe("cache", "reg", instance=instance_dir, spark=spark,
              columns={"datetime": "dt", "id": "id"})
    p2 = Pipe("cache", "reg", instance=instance_dir, spark=spark)
    assert p1.registry is p2.registry


def test_registry_load_cached_within_ttl(spark, instance_dir, monkeypatch):
    p = Pipe("cache", "ttl", instance=instance_dir, spark=spark,
             columns={"datetime": "dt", "id": "id"})
    p.sync(pd.DataFrame(ROWS))

    reads = {"n": 0}
    orig = PipeRegistry._load_uncached

    def counting(self, target):
        reads["n"] += 1
        return orig(self, target)

    monkeypatch.setattr(PipeRegistry, "_load_uncached", counting)
    # fresh Pipe objects + reads served entirely from the shared cache
    for _ in range(3):
        q = Pipe("cache", "ttl", instance=instance_dir, spark=spark)
        assert q.columns.get("datetime") == "dt"
        assert q.get_data(order=None).count() == 2
    assert reads["n"] == 0


def test_registry_save_refreshes_shared_cache(spark, instance_dir):
    p1 = Pipe("cache", "fresh", instance=instance_dir, spark=spark,
              columns={"datetime": "dt", "id": "id"})
    p1.sync(pd.DataFrame(ROWS))
    p1.parameters["tags"] = ["gold"]
    p1.register()
    # a second Pipe object sees the in-process edit immediately
    p2 = Pipe("cache", "fresh", instance=instance_dir, spark=spark)
    assert p2.parameters.get("tags") == ["gold"]


def test_first_sync_probes_fresh_not_cached(spark, instance_dir):
    """A stale exists()=False must not route a sync down the blind-append
    path once another writer has created the table."""
    a = Pipe("cache", "probe", instance=instance_dir, spark=spark,
             columns={"datetime": "dt", "id": "id"})
    assert a.exists() is False  # caches False on pipe a's store
    # a second Pipe object (separate store/exists cache) creates the table
    b = Pipe("cache", "probe", instance=instance_dir, spark=spark,
             columns={"datetime": "dt", "id": "id"})
    b.sync(pd.DataFrame(ROWS))
    # cached probe may still say False; sync must diff regardless
    res = a.sync(pd.DataFrame(ROWS))
    assert res.success
    assert res.inserted == 0 and res.updated == 0
    assert a.get_data(order=None).count() == 2


def test_dedupe_patch_keeps_last_batch_row(spark, instance_dir):
    """keep='last' batch semantics (reference drop_duplicates keep='last'):
    two updates for one key in one batch -> the later row wins, even when
    its values are smaller."""
    p = Pipe("cache", "keeplast", instance=instance_dir, spark=spark,
             columns={"datetime": "dt", "id": "id"}, upsert=True)
    p.sync(pd.DataFrame(ROWS))
    p.sync(pd.DataFrame([
        {"dt": dtm(2024, 1, 1), "id": 1, "val": 9.0},
        {"dt": dtm(2024, 1, 1), "id": 1, "val": 5.0},  # sent later, smaller
    ]))
    row = [r for r in p.get_data(order=None).collect() if r["id"] == 1][0]
    assert row["val"] == 5.0


def test_tags_roundtrip_and_group_matching(spark, instance_dir):
    """Tags round-trip through the registry, and fetch_pipes_keys matches
    with the reference's group semantics (comma = AND, list = OR,
    '_'-prefix = NOT; connectors/sql/_pipes.py:279-309)."""
    for metric, tags in (("a", ["prod", "etl"]), ("b", ["prod"]),
                         ("c", ["dev"])):
        p = Pipe("tagged", metric, instance=instance_dir, spark=spark,
                 columns={"datetime": "dt", "id": "id"}, tags=tags)
        p.register()
    # round-trip: a fresh Pipe object sees the registered tags
    assert Pipe("tagged", "a", instance=instance_dir,
                spark=spark).tags == ["prod", "etl"]

    reg = PipeRegistry.for_instance(instance_dir)

    def metrics(tags):
        return sorted(m for _, m, _ in
                      reg.fetch_pipes_keys(connector="tagged", tags=tags))

    assert metrics(["prod"]) == ["a", "b"]           # simple membership
    assert metrics(["prod,etl"]) == ["a"]            # comma: AND
    assert metrics(["etl", "dev"]) == ["a", "c"]     # list: OR
    assert metrics(["_dev"]) == ["a", "b"]           # negation
    assert metrics(["prod,_etl"]) == ["b"]           # AND with negation
    assert metrics(["nope"]) == []

    # tags setter + re-register updates the surface
    p = Pipe("tagged", "c", instance=instance_dir, spark=spark)
    p.tags = ["dev", "archived"]
    p.register()
    assert metrics(["archived"]) == ["c"]


def test_filter_existing_no_cache_leak(spark, instance_dir):
    """External filter_existing() must not leave persisted DataFrames
    behind (ADVICE r2: the sync-leak class reintroduced one method up)."""
    p = Pipe("cache", "leak", instance=instance_dir, spark=spark,
             columns={"datetime": "dt", "id": "id"})
    p.sync(pd.DataFrame(ROWS))
    def persistent_ids():
        # compare RDD id SETS, not counts: the context cleaner may
        # concurrently unpersist other tests' stale checkpoints
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in jmap.keySet().toArray()}

    before = persistent_ids()
    from meerschaum_spark import dataframe as mdf
    df, _ = mdf.to_spark_df(spark, pd.DataFrame([
        {"dt": dtm(2024, 1, 3), "id": 3, "val": 3.0},
    ]), p.dtypes or None)
    unseen, update = p.filter_existing(df)
    assert unseen.count() == 1 and update.count() == 0
    assert persistent_ids() - before == set()


def _mkdoc(c, m, loc=None, tags=None):
    return {"keys": {"connector": c, "metric": m, "location": loc},
            "parameters": ({"tags": tags} if tags else {})}


def test_index_serves_fetch_and_tracks_save_delete(instance_dir):
    reg = PipeRegistry.for_instance(instance_dir)
    reg.save("a_x", _mkdoc("a", "x", tags=["prod"]))
    reg.save("a_y", _mkdoc("a", "y", tags=["dev"]))
    reg.save("b_x", _mkdoc("b", "x", "east", tags=["prod", "dev"]))
    import os
    assert os.path.isfile(reg.index_path)
    assert reg.fetch_pipes_keys() == [("a", "x", None), ("a", "y", None),
                                      ("b", "x", "east")]
    assert reg.fetch_pipes_keys(connector="a") == [("a", "x", None),
                                                   ("a", "y", None)]
    assert reg.fetch_pipes_keys(tags=["prod"]) == [("a", "x", None),
                                                   ("b", "x", "east")]
    assert reg.fetch_pipes_keys(tags=["prod,dev"]) == [("b", "x", "east")]
    assert reg.fetch_pipes_keys(tags=["_dev"]) == [("a", "x", None)]
    reg.delete("a_y")
    assert reg.fetch_pipes_keys() == [("a", "x", None), ("b", "x", "east")]


def test_index_rebuilds_after_foreign_write(instance_dir):
    """A doc written WITHOUT going through save() (another process, an
    older version) bumps the registry dir's mtime, so the next fetch
    must detect the stale index and rebuild from a scan."""
    import json
    import os

    reg = PipeRegistry.for_instance(instance_dir)
    reg.save("a_x", _mkdoc("a", "x"))
    assert reg.fetch_pipes_keys() == [("a", "x", None)]
    # foreign writer: publish a doc file directly
    path = os.path.join(reg.registry_dir, "c_z.json")
    with open(path + ".tmp", "w") as f:
        json.dump(_mkdoc("c", "z", tags=["prod"]), f)
    os.replace(path + ".tmp", path)
    assert reg.fetch_pipes_keys() == [("a", "x", None), ("c", "z", None)]
    assert reg.fetch_pipes_keys(tags=["prod"]) == [("c", "z", None)]
    # foreign delete: remove the file directly
    os.remove(path)
    assert reg.fetch_pipes_keys() == [("a", "x", None)]


def test_index_corruption_falls_back_to_scan(instance_dir):
    reg = PipeRegistry.for_instance(instance_dir)
    reg.save("a_x", _mkdoc("a", "x"))
    with open(reg.index_path, "w") as f:
        f.write("{not json")
    reg._index_cache = None
    assert reg.fetch_pipes_keys() == [("a", "x", None)]


@pytest.mark.slow
def test_index_converges_under_two_process_registration():
    """Two OS processes register pipes into the same registry
    concurrently (VERDICT r11 #7): the flock serializes the
    publish+fold, and the post-publish mtime stamp (ADVICE r11 —
    captured BEFORE the scan/fold, never after) guarantees a
    concurrently-landed entry can't be absorbed into a fresh-looking
    index that omits it. Invariants checked from a THIRD fresh process
    context: the listing holds every registered pipe, and if the
    on-disk index claims freshness (stamp == current dir mtime) it must
    actually contain every entry."""
    import json
    import os
    import subprocess
    import sys
    import tempfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    inst = tempfile.mkdtemp(prefix="mrsm_regidx_")
    n = 60
    worker = """
import sys
sys.path.insert(0, {repo!r})
from meerschaum_spark.registry import PipeRegistry
inst, wid, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
reg = PipeRegistry.for_instance(inst)
for i in range(n):
    t = f"w{{wid}}_{{i}}"
    reg.save(t, {{"keys": {{"connector": f"c{{wid}}", "metric": f"m{{i}}",
                          "location": None}},
               "parameters": {{"tags": ["stress"]}}}})
    if i % 7 == 3:          # churn: delete + re-register
        reg.delete(t)
        reg.save(t, {{"keys": {{"connector": f"c{{wid}}",
                              "metric": f"m{{i}}", "location": None}},
                   "parameters": {{"tags": ["stress"]}}}})
print("REG_WORKER_OK")
""".format(repo=repo)
    with tempfile.NamedTemporaryFile("w", suffix=".py",
                                     delete=False) as f:
        f.write(worker)
        wpath = f.name
    env = dict(os.environ)
    env["PYTHONPATH"] = repo
    try:
        procs = [subprocess.Popen(
            [sys.executable, wpath, inst, str(wid), str(n)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env) for wid in (0, 1)]
        for p in procs:
            out, err = p.communicate(timeout=300)
            assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"
            assert "REG_WORKER_OK" in out
    finally:
        os.unlink(wpath)

    reg = PipeRegistry.for_instance(inst)
    keys = reg.fetch_pipes_keys()
    expect = {(f"c{w}", f"m{i}", None) for w in (0, 1) for i in range(n)}
    assert set(keys) == expect and len(keys) == 2 * n

    # fresh-looking index must be complete (the ADVICE r11 hazard)
    with open(reg.index_path) as f:
        idx = json.load(f)
    if idx["dir_mtime_ns"] == os.stat(reg.registry_dir).st_mtime_ns:
        assert len(idx["entries"]) == 2 * n, (
            "index claims freshness but omits "
            f"{2 * n - len(idx['entries'])} entries")


def test_index_racy_tick_guard_same_mtime_foreign_publish(
        instance_dir, monkeypatch):
    """An UNLOCKED foreign publish landing in the SAME coarse mtime
    tick as the index stamp (simulated deterministically by pinning
    the dir mtime back to the stamped value) is caught while the tick
    is open: the == freshness probe passes, but the racy-tick guard's
    listdir name-set compare forces the rebuild that picks the entry
    up. Grace is pinned wide so the test never races the real
    clock."""
    import json
    import os

    monkeypatch.setattr(PipeRegistry, "INDEX_MTIME_GRACE_NS", 10**18)
    reg = PipeRegistry.for_instance(instance_dir)
    reg.save("a_x", _mkdoc("a", "x"))
    assert reg.fetch_pipes_keys() == [("a", "x", None)]
    stamp = reg._index_cache[0]

    def foreign(name, doc):
        path = os.path.join(reg.registry_dir, name + ".json")
        with open(path + ".tmp", "w") as f:
            json.dump(doc, f)
        os.replace(path + ".tmp", path)
        os.utime(reg.registry_dir, ns=(stamp, stamp))
        assert reg._dir_mtime_ns() == stamp

    # memo path: warm in-process cache, stamp matches the pinned mtime
    foreign("c_z", _mkdoc("c", "z"))
    assert reg.fetch_pipes_keys() == [("a", "x", None), ("c", "z", None)]

    # file-probe path: cold memo forces the index-file read
    stamp = json.load(open(reg.index_path))["dir_mtime_ns"]
    foreign("d_w", _mkdoc("d", "w"))
    del reg._index_cache
    assert reg.fetch_pipes_keys() == [
        ("a", "x", None), ("c", "z", None), ("d", "w", None)]


def test_index_racy_tick_guard_is_the_mechanism(instance_dir, monkeypatch):
    """Control: with the grace window forced permanently CLOSED, the
    same simulated same-tick collision is trusted stale — proving the
    name-set compare (not some other path) is what catches it, and
    that the guard costs nothing once a tick is old."""
    import json
    import os

    monkeypatch.setattr(PipeRegistry, "INDEX_MTIME_GRACE_NS", -1)
    reg = PipeRegistry.for_instance(instance_dir)
    reg.save("a_x", _mkdoc("a", "x"))
    assert reg.fetch_pipes_keys() == [("a", "x", None)]
    stamp = reg._index_cache[0]
    path = os.path.join(reg.registry_dir, "c_z.json")
    with open(path + ".tmp", "w") as f:
        json.dump(_mkdoc("c", "z"), f)
    os.replace(path + ".tmp", path)
    os.utime(reg.registry_dir, ns=(stamp, stamp))
    assert reg.fetch_pipes_keys() == [("a", "x", None)]
