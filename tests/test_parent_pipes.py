"""Parent/child pipes: definitions over parent views, incremental bounds
pushed through the view into the parent's partition-pruned scan."""

import datetime

import pandas as pd

from meerschaum_spark.pipe import Pipe
from meerschaum_spark.plans import plan_report

UTC = datetime.timezone.utc


def dtm(*args):
    return datetime.datetime(*args, tzinfo=UTC)


def test_child_pipe_syncs_from_parent(spark, instance_dir):
    parent = Pipe("src", "raw", instance=instance_dir, spark=spark,
                  columns={"datetime": "dt", "id": "id"})
    parent.sync(pd.DataFrame([
        {"dt": dtm(2024, 1, d), "id": i, "val": float(d * 10 + i)}
        for d in range(1, 6) for i in (1, 2)]))

    child = Pipe("derived", "doubled", instance=instance_dir, spark=spark,
                 columns={"datetime": "dt", "id": "id"},
                 parameters={
                     "parents": [parent.keys],
                     "fetch": {
                         "definition":
                             f"SELECT dt, id, val * 2 AS val FROM {parent.target}",
                         "backtrack_minutes": 60,
                     },
                 })
    res = child.sync()
    assert res.success and res.inserted == 10
    docs = child.get_docs(params={"id": 1, "dt": dtm(2024, 1, 3)})
    assert docs[0]["val"] == 62.0

    # parent gains rows; child resyncs incrementally (backtrack window)
    parent.sync(pd.DataFrame([{"dt": dtm(2024, 1, 6), "id": 1, "val": 61.0}]))
    res2 = child.sync()
    assert res2.success and res2.inserted == 1
    assert child.get_rowcount() == 11


def test_bounds_push_through_parent_view(spark, instance_dir):
    parent = Pipe("src", "raw2", instance=instance_dir, spark=spark,
                  columns={"datetime": "dt", "id": "id"})
    parent.sync(pd.DataFrame([
        {"dt": dtm(2024, 1, 1) + datetime.timedelta(days=40 * k), "id": 1,
         "val": float(k)} for k in range(4)]))  # spans several partitions
    child = Pipe("derived", "view2", instance=instance_dir, spark=spark,
                 columns={"datetime": "dt", "id": "id"},
                 parameters={"parents": [parent.keys],
                             "fetch": {"definition":
                                       f"SELECT * FROM {parent.target}"}})
    child._register_parent_views()
    df = child.fetch(begin=dtm(2024, 2, 1), end=dtm(2024, 3, 1))
    r = plan_report(df)
    # the child's dt bounds reach the PARENT's scan: row-group pushdown —
    # Catalyst does the reference's CTE-rewrite pushdown for free
    assert any("dt" in f for f in r["pushed_filters"])
    assert df.count() == 1
