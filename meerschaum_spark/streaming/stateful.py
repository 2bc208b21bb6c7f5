"""Custom stateful streaming operators (``applyInPandasWithState``).

The batch engine's sessionization (queries.events_sessionization) and
dedup (W1) re-expressed as true streaming operators with cross-batch
state: per-key state lives in the state store, survives micro-batches,
and expires on processing-time timeout — the Structured-Streaming-native
replacement for the reference's re-fetch-the-backtrack-window loop.
"""

from __future__ import annotations

import datetime
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = ("user_id long, ts timestamp, session_id long, "
                         "n_in_session long")
SESSION_STATE_SCHEMA = "session_id long, last_ts_us long, n long"


def _sessionize_group(
    key: Tuple[Any],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_seconds: int,
    expire_state: bool,
    order_cols: list | None = None,
) -> Iterator[pd.DataFrame]:
    """Assign gap-based session ids to one user's rows, carrying
    (session_id, last_ts, count) across micro-batches in the state store."""
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        session_id, last_ts_us, n = state.get
    else:
        session_id, last_ts_us, n = 0, None, 0

    # mergesort = stable: with tie-break columns the within-batch order is
    # fully deterministic, matching the batch window's ORDER BY
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
        ["ts", *(order_cols or [])], kind="mergesort")
    import numpy as np

    # vectorized gap detection (a per-row Python loop costs ~5× here —
    # this function runs once per user per micro-batch over Arrow batches)
    ts_us = (rows["ts"].astype("datetime64[ns]").astype("int64")
             // 1000).to_numpy()
    gap_us = gap_seconds * 1_000_000
    k = len(ts_us)
    if k:
        new = np.zeros(k, dtype=bool)
        new[0] = last_ts_us is not None and ts_us[0] - last_ts_us > gap_us
        if k > 1:
            new[1:] = (ts_us[1:] - ts_us[:-1]) > gap_us
        sids = session_id + np.cumsum(new)
        idx = np.arange(k)
        last_new = np.maximum.accumulate(np.where(new, idx, -1))
        counts = np.where(last_new >= 0, idx - last_new + 1, idx + 1 + n)
        session_id = int(sids[-1])
        last_ts_us = int(ts_us[-1])
        n = int(counts[-1])
    else:
        sids = counts = np.array([], dtype="int64")

    state.update((session_id, last_ts_us, n))
    if expire_state:
        state.setTimeoutDuration(gap_seconds * 1000 * 10)
    yield pd.DataFrame({
        "user_id": key[0], "ts": rows["ts"].to_numpy(),
        "session_id": sids, "n_in_session": counts,
    })


def stateful_sessionize(
    stream_df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    expire_state: bool = False,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming gap-sessionizer: the batch window (lag + running sum)
    becomes per-key state; sessions stay open across micro-batches.

    ``expire_state=True`` adds a processing-time timeout at 10× the gap
    (for long-running ``processingTime`` triggers). Leave it off for
    ``availableNow`` backfills — pending timeouts keep scheduling wake-up
    micro-batches and the one-shot trigger never drains.

    ``order_cols`` adds tie-break columns to the within-batch event-time
    sort (stable mergesort), making session assignment deterministic under
    duplicate timestamps — required when the output must match the batch
    window's ``ORDER BY ts, event_id`` exactly."""
    from pyspark.sql import functions as F

    src = stream_df.select(F.col(user_col).alias("user_id"),
                           F.col(ts_col).alias("ts"),
                           *[F.col(c) for c in (order_cols or [])])

    def fn(key, pdfs, state):
        return _sessionize_group(key, pdfs, state, gap_seconds, expire_state,
                                 order_cols)

    timeout = (GroupStateTimeout.ProcessingTimeTimeout if expire_state
               else GroupStateTimeout.NoTimeout)
    return (src.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    ))


def streaming_dedup(
    stream_df: DataFrame,
    key_cols: list[str],
    ts_col: str | None = None,
    watermark: str = "1 day",
) -> DataFrame:
    """Exactly the pipe's index-key dedup on a stream: Spark's native
    watermarked dropDuplicates keeps per-key state bounded by the
    watermark — the streaming analogue of the backtrack window."""
    if ts_col is not None:
        return stream_df.withWatermark(ts_col, watermark) \
                        .dropDuplicates(key_cols)
    return stream_df.dropDuplicates(key_cols)


CDC_OUTPUT_SCHEMA = ("user_id long, last_ts timestamp, last_event_id long, "
                     "last_event_type string, last_value double, "
                     "n_changes long, n_deletes long, is_delete boolean")
CDC_STATE_SCHEMA = ("last_ts_us long, last_event_id long, "
                    "last_event_type string, last_value double, "
                    "n_changes long, n_deletes long, is_delete boolean")


def _cdc_group(
    key: Tuple[Any],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold one key's micro-batch rows into its latest-state snapshot.
    Only the lexicographically-largest (ts, event_id) row decides the
    snapshot values; counts accumulate across batches in state."""
    (user_id,) = key
    if state.exists:
        (ts_us, eid, etype, val, n, nd, isdel) = state.get
    else:
        ts_us, eid, etype, val, n, nd, isdel = -1, -1, None, None, 0, 0, False
    for pdf in pdfs:
        if not len(pdf):
            continue
        n += len(pdf)
        ops_del = (pdf["event_id"] % 17 == 0)
        nd += int(ops_del.sum())
        # the batch's last row by (ts, event_id)
        ordered = pdf.sort_values(["ts", "event_id"])
        last = ordered.iloc[-1]
        last_us = int(last["ts"].value) // 1000  # pandas ns → µs
        if (last_us, int(last["event_id"])) > (ts_us, eid):
            ts_us, eid = last_us, int(last["event_id"])
            # preserve SQL NULLs: Arrow hands pandas NaN/None for null
            # cells, and float()/str() would coin NaN / the string 'nan'
            # where the batch twin (and the shared oracle) emit NULL
            etype = (None if pd.isna(last["event_type"])
                     else str(last["event_type"]))
            val = (None if pd.isna(last["value"])
                   else float(last["value"]))
            isdel = bool(int(last["event_id"]) % 17 == 0)
    state.update((ts_us, eid, etype, val, n, nd, isdel))
    yield pd.DataFrame({
        "user_id": [user_id],
        "last_ts": [pd.Timestamp(ts_us, unit="us")],
        "last_event_id": [eid],
        "last_event_type": [etype],
        "last_value": [val],
        "n_changes": [n],
        "n_deletes": [nd],
        "is_delete": [isdel],
    })


def stateful_cdc_snapshot(
    stream_df: DataFrame,
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming CDC compaction: per-key latest-state snapshot with
    delete tombstones, held in the state store across micro-batches —
    the streaming twin of the batch ``events_cdc_snapshot`` query (the
    Debezium/Hudi upsert-view maintained continuously). Emits each
    key's refreshed snapshot every micro-batch; readers keep the
    highest-``n_changes`` row per key (monotonic across batches)."""
    from pyspark.sql import functions as F

    src = stream_df.select(
        F.col(key_col).alias("user_id"), "ts", "event_id",
        "event_type", "value")
    return (src.groupBy("user_id").applyInPandasWithState(
        _cdc_group,
        outputStructType=CDC_OUTPUT_SCHEMA,
        stateStructType=CDC_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    ))


EMA_OUTPUT_SCHEMA = "user_id long, n_events long, ema_scaled long"
EMA_STATE_SCHEMA = "ema long, n long"


def _ema_group(
    key: Tuple[Any],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold one key's micro-batch rows through the integer EWMA
    recurrence (S₁ = y₁; Sᵢ = ⌊(Sᵢ₋₁ + yᵢ)/2⌋), state carrying the
    running (ema, count) across batches. Python ints — the recurrence is
    exact, matching the batch twin and the shared recursive-CTE oracle
    bit-for-bit (batch boundaries must respect per-key ts order, the
    same contract the CDC/sessionize twins state)."""
    (user_id,) = key
    if state.exists:
        ema, n = state.get
    else:
        ema, n = None, 0
    rows = pd.concat(list(pdfs), ignore_index=True)
    if len(rows):
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        for y in rows["y"]:
            if pd.isna(y):
                # defensive: the source filters NULL measurements, but a
                # NaN here must not poison the integer fold
                continue
            y = int(y)
            ema = y if ema is None else (int(ema) + y) // 2
            n += 1
    state.update((int(ema) if ema is not None else None, int(n)))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n],
                        "ema_scaled": [ema]})


def stateful_ema(
    stream_df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming twin of ``events_ema_sequential``: the per-series
    integer EWMA recurrence maintained CONTINUOUSLY in the state store —
    per key the state is two longs, each micro-batch folds its rows in
    event order, and the emitted running (n, ema) is monotonic in n so
    readers keep the max-n row per key. The sequential-algorithm escape
    hatch (applyInPandas batch-side) carried over to unbounded data."""
    from pyspark.sql import functions as F

    # NULL measurements are excluded (same contract as the batch twin
    # and the shared oracle)
    src = stream_df.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("user_id"), F.col(ts_col).alias("ts"),
        "event_id",
        F.floor(F.col(value_col) * 1_000_000 + F.lit(0.5))
        .cast("long").alias("y"))
    return (src.groupBy("user_id").applyInPandasWithState(
        _ema_group,
        outputStructType=EMA_OUTPUT_SCHEMA,
        stateStructType=EMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    ))


CUSUM_OUTPUT_SCHEMA = ("user_id long, n_events long, s_pos long, "
                       "s_neg long, n_alarms long")
CUSUM_STATE_SCHEMA = "sp long, sn long, n long, alarms long"

#: reference target / allowance / alarm threshold in µ-scaled units.
#: UNLIKE the batch ``events_cusum_changepoint`` (whose target is the
#: per-series sample mean — a quantity only a bounded scan can know),
#: the streaming twin monitors deviation from a KNOWN reference value,
#: which is Page's original formulation and the only causally-computable
#: one on unbounded data. The oracle below uses the same constants.
STREAM_CUSUM_TARGET = 50_000_000
STREAM_CUSUM_K = 25_000_000
STREAM_CUSUM_H = 200_000_000


def _cusum_group(
    key: Tuple[Any],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold one key's micro-batch rows through the two-sided CUSUM
    recurrence with reset (sp = max(0, sp + y − T − K); sn symmetric;
    both reset to 0 after an alarm), state carrying (sp, sn, n, alarms)
    across batches. Python ints only — +/−/max, no division — so the
    fold is bit-exact against the recursive-CTE oracle regardless of
    how the stream slices the series into micro-batches (per-key ts
    order across batches is the same contract the EMA twin states)."""
    (user_id,) = key
    if state.exists:
        sp, sn, n, alarms = state.get
        sp, sn, n, alarms = int(sp), int(sn), int(n), int(alarms)
    else:
        sp = sn = n = alarms = 0
    rows = pd.concat(list(pdfs), ignore_index=True)
    if len(rows):
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        for y in rows["y"]:
            if pd.isna(y):
                continue
            y = int(y)
            sp = max(0, sp + y - STREAM_CUSUM_TARGET - STREAM_CUSUM_K)
            sn = max(0, sn + STREAM_CUSUM_TARGET - y - STREAM_CUSUM_K)
            n += 1
            if sp > STREAM_CUSUM_H or sn > STREAM_CUSUM_H:
                alarms += 1
                sp = sn = 0
    state.update((sp, sn, n, alarms))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n],
                        "s_pos": [sp], "s_neg": [sn],
                        "n_alarms": [alarms]})


def stateful_cusum(
    stream_df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming twin of the CUSUM change-point family: the per-series
    reset recurrence maintained CONTINUOUSLY in the state store — four
    longs of state per key, emissions monotonic in n so readers keep
    the max-n row per key."""
    from pyspark.sql import functions as F

    src = stream_df.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("user_id"), F.col(ts_col).alias("ts"),
        "event_id",
        F.floor(F.col(value_col) * 1_000_000 + F.lit(0.5))
        .cast("long").alias("y"))
    return (src.groupBy("user_id").applyInPandasWithState(
        _cusum_group,
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    ))


HOLT_OUTPUT_SCHEMA = ("user_id long, n_events long, level_scaled long, "
                      "trend_scaled long")
HOLT_STATE_SCHEMA = "l long, b long, n long"


def _holt_group(
    key: Tuple[Any],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold one key's micro-batch rows through Holt's linear-trend
    recurrence (α = β = 1/4, exact integer floor division — Python
    ``//`` floors, matching the batch twin and the shared oracle for
    NEGATIVE trends too), state carrying (level, trend, count)."""
    (user_id,) = key
    if state.exists:
        lv, tr, n = state.get
    else:
        lv, tr, n = None, 0, 0
    rows = pd.concat(list(pdfs), ignore_index=True)
    if len(rows):
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        for y in rows["y"]:
            if pd.isna(y):
                continue
            y = int(y)
            if lv is None:
                lv, tr = y, 0
            else:
                l_new = (y + 3 * (int(lv) + int(tr))) // 4
                tr = (l_new - int(lv) + 3 * int(tr)) // 4
                lv = l_new
            n += 1
    state.update((int(lv) if lv is not None else None, int(tr), int(n)))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n],
                        "level_scaled": [lv], "trend_scaled": [tr]})


def stateful_holt(
    stream_df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming twin of ``events_holt_linear``: the two-variable Holt
    recurrence maintained CONTINUOUSLY in the state store — three longs
    of state per key, emissions monotonic in n so readers keep the
    max-n row per key."""
    from pyspark.sql import functions as F

    src = stream_df.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("user_id"), F.col(ts_col).alias("ts"),
        "event_id",
        F.floor(F.col(value_col) * 1_000_000 + F.lit(0.5))
        .cast("long").alias("y"))
    return (src.groupBy("user_id").applyInPandasWithState(
        _holt_group,
        outputStructType=HOLT_OUTPUT_SCHEMA,
        stateStructType=HOLT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    ))


HW_OUTPUT_SCHEMA = ("user_id long, n_events long, level_scaled long, "
                    "trend_scaled long, season_state array<long>")
HW_STATE_SCHEMA = "l long, b long, s array<long>, n long"


def _hw_group(
    key: Tuple[Any],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold one key's micro-batch rows through the Holt-Winters additive
    recurrence (α = β = γ = 1/4, hour-of-day m = 24, exact integer floor
    division — Python ``//`` floors, matching the batch twin and the
    shared recursive-CTE oracle for negative trend/season), state
    carrying (level, trend, 24-slot season list, count)."""
    (user_id,) = key
    if state.exists:
        lv, tr, season, n = state.get
        season = list(season)
    else:
        lv, tr, season, n = None, 0, [0] * 24, 0
    rows = pd.concat(list(pdfs), ignore_index=True)
    if len(rows):
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        for y, h in zip(rows["y"], rows["h"]):
            if pd.isna(y):
                continue
            y, h = int(y), int(h)
            if lv is None:
                lv, tr = y, 0
            else:
                so = season[h]
                l_new = (y - so + 3 * (int(lv) + int(tr))) // 4
                tr = (l_new - int(lv) + 3 * int(tr)) // 4
                season[h] = (y - l_new + 3 * so) // 4
                lv = l_new
            n += 1
    state.update((int(lv) if lv is not None else None, int(tr),
                  [int(x) for x in season], int(n)))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n],
                        "level_scaled": [lv], "trend_scaled": [tr],
                        "season_state": [[int(x) for x in season]]})


def stateful_holt_winters(
    stream_df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming twin of ``events_holt_winters``: the triple-exponential
    recurrence maintained CONTINUOUSLY in the state store — two longs +
    a 24-slot long array of state per key (the first array-typed state
    in the stateful family), emissions monotonic in n so readers keep
    the max-n row per key."""
    from pyspark.sql import functions as F

    src = stream_df.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("user_id"), F.col(ts_col).alias("ts"),
        "event_id",
        F.floor(F.col(value_col) * 1_000_000 + F.lit(0.5))
        .cast("long").alias("y"),
        F.hour(ts_col).cast("long").alias("h"))
    return (src.groupBy("user_id").applyInPandasWithState(
        _hw_group,
        outputStructType=HW_OUTPUT_SCHEMA,
        stateStructType=HW_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    ))
