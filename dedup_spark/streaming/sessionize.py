"""Event-time sessionization — the custom-stateful-operator tier.

Gap-based sessions (a new session starts when a user is idle longer
than ``gap``) need per-key state that outlives a micro-batch and an
event-time timeout to close the final session of a burst — semantics
no built-in streaming aggregate expresses. This is the canonical
``applyInPandasWithState`` shape: Arrow-batched per-group pandas,
state one tuple per OPEN session (start, end, count) — O(active keys),
not O(events) — and ``GroupStateTimeout.EventTimeTimeout`` so idle
sessions flush exactly when the watermark passes last_event + gap.

Scale contract: state is bounded by concurrently-active users inside
one gap horizon; sessions that close *within* a batch are emitted
immediately and never touch state. The group shuffle partitions by
user key, so a 10^12-event stream distributes by user cardinality —
the same partitioning a batch sessionization (SQL islands, the oracle
in __spark_entry__.py) would shuffle on anyway, minus re-reading
history every run.

Complementary tiers in this module's package: incremental.py's
foreachBatch state TABLE (unbounded exact memory) and
dedup_within_watermark (bounded in-flight dedup). Sessionization shows
the third pattern: arbitrary per-key streaming state in Python.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id bigint, session_start_us bigint, session_end_us bigint, "
    "n_events bigint"
)
_STATE_SCHEMA = "start_us bigint, end_us bigint, n bigint"


def _micros(series: pd.Series) -> "pd.Series":
    """Event-time column → int64 epoch micros (tz-naive ns under a
    pinned-UTC session, or tz-aware — both collapse to the instant)."""
    vals = series
    if getattr(vals.dtype, "tz", None) is not None:
        vals = vals.dt.tz_convert("UTC").dt.tz_localize(None)
    return vals.astype("datetime64[ns]").astype("int64") // 1_000


def sessionize(
    stream_df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "12 hours",
    delay: str = "1 hour",
) -> DataFrame:
    """Gap-based event-time sessionization of a stream: one output row
    per CLOSED session ``(user_id, session_start_us, session_end_us,
    n_events)``. A session closes either inside a batch (a later event
    of the same user is > gap away — emitted immediately) or by
    event-time timeout (watermark passes last_event + gap). Equivalent
    by construction to the batch SQL islands computation when events
    arrive in event-time order (the replay harness guarantees that;
    out-of-order arrival within the watermark still merges correctly
    because each batch is sorted before folding into state)."""
    gap_us = int(pd.Timedelta(gap).value // 1_000)

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user = key[0]

        def rows(sessions):
            return pd.DataFrame(
                {
                    "user_id": pd.Series([user] * len(sessions), dtype="int64"),
                    "session_start_us": pd.Series(
                        [s[0] for s in sessions], dtype="int64"
                    ),
                    "session_end_us": pd.Series(
                        [s[1] for s in sessions], dtype="int64"
                    ),
                    "n_events": pd.Series([s[2] for s in sessions], dtype="int64"),
                }
            )

        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield rows([(start, end, n)])
            return

        import numpy as np

        ts = []
        for pdf in pdfs:
            ts.append(_micros(pdf[ts_col]))
        ts = np.sort(pd.concat(ts).to_numpy())
        open_sess = state.get if state.exists else None
        if len(ts) == 0:  # defensive: nothing to fold, keep state as-is
            if open_sess is not None:
                state.update(tuple(open_sess))
                state.setTimeoutTimestamp(
                    open_sess[1] // 1_000 + gap_us // 1_000
                )
            return

        # vectorized islands: a session boundary wherever the idle gap
        # exceeds gap_us (no per-event Python)
        bounds = np.flatnonzero(np.diff(ts) > gap_us) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(ts)]))
        islands = [
            (int(ts[s]), int(ts[e - 1]), int(e - s))
            for s, e in zip(starts, ends)
        ]

        closed = []
        if open_sess is not None:
            # fold the open session into the batch islands as one more
            # interval and re-merge: out-of-order events within the
            # watermark may land BEFORE the open session (or bridge two
            # batch islands through it), so session_end must never
            # regress — interval min/max, not blind concatenation.
            # Batch islands are mutually > gap apart, so only merges
            # involving the open interval can chain.
            merged: list[list[int]] = []
            for s, e, n in sorted(islands + [tuple(open_sess)]):
                if merged and s - merged[-1][1] <= gap_us:
                    merged[-1][0] = min(merged[-1][0], s)
                    merged[-1][1] = max(merged[-1][1], e)
                    merged[-1][2] += n
                else:
                    merged.append([s, e, n])
            islands = [tuple(x) for x in merged]
        closed.extend(islands[:-1])
        open_sess = islands[-1]

        state.update(open_sess)
        # close the trailing session when the watermark passes its gap
        state.setTimeoutTimestamp(open_sess[1] // 1_000 + gap_us // 1_000)
        if closed:
            yield rows(closed)

    return (
        stream_df.withWatermark(ts_col, delay)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
