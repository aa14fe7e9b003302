"""Custom stateful streaming operators via ``applyInPandasWithState``.

EXT surface (SURVEY.md §2.3 / M5): when windowed aggregation can't
express the semantics (running per-key accumulators, custom eviction,
cross-batch counters), Structured Streaming's arbitrary-state operator
is the escape hatch — the streaming analog of the batch Pandas-UDF
path. State is a per-key tuple the engine checkpoints; each micro-batch
delivers that key's new rows as Arrow batches.

The operator here is a per-user running profile: cumulative event
count, value sum, and last-seen timestamp, emitted once per micro-batch
the key appears in (update mode).

Timeout policy: ``NoTimeout``. A ProcessingTimeTimeout would let idle
keys be evicted (the custom-code twin of ``session_window``'s gap
close), but it also makes the scheduler run micro-batches continuously
to fire timers — so ``processAllAvailable``-style deterministic drains
never settle. Event-time idleness is instead decided by the caller
(e.g. a downstream filter on ``last_ts``); wall-clock eviction belongs
to long-running deployments, where the timer cost is amortized.

Scale notes: state is partitioned by key across executors (the shuffle
is on ``user_id``); per-key state is O(1) — no event retention — so
state size is bounded by live-key cardinality, not stream length.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id LONG, n_events LONG, sum_value DOUBLE, last_ts TIMESTAMP"
STATE_SCHEMA = "n LONG, total DOUBLE, last_ts TIMESTAMP"


def _update_profile(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into running state."""
    (user_id,) = key
    n, total, last_ts = state.get if state.exists else (0, 0.0, None)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    state.update((n, total, last_ts))
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "sum_value": total, "last_ts": last_ts}]
    )


def user_profile_stream(events_stream: DataFrame) -> DataFrame:
    """events stream → per-user running profile (update mode).

    ``events_stream`` needs (user_id, ts, value) columns — e.g.
    ``streaming.windows._events_stream`` or any readStream source.
    """
    return (
        events_stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- transformWithStateInPandas (the Spark 4 arbitrary-state API) ------------
#
# The successor to applyInPandasWithState: named state variables on a
# handle, per-key timers, and composable state types (value/list/map)
# instead of one monolithic tuple. The operator below is the same
# running per-user profile as _update_profile, so the two APIs are
# directly comparable — and over a single-batch drain of static fixture
# data the emitted totals equal the batch groupBy, giving the new API a
# full value oracle too.

try:  # pragma: no cover - import surface differs across 4.x minors
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _ProfileProcessor(StatefulProcessor):
        """ValueState-backed running (count, sum) per user."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n LONG, total DOUBLE")

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, total = self._agg.get() if self._agg.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._agg.update((n, total))
            yield pd.DataFrame(
                [{"user_id": key[0], "n_events": n, "sum_value": round(total, 2)}]
            )

        def close(self) -> None:
            pass

    def user_profile_tws(events_stream: DataFrame) -> DataFrame:
        """events stream → per-user running (count, sum) via
        ``transformWithStateInPandas`` (update mode)."""
        return (
            events_stream.select("user_id", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(
                _ProfileProcessor(),
                outputStructType="user_id LONG, n_events LONG, sum_value DOUBLE",
                outputMode="Update",
                timeMode="None",
            )
        )

    HAS_TWS = True
except ImportError:  # pragma: no cover
    HAS_TWS = False
