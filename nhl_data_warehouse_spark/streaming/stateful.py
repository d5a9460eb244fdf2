"""Custom stateful streaming operators (``applyInPandasWithState``).

``session_window``/tumbling windows cover the declarative stateful
shapes (``streaming/windows.py``); this module is the escape hatch for
state machines Spark's built-ins can't express — running per-key
accumulators that survive across micro-batches, emit on every update,
and expire via timeouts.

Scale notes: state lives partitioned by the grouping key in the state
store (RocksDB-backed on a real cluster — set
``spark.sql.streaming.stateStore.providerClass``); each micro-batch
shuffles only that batch's rows to their key's partition. Arrow
batches bound Python-side memory exactly like ``mapInPandas``.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

RUNNING_TOTALS_SCHEMA = "user_id long, n_events long, sum_value double"
_STATE_SCHEMA = "n long, s double"


def running_user_totals(events: DataFrame, timeout: str = "NoTimeout") -> DataFrame:
    """Per-user lifetime event count + value sum, updated every
    micro-batch — the canonical custom-state shape (a feature-store
    style running profile). Input must be a *streaming* DataFrame with
    ``user_id`` and ``value`` columns.

    State is one (n, s) pair per user: O(|users|) total, independent
    of stream length. ``timeout="ProcessingTimeTimeout"`` plus a
    ``state.setTimeoutDuration`` call inside would expire idle users —
    kept ``NoTimeout`` here so results are deterministic for tests.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum()) if len(pdf) else 0.0
        state.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )
