"""Custom stateful streaming: applyInPandasWithState.

Capability extension (the reference has no streaming state at all —
SURVEY.md §2.11). Running per-key aggregates whose logic doesn't fit
the built-in windowed operators go through
``applyInPandasWithState``: Spark shuffles rows to their key's
partition, hands each key's micro-batch slice plus its persisted state
to a pandas function, and checkpoints the returned state.

State-size posture at scale: state is one small tuple per key, stored
in the state store (RocksDB-backed on clusters); `GroupStateTimeout`
reaps idle keys so unbounded key spaces (user ids) don't grow state
forever.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# output: one row per (key, batch) with the running totals so far
RUNNING_TOTALS_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
_STATE_SCHEMA = "n bigint, s double"


def _update_running_totals(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into persisted state."""
    (user_id,) = key
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "sum_value": [s]})


def running_totals_per_user(events: DataFrame) -> DataFrame:
    """Running (n_events, sum_value) per user across micro-batches.

    `events` must be a streaming DataFrame with `user_id` and `value`
    columns. Emits the updated running totals for every user seen in
    each micro-batch (update semantics).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
