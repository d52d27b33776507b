"""Custom stateful streaming operator via applyInPandasWithState.

Built-in stateful operators cover sessions and dedup (streaming/sessions.py);
this is the escape hatch for semantics Spark doesn't ship: an arbitrary
per-key running aggregate whose state lives in the engine's checkpointed
state store. The example operator maintains per-user lifetime event count /
mean value across micro-batches AND across query restarts (state is part of
the checkpoint) — the per-entity profile builder every training-data
pipeline grows eventually.

Kernel contract: Arrow-batched pandas per key group, engine-managed
GroupState, update output mode. No per-row Python."""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id bigint, n bigint, total double, mean double"
STATE_SCHEMA = "n bigint, total double"


def _update_user_stats(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n": [n],
            "total": [total],
            "mean": [total / n if n else 0.0],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user lifetime (count, total, mean) over a STREAMING events frame;
    one updated row per user per micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
