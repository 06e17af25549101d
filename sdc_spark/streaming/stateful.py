"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming at all; this is the extension point for
operators Spark's built-in windowed aggregates can't express — running
per-key state machines (EMA, anomaly flags, session enrichment).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EMA_OUTPUT_SCHEMA = "user_id long, n_seen long, ema double"
EMA_STATE_SCHEMA = "n_seen long, ema double"


def _ema_fn(alpha: float):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n_seen, ema = state.get
        else:
            n_seen, ema = 0, None
        for pdf in pdfs:
            for v in pdf.sort_values("ts")["value"]:
                ema = float(v) if ema is None else alpha * float(v) + (1 - alpha) * ema
                n_seen += 1
        state.update((n_seen, ema))
        yield pd.DataFrame({"user_id": [user_id], "n_seen": [n_seen], "ema": [ema]})

    return fn


def running_ema(
    stream: DataFrame, alpha: float = 0.2, keys: Sequence[str] = ("user_id",)
) -> DataFrame:
    """Per-key exponential moving average with persistent state — emits the
    updated (n_seen, ema) per key per micro-batch."""
    return stream.groupBy(*keys).applyInPandasWithState(
        _ema_fn(alpha),
        outputStructType=EMA_OUTPUT_SCHEMA,
        stateStructType=EMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
