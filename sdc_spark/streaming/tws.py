"""Stateful streaming on Spark 4's transformWithStateInPandas API.

applyInPandasWithState (stateful.py) carries one opaque state tuple per
key; transformWithState is its successor — typed, composable state
primitives (ValueState/ListState/MapState) plus first-class timers, backed
by the RocksDB state store. This module ports the natural first operator
to it: a per-key running top-k + count, the streaming twin of the batch
top-k-per-group query.

Scale shape: state per key is O(k) doubles + one long — a billion keys at
k=3 is ~40 GB of RocksDB across the cluster, far below the executor-local
SSD budget the state store is designed for. Input rows stream through
Arrow batches; nothing is collected.

Requires spark.sql.streaming.stateStore.providerClass =
RocksDBStateStoreProvider (transformWithState does not run on the default
HDFS-backed provider) and the python `protobuf` package (the TWS driver
worker speaks protobuf to the JVM). `tws_available()` reports whether the
current environment can run it; the batch twin runs everywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

TOPK_OUTPUT_SCHEMA = "user_id long, n_seen long, topk array<double>"

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_available() -> bool:
    """True when the transformWithState runtime deps are importable."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class TopKProcessor(StatefulProcessor):
    """Keeps the k largest `value`s ever seen per key and the total count.

    State: ValueState("n", long) + ListState("topk", double). The list is
    rewritten each batch (k elements — constant-size put)."""

    def __init__(self, k: int = 3) -> None:
        self._k = k

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._n = handle.getValueState("n", "n long")
        self._topk = handle.getListState("topk", "v double")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n = self._n.get()[0] if self._n.exists() else 0
        cur = [r[0] for r in self._topk.get()] if n else []
        for pdf in rows:
            vals = pdf["value"].tolist()
            n += len(vals)
            cur = sorted(cur + [float(v) for v in vals], reverse=True)[: self._k]
        self._n.update((n,))
        self._topk.put([(v,) for v in cur])
        yield pd.DataFrame(
            {"user_id": [user_id], "n_seen": [n], "topk": [cur]}
        )


def running_topk(stream: DataFrame, k: int = 3) -> DataFrame:
    """Per-user running top-k of `value` — emits the refreshed (n_seen,
    topk) row for every key touched by the micro-batch."""
    return stream.groupBy("user_id").transformWithStateInPandas(
        TopKProcessor(k),
        outputStructType=TOPK_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def running_topk_batch(df: DataFrame, k: int = 3) -> DataFrame:
    """Batch twin: the same (user_id, n_seen, topk) via one aggregate —
    what the stream converges to after all input is consumed."""
    return df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_seen"),
        F.slice(F.reverse(F.array_sort(F.collect_list("value"))), 1, k).alias("topk"),
    )
