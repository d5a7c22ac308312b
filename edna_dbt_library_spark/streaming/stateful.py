"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming, but its MERGE-recency semantics
(incremental_partition_merge.sql:116-119) have a natural continuous form:
keep per-key state and emit only rows that advance it. Two operators:

* ``stream_dedup_by_key`` — emit the FIRST row seen per key, suppress
  replays (streaming exact dedup; the state is one flag per key).
* ``stream_latest_by_key`` — emit a row only when its event_time is
  strictly newer than the stored one (the streaming form of the
  ``S.ev > T.ev`` recency update).

State is per-key and partitioned by Spark's state store — memory scales
with distinct keys per watermark horizon, not stream length. Arrow batches
carry the rows; the python state handle holds one tuple per key.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def stream_dedup_by_key(grouped_df, output_schema: T.StructType):
    """Apply to ``stream.groupBy(key_cols)``: emits each key's first-seen
    row, drops subsequent ones. ``output_schema`` must match the input row
    schema."""

    def fn(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        first = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = pdf.iloc[[0]]
        if first is not None:
            state.update((True,))
            yield first

    return grouped_df.applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType=T.StructType([T.StructField("seen", T.BooleanType())]),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_latest_by_key(grouped_df, output_schema: T.StructType, ts_col: str):
    """Apply to ``stream.groupBy(key_cols)``: emits a row only when its
    ``ts_col`` strictly advances the per-key high-water mark — the
    continuous MERGE-recency rule."""

    def fn(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        high = state.get[0] if state.exists else None
        out = []
        for pdf in pdfs:
            for _, row in pdf.sort_values(ts_col).iterrows():
                ts_us = int(row[ts_col].value // 1000)  # pandas ns -> us
                if high is None or ts_us > high:
                    high = ts_us
                    out.append(row)
        if out:
            state.update((high,))
            yield pd.DataFrame(out)

    return grouped_df.applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType=T.StructType([T.StructField("high_us", T.LongType())]),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
