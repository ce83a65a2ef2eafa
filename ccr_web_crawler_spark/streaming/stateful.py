"""Stateful streaming operators (Structured Streaming,
``applyInPandasWithState``).

The batch crawl enforces per-host politeness budgets per round
(``operators/politeness.py``, reference delay loop
``crawler/discovery.py:203``). In a streaming frontier the same quota
must hold ACROSS micro-batches — which needs keyed state Spark's
built-in windowed aggregates can't express: a per-host cumulative
admitted count that survives from trigger to trigger. This module is
the ``applyInPandasWithState`` form of that operator.

Scale shape: state per key is ONE bigint (the cumulative count) — no
row buffering, so state size is O(distinct hosts), not O(urls); the
grouping shuffle is the same host-keyed exchange the batch admit pays.
Hot hosts are bounded by the cap itself: once a host exhausts its
budget the group function drops its rows in O(batch) without sorting.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ADMIT_OUT_SCHEMA = (
    "host string, url_canon string, depth int, seq long, admit_no long"
)
_STATE_SCHEMA = "admitted long"


def admit_stream(
    frontier: DataFrame,
    max_per_host: int = 100,
    output_schema: str = ADMIT_OUT_SCHEMA,
) -> DataFrame:
    """Streaming per-host admission: each host may emit at most
    ``max_per_host`` urls over the LIFETIME of the stream, in
    (depth, seq) order within each micro-batch; later batches resume
    from the persisted count. Emitted rows carry ``admit_no`` — the
    host-scoped cumulative admit index (1-based), the streaming analog
    of the batch admit window's row_number.

    Also accepts a BATCH DataFrame (``applyInPandasWithState`` rejects
    batch plans, so the batch path runs the identical per-group logic
    through plain ``applyInPandas`` with zero initial state — i.e. one
    micro-batch of the stream). The batch form is SQL-expressible
    (windowed row_number ≤ cap) and oracle-checked by the driver's
    ``admit_stream`` CORRECTNESS entry; the cross-batch state carry is
    pinned in tests/test_streaming_stateful.py.
    """

    def _admit_chunks(
        pdfs: Iterator[pd.DataFrame], admitted: int
    ) -> tuple[pd.DataFrame | None, int]:
        remaining = max_per_host - admitted
        # the group's rows arrive as Arrow-batch chunks; keep only the
        # best `remaining` by (depth, seq) across chunks — bounded
        # memory O(cap + chunk), never O(group), so a hot host's
        # million-row batch streams through without materializing
        best: pd.DataFrame | None = None
        if remaining > 0:
            for pdf in pdfs:
                chunk = pdf[["host", "url_canon", "depth", "seq"]]
                best = chunk if best is None else pd.concat([best, chunk])
                best = best.sort_values(["depth", "seq"]).head(remaining)
        if best is None or not len(best):
            return None, admitted
        out = best.sort_values(["depth", "seq"]).copy()
        out["admit_no"] = range(admitted + 1, admitted + len(out) + 1)
        return out, admitted + len(out)

    def admit(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (admitted,) = state.get if state.exists else (0,)
        out, admitted = _admit_chunks(pdfs, admitted)
        if out is not None:
            yield out
        state.update((admitted,))

    if frontier.isStreaming:
        return frontier.groupBy("host").applyInPandasWithState(
            admit,
            outputStructType=output_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def admit_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        out, _ = _admit_chunks(iter([pdf]), 0)
        if out is None:
            return pd.DataFrame(
                {"host": [], "url_canon": [], "depth": [], "seq": [], "admit_no": []}
            )
        return out

    return frontier.groupBy("host").applyInPandas(admit_batch, schema=output_schema)
