"""Custom stateful streaming operators via applyInPandasWithState
(round brief: "applyInPandasWithState for custom stateful operators").

sessionize_stream maintains one open session per key across micro-batches
in Arrow-backed group state: each batch's events for a key either extend
the open session (gap not exceeded) or close it and open a new one. The
operator emits, per batch, every session the batch touched — closed ones
finally, the open one as a snapshot (open=true) — so a downstream
last-write-wins consumer (or the memory sink's update stream) converges to
the exact session set. Deterministic: NoTimeout (no wall-clock), events
sorted by event time inside the handler, state is a pure fold of them.

The batch-mode twin of this operator is the lag/lead sessionization the
driver already gates (events_sessions) — this is the streaming shape of
the same computation, with O(1) state per key instead of a full-history
window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

OUT_SCHEMA = (
    "key long, session_start timestamp, session_end timestamp, "
    "n long, open boolean"
)
STATE_SCHEMA = "start_us long, end_us long, n long"


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """(key, session_start, session_end, n, open) — session windows per
    key with inactivity gap `gap_seconds`, state carried across
    micro-batches. Use outputMode("update") on the sink."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = int(gap_seconds) * 1_000_000

    def handle(key, pdf_iter, state):
        import pandas as pd

        ts_us: list[int] = []
        for pdf in pdf_iter:
            ts_us.extend(int(t) // 1000 for t in pdf[ts_col].astype("int64"))

        # interval merge over {batch events} ∪ {carried open session}: sort
        # by start, fuse whenever the next start is within gap of the open
        # end. Handles out-of-order arrival across micro-batches — an event
        # EARLIER than the carried session's start (but within gap) extends
        # the session backwards (session_start = min), and early stragglers
        # beyond the gap become their own closed sessions. The last merged
        # interval stays open. NOTE: a backward extension re-emits the open
        # session under its new (earlier) session_start; the prior snapshot
        # row keyed on the old start is superseded — exactly how Spark's
        # own session_window merges redefine window identity.
        items = [[t, t, 1] for t in ts_us]
        if state.exists:
            items.append(list(state.get))
        items.sort()
        merged: list[list[int]] = []
        for iv in items:
            if merged and iv[0] <= merged[-1][1] + gap_us:
                merged[-1][1] = max(merged[-1][1], iv[1])
                merged[-1][2] += iv[2]
            else:
                merged.append(list(iv))
        closed = merged[:-1]
        cur = merged[-1]
        state.update((cur[0], cur[1], cur[2]))

        rows = [(c, False) for c in closed] + [(cur, True)]
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(rows),
                "session_start": [
                    pd.Timestamp(c[0] * 1000, unit="ns") for c, _ in rows
                ],
                "session_end": [
                    pd.Timestamp(c[1] * 1000, unit="ns") for c, _ in rows
                ],
                "n": [c[2] for c, _ in rows],
                "open": [o for _, o in rows],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        handle,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
