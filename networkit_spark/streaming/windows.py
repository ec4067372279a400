"""Event-time windowed aggregation with watermarked late-data bounds
(SURVEY §1.1 streaming model; round brief: "watermarks + windowed aggs
for late data").

The same declarative program runs in BATCH mode (full history, the shape
the DuckDB oracle checks) and in STREAMING mode (`readStream` input +
`watermark=` for state eviction): `F.window` event-time bucketing is
engine-native in both, so correctness is pinned once in batch and the
streaming run only adds the lateness bound.

Window alignment note: Spark's tumbling windows align to the 1970-01-01
epoch; DuckDB's `time_bucket` aligns to 2000-01-01 for sub-month widths.
Both instants are midnight-aligned, so any width dividing 24h (the only
widths used here) produces identical buckets — the oracle relies on this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = None,
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """(win_start, win_end, *keys, n, total): event counts + value sums per
    event-time window (tumbling, or sliding when `slide` is given).

    `watermark`: pass a delay ("30 minutes") on streaming input — windows
    older than max(event time) − delay are finalized and their state
    evicted; late rows beyond the bound are dropped (Structured Streaming
    append-mode semantics). Batch input ignores the watermark, as Spark
    defines."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    return (
        df.groupBy(win.alias("win"), *[F.col(k) for k in keys])
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(value_col).alias("total"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *keys,
            "n",
            "total",
        )
    )
