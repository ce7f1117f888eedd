"""Stream-stream interval join (Structured Streaming operator class the
batch as-of join in ``plans/advanced_joins`` replaces offline; this is the
online variant — beyond-reference scope, SURVEY.md §2.9 north star).

Shape: two streams over the same events source, split by type —
purchases joined to clicks by the same user within a bounded look-back
interval. Both sides carry watermarks and the join condition carries the
time bound, so Spark can expire state: click state is held only
``LOOKBACK + watermark`` long (the documented requirement for
stream-stream inner joins with one-sided intervals).

At scale: state is partitioned by ``user_id`` in the state store; the
watermark horizon bounds it regardless of stream length. Without the time
bound in the join condition Spark would (correctly) refuse unbounded
state growth for append output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Look-back: a click attributes to a purchase up to this long after it.
LOOKBACK_MINUTES = 10


def stream_click_purchase_join(events: DataFrame) -> DataFrame:
    """Purchases inner-joined to clicks by the same user with
    ``purchase.ts - 10min <= click.ts <= purchase.ts`` (interval join).

    Input: a streaming events frame (``stream_events_source``). Output is
    append-mode-safe: both sides are watermarked and the interval bounds
    click-side state.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("purchase_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    return purchases.join(
        clicks,
        (F.col("purchase_user") == F.col("click_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {LOOKBACK_MINUTES} MINUTES")
        ),
        "inner",
    ).select(
        "purchase_id",
        F.col("purchase_user").alias("user_id"),
        "purchase_ts",
        "purchase_value",
        "click_id",
        "click_ts",
    )


def click_purchase_join_batch(events: DataFrame) -> DataFrame:
    """Batch twin of :func:`stream_click_purchase_join` — identical
    semantics on a static frame, used as the streaming test oracle."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("purchase_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return purchases.join(
        clicks,
        (F.col("purchase_user") == F.col("click_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {LOOKBACK_MINUTES} MINUTES")
        ),
        "inner",
    ).select(
        "purchase_id",
        F.col("purchase_user").alias("user_id"),
        "purchase_ts",
        "purchase_value",
        "click_id",
        "click_ts",
    )


def stream_enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    stream_key: str,
    dim_key: str,
    dim_cols: list[str],
) -> DataFrame:
    """Stream-static dimension enrichment: the streaming twin of the
    silver-layer snowflake joins (J1-J3) — each micro-batch inner-joins
    the (static, broadcastable) dimension snapshot.

    Stream-static joins need NO watermark and hold NO state: the static
    side is re-planned per micro-batch, so a dim refresh (overwrite by
    the batch pipeline) is picked up on the next trigger — the standard
    slowly-refreshing-dimension pattern. At scale the dim broadcasts
    (or AQE picks SMJ for a huge one); the stream side never shuffles
    for a broadcast join.
    """
    d = dim.select(
        F.col(dim_key).alias("__dk"), *[F.col(c) for c in dim_cols]
    )
    return stream.join(
        F.broadcast(d), stream[stream_key] == F.col("__dk"), "inner"
    ).drop("__dk")
