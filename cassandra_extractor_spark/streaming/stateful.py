"""Custom stateful operators.

Sessionization — the canonical custom stateful op the reference has no
analogue for, included because real event-extraction pipelines need it:

- ``sessionize`` (batch): lag/cumsum window formulation — one
  shuffle+sort per key, linear, oracle-checkable, the 100 TB path for
  backfills.
- ``sessionize_stream`` (streaming): ``applyInPandasWithState`` with a
  processing-time timeout — the same fold over an unbounded stream,
  state = open session per user, flushed on timeout (see the function
  docstring for the event-time trade-off).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F, types as T

SESSION_GAP_MIN = 30

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_ms", T.LongType()),
        T.StructField("session_end_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize(df: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Batch sessionization: session breaks where the gap to the
    previous event exceeds ``gap_min`` minutes."""
    gap_ms = gap_min * 60 * 1000
    ts_ms = F.unix_millis(F.col("ts"))
    # order by the truncated ms value (not raw ts) so tie-breaks match
    # the oracle, which only sees epoch millis
    w = W.partitionBy("user_id").orderBy(ts_ms, "event_id")
    prev_ms = F.lag(ts_ms).over(w)
    is_new = F.when(
        prev_ms.isNull() | ((ts_ms - prev_ms) > gap_ms), F.lit(1)
    ).otherwise(F.lit(0))
    with_session = df.select(
        "user_id",
        ts_ms.alias("ts_ms"),
        F.sum(is_new).over(w).alias("session_id"),
    )
    return (
        with_session.groupBy("user_id", "session_id")
        .agg(
            F.min("ts_ms").alias("session_start_ms"),
            F.max("ts_ms").alias("session_end_ms"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "session_start_ms", "session_end_ms", "n_events")
    )


def ns_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_extractor_spark.sources.catalog import load_table

    return sessionize(load_table(spark, "events", sf_dir)).orderBy(
        "user_id", "session_start_ms"
    )


def _fold_key(
    user_id: int,
    ts_chunks: list[pd.Series],
    prior: tuple[int, int, int] | None,
    gap_ms: int,
) -> tuple[list[dict], tuple[int, int, int] | None]:
    """Pure per-key session fold over UNORDERED epoch-ms chunks.

    Concatenates all chunks and sorts the union once — per-chunk sorts
    would let an out-of-order later chunk move ``end_ms`` backwards or
    mis-split sessions.  The sort only covers ONE batch, so an event in
    a LATER micro-batch that is older than the open session's end takes
    the merge branch; the min/max clamps there keep the state invariant
    ``start_ms ≤ end_ms = max(seen)`` across batches (a plain
    ``end_ms = ts_ms`` would move the session end backwards).  A late
    event more than ``gap_ms`` older than the open session still merges
    rather than retro-splitting it — reconcile with the batch
    ``sessionize`` for exact event-time semantics.  Returns (closed
    sessions, open-session state).
    """
    start_ms = end_ms = None
    n = 0
    if prior is not None:
        start_ms, end_ms, n = prior
    out: list[dict] = []
    all_ts = (
        pd.concat(ts_chunks, ignore_index=True).sort_values() if ts_chunks else []
    )
    for ts_ms in all_ts:
        ts_ms = int(ts_ms)
        if start_ms is None:
            start_ms, end_ms, n = ts_ms, ts_ms, 1
        elif ts_ms - end_ms > gap_ms:
            out.append(
                {"user_id": user_id, "session_start_ms": start_ms, "session_end_ms": end_ms, "n_events": n}
            )
            start_ms, end_ms, n = ts_ms, ts_ms, 1
        else:
            # within-batch the sort guarantees ts_ms >= end_ms; the
            # clamps matter only for cross-batch late arrivals
            start_ms, end_ms, n = min(start_ms, ts_ms), max(end_ms, ts_ms), n + 1
    state = (start_ms, end_ms, n) if start_ms is not None else None
    return out, state


def sessionize_stream(events: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Streaming sessionization with per-user state + PROCESSING-time
    timeout.  Input must be a streaming frame with (user_id, ts).

    Trade-off (deliberate): the 60 s processing-time timeout flushes an
    open session when no batch for that user arrives for 60 s of wall
    clock — an event delayed longer than that lands in a NEW session,
    diverging from the batch ``sessionize`` result.  Event-time
    correctness would need ``EventTimeTimeout`` + a watermark ≥ the
    session gap, which delays every emission by the gap (30 min);
    extraction pipelines prefer the fast flush.  Re-running the batch
    ``sessionize`` over the landed data reconciles exactly.
    """
    gap_ms = gap_min * 60 * 1000

    def update(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_ms, end_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": user_id, "session_start_ms": start_ms, "session_end_ms": end_ms, "n_events": n}]
            )
            return
        prior = tuple(state.get) if state.exists else None
        chunks = [pdf["ts"].astype("int64") // 10**6 for pdf in pdf_iter]
        out, new_state = _fold_key(user_id, chunks, prior, gap_ms)
        if new_state is not None:
            state.update(new_state)
            state.setTimeoutDuration(60_000)
        yield pd.DataFrame(out)

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="ProcessingTimeTimeout",
    )


def stream_dedup(stream: DataFrame, fp_col: str = "fp") -> DataFrame:
    """Streaming cross-batch exact dedup: emit each fingerprint's FIRST
    occurrence across the whole stream, suppress every later one — the
    streaming counterpart of ``ns_dedup_exact`` for continuously-
    ingested corpora (state = seen fingerprint set, maintained by
    Spark's streaming aggregation state store, persisted in the
    checkpoint so dedup survives restarts).

    Spark-first: this is the built-in ``dropDuplicates`` on an
    unbounded stream — no custom state code; the state store shards by
    fingerprint hash, so it scales horizontally like any keyed state.
    UNBOUNDED state caveat: without a watermark the seen-set grows
    forever.  For corpus dedup that is the SEMANTICS (a year-old dup is
    still a dup); bound memory by fingerprinting (16-byte md5 keys),
    RocksDB state store at production scale, or pass an event-time
    ``watermark``-ed stream and use ``within_watermark=True`` to dedup
    only within the lateness horizon (bounded state, the CDC shape).
    """
    return stream.dropDuplicates([fp_col])


def stream_dedup_within_watermark(
    stream: DataFrame, fp_col: str = "fp", ts_col: str = "ts", delay: str = "10 minutes"
) -> DataFrame:
    """Bounded-state variant: dedup only among rows whose event times
    fall within the watermark horizon (``dropDuplicatesWithinWatermark``
    — state for a fingerprint is dropped once the watermark passes it).
    The right shape when duplicates are caused by at-least-once
    delivery (CDC replays, producer retries) rather than true content
    duplication: state is O(horizon), not O(corpus)."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark([fp_col])


def stream_attribution_join(
    views: DataFrame,
    clicks: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    attribution_window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join — the attribution pattern:
    each click joins the view(s) by the same key that happened AT MOST
    ``attribution_window`` before it (and not after).

    This is Spark's built-in stream-stream join: both sides buffer in
    the state store; the time-range condition plus the watermarks give
    the engine a provable bound for evicting buffered rows, so state is
    O(window + lateness) per key — without the range condition the
    buffers grow forever and Spark rejects the query in append mode.
    The reference has no streaming joins at all (its workers are
    row-at-a-time); this is the capability a continuously-extracted
    event table needs for enrichment without a batch re-join.
    """
    v = views.select(
        F.col(key).alias("v_key"),
        F.col(ts_col).alias("view_ts"),
    ).withWatermark("view_ts", watermark)
    c = clicks.select(
        F.col(key).alias("c_key"),
        F.col(ts_col).alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    return v.join(
        c,
        F.expr(
            f"v_key = c_key AND click_ts >= view_ts "
            f"AND click_ts <= view_ts + INTERVAL {attribution_window}"
        ),
    ).select(
        F.col("v_key").alias(key),
        "view_ts",
        "click_ts",
        (F.unix_millis("click_ts") - F.unix_millis("view_ts")).alias("lag_ms"),
    )


ZSCORE_FRAME = 20  #: sliding frame length (matches batch q76)
ZSCORE_MIN_N = 10

_ZS_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("n_win", T.LongType()),
        T.StructField("s_win", T.LongType()),
        T.StructField("ss_win", T.LongType()),
        T.StructField("is_outlier", T.BooleanType()),
    ]
)

_ZS_STATE_SCHEMA = T.StructType(
    [T.StructField("vals", T.ArrayType(T.LongType()))]
)


def stream_zscore(events: DataFrame) -> DataFrame:
    """Streaming rolling z-score — the stateful-operator spelling of
    batch ``q76_rolling_zscore``: per-user state is the last
    ``ZSCORE_FRAME-1`` integerized values (a bounded ring, O(frame) per
    key forever), each event is flagged by the same cross-multiplied
    integer inequality, so on time-ordered arrival the streaming output
    is ROW-IDENTICAL to the batch operator (asserted in
    ``test_stream_zscore_matches_batch``).

    Out-of-order arrival *within* a batch is repaired by the one-batch
    sort below; an event arriving in a LATER batch than a newer one
    uses the state as-of its arrival (documented divergence — the same
    trade-off ``sessionize_stream`` makes; re-run the batch operator
    over landed data to reconcile exactly).
    """

    def update(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        vals: list[int] = list(state.get[0]) if state.exists else []
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        out = []
        for event_id, value in zip(pdf["event_id"], pdf["value"]):
            x = int(round(float(value) * 100))
            window = vals[-(ZSCORE_FRAME - 1) :] + [x]
            n = len(window)
            s = sum(window)
            ss = sum(v * v for v in window)
            out.append(
                {
                    "event_id": int(event_id),
                    "user_id": int(user_id),
                    "n_win": n,
                    "s_win": s,
                    "ss_win": ss,
                    "is_outlier": (n * x - s) ** 2 > 4 * (n * ss - s * s),
                }
            )
            vals = window
        state.update((vals[-(ZSCORE_FRAME - 1) :],))
        yield pd.DataFrame(
            [r for r in out if r["n_win"] >= ZSCORE_MIN_N],
            columns=["event_id", "user_id", "n_win", "s_win", "ss_win", "is_outlier"],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_ZS_OUT_SCHEMA,
        stateStructType=_ZS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def stream_time_rollup(
    events: DataFrame,
    bucket: str = "1 day",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming continuous aggregate — the live half of batch
    ``q90_time_rollup``: watermarked tumbling-window counts + cent sums
    per (window, event_type).  In append mode a window row is emitted
    exactly once, when the watermark closes it; the batch rollup over
    the same landed data reproduces every closed row
    (``test_streaming_windowed_agg_with_watermark``), which is what
    makes backfill + live serving from one definition coherent.

    State is one partial aggregate per open (window, type) — bounded
    by the watermark horizon, independent of stream length.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", bucket).alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
    )
