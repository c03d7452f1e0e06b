"""Streaming top-k heavy hitters — Space-Saving state per group.

The batch side of this engine already ships the heavy-hitter family
(``ns_heavy_hitters``: CMS-pruned exact counts; ``ns_cms_estimate``);
this is the LIVE half: per-key state is a bounded Space-Saving summary
(Metwally et al., "Efficient computation of frequent and top-k
elements in data streams") — at most ``capacity`` (item, count,
error) counters per group key, folded per micro-batch, surviving
checkpoint restarts exactly like ``stream_hll_distinct``'s registers.

Guarantees carried by the summary (asserted in
``tests/test_topk_stream.py``):

- ``est ≥ true ≥ est − err`` for every tracked item;
- any item with true frequency > n_seen/capacity is tracked;
- with ``capacity ≥`` the number of distinct items, every count is
  EXACT (err = 0) and equals the batch groupBy count — the
  batch-parity contract.

Reference parity: the reference has no streaming analytics at all
(SURVEY §2.5); this operator exists for the training-data-pipeline
surface (live vocabulary/domain monitoring over an unbounded extract).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

TOPK_CAPACITY = 32

_TK_OUT_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType()),
        T.StructField("item", T.StringType()),
        T.StructField("est", T.LongType()),
        T.StructField("err", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)

_TK_STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("errors", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
    ]
)


def _space_saving_fold(
    counters: dict[str, list[int]], items, capacity: int
) -> None:
    """Classic Space-Saving update, in place: counters[item] =
    [count, error]."""
    for it in items:
        if it in counters:
            counters[it][0] += 1
        elif len(counters) < capacity:
            counters[it] = [1, 0]
        else:
            victim = min(counters, key=lambda k: counters[k][0])
            vcount = counters[victim][0]
            del counters[victim]
            # inherit the victim's count as the new item's error bound
            counters[it] = [vcount + 1, vcount]


def stream_topk(
    events: DataFrame,
    key_col: str = "event_type",
    item_col: str = "user_id",
    capacity: int = TOPK_CAPACITY,
) -> DataFrame:
    """Streaming per-key top-k summary with bounded state.

    Emits every tracked counter each micro-batch (≤ ``capacity`` rows
    per key, descending est) — the consumer takes the head it wants.
    State is O(capacity) per key FOREVER; the per-batch fold is the
    textbook Space-Saving update, so a key that concentrates (a
    crawler loop, a spam domain) is guaranteed to surface once its
    share exceeds 1/capacity.
    """

    def update(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        if state.exists:
            items, counts, errors, n_seen = (
                list(state.get[0]),
                list(state.get[1]),
                list(state.get[2]),
                int(state.get[3]),
            )
            counters = {
                it: [c, e] for it, c, e in zip(items, counts, errors)
            }
        else:
            counters, n_seen = {}, 0
        for pdf in pdf_iter:
            vals = pdf[item_col].astype(str)
            n_seen += len(vals)
            _space_saving_fold(counters, vals, capacity)
        ordered = sorted(counters.items(), key=lambda kv: (-kv[1][0], kv[0]))
        state.update(
            (
                [it for it, _ in ordered],
                [c for _, (c, _e) in ordered],
                [e for _, (_c, e) in ordered],
                n_seen,
            )
        )
        yield pd.DataFrame(
            [
                {
                    "group_key": key[0],
                    "item": it,
                    "est": c,
                    "err": e,
                    "n_seen": n_seen,
                }
                for it, (c, e) in ordered
            ],
            columns=["group_key", "item", "est", "err", "n_seen"],
        )

    return (
        events.select(
            F.col(key_col).cast("string").alias("group_key"),
            F.col(item_col).cast("string").alias(item_col),
        )
        .groupBy("group_key")
        .applyInPandasWithState(
            update,
            outputStructType=_TK_OUT_SCHEMA,
            stateStructType=_TK_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )
