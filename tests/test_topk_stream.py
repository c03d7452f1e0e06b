"""Streaming Space-Saving top-k: batch parity at full capacity,
Metwally guarantees under eviction, checkpoint restart."""

from __future__ import annotations

import pandas as pd

SCHEMA = "event_type STRING, user_id LONG"


def _land(spark, tmp_path, src, file_no, spec):
    rows = [
        {"event_type": k, "user_id": v} for k, vals in spec.items() for v in vals
    ]
    (
        spark.createDataFrame(pd.DataFrame(rows), SCHEMA)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(str(tmp_path / "stage" / f"f{file_no}"))
    )
    part = next((tmp_path / "stage" / f"f{file_no}").glob("*.parquet"))
    src.mkdir(exist_ok=True)
    part.rename(src / f"data_{file_no}.parquet")


def _run(spark, src, ckpt, capacity):
    from cassandra_extractor_spark.streaming.topk import stream_topk

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*.parquet")
    )
    emitted = []
    q = (
        stream_topk(stream, capacity=capacity)
        .writeStream.foreachBatch(lambda df, bid: emitted.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # keep each key's final summary: the emission with max n_seen
    latest_n: dict = {}
    for r in emitted:
        latest_n[r["group_key"]] = max(latest_n.get(r["group_key"], 0), r["n_seen"])
    latest: dict = {}
    for r in emitted:
        if r["n_seen"] == latest_n[r["group_key"]]:
            latest.setdefault(r["group_key"], []).append(r)
    for rows in latest.values():
        rows.sort(key=lambda r: (-r["est"], r["item"]))
    return latest


def test_stream_topk_exact_at_capacity_with_restart(spark, tmp_path):
    """capacity ≥ distinct items ⇒ every count exact (err 0) and equal
    to the batch groupBy count over everything landed — including
    across a full stop + checkpoint restart."""
    src = tmp_path / "tksrc"
    # skewed stream: item i appears with multiplicity ~ its index
    _land(spark, tmp_path, src, 0, {"view": [i for i in range(8) for _ in range(i + 1)]})
    _land(spark, tmp_path, src, 1, {"view": [7] * 10 + [0] * 2, "click": [1, 1, 2]})
    got = _run(spark, src, tmp_path / "tkck", capacity=32)
    assert {r["item"]: r["est"] for r in got["click"]} == {"1": 2, "2": 1}

    # restart with a third file
    _land(spark, tmp_path, src, 2, {"view": [7] * 5, "click": [2, 2]})
    got2 = _run(spark, src, tmp_path / "tkck", capacity=32)
    batch = (
        spark.read.schema(SCHEMA)
        .parquet(f"{src}/*.parquet")
        .groupBy("event_type", "user_id")
        .count()
        .collect()
    )
    want = {
        (r["event_type"], str(r["user_id"])): r["count"] for r in batch
    }
    for k, rows in got2.items():
        for r in rows:
            assert r["err"] == 0
            assert want[(k, r["item"])] == r["est"], (k, r["item"])
    assert sum(1 for _ in got2["view"]) == 8  # all distinct tracked


def test_stream_topk_guarantees_under_eviction(spark, tmp_path):
    """capacity < distinct ⇒ Space-Saving bounds hold: est ≥ true ≥
    est − err, and every item with true share > 1/capacity is
    tracked."""
    src = tmp_path / "tk2src"
    heavy = [99] * 40 + [98] * 25
    tail = [i for i in range(60)]  # 60 singletons
    _land(spark, tmp_path, src, 0, {"view": heavy[:30] + tail[:30]})
    _land(spark, tmp_path, src, 1, {"view": heavy[30:] + tail[30:]})
    cap = 8
    got = _run(spark, src, tmp_path / "tk2ck", capacity=cap)["view"]
    true = {"99": 40, "98": 25}
    n = 40 + 25 + 60
    assert got[0]["n_seen"] == n
    tracked = {r["item"]: r for r in got}
    assert len(tracked) == cap
    for item, t in true.items():
        assert item in tracked  # share > n/cap = 15.6 ⇒ guaranteed
        r = tracked[item]
        assert r["est"] >= t >= r["est"] - r["err"], (item, r)
    # estimates never undercount any tracked item's true frequency
    for r in tracked.values():
        t = true.get(r["item"], 1)
        assert r["est"] >= t >= r["est"] - r["err"]
