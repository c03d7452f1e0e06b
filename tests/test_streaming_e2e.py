"""End-to-end streaming extraction: rate-limited multi-batch drain,
multi-sink fan-out, and checkpoint-resume idempotence (SURVEY D1/D3/D6
— the behavior VERDICT r02 noted was only verified piecewise)."""

from __future__ import annotations

import pandas as pd

from cassandra_extractor_spark.streaming.pipeline import stream_extract

SCHEMA = "event_id LONG, user_id LONG, ts TIMESTAMP"


def _write_file(spark, src_dir, file_no: int, ids: range) -> None:
    pdf = pd.DataFrame(
        {
            "event_id": list(ids),
            "user_id": [i % 3 for i in ids],
            "ts": pd.to_datetime([1_700_000_000_000 + i * 60_000 for i in ids], unit="ms"),
        }
    )
    spark.createDataFrame(pdf, SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        f"{src_dir}/f{file_no}"
    )


def _run(spark, src_dir, ckpt, sink_a, sink_b, batch_ids):
    def collect_into(store):
        def write(df, batch_id):
            batch_ids.append(batch_id)
            store.extend(r["event_id"] for r in df.select("event_id").collect())

        return write

    q = stream_extract(
        spark,
        source_path=str(src_dir),
        schema=SCHEMA,
        sinks={"a": collect_into(sink_a), "b": collect_into(sink_b)},
        checkpoint_dir=str(ckpt),
        ts_col="ts",
        max_files_per_trigger=1,  # rate limit -> one file per micro-batch
        path_glob="*.parquet",
    )
    q.awaitTermination(120)
    return q


def test_stream_extract_fanout_rate_limit_and_checkpoint_resume(spark, tmp_path):
    src = tmp_path / "src"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    # file source treats subdirs as partitions; write flat files instead
    for i, ids in enumerate([range(0, 5), range(5, 9), range(9, 12)]):
        _write_file(spark, tmp_path / "stage", i, ids)
        part = next((tmp_path / "stage" / f"f{i}").glob("*.parquet"))
        part.rename(src / f"data_{i}.parquet")

    a: list[int] = []
    b: list[int] = []
    batches: list[int] = []
    _run(spark, src, ckpt, a, b, batches)
    # every row exactly once, in BOTH sinks (fan-out), one file per batch
    assert sorted(a) == list(range(12))
    assert sorted(b) == list(range(12))
    assert len(set(batches)) >= 3, batches  # rate limit forced >=3 micro-batches

    # resume from the same checkpoint with one new file: ONLY it drains
    _write_file(spark, tmp_path / "stage", 9, range(12, 15))
    part = next((tmp_path / "stage" / "f9").glob("*.parquet"))
    part.rename(src / "data_3.parquet")
    a2: list[int] = []
    b2: list[int] = []
    _run(spark, src, ckpt, a2, b2, [])
    assert sorted(a2) == [12, 13, 14]
    assert sorted(b2) == [12, 13, 14]

    # idempotent restart: no new data -> no re-emission
    a3: list[int] = []
    _run(spark, src, ckpt, a3, a3, [])
    assert a3 == []
