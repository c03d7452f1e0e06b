"""Streaming posting-store maintenance: batch parity of store-backed
conjunctive retrieval with ns_boolean_retrieval, bucket-pruned base
scans, checkpoint restart, replay overwrite, and idempotent compaction
(SURVEY §2.5 retrieval surface, streaming spelling)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cassandra_extractor_spark.operators.text import BOOL_QUERY, ns_boolean_retrieval
from cassandra_extractor_spark.sources.catalog import load_table
from cassandra_extractor_spark.streaming.posting_stream import (
    boolean_query_against_store,
    build_postings,
    compact_posting_store,
    stream_posting_ingest,
    write_posting_store,
)

SCHEMA = "doc_id LONG, text STRING"


def _write_batch(spark, tmp_path, src, file_no: int, df) -> None:
    stage = tmp_path / "stage" / f"f{file_no}"
    df.coalesce(1).write.mode("overwrite").parquet(str(stage))
    part = next(stage.glob("*.parquet"))
    part.rename(src / f"data_{file_no}.parquet")


@pytest.fixture()
def doc_slices(spark, sf_dir):
    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    return d, (
        d.where(F.col("doc_id") % 3 == 0),
        d.where(F.col("doc_id") % 3 == 1),
        d.where(F.col("doc_id") % 3 == 2),
    )


def test_posting_store_parity_restart_pruning_compaction(
    spark, sf_dir, tmp_path, doc_slices
):
    docs, slices = doc_slices
    src = tmp_path / "src"
    src.mkdir()
    (tmp_path / "stage").mkdir()
    table = "posting_store_t"
    # base store: first slice indexed in batch; the rest arrives live
    write_posting_store(build_postings(slices[0]), table, n_buckets=4)
    try:
        stats: dict[int, tuple[int, int]] = {}

        def sink(df, batch_id):
            r = df.collect()[0]
            stats[batch_id] = (r["n_docs"], r["n_postings"])

        def run():
            q = stream_posting_ingest(
                spark,
                source_path=str(src),
                schema=SCHEMA,
                delta_dir=str(tmp_path / "delta"),
                checkpoint_dir=str(tmp_path / "ckpt"),
                stats_sink=sink,
            )
            q.awaitTermination(120)

        _write_batch(spark, tmp_path, src, 0, slices[1])
        run()
        assert 0 in stats and stats[0][1] > 0
        # restart for the third slice
        _write_batch(spark, tmp_path, src, 1, slices[2])
        run()
        assert set(stats) == {0, 1}

        # PARITY: store-backed AND-retrieval == the batch operator
        got = boolean_query_against_store(
            spark, table, str(tmp_path / "delta"), BOOL_QUERY
        ).collect()
        want = ns_boolean_retrieval(spark, sf_dir).collect()
        assert [(r.doc_id, r.tf_total, r.tf_min) for r in got] == [
            (r.doc_id, r.tf_total, r.tf_min) for r in want
        ]
        assert got, "query matched no documents — fixture terms wrong"

        # BUCKET PRUNING: the base-side term-equality scan selects a
        # strict subset of the 4 buckets
        base = spark.table(table).where(F.col("tok").isin(*BOOL_QUERY))
        plan = base._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount" in plan, plan[:2000]
        sel = plan.split("SelectedBucketsCount: ", 1)[1].split(" ", 1)[0]
        assert int(sel) < 4, plan[:2000]

        # restart with no new files: nothing re-fires
        seen = dict(stats)
        run()
        assert stats == seen

        # COMPACTION: delta folds into the bucketed base, results
        # unchanged, idempotent; a second fold with a stale delta copy
        # (crash window) changes nothing
        import shutil

        shutil.copytree(str(tmp_path / "delta"), str(tmp_path / "delta_stale"))
        absorbed = compact_posting_store(spark, table, str(tmp_path / "delta"), 4)
        assert absorbed == stats[0][1] + stats[1][1]
        assert not (tmp_path / "delta").exists()
        got2 = boolean_query_against_store(
            spark, table, str(tmp_path / "delta"), BOOL_QUERY
        ).collect()
        assert [(r.doc_id, r.tf_total, r.tf_min) for r in got2] == [
            (r.doc_id, r.tf_total, r.tf_min) for r in want
        ]
        # crash-window replay: re-absorb the stale copy → identical store
        absorbed2 = compact_posting_store(spark, table, str(tmp_path / "delta_stale"), 4)
        assert absorbed2 == absorbed
        got3 = boolean_query_against_store(
            spark, table, str(tmp_path / "delta"), BOOL_QUERY
        ).collect()
        assert [(r.doc_id, r.tf_total, r.tf_min) for r in got3] == [
            (r.doc_id, r.tf_total, r.tf_min) for r in want
        ]
        assert compact_posting_store(spark, table, str(tmp_path / "delta"), 4) == 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_build_postings_matches_python(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["a b a\tc", "  b  B b "],
        }
    )
    docs = spark.createDataFrame(pdf, SCHEMA)
    got = {
        (r.doc_id, r.tok): r.tf for r in build_postings(docs).collect()
    }
    assert got == {(0, "a"): 2, (0, "b"): 1, (0, "c"): 1, (1, "b"): 3}
