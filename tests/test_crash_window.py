"""Round-13 (r12 verdict #7): direct simulation of the compaction
CRASH WINDOW for all three incremental stores.  The two-phase fold
commits its rewritten base and the process dies BEFORE the delta is
removed; on restart the streaming batch replays and overwrites its
delta partition.  Each store's read path claims duplicate tolerance —
set-semantic candidate join (signatures), MAX-collapse on (doc_id,
tok) / doc_id (postings / doclens), candidate dedup on (q_id, n_id)
(ANN) — previously argued in ``streaming/maintenance.py``'s docstring;
here the window is EXECUTED: kill between fold and delta-remove, then
replay, and assert reads are row-identical to a cleanly-folded store,
both inside the window and after the re-run fold completes it."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from cassandra_extractor_spark.sources.catalog import load_table


@pytest.fixture()
def no_rmtree(monkeypatch):
    """Simulates the crash: the fold's base rewrite commits but the
    delta-removal step never runs (process died in between)."""

    def arm():
        monkeypatch.setattr(shutil, "rmtree", lambda *a, **k: None)

    def disarm():
        monkeypatch.undo()

    return arm, disarm


def test_signature_store_crash_window_reads_identical(
    spark, sf_dir, tmp_path, no_rmtree
):
    from cassandra_extractor_spark.operators.dedup import (
        bands_for,
        incremental_dedup,
        minhash_signatures_for,
        write_signature_store,
    )
    from cassandra_extractor_spark.streaming.dedup_stream import (
        _BAND_COLS,
        compact_signature_store,
    )

    arm, disarm = no_rmtree
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    base_docs = docs.where(F.col("doc_id") < 300)
    batch_docs = docs.where((F.col("doc_id") >= 300) & (F.col("doc_id") < 400))
    probe = docs.where((F.col("doc_id") >= 400) & (F.col("doc_id") < 450))
    delta = str(tmp_path / "delta")

    def batch_bands():
        return bands_for(minhash_signatures_for(batch_docs)).select(*_BAND_COLS)

    try:
        write_signature_store(
            bands_for(minhash_signatures_for(base_docs)), "cw_sig", n_buckets=4
        )
        batch_bands().write.mode("overwrite").parquet(f"{delta}/batch=0")
        # the clean twin: everything folded, no delta, no crash
        write_signature_store(
            bands_for(minhash_signatures_for(base_docs.unionByName(batch_docs))),
            "cw_sig_clean",
            n_buckets=4,
        )
        want = sorted(
            map(
                tuple,
                incremental_dedup(spark.table("cw_sig_clean"), probe)[0].collect(),
            )
        )
        assert want, "probe window produced no duplicate pairs — fixture too weak"

        arm()
        absorbed = compact_signature_store(spark, "cw_sig", delta, n_buckets=4)
        disarm()
        assert absorbed > 0
        # replay: the restarted batch overwrites its own delta partition
        batch_bands().write.mode("overwrite").parquet(f"{delta}/batch=0")

        # INSIDE the window: base holds the folded bands AND the delta
        # still exists — the gate's read (base ∪ delta) sees every band
        # twice; the set-semantic candidate join must not care
        gate_view = spark.table("cw_sig").select(*_BAND_COLS).unionByName(
            spark.read.parquet(delta).select(*_BAND_COLS)
        )
        got = sorted(map(tuple, incremental_dedup(gate_view, probe)[0].collect()))
        assert got == want

        # the restarted fold COMPLETES the crashed one: re-absorbing the
        # already-folded bands changes nothing, the delta finally drops
        absorbed2 = compact_signature_store(spark, "cw_sig", delta, n_buckets=4)
        assert absorbed2 > 0  # it did re-absorb the replayed duplicates
        got2 = sorted(
            map(
                tuple,
                incremental_dedup(
                    spark.table("cw_sig").select(*_BAND_COLS), probe
                )[0].collect(),
            )
        )
        assert got2 == want
        # and it SELF-HEALED: the healed base equals the clean twin
        # row-for-row (no replayed duplicates carried forever)
        healed = spark.table("cw_sig").select(*_BAND_COLS)
        assert healed.count() == healed.distinct().count()
        assert healed.count() == spark.table("cw_sig_clean").count()
    finally:
        spark.sql("DROP TABLE IF EXISTS cw_sig")
        spark.sql("DROP TABLE IF EXISTS cw_sig_clean")


def test_posting_store_crash_window_reads_identical(
    spark, sf_dir, tmp_path, no_rmtree
):
    from cassandra_extractor_spark.streaming.posting_stream import (
        bm25_query_against_store,
        build_doclens,
        build_postings,
        compact_doclen_store,
        compact_posting_store,
        write_doclen_store,
        write_posting_store,
    )

    arm, disarm = no_rmtree
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    base_docs = docs.where(F.col("doc_id") < 300)
    batch_docs = docs.where((F.col("doc_id") >= 300) & (F.col("doc_id") < 400))
    both = base_docs.unionByName(batch_docs)
    delta, dl_delta = str(tmp_path / "delta"), str(tmp_path / "dl_delta")

    def write_deltas():
        build_postings(batch_docs).write.mode("overwrite").parquet(
            f"{delta}/batch=0"
        )
        build_doclens(batch_docs).write.mode("overwrite").parquet(
            f"{dl_delta}/batch=0"
        )

    try:
        write_posting_store(build_postings(base_docs), "cw_post", n_buckets=2)
        write_doclen_store(build_doclens(base_docs), "cw_dl", n_buckets=2)
        write_deltas()
        write_posting_store(build_postings(both), "cw_post_clean", n_buckets=2)
        write_doclen_store(build_doclens(both), "cw_dl_clean", n_buckets=2)
        want = [
            (r.doc_id, r.bm25)
            for r in bm25_query_against_store(
                spark, "cw_post_clean", None, "cw_dl_clean", None
            ).collect()
        ]
        assert any(s != 0.0 for _, s in want)

        arm()
        assert compact_posting_store(spark, "cw_post", delta, n_buckets=2) > 0
        assert compact_doclen_store(spark, "cw_dl", dl_delta, n_buckets=2) > 0
        disarm()
        write_deltas()  # replay on restart

        # INSIDE the window: every batch posting and doc-length exists
        # in base AND delta; MAX-collapse on identical rows is identity
        got = [
            (r.doc_id, r.bm25)
            for r in bm25_query_against_store(
                spark, "cw_post", delta, "cw_dl", dl_delta
            ).collect()
        ]
        assert got == want

        # completing fold: re-absorb is a no-op on values, drops deltas
        assert compact_posting_store(spark, "cw_post", delta, n_buckets=2) > 0
        assert compact_doclen_store(spark, "cw_dl", dl_delta, n_buckets=2) > 0
        got2 = [
            (r.doc_id, r.bm25)
            for r in bm25_query_against_store(
                spark, "cw_post", None, "cw_dl", None
            ).collect()
        ]
        assert got2 == want
    finally:
        for t in ("cw_post", "cw_dl", "cw_post_clean", "cw_dl_clean"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_ann_store_crash_window_reads_identical(spark, sf_dir, tmp_path, no_rmtree):
    from cassandra_extractor_spark.operators.similarity import (
        N_IVF_CENTROIDS,
        N_QUERIES,
        _load_embeddings,
    )
    from cassandra_extractor_spark.streaming.ann_stream import (
        _read_centroids,
        ann_store_topk,
        assign_cells,
        compact_ann_store,
        init_ann_centroids,
    )

    arm, disarm = no_rmtree
    e = _load_embeddings(spark, sf_dir)
    queries = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "emb"
    )
    cent = e.where(
        (F.col("vec_id") >= N_QUERIES)
        & (F.col("vec_id") < N_QUERIES + N_IVF_CENTROIDS)
    ).select(F.col("vec_id").alias("c_id"), F.col("emb").alias("c_emb"))
    corpus = e.where(F.col("vec_id") >= N_QUERIES).select("vec_id", "emb")
    base_vecs = corpus.where(F.col("vec_id") % 2 == 0)
    batch_vecs = corpus.where(F.col("vec_id") % 2 == 1)
    store, clean = str(tmp_path / "store"), str(tmp_path / "clean")

    for d in (store, clean):
        init_ann_centroids(spark, cent, d)

    def write_delta(d, df):
        assign_cells(df, _read_centroids(spark, d)).write.mode(
            "overwrite"
        ).partitionBy("c_id").parquet(f"{d}/delta/batch=0")

    # base via a completed fold of the first half
    write_delta(store, base_vecs)
    assert compact_ann_store(spark, store) > 0
    write_delta(store, batch_vecs)
    # clean twin: both halves folded in one clean pass
    write_delta(clean, corpus)
    assert compact_ann_store(spark, clean) > 0
    want = list(map(tuple, ann_store_topk(spark, clean, queries).collect()))

    arm()
    assert compact_ann_store(spark, store) > 0
    disarm()
    write_delta(store, batch_vecs)  # replay on restart

    # INSIDE the window: the batch's vectors sit in base AND delta —
    # the probe dedupes candidates on (q_id, n_id), so no duplicate
    # can occupy two top-k slots
    got = list(map(tuple, ann_store_topk(spark, store, queries).collect()))
    assert got == want

    # the completing fold SELF-HEALS: the replayed duplicates collapse
    # (dropDuplicates on vec_id in the fold), so the healed base equals
    # the clean twin's corpus exactly — not just at read time
    assert compact_ann_store(spark, store) > 0
    got2 = list(map(tuple, ann_store_topk(spark, store, queries).collect()))
    assert got2 == want
    base = spark.read.parquet(f"{store}/base")
    assert base.count() == base.select("vec_id").distinct().count()
    assert base.count() == spark.read.parquet(f"{clean}/base").count()
