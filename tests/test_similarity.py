"""Similarity search: vectorized fast path agrees with the exact one."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from cassandra_extractor_spark.operators.similarity import (
    N_QUERIES,
    cosine_topk_vectorized,
    ns_ann_cosine_topk,
)
from cassandra_extractor_spark.sources.catalog import load_table


def test_vectorized_matches_exact_topk(spark, sf_dir):
    exact = {
        (r["q_id"], r["rank"]): (r["n_id"], r["cos"])
        for r in ns_ann_cosine_topk(spark, sf_dir).collect()
    }
    e = load_table(spark, "embeddings", sf_dir)
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in e.where(F.col("vec_id") < N_QUERIES).collect()
    ]
    corpus = e.where(F.col("vec_id") >= N_QUERIES)
    fast = {
        (r["q_id"], r["rank"]): (r["n_id"], r["cos"])
        for r in cosine_topk_vectorized(corpus, queries).collect()
    }
    assert set(exact) == set(fast)
    # per-rank score agreement; neighbor identity must match except
    # where several exact neighbors tie at 6 decimals (rank order
    # between the fold and numpy paths is then legitimately arbitrary)
    by_q: dict[int, list] = {}
    for (q_id, rank), (n_id, cos) in exact.items():
        by_q.setdefault(q_id, []).append((cos, n_id))
    for key, (n_id, cos) in exact.items():
        f_nid, f_cos = fast[key]
        assert abs(f_cos - cos) < 1e-6
        tied_ids = {n for c, n in by_q[key[0]] if c == cos}
        assert f_nid in tied_ids if len(tied_ids) > 1 else f_nid == n_id
