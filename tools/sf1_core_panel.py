"""sf1-tier 8-vs-32-core scaling panel (round-13 verdict #8).

The driver's 8-vs-32-core comparison at sf0.1 is overhead-bound (the
273-item suite gains only ~10% from 4x cores because most line items
are 0.3-1.5 s marginal costs sitting on the ~0.4 s job-scheduling
floor), so it reads as "serial" regardless of plan quality.  This tool
demonstrates the parallelism story where it can be seen: the x10 tier
(sf1-equivalent, same deterministic derivation as ``sf1_probe.py``)
on a fixed compute-bound panel — the cold dedup chain build,
``q116_spearman`` (the one-corpus-shuffle rank correlation),
``tpch_q01`` (scan + two-level exact money aggregate) and
``ns_semantic_dedup`` (cell-bounded cosine self-join) — each
median-of-3, in a FRESH process per core count (the master is fixed
per JVM).

The tier reuses ``sf1_probe``'s documents/lineitem generation and adds
embeddings (vec_id shifted by 10^7 per copy; dimensions circularly
rotated by copy — norms and per-dim distributions preserved, cosine
structure across copies decorrelated, so cell populations scale with
volume instead of collapsing onto the originals).

Usage:
  python tools/sf1_core_panel.py            # both core counts + table
  python tools/sf1_core_panel.py --cpus 8   # one arm (inner call)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
PANEL_CORES = (8, 32)


def gen_embeddings(spark, out_dir: str, factor: int) -> None:
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{SRC}/embeddings.parquet")
    # RAW schema (vec_id, embedding, label) — the catalog renames
    # embedding→emb at load time, so the tier must keep the raw names
    dim = len(e.select("embedding").first()["embedding"])
    copies = spark.range(factor).select(F.col("id").cast("long").alias("copy"))
    out = e.crossJoin(copies).select(
        (F.col("vec_id") + F.col("copy") * F.lit(10_000_000)).alias("vec_id"),
        # circular dimension rotation by copy: norm-preserving,
        # distribution-preserving, decorrelates cosines across copies
        F.expr(
            f"transform(sequence(0, {dim - 1}), "
            f"i -> embedding[int((i + copy) % {dim})])"
        ).alias("embedding"),
        "label",
    )
    # 64 files for scan parallelism (see sf1_probe.gen_documents)
    out.repartition(64).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )


def ensure_panel_tier(spark, regen: bool = False) -> str:
    from sf1_probe import BASE, ensure_tier, gen_documents, gen_lineitem  # noqa: F401

    out_dir = ensure_tier(spark, "x10", 10, regen)
    emb_marker = os.path.join(out_dir, "_EMB_COMPLETE")
    if regen or not os.path.exists(emb_marker):
        gen_embeddings(spark, out_dir, 10)
        with open(emb_marker, "w") as f:
            f.write("ok\n")
    return out_dir


def run_arm(cpus: int) -> dict[str, float]:
    from cassandra_extractor_spark.operators.dedup import (
        invalidate_dedup_chain,
        shared_clusters,
        shared_kgrams,
        shared_pairs,
    )
    from cassandra_extractor_spark.operators.text import shared_token_stream
    from cassandra_extractor_spark.registry import QUERIES
    from cassandra_extractor_spark.session import get_spark

    spark = get_spark(f"sf1-panel-{cpus}")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    sf_dir = ensure_panel_tier(spark)

    # bench sizing rule, applied to the tier
    total = 0
    for root, _dirs, files in os.walk(sf_dir):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    # NOT bench.py's min(cpus, data-derived) rule: at 100 TB partition
    # count is thousands >> cores, so reduce stages are never
    # core-capped — the panel must reproduce that posture or the 8-vs-32
    # ratio measures the shuffle-partition constant (both arms capped at
    # 8 reduce tasks in the first panel run), not the plan.  AQE's
    # advisory size still coalesces the small exchanges.
    sp = max(2 * cpus, (total * 4) // (64 * 1024 * 1024))
    spark.conf.set("spark.sql.shuffle.partitions", str(int(sp)))
    advisory = max(512 * 1024, total // (cpus * 2))
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", str(advisory))

    def chain_build() -> None:
        shared_pairs(spark, sf_dir)
        shared_pairs(spark, sf_dir, max_bucket=64)
        shared_clusters(spark, sf_dir)
        shared_token_stream(spark, sf_dir)
        shared_kgrams(spark, sf_dir)

    results: dict[str, float] = {}
    # warm-up: one untimed cold build absorbs JIT/classloading
    invalidate_dedup_chain(spark)
    chain_build()

    samples = []
    for _ in range(3):
        invalidate_dedup_chain(spark)
        t0 = time.time()
        chain_build()
        samples.append(time.time() - t0)
    results["shared_dedup_chain_build"] = round(sorted(samples)[1], 3)

    for qname in ("q116_spearman", "tpch_q01", "ns_semantic_dedup"):
        fn = QUERIES[qname]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        samples = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        results[qname] = round(sorted(samples)[1], 3)
    return results


def main() -> None:
    if "--cpus" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])
        print(json.dumps({"cpus": cpus, "panel": run_arm(cpus)}))
        return

    # outer mode: fresh process per core count (master fixed per JVM)
    rows: dict[int, dict[str, float]] = {}
    for cpus in PANEL_CORES:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpus", str(cpus)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        rows[cpus] = json.loads(line)["panel"]
    print("| query | 8-core s | 32-core s | ratio (8/32) |")
    print("|---|---|---|---|")
    for q in rows[PANEL_CORES[0]]:
        a, b = rows[PANEL_CORES[0]][q], rows[PANEL_CORES[1]][q]
        print(f"| {q} | {a} | {b} | {round(a / b, 2)} |")


if __name__ == "__main__":
    main()
