"""Streaming CDC materialized view — the streaming twin of batch
``cdc_apply`` (operators/relational.py, the MERGE-INTO shape): a
change stream continuously maintains a latest-row-per-key snapshot.

Architecture — BUCKETED generational store, the third member of the
replay-safe store family (signature store: set-semantic, rollup store:
partial-agg partitions, CDC store: keyed snapshot buckets):

- the snapshot is hash-bucketed on the key (same discipline as the
  persisted signature store, operators/dedup.py ``write_signature_store``);
  each micro-batch merges ONLY the buckets its keys hash into and
  writes them to a NEW immutable directory ``data/g<batch_id>/_b=<b>``
  — write amplification is O(touched buckets), never O(|store|), and
  nothing ever overwrites a directory a running plan is reading;
- visibility is an atomic MANIFEST commit: ``manifest/gen=<seq>.json``
  (written tmp + ``os.replace``) maps every bucket to its current data
  directory — touched buckets point at the new generation, untouched
  buckets carry their existing directories forward untouched.  The
  current snapshot is the highest-seq manifest; a crash before the
  manifest commit leaves half-written data dirs UNREFERENCED and the
  previous snapshot intact (this is the format-free spelling of the
  Delta/Iceberg manifest dance);
- replay-safe twice over: the manifest records the ``batch_id`` it
  committed, so a foreachBatch replay of an already-committed batch
  (driver died between manifest commit and streaming-checkpoint
  commit) short-circuits as an idempotent skip; and even a forced
  re-merge is idempotent BY ALGEBRA — last-writer-wins over
  (order_cols, op, payload-hash) is deterministic and reproduces the
  identical snapshot;
- OUT-OF-ORDER safe across batches: the store retains ``order_cols``
  and tombstones (op='D' rows), so a late-arriving STALE change loses
  the per-key ordering against what the store already holds — a stale
  update can never resurrect a deleted key;
- tombstones are retained until an explicit ``purge_tombstones``
  horizon: the purge records the horizon IN the manifest, and every
  later merge drops incoming changes strictly below it — so a stale
  update arriving after its fencing tombstone was purged is rejected
  by the horizon contract instead of silently resurrecting the key;
- old generations are cleaned best-effort after each commit
  (``retain_gens`` manifests kept; data dirs referenced by none of
  them are deleted).

100 TB posture: per-trigger cost is one shuffle of the (small) batch
plus a scan of the touched buckets only; bucket count is chosen so a
bucket is a few GB (here a test-sized default).  Compaction of
many-generation bucket lineages is the same new-dir + manifest swap.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F
from pyspark.sql.streaming import StreamingQuery


def _bucket_col(key: str, n_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")


# ---------------------------------------------------------------- manifests


def _manifest_dir(store_dir: str) -> str:
    return os.path.join(store_dir, "manifest")


def _manifest_seqs(store_dir: str) -> list[int]:
    mdir = _manifest_dir(store_dir)
    if not os.path.isdir(mdir):
        return []
    return sorted(
        int(f[len("gen=") : -len(".json")])
        for f in os.listdir(mdir)
        if f.startswith("gen=") and f.endswith(".json")
    )

def _read_manifest(store_dir: str, seq: int) -> dict:
    with open(os.path.join(_manifest_dir(store_dir), f"gen={seq}.json")) as fh:
        return json.load(fh)


def _current_manifest(store_dir: str) -> dict | None:
    seqs = _manifest_seqs(store_dir)
    return _read_manifest(store_dir, seqs[-1]) if seqs else None


def _commit_manifest(store_dir: str, manifest: dict) -> None:
    """Atomic visibility: the rename IS the commit — readers either see
    the previous manifest or this one, never a torn state."""
    mdir = _manifest_dir(store_dir)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".tmp.gen={manifest['seq']}.json")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(mdir, f"gen={manifest['seq']}.json"))


def _bucket_paths(store_dir: str, manifest: dict, buckets=None) -> list[str]:
    sel = manifest["buckets"]
    if buckets is not None:
        want = {str(b) for b in buckets}
        sel = {b: p for b, p in sel.items() if b in want}
    return [os.path.join(store_dir, "data", p) for p in sel.values()]


def _read_buckets(
    spark: SparkSession, store_dir: str, manifest: dict, buckets=None
) -> DataFrame | None:
    paths = _bucket_paths(store_dir, manifest, buckets)
    return spark.read.parquet(*paths) if paths else None


def _read_current(spark: SparkSession, store_dir: str) -> DataFrame | None:
    """Full current snapshot (all buckets of the highest manifest)."""
    m = _current_manifest(store_dir)
    return _read_buckets(spark, store_dir, m) if m else None


def _write_generation(
    df: DataFrame, store_dir: str, gen_name: str, key: str, n_buckets: int
) -> dict[str, str]:
    """Write ``df`` bucketed by key under ``data/<gen_name>/_b=<b>`` and
    return the bucket→relative-path map for the manifest.  The directory
    is NEW per generation — never a path any reader references yet."""
    out = os.path.join(store_dir, "data", gen_name)
    (
        df.withColumn("_b", _bucket_col(key, n_buckets))
        # one bucket per shuffle partition → one file per bucket dir
        .repartition(F.col("_b"))
        .write.mode("overwrite")
        .partitionBy("_b")
        .parquet(out)
    )
    return {
        d.split("=", 1)[1]: f"{gen_name}/{d}"
        for d in os.listdir(out)
        if d.startswith("_b=")
    }


def _cleanup(store_dir: str, retain_gens: int) -> tuple[int, int]:
    """Drop manifests beyond the retained window, then any data
    generation directory referenced by NO retained manifest.  Returns
    (manifests removed, generation dirs removed) for the maintenance
    report."""
    seqs = _manifest_seqs(store_dir)
    drop = seqs[:-retain_gens] if retain_gens else []
    for s in drop:
        os.remove(os.path.join(_manifest_dir(store_dir), f"gen={s}.json"))
    kept = _manifest_seqs(store_dir)
    referenced = set()
    for s in kept:
        for rel in _read_manifest(store_dir, s)["buckets"].values():
            referenced.add(rel.split("/", 1)[0])
    removed_dirs = 0
    data_dir = os.path.join(store_dir, "data")
    if os.path.isdir(data_dir):
        for d in os.listdir(data_dir):
            if d not in referenced:
                shutil.rmtree(os.path.join(data_dir, d), ignore_errors=True)
                removed_dirs += 1
    return len(drop), removed_dirs


def cleanup_generations(store_dir: str, retain_gens: int) -> dict:
    """Operational retention entry point (the control plane's CDC
    maintenance op): keep the newest ``retain_gens`` manifests, delete
    unreferenced generation data.  Same invariant as the per-trigger
    best-effort cleanup — the CURRENT manifest and everything it
    references always survive."""
    if retain_gens < 1:
        raise ValueError("retain_gens must be >= 1: the current manifest must survive")
    removed_manifests, removed_dirs = _cleanup(store_dir, retain_gens)
    return {
        "removed_manifests": removed_manifests,
        "removed_generations": removed_dirs,
        "retained_seqs": _manifest_seqs(store_dir),
    }


# ------------------------------------------------------------------- merge


def init_cdc_store(
    spark: SparkSession,
    base: DataFrame,
    store_dir: str,
    key: str,
    op_col: str,
    order_cols: Sequence[str],
    n_buckets: int = 8,
) -> None:
    """Seed the store from a base snapshot.  The caller supplies
    ``order_cols`` values older than any change that will ever arrive
    (epoch zero / sentinel), so every real change outranks the seed.

    Fails fast if the key/op/order columns are missing from ``base`` —
    otherwise the first micro-batch would die inside the merge with an
    opaque column-resolution error."""
    missing = [c for c in (key, op_col, *order_cols) if c not in base.columns]
    if missing:
        raise ValueError(
            f"init_cdc_store: base snapshot is missing column(s) {missing}; "
            f"seed it with the key ({key!r}), op ({op_col!r}) and order "
            f"columns ({list(order_cols)!r}) set to sentinel values older "
            "than any arriving change"
        )
    buckets = _write_generation(base, store_dir, "g-1", key, n_buckets)
    _commit_manifest(
        store_dir,
        {
            "seq": 0,
            "batch_id": None,
            "key": key,
            "n_buckets": n_buckets,
            "horizon": None,
            "buckets": buckets,
        },
    )


def _horizon_struct(df: DataFrame, order_cols: Sequence[str], horizon: Sequence) -> F.Column:
    """Horizon literals cast to the order columns' ACTUAL types, so the
    struct comparison type-checks (e.g. a Python int literal vs a BIGINT
    order column)."""
    types = dict(df.dtypes)
    return F.struct(
        *[F.lit(v).cast(types[c]) for c, v in zip(order_cols, horizon)]
    )


def merge_cdc_batch(
    store: DataFrame | None,
    changes: DataFrame,
    key: str,
    order_cols: Sequence[str],
    op_col: str,
    payload_cols: Sequence[str],
    horizon: Sequence | None = None,
) -> DataFrame:
    """Last-writer-wins merge of a change batch into a snapshot —
    pure-DataFrame, idempotent (merging a batch twice is a no-op), and
    stale-proof (the snapshot's retained order_cols win against older
    late arrivals; tombstones outrank stale updates the same way).

    DETERMINISTIC ties: after ``order_cols`` the window breaks ties on
    (op desc, xxhash64 of the payload desc), so two distinct changes
    sharing an order_cols value elect the same winner on every replay
    — real change logs should still carry unique per-key sequence
    numbers, but a tie can never make replays diverge.

    ``horizon``: values matching ``order_cols``; incoming changes
    strictly below it are dropped — the fence that replaces purged
    tombstones (see ``purge_tombstones``)."""
    cols = [key, op_col, *order_cols, *payload_cols]
    incoming = changes.select(*cols)
    if horizon is not None:
        incoming = incoming.where(
            ~(F.struct(*order_cols) < _horizon_struct(incoming, order_cols, horizon))
        )
    all_rows = incoming
    if store is not None:
        all_rows = store.select(*cols).unionByName(all_rows)
    tie = [F.col(op_col).desc()]
    if payload_cols:
        tie.append(
            F.xxhash64(F.struct(*[F.col(c) for c in payload_cols])).desc()
        )
    w = W.partitionBy(key).orderBy(*[F.col(c).desc() for c in order_cols], *tie)
    return (
        all_rows.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_cdc_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    store_dir: str,
    key: str,
    order_cols: Sequence[str],
    op_col: str = "op",
    payload_cols: Sequence[str] = (),
    retain_gens: int = 3,
) -> None:
    """Merge one change batch into the bucketed generational store —
    the foreachBatch body of ``stream_cdc_apply``, public so a batch
    pipeline (or the control plane) can apply changes without a
    streaming query.  All the store's guarantees live here: idempotent
    replay skip via the manifest-recorded batch_id, O(touched-buckets)
    write amplification, horizon-fenced staleness rejection, atomic
    manifest commit, best-effort generation cleanup."""
    cur = _current_manifest(store_dir)
    if cur is None:
        raise FileNotFoundError(
            f"CDC store not initialized under {store_dir}: call "
            "init_cdc_store with a (possibly empty) base snapshot first"
        )
    if cur["batch_id"] == batch_id:
        # foreachBatch replay of a batch whose manifest already
        # committed (driver died before the streaming checkpoint
        # did) — idempotent skip; the snapshot already reflects it
        return
    n_buckets = cur["n_buckets"]
    batch = batch_df.withColumn("_b", _bucket_col(key, n_buckets))
    # bounded by n_buckets — a driver-side list, not a data collect
    touched = sorted(
        r["_b"] for r in batch.select("_b").distinct().collect()
    )
    if not touched:
        new_buckets = dict(cur["buckets"])
    else:
        merged = merge_cdc_batch(
            _read_buckets(spark, store_dir, cur, touched),
            batch.drop("_b"),
            key,
            order_cols,
            op_col,
            payload_cols,
            horizon=cur.get("horizon"),
        )
        written = _write_generation(
            merged, store_dir, f"g{batch_id}", key, n_buckets
        )
        # untouched buckets carry their existing dirs forward —
        # their files are never rewritten (O(touched), not O(store))
        new_buckets = {**cur["buckets"], **written}
    _commit_manifest(
        store_dir,
        {
            **cur,
            "seq": cur["seq"] + 1,
            "batch_id": batch_id,
            "buckets": new_buckets,
        },
    )
    _cleanup(store_dir, retain_gens)


def stream_cdc_apply(
    spark: SparkSession,
    source_path: str,
    schema: str,
    store_dir: str,
    checkpoint_dir: str,
    key: str,
    order_cols: Sequence[str],
    op_col: str = "op",
    payload_cols: Sequence[str] = (),
    max_files_per_trigger: int = 1,
    retain_gens: int = 3,
) -> StreamingQuery:
    """Maintain the CDC snapshot over a file source of change batches.
    Drains everything available (``availableNow``) then stops;
    restarting with the same ``checkpoint_dir`` resumes after the last
    committed batch.  The store must exist (``init_cdc_store``)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "*.parquet")
        .parquet(source_path)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        apply_cdc_batch(
            spark,
            batch_df,
            batch_id,
            store_dir,
            key,
            order_cols,
            op_col,
            payload_cols,
            retain_gens=retain_gens,
        )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def purge_tombstones(
    spark: SparkSession,
    store_dir: str,
    order_cols: Sequence[str],
    op_col: str,
    horizon: Sequence,
) -> None:
    """Drop tombstones strictly below ``horizon`` (values matching
    ``order_cols``) and RECORD the horizon in the manifest: from now on
    every merge rejects incoming changes below it, so a stale update
    that would have been fenced by a purged tombstone is rejected by
    the horizon instead of resurrecting the key.  Only call with a
    horizon you are prepared to enforce (older changes are discarded).

    Rewrites every bucket (an explicit maintenance pass, not a
    per-trigger cost) into a new generation + manifest commit — the
    same atomic-swap discipline as the merge path."""
    cur = _current_manifest(store_dir)
    if cur is None:
        raise FileNotFoundError(f"no manifest under {store_dir}")
    prev = cur.get("horizon")
    if prev is not None and list(prev) >= list(horizon):
        raise ValueError(
            f"purge horizon {list(horizon)!r} must advance past the "
            f"recorded horizon {list(prev)!r}"
        )
    snap = _read_buckets(spark, store_dir, cur)
    hz = _horizon_struct(snap, order_cols, horizon)
    kept = snap.where(
        (F.col(op_col) != "D") | ~(F.struct(*order_cols) < hz)
    )
    written = _write_generation(
        kept, store_dir, f"purge{cur['seq'] + 1}", cur["key"], cur["n_buckets"]
    )
    _commit_manifest(
        store_dir,
        {
            **cur,
            "seq": cur["seq"] + 1,
            "batch_id": cur["batch_id"],
            "horizon": list(horizon),
            "buckets": written,
        },
    )


def read_cdc_view(
    spark: SparkSession, store_dir: str, op_col: str = "op"
) -> DataFrame:
    """The served materialized view: the current snapshot minus
    tombstones (tombstones stay IN the store to fence stale late
    arrivals; they leave only through ``purge_tombstones``, which
    installs a horizon fence in their place)."""
    cur = _read_current(spark, store_dir)
    if cur is None:
        raise FileNotFoundError(f"no complete generation under {store_dir}")
    return cur.where(F.col(op_col) != "D")
