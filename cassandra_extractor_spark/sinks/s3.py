"""S3 sink (reference K2: ``s3worker.py``).

The reference writes ONE OBJECT PER RECORD with a ``%``-templated key
and a templated/JSON body plus uuid default-id injection
(s3worker.py:18-24,72-73).  At scale one-object-per-row is an
anti-pattern (S3 request costs dominate), so:

- default = bulk mode: ``df.write.json("s3a://bucket/prefix")`` —
  one object per partition, full throughput;
- compat = per-record mode via ``foreachPartition`` + boto3 (executor-
  side, no driver collect), for consumers that require the reference's
  exact key-per-record layout.  boto3 is import-gated: absent in this
  container.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from cassandra_extractor_spark.functions.tablespecs import default_id, render_template


@dataclass
class S3SinkConfig:
    bucket: str
    key_template: str  # e.g. "exports/%(id)s.json" (s3worker.py:19-23)
    body_template: str | None = None  # default: row as JSON
    per_record: bool = False
    inject_default_id: bool = True  # T9, s3worker.py:72-73


def prepare_s3_frame(df: DataFrame, cfg: S3SinkConfig) -> DataFrame:
    """(key, body) frame — all templating compiled to Column exprs."""
    if cfg.inject_default_id:
        df = default_id(df)
    df = render_template(df, cfg.key_template, out="__key")
    if cfg.body_template:
        df = render_template(df, cfg.body_template, out="__body")
        body = F.col("__body")
    else:
        body = F.to_json(F.struct(*[F.col(c) for c in df.columns if not c.startswith("__")]))
    return df.select(F.col("__key").alias("key"), body.alias("body"))


def write_s3(df: DataFrame, cfg: S3SinkConfig, path_prefix: str | None = None) -> None:
    """Bulk mode (default): distributed JSONL write to the bucket
    prefix.  Per-record mode: executor-side boto3 puts."""
    if not cfg.per_record:
        target = path_prefix or f"s3a://{cfg.bucket}"
        prepare_s3_frame(df, cfg).write.mode("append").json(target)
        return

    frame = prepare_s3_frame(df, cfg)
    bucket = cfg.bucket

    def put_partition(rows) -> None:  # pragma: no cover - boto3 absent here
        try:
            import boto3
        except ImportError as exc:
            raise RuntimeError("per-record S3 mode requires boto3 on executors") from exc
        client = boto3.client("s3")
        for row in rows:
            client.put_object(Bucket=bucket, Key=row["key"], Body=row["body"].encode())

    frame.foreachPartition(put_partition)
