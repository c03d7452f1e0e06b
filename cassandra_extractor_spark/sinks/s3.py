"""S3 sink (reference K2: ``s3worker.py``).

The reference writes ONE OBJECT PER RECORD with a ``%``-templated key
and a templated/JSON body plus uuid default-id injection
(s3worker.py:18-24,72-73).  At scale one-object-per-row is an
anti-pattern (S3 request costs dominate), so:

- default = bulk mode: ``df.write.json("s3a://bucket/prefix")`` —
  one object per partition, full throughput;
- compat = per-record mode via ``foreachPartition`` + boto3 (executor-
  side, no driver collect), for consumers that require the reference's
  exact key-per-record layout.  ``endpoint_url``/credential fields
  target S3-compatible stores (MinIO, moto in tests); boto3 stays
  import-gated so environments without it fail with a clear hint.
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
    # S3-compatible endpoint targeting (MinIO, on-prem gateways, moto
    # in tests); None values fall back to the ambient AWS config chain
    endpoint_url: str | None = None
    region: str | None = None
    access_key: str | None = None
    secret_key: str | None = None


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
    # plain values (not the dataclass) so the closure ships a few
    # strings to executors, never the DataFrame-bearing config object
    client_kwargs = {
        k: v
        for k, v in {
            "endpoint_url": cfg.endpoint_url,
            "region_name": cfg.region,
            "aws_access_key_id": cfg.access_key,
            "aws_secret_access_key": cfg.secret_key,
        }.items()
        if v is not None
    }

    def put_partition(rows) -> None:
        try:
            import boto3
        except ImportError as exc:
            raise RuntimeError("per-record S3 mode requires boto3 on executors") from exc
        # one client per partition — NOT per row; connection reuse is
        # what keeps per-record mode viable at all
        client = boto3.client("s3", **client_kwargs)
        for row in rows:
            client.put_object(Bucket=bucket, Key=row["key"], Body=row["body"].encode())

    frame.foreachPartition(put_partition)
