"""File-transport Kafka emulation: a directory-backed topic log.

The sandbox has no broker and no spark-sql-kafka jar, so the ONLY part
of K1 that could never execute was the final socket hop.  This module
replaces that hop with a filesystem transport while keeping everything
Kafka-shaped on both sides of it:

- ``write_kafka`` (sinks/kafka.py) routes ``file://`` bootstrap servers
  here AFTER compiling the frame through ``prepare_kafka_frame`` and
  ``kafka_writer_options`` — the template/key/headers/WRR-partition
  serialization path is byte-identical to a real produce.
- The transport enforces the real sink's frame contract (value
  required; key/value string-or-binary; headers array<struct<key
  string, value binary>>; partition int) and SERIALIZES KEY AND VALUE
  TO BINARY, exactly as ``KafkaRecordToRowConverter`` would hand them
  back from a broker.
- Each call appends one SEGMENT (a parquet directory named by a
  monotonically increasing segment number, like log segments); offsets
  are reconstructed per partition as (segment, intra-segment sequence)
  order — append-only, no read-modify-write of earlier segments.
- ``read_kafka_log`` returns the Kafka SOURCE schema: key binary,
  value binary, topic string, partition int, offset long, headers —
  so a round-trip test reads records the way a consumer would.

Reference parity: kafkaworker.py:159-210 (produce loop: templated
value, optional key, headers, partition choice) — re-verified here
end to end; only the transport differs.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

_SEGMENT_RE = re.compile(r"^segment=(\d{8})$")

#: the frame columns the real Kafka sink accepts, and their types
_ALLOWED = {
    "key": ("string", "binary"),
    "value": ("string", "binary"),
    "topic": ("string",),
    "partition": ("int",),
    "headers": ("array<struct<key:string,value:binary>>",),
}


def _transport_dir(bootstrap_servers: str, topic: str) -> str:
    assert bootstrap_servers.startswith("file://")
    return os.path.join(bootstrap_servers[len("file://") :], topic)


def validate_kafka_frame(frame: DataFrame) -> DataFrame:
    """Enforce the real sink's analysis rules (KafkaWriter): a value
    column is required, unknown columns are rejected, and key/value
    are serialized to BINARY for the wire."""
    dtypes = dict(frame.dtypes)
    if "value" not in dtypes:
        raise ValueError("kafka frame: required column 'value' is missing")
    for col, dt in dtypes.items():
        if col not in _ALLOWED:
            raise ValueError(
                f"kafka frame: unsupported column '{col}' "
                f"(allowed: {sorted(_ALLOWED)})"
            )
        if dt not in _ALLOWED[col]:
            raise ValueError(
                f"kafka frame: column '{col}' has type {dt}, "
                f"expected one of {_ALLOWED[col]}"
            )
    out = [
        F.col("key").cast("binary").alias("key")
        if "key" in dtypes
        else F.lit(None).cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
    ]
    if "partition" in dtypes:
        out.append(F.col("partition"))
    if "headers" in dtypes:
        out.append(F.col("headers"))
    return frame.select(*out)


def write_file_transport(frame: DataFrame, opts: dict[str, str]) -> None:
    """Append one segment of Kafka-serialized records to the topic dir.

    The segment write is a plain distributed parquet write — no
    driver-side row loop; intra-segment sequence is assigned with
    ``monotonically_increasing_id`` (task-ordered, the same "arrival
    order within a producer batch" contract a real partition log
    gives).
    """
    topic = opts["topic"]
    tdir = _transport_dir(opts["kafka.bootstrap.servers"], topic)
    os.makedirs(tdir, exist_ok=True)
    existing = sorted(
        int(m.group(1))
        for m in (_SEGMENT_RE.match(d) for d in os.listdir(tdir))
        if m
    )
    seg = (existing[-1] + 1) if existing else 0
    serialized = validate_kafka_frame(frame)
    if "partition" not in serialized.columns:
        serialized = serialized.withColumn("partition", F.lit(0))
    if "headers" not in serialized.columns:
        serialized = serialized.withColumn(
            "headers",
            F.lit(None).cast(
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("key", T.StringType()),
                            T.StructField("value", T.BinaryType()),
                        ]
                    )
                )
            ),
        )
    serialized = serialized.withColumn("seq", F.monotonically_increasing_id())
    serialized.write.mode("errorifexists").parquet(
        os.path.join(tdir, f"segment={seg:08d}")
    )


def read_kafka_log(
    spark: SparkSession, bootstrap_servers: str, topic: str
) -> DataFrame:
    """Consume the topic dir back in the Kafka SOURCE schema.

    Offsets are per-partition row numbers in (segment, seq) order —
    contiguous from 0, append-ordered across segments, exactly the
    invariant a consumer relies on.
    """
    from pyspark.sql import Window

    tdir = _transport_dir(bootstrap_servers, topic)
    df = spark.read.option("basePath", tdir).parquet(tdir)
    w = Window.partitionBy("partition").orderBy("segment", "seq")
    return df.select(
        "key",
        "value",
        F.lit(topic).alias("topic"),
        F.col("partition").cast("int").alias("partition"),
        (F.row_number().over(w) - 1).cast("long").alias("offset"),
        "headers",
    )
