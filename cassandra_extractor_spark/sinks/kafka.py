"""Kafka sink (reference K1: ``kafkaworker.py``).

The reference produces one message per record with a templated value,
optional templated key and headers, a topic list with prefix, and a
weighted round-robin partition choice (smooth WRR over ``id:weight``
pairs, roundrobin.py:5-29).  Spark-first: build a frame with
``key``/``value``/``headers``/``partition`` columns and hand it to the
built-in Kafka sink; batching/linger/acks are producer configs, not
code (kafkaworker.py:24-50 → ``kafka.*`` options).

The weighted partitioner is re-expressed **deterministically and
distributed**: each row hashes to a point in the cumulative-weight
space (``pmod(xxhash64(key), total_weight)``), giving the same
long-run weighting as smooth WRR without any driver-side counter —
the sequential-counter version cannot scale past one producer thread.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F

from cassandra_extractor_spark.functions.tablespecs import render_template


@dataclass
class KafkaSinkConfig:
    """Mirror of the reference's Kafka config surface (app.py:332-347)."""

    bootstrap_servers: str
    topic: str
    topic_prefix: str = ""
    key_template: str | None = None  # %(col)s templates (kafkaworker.py:180-182)
    value_template: str | None = None  # default: whole row as JSON
    header_columns: list[str] = field(default_factory=list)
    #: ``{partition_id: weight}`` — the reference's id:weight pairs
    partition_weights: dict[int, int] | None = None
    producer_options: dict[str, str] = field(default_factory=dict)
    #: first-class delivery knobs (reference flush/ack policy,
    #: kafkaworker.py:85-106).  These are CONFIG PASS-THROUGH: with no
    #: broker in the sandbox the values are asserted to reach the
    #: writer option map, never observed live.  Explicit fields win
    #: over the same key in ``producer_options``.  NOTE: the reference
    #: defaults acks=-1 and derives a FRACTIONAL linger.ms from
    #: flush_latency (default 0.5 ms) — neither default is implied
    #: here: pass ``acks="-1"`` explicitly to mirror it.  ``linger_ms``
    #: accepts whole-valued floats for API symmetry, but this sink
    #: feeds Spark's built-in Kafka writer whose JAVA producer parses
    #: ``linger.ms`` as a Long — a fractional value (the reference's
    #: librdkafka-only 0.5 ms capability) is REJECTED at config time
    #: with an explanatory error rather than exploding at producer
    #: construction.
    acks: str | None = None
    linger_ms: float | int | None = None

    @property
    def full_topic(self) -> str:
        return f"{self.topic_prefix}{self.topic}"


def weighted_partition_col(weights: dict[int, int], on: Column) -> Column:
    """Deterministic weighted partition choice (reference smooth WRR,
    roundrobin.py:5-29): hash the row into cumulative-weight buckets.

    Distributed-safe: no shared counter; the hash is uniform so each
    partition receives traffic proportional to its weight.
    """
    total = sum(weights.values())
    point = F.pmod(F.xxhash64(on), F.lit(total))
    result = F.lit(list(weights)[0])
    cum = 0
    for pid, w in weights.items():
        result = F.when((point >= cum) & (point < cum + w), F.lit(pid)).otherwise(result)
        cum += w
    return result.cast("int")


def prepare_kafka_frame(df: DataFrame, cfg: KafkaSinkConfig) -> DataFrame:
    """Compile the record→message mapping into a Kafka-sink frame
    (columns: key, value, optional headers/partition)."""
    if cfg.value_template:
        df = render_template(df, cfg.value_template, out="__value")
        value = F.col("__value")
    else:
        value = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    cols = [value.cast("string").alias("value")]
    if cfg.key_template:
        df = render_template(df, cfg.key_template, out="__key")
        cols.insert(0, F.col("__key").cast("string").alias("key"))
    if cfg.header_columns:
        cols.append(
            F.array(
                *[
                    F.struct(F.lit(c).alias("key"), F.col(c).cast("string").cast("binary").alias("value"))
                    for c in cfg.header_columns
                ]
            ).alias("headers")
        )
    if cfg.partition_weights:
        key_col = F.col("__key") if cfg.key_template else value
        cols.append(weighted_partition_col(cfg.partition_weights, key_col).alias("partition"))
    return df.select(*cols)


def kafka_writer_options(cfg: KafkaSinkConfig) -> dict[str, str]:
    """The exact option map handed to the Kafka writer — pure so the
    ``producer_options`` → ``kafka.*`` pass-through (the reference's
    flush/linger/acks policies, kafkaworker.py:85-106 → linger.ms /
    batch.size / acks) is unit-testable without a broker."""
    opts = {
        "kafka.bootstrap.servers": cfg.bootstrap_servers,
        "topic": cfg.full_topic,
        "includeHeaders": "true",
    }
    for k, v in cfg.producer_options.items():
        opts[f"kafka.{k}" if not k.startswith("kafka.") else k] = v
    # explicit fields last: more specific than the generic map
    if cfg.acks is not None:
        opts["kafka.acks"] = cfg.acks
    if cfg.linger_ms is not None:
        # the Java client parses linger.ms as a Long: '0.5' throws
        # ConfigException at producer construction — fail fast here
        if cfg.linger_ms != int(cfg.linger_ms):
            raise ValueError(
                f"linger_ms={cfg.linger_ms!r}: Spark's Kafka sink uses the "
                "Java producer, which parses linger.ms as an integer number "
                "of milliseconds; sub-millisecond linger (the reference's "
                "librdkafka flush_latency=0.5ms) is not expressible — pass "
                "0 (fire immediately) or a whole number of ms."
            )
        opts["kafka.linger.ms"] = str(int(cfg.linger_ms))
    return opts


def map_kafka_error(exc: Exception) -> Exception:
    """Error split: only the missing-jar case gets the setup hint;
    genuine runtime failures (auth, broker down, serialization)
    propagate as-is."""
    msg = str(exc)
    if (
        "DATA_SOURCE_NOT_FOUND" in msg
        or "Failed to find data source" in msg
        or "ClassNotFoundException" in msg
    ):
        err = RuntimeError(
            "Kafka sink unavailable: add org.apache.spark:spark-sql-kafka-0-10 "
            "to spark.jars.packages and point bootstrap_servers at a broker."
        )
        err.__cause__ = exc
        return err
    return exc


def write_kafka(df: DataFrame, cfg: KafkaSinkConfig) -> None:
    """Write to Kafka via the built-in sink (requires the
    spark-sql-kafka package on the classpath).

    ``file://`` bootstrap servers route to the directory-backed topic
    log (sinks/kafka_file.py) AFTER the identical frame-compile +
    option-map path — the offline round-trip used by the live tests.
    """
    frame = prepare_kafka_frame(df, cfg)
    opts = kafka_writer_options(cfg)
    if cfg.bootstrap_servers.startswith("file://"):
        from cassandra_extractor_spark.sinks.kafka_file import write_file_transport

        write_file_transport(frame, opts)
        return
    writer = frame.write.format("kafka")
    for k, v in opts.items():
        writer = writer.option(k, v)
    try:
        writer.save()
    except Exception as exc:
        # keep the real Kafka failure on the cause chain: the old
        # `from exc.__cause__` overwrote the mapped error's cause with
        # the original exception's own (usually None) and dropped it;
        # pass-through errors keep their own cause (no self-cycle)
        mapped = map_kafka_error(exc)
        raise mapped from (exc if mapped is not exc else exc.__cause__)
