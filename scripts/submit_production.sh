#!/usr/bin/env bash
# Production spark-submit template: Cassandra -> multi-sink extraction
# on a real cluster.
#
# HONEST STATUS: this is a deployment *template*, not a turn-key
# script.  The CLI (`app.py`) currently reads the parquet test catalog
# (`sources/catalog.py`) — the production Cassandra path is wired in
# `sources/cassandra.read_cassandra` and needs a small driver that
# builds the DataFrame from `CassandraSource(...)` instead of
# `--sf-dir`.  The HWM store is a local/shared-FS JSON file
# (`--hwm-state`): point it at a mounted shared path, NOT an s3:// URI.
set -euo pipefail

# ship the whole package to executors/driver (cluster mode runs app.py
# in a container that does not have the repo checkout)
PKG_ZIP=$(mktemp -u /tmp/cassandra_extractor_spark.XXXX.zip)
(cd "$(dirname "$0")/.." && zip -qr "$PKG_ZIP" cassandra_extractor_spark)

spark-submit \
  --master "${SPARK_MASTER:-yarn}" \
  --deploy-mode cluster \
  --py-files "$PKG_ZIP" \
  --packages \
com.datastax.spark:spark-cassandra-connector_2.13:3.5.1,\
org.apache.spark:spark-sql-kafka-0-10_2.13:4.0.0,\
org.postgresql:postgresql:42.7.3,\
org.apache.hadoop:hadoop-aws:3.4.0 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-2000}" \
  --conf spark.sql.files.maxPartitionBytes=134217728 \
  --conf spark.dynamicAllocation.enabled=true \
  --conf spark.cassandra.connection.host="${CASSANDRA_HOSTS}" \
  --conf spark.cassandra.input.fetch.size_in_rows=10000 \
  --conf spark.sql.session.timeZone=UTC \
  cassandra_extractor_spark/app.py \
  -T "${TABLES}" \
  --output "${OUTPUT_URI}" \
  --sinks jsonl \
  --hwm-column modified_timestamp \
  --hwm-state "${HWM_STATE_PATH:-/mnt/shared/hwm.json}" \
  --properties "${JOB_PROPERTIES:-job.properties}" \
  "$@"
