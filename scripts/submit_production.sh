#!/usr/bin/env bash
# Production spark-submit template: Cassandra -> multi-sink extraction
# on a real cluster. Local testing uses parquet fixtures instead
# (see README); this documents the cluster-side wiring.
set -euo pipefail

spark-submit \
  --master "${SPARK_MASTER:-yarn}" \
  --deploy-mode cluster \
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
  --properties "${JOB_PROPERTIES:-job.properties}" \
  "$@"
