from cassandra_extractor_spark.streaming.hwm import HighWaterMarkStore, incremental_extract  # noqa: F401
