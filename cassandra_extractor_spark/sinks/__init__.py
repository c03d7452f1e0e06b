from cassandra_extractor_spark.sinks.fanout import fan_out  # noqa: F401
from cassandra_extractor_spark.sinks.jsonl import write_jsonl  # noqa: F401
