from cassandra_extractor_spark.functions.tablespecs import TableSpec, apply_table_spec  # noqa: F401
