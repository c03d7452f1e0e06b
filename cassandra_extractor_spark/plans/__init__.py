from cassandra_extractor_spark.plans.spec import ExtractionSpec, run_extraction  # noqa: F401
