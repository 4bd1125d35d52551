from cyborgdb_encrypted_vector_search_spark.streaming import ingest  # noqa: F401
