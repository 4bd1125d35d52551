from cyborgdb_encrypted_vector_search_spark.plans import catalog  # noqa: F401
