from cyborgdb_encrypted_vector_search_spark.sources import collections, registry  # noqa: F401
