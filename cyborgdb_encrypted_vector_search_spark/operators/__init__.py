from cyborgdb_encrypted_vector_search_spark.operators import dedup, knn, textops  # noqa: F401
