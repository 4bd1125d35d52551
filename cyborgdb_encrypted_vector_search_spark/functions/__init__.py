from cyborgdb_encrypted_vector_search_spark.functions import crypto, hashing, text, vector  # noqa: F401
