"""cyborgdb_encrypted_vector_search_spark — a PySpark-native vector-collection analytics engine.

A from-scratch, Spark-first re-creation of the query/data-processing
capabilities of the reference repo ``vinodnextcoder/cyborgdb-encrypted-vector-search``
(a vector-collection data model with insert / point-get / full-scan /
top-k-similarity operators plus an iterative embed→score→rank→mutate
dataflow), generalized into the operator set a large-scale LLM training
data pipeline needs: deduplication (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding near-dup), similarity search (exact brute
force and IVF / LSH approximate), text analysis (language id, quality
scoring, token counting, fingerprinting), encrypted-at-rest collections,
and Structured Streaming ingest.

Design stance (SURVEY.md §7): everything is declarative DataFrame /
Spark SQL so Catalyst handles pushdown, pruning, broadcast selection and
whole-stage codegen; Python UDFs appear only where semantics genuinely
require them (seeded mutation, grouped sequential search loops), always
Arrow-batched.
"""

__version__ = "0.1.0"
