"""Vector collections: the reference's data model as Parquet tables.

Reference semantics re-created batch-first (SURVEY.md §1, §2.1):

- create / create-or-get collection  (reference src/chromadb_store.py:4,
  src/cod.py:79-84)            → Parquet directory + declared schema
- row-at-a-time ``add`` loop   (reference src/chromadb_store.py:7-8)
                               → batch append writes
- full-scan extract ("the leak", reference src/chromadb_store.py:10-12)
                               → column-pruned scan
- point get by id              (reference src/cod.py:107-120)
                               → pushed-down key-equality filter
- encrypted store/extract stub (reference src/cyborgdb_store.py:4-11)
                               → real AES-GCM BINARY column

Scale design: a collection written with ``save`` is repartitioned by a
hash of the id so point-gets and id-joins hit a bounded set of files;
ids are generated distributedly (no driver-side enumeration). Online
per-record CRUD is an explicit non-goal (batch append/compact model).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cyborgdb_encrypted_vector_search_spark.functions import crypto
from cyborgdb_encrypted_vector_search_spark.functions.vector import dim_check

# collection(id STRING, document STRING, embedding ARRAY<FLOAT>,
#            metadata MAP<STRING,STRING>)  — SURVEY.md §1.3
COLLECTION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("document", T.StringType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType(), False), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


@dataclass
class Collection:
    """A named, Parquet-backed vector collection.

    Two layouts:

    - flat (default): a plain parquet dir; CRUD (delete/upsert) is a
      full write-then-swap rewrite — fine for small/medium tables.
    - bucket-partitioned (``create(..., buckets=N)``): rows land under
      ``id_bucket=pmod(xxhash64(id), N)/`` partition dirs. Point-gets
      prune to one bucket's files, and delete/upsert REWRITE ONLY THE
      TOUCHED BUCKETS (partition-pruned read + per-bucket dir swap) —
      at 100 TB a batch of deletes costs O(touched buckets), never a
      full-table rewrite. The bucket count is recorded in a
      ``_coll_meta.json`` sidecar (underscore-prefixed: invisible to
      Spark's file listing) so any later opener sees the layout.
    """

    spark: SparkSession
    name: str
    path: str
    dim: int | None = None
    buckets: int | None = None

    _META_FILE = "_coll_meta.json"

    # -- DDL ------------------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        name: str,
        base_dir: str,
        dim: int | None = None,
        exist_ok: bool = True,
        buckets: int | None = None,
    ) -> "Collection":
        """Create-or-get (reference create→get fallback, src/cod.py:82-84)."""
        path = os.path.join(base_dir, name)
        exists = os.path.isdir(path)
        if exists and not exist_ok:
            raise FileExistsError(f"collection {name!r} already exists at {path}")
        coll = cls(spark, name, path, dim, buckets)
        if not exists:
            init = spark.createDataFrame([], COLLECTION_SCHEMA)
            if buckets:
                init = init.withColumn("id_bucket", F.lit(0).cast("int"))
                init.write.mode("overwrite").partitionBy("id_bucket").parquet(
                    path
                )
                import json as _json

                with open(os.path.join(path, cls._META_FILE), "w") as fh:
                    _json.dump({"buckets": buckets, "dim": dim}, fh)
            else:
                init.write.mode("overwrite").parquet(path)
        return coll

    @property
    def bucket_count(self) -> int | None:
        """Bucket count of the layout (from the sidecar if this handle
        was opened without one); None for flat collections."""
        if self.buckets is None:
            meta = os.path.join(self.path, self._META_FILE)
            if os.path.isfile(meta):
                import json as _json

                with open(meta) as fh:
                    self.buckets = _json.load(fh).get("buckets")
        return self.buckets

    def _bucket_expr(self, id_col: str = "id") -> Column:
        return F.pmod(F.xxhash64(F.col(id_col)), F.lit(self.bucket_count)).cast(
            "int"
        )

    def _buckets_of(self, ids_df: DataFrame, id_col: str = "id") -> list[int]:
        """The bucket set a batch of ids lands in — computed WITH
        Spark's own xxhash64 (never re-implemented driver-side), and
        bounded by the bucket count, so the collect is tiny."""
        return sorted(
            r["b"]
            for r in ids_df.select(
                self._bucket_expr(id_col).alias("b")
            )
            .distinct()
            .collect()
        )

    # -- writes ---------------------------------------------------------
    def _project_rows(
        self,
        df: DataFrame,
        id_col: str | None = None,
        document_col: str = "document",
        embedding_col: str = "embedding",
        metadata_col: str | None = None,
    ) -> DataFrame:
        """Normalize arbitrary input columns to the collection schema
        (shared by add and upsert)."""
        out = df
        if id_col is None:
            out = out.withColumn("id", F.expr("uuid()"))
            id_col = "id"
        sel = [
            F.col(id_col).cast("string").alias("id"),
            F.col(document_col).cast("string").alias("document"),
            F.col(embedding_col).cast("array<float>").alias("embedding"),
        ]
        if metadata_col is None:
            sel.append(F.lit(None).cast("map<string,string>").alias("metadata"))
        else:
            sel.append(F.col(metadata_col).alias("metadata"))
        out = out.select(*sel)
        if self.dim is not None:
            out = out.filter(
                F.col("embedding").isNull() | dim_check("embedding", self.dim)
            )
        return out

    def add(
        self,
        df: DataFrame,
        id_col: str | None = None,
        document_col: str = "document",
        embedding_col: str = "embedding",
        metadata_col: str | None = None,
    ) -> None:
        """Batch append (replaces the reference's per-record add loop,
        src/chromadb_store.py:7-8). Generates UUID ids when none given
        (reference src/cod.py:68); enforces the dim constraint the
        reference never checked."""
        out = self._project_rows(
            df, id_col, document_col, embedding_col, metadata_col
        )
        if self.bucket_count:
            # shuffle once by bucket before the partitioned write: each
            # append lands ONE file per touched bucket instead of
            # (input partitions x buckets) small files — the shuffle is
            # O(batch) and keeps every later bucket-pruned read cheap
            (
                out.withColumn("id_bucket", self._bucket_expr())
                .repartition(self.bucket_count, F.col("id_bucket"))
                .write.mode("append")
                .partitionBy("id_bucket")
                .parquet(self.path)
            )
        else:
            out.write.mode("append").parquet(self.path)

    # -- reads ----------------------------------------------------------
    def scan(self) -> DataFrame:
        """Full scan, layout-independent schema: the bucketed layout's
        partition column is dropped so consumers see the same four
        columns either way (use _scan_raw for bucket-aware plans)."""
        df = self._scan_raw()
        return df.drop("id_bucket") if "id_bucket" in df.columns else df

    def _scan_raw(self) -> DataFrame:
        if self.bucket_count:
            import glob as _glob

            # an empty bucketed table has no partition dirs to infer a
            # schema from (fresh create, or every bucket deleted) —
            # return the declared empty frame instead of failing
            if not _glob.glob(os.path.join(self.path, "id_bucket=*")):
                return self.spark.createDataFrame(
                    [], COLLECTION_SCHEMA
                ).withColumn("id_bucket", F.lit(0).cast("int"))
        return self.spark.read.parquet(self.path)

    def extract_embeddings(self) -> DataFrame:
        """The 'leak': full scan of all vectors (reference
        src/chromadb_store.py:10-12). Column-pruned to the embedding."""
        return self.scan().select("id", "embedding")

    def count(self) -> int:
        """Record count (Chroma's ``collection.count()``): a
        column-pruned count(*) over the parquet footers."""
        return self.scan().count()

    def peek(self, n: int = 10) -> DataFrame:
        """First ``n`` records by id (Chroma's ``collection.peek()``);
        ordered so the result is deterministic — plans as a global
        top-k (TakeOrderedAndProject), never a full sort."""
        return self.scan().orderBy(F.asc("id")).limit(n)

    def get_where(
        self,
        where: dict[str, str],
        include: list[str] | None = None,
        limit: int | None = None,
    ) -> DataFrame:
        """Metadata-filtered get (Chroma's ``collection.get(where=...,
        limit=...)``): every (key, value) pair must match the record's
        metadata map. The map-lookup equality is a codegen'd scan
        predicate — no join, no shuffle."""
        cols = include or ["id", "document", "embedding", "metadata"]
        if "id" not in cols:
            cols = ["id", *cols]
        df = self.scan()
        for k, v in where.items():
            df = df.filter(F.col("metadata")[k] == F.lit(v))
        df = df.select(*cols)
        return df.orderBy(F.asc("id")).limit(limit) if limit else df

    def get(self, ids: list[str], include: list[str] | None = None) -> DataFrame:
        """Point lookup by id(s) (reference src/cod.py:107-120).

        The IN-predicate is pushed into the Parquet scan; with the
        id-hash layout written by ``save`` this prunes to few files.
        """
        cols = include or ["id", "document", "embedding", "metadata"]
        if "id" not in cols:
            cols = ["id", *cols]
        if self.bucket_count:
            # prune to the buckets the requested ids hash into: the
            # id_bucket IN (...) predicate is a PartitionFilter, so the
            # point-get reads only those buckets' files
            ids_df = self.spark.createDataFrame(
                [(i,) for i in ids], "id string"
            )
            src = self._scan_raw().filter(
                F.col("id_bucket").isin(self._buckets_of(ids_df))
            )
            return src.select(*cols).filter(F.col("id").isin(ids))
        return self.scan().select(*cols).filter(F.col("id").isin(ids))

    def query(
        self,
        query_embeddings: list[list[float]] | None = None,
        query_texts: list[str] | None = None,
        n_results: int = 3,
        embedder=None,
        include: list[str] | None = None,
        where: dict[str, str] | None = None,
    ) -> DataFrame:
        """Similarity query — the reference's one serving call
        (``collection.query(query_embeddings=..., n_results=...)``,
        src/cod.py:124-129), re-expressed as ONE Spark plan for the
        whole query batch.

        Exact cosine kNN via the broadcast query-side join
        (operators/knn.knn_join): the collection never shuffles, each
        partition keeps a per-query top-k heap (WindowGroupLimit), so
        the plan is the same at 40 rows or 100 TB. Returns one row per
        (query_idx, rank) with ``id``, ``distance`` (cosine distance,
        1 − cosine similarity) and, when included, ``document`` —
        the relational shape of Chroma's parallel-lists payload.

        ``query_texts`` embeds driver-side through the D1 seam
        (``embedder`` defaults to the stub; pass a real model's encode
        there the same way make_embed_udf takes a model_factory).

        ``where`` is Chroma's metadata equality filter
        (``where={"source": "demo"}``): every (key, value) pair must
        match the record's metadata map. It is applied BEFORE scoring,
        so at scale the predicate prunes the corpus ahead of the
        cosine work — and with a metadata-partitioned layout it prunes
        files, the filtered-search shape vector stores implement with
        per-segment metadata indexes.
        """
        cols = include or ["documents", "distances"]
        corpus = self.scan()
        if where:
            for k, v in where.items():
                corpus = corpus.filter(
                    F.col("metadata")[k] == F.lit(str(v))
                )
        corpus = corpus.select(
            "id", "embedding", *(["document"] if "documents" in cols else [])
        )
        return self._query_over(
            corpus, query_embeddings, query_texts, n_results, embedder, cols
        )

    def query_encrypted(
        self,
        key: str,
        query_embeddings: list[list[float]] | None = None,
        query_texts: list[str] | None = None,
        n_results: int = 3,
        embedder=None,
        include: list[str] | None = None,
    ) -> DataFrame:
        """Similarity query against an AES-GCM-encrypted collection —
        the reference's core thesis (encrypted store + retrieval,
        src/cyborgdb_store.py + src/cod.py:124-129) as ONE dataflow:
        scan → aes_decrypt → from_json → cosine → per-query top-k, all
        inside a single Spark plan. The ciphertext never leaves the
        JVM, no decrypted intermediate is ever materialized to storage,
        and the plan shape is identical to :meth:`query` (broadcast
        queries, corpus never shuffles) with one extra scan-side
        project for the decrypt — at 100 TB the decrypt cost is a
        per-row column expression inside whole-stage codegen, not an
        extra pass."""
        cols = include or ["documents", "distances"]
        plain = self.decrypt(key)
        corpus = plain.select(
            "id", "embedding", *(["document"] if "documents" in cols else [])
        )
        return self._query_over(
            corpus, query_embeddings, query_texts, n_results, embedder, cols
        )

    def _query_over(
        self,
        corpus: DataFrame,
        query_embeddings,
        query_texts,
        n_results: int,
        embedder,
        cols: list[str],
    ) -> DataFrame:
        from cyborgdb_encrypted_vector_search_spark.functions import embed as E
        from cyborgdb_encrypted_vector_search_spark.operators import knn

        if (query_embeddings is None) == (query_texts is None):
            raise ValueError(
                "pass exactly one of query_embeddings / query_texts"
            )
        if query_texts is not None:
            dim = self.dim or E.DEFAULT_DIM
            enc = embedder or (lambda ts: E.embed_texts(ts, dim))
            query_embeddings = [list(map(float, v)) for v in enc(query_texts)]
        if self.dim is not None:
            for i, v in enumerate(query_embeddings):
                if len(v) != self.dim:
                    raise ValueError(
                        f"query {i} has dim {len(v)}, collection dim {self.dim}"
                    )
        queries = self.spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(query_embeddings)],
            "query_idx long, query_vec array<double>",
        )
        hits = knn.knn_join(
            queries,
            corpus,
            k=n_results,
            query_id_col="query_idx",
            query_vec_col="query_vec",
            corpus_id_col="id",
            corpus_vec_col="embedding",
            rank_col="rank",
        )
        out = [F.col("query_idx"), F.col("rank"), F.col("id")]
        if "documents" in cols:
            out.append(F.col("document"))
        if "distances" in cols:
            out.append((F.lit(1.0) - F.col("score")).alias("distance"))
        return hits.select(*out)

    # -- batch maintenance (append/compact model; online CRUD is an
    #    explicit non-goal — SURVEY.md §7 hard parts (d)) ---------------
    def compact(self, target_partitions: int = 8) -> int:
        """Rewrite the collection into ``target_partitions`` files.

        Batch appends accumulate small files (each ``add`` writes >=1);
        periodic compaction restores scan efficiency. Write-then-swap:
        the new layout lands in a staging dir and replaces the old one
        only after a successful write, so readers never see a partial
        table. Returns the row count."""
        import shutil

        staged = self.path + ".compacting"
        if self.bucket_count:
            # keep the bucket layout: one hash-partitioned write keyed
            # by id_bucket folds each bucket's small files into one
            df = self._scan_raw().repartition("id_bucket")
            n = df.count()
            df.write.mode("overwrite").partitionBy("id_bucket").parquet(staged)
            meta = os.path.join(self.path, self._META_FILE)
            if os.path.isfile(meta):
                shutil.copy(meta, os.path.join(staged, self._META_FILE))
        else:
            df = self.scan().repartition(target_partitions)
            n = df.count()
            df.write.mode("overwrite").parquet(staged)
        old = self.path + ".old"
        shutil.move(self.path, old)
        shutil.move(staged, self.path)
        shutil.rmtree(old)
        return n

    def _swap_in(self, keep: DataFrame, staged_suffix: str) -> int:
        """Write ``keep`` to a staging dir, then atomically swap it in
        for the current table (write-then-swap; readers never see a
        partial table). Returns rows remaining."""
        import shutil

        staged = self.path + staged_suffix
        n = keep.count()
        keep.write.mode("overwrite").parquet(staged)
        old = self.path + ".old"
        shutil.move(self.path, old)
        shutil.move(staged, self.path)
        shutil.rmtree(old)
        return n

    def _rewrite_buckets(self, ids_df: DataFrame, new_rows: DataFrame | None) -> int:
        """Partition-pruned CRUD core for the bucketed layout: read
        ONLY the buckets the incoming ids hash into (id_bucket IN (...)
        is a PartitionFilter), anti-join the ids out, optionally union
        replacement rows, stage the result partitioned, then swap just
        the touched bucket dirs. Untouched buckets are never read,
        never rewritten — the 100 TB CRUD contract. A bucket left empty
        by a pure delete is removed (staging has no dir for it).
        Returns the number of touched buckets."""
        import shutil

        affected = self._buckets_of(ids_df)
        if not affected:
            return 0
        incoming = ids_df.select(F.col("id").cast("string").alias("id")).distinct()
        keep = (
            self._scan_raw()
            .filter(F.col("id_bucket").isin(affected))
            .join(F.broadcast(incoming), "id", "left_anti")
        )
        out = keep
        if new_rows is not None:
            out = keep.unionByName(
                new_rows.withColumn("id_bucket", self._bucket_expr())
            )
        # pid-suffixed staging: two concurrent CRUD jobs on the same
        # collection must not share a staging dir (last-writer-wins on
        # the bucket swap below is the documented concurrency model,
        # but a shared stage would interleave FILES, not buckets)
        staged = f"{self.path}.crud_stage{os.getpid()}"
        (
            out.repartition(max(len(affected), 1), F.col("id_bucket"))
            .write.mode("overwrite")
            .partitionBy("id_bucket")
            .parquet(staged)
        )
        for b in affected:
            old_dir = os.path.join(self.path, f"id_bucket={b}")
            new_dir = os.path.join(staged, f"id_bucket={b}")
            if os.path.isdir(old_dir):
                shutil.rmtree(old_dir)
            if os.path.isdir(new_dir):
                shutil.move(new_dir, old_dir)
        shutil.rmtree(staged, ignore_errors=True)
        return len(affected)

    def delete(self, ids: list[str]) -> int:
        """Batch delete by a SMALL caller-provided id list: the
        NOT-IN predicate pushes into the scan. For id sets of
        DataFrame scale use ``delete_matching`` — never materialize a
        big id list on the driver. On a bucketed layout only the
        touched buckets are rewritten; flat layouts pay the full
        write-then-swap. Returns rows remaining (flat) or touched
        buckets (bucketed)."""
        if self.bucket_count:
            ids_df = self.spark.createDataFrame([(i,) for i in ids], "id string")
            return self._rewrite_buckets(ids_df, None)
        keep = self.scan().filter(~F.col("id").isin(ids))
        return self._swap_in(keep, ".deleting")

    def _without(self, ids_df: DataFrame, id_col: str = "id") -> DataFrame:
        """The collection minus every id in ``ids_df``: a left-anti
        join plan (the incoming side shuffles/broadcasts by id; the
        collection side streams — no driver materialization)."""
        incoming = ids_df.select(
            F.col(id_col).cast("string").alias("id")
        ).distinct()
        return self.scan().join(incoming, "id", "left_anti")

    def delete_matching(self, ids_df: DataFrame, id_col: str = "id") -> int:
        """Batch delete of every id present in ``ids_df`` via left-anti
        join — fully distributed. Bucketed layouts rewrite only the
        touched buckets; flat layouts swap the full table."""
        if self.bucket_count:
            return self._rewrite_buckets(
                ids_df.select(F.col(id_col).cast("string").alias("id")), None
            )
        return self._swap_in(self._without(ids_df, id_col), ".deleting")

    def upsert(self, df: DataFrame, id_col: str = "id", **kwargs) -> None:
        """Batch upsert: anti-join out the incoming ids, then append
        the new rows. Both halves are distributed jobs — at ingest
        scale the incoming batch never lands on the driver. On a
        bucketed layout the old-row removal and the new-row insert land
        in ONE partition-pruned rewrite of just the touched buckets."""
        if self.bucket_count:
            new_rows = self._project_rows(df, id_col=id_col, **kwargs)
            self._rewrite_buckets(
                df.select(F.col(id_col).cast("string").alias("id")), new_rows
            )
            return
        self.delete_matching(df, id_col=id_col)
        self.add(df, id_col=id_col, **kwargs)

    # -- layouts ---------------------------------------------------------
    def save_bucketed(
        self, table_name: str, n_buckets: int = 16, df: DataFrame | None = None
    ) -> None:
        """Materialize the collection as a bucketed catalog table
        (bucketBy id, sorted within buckets).

        Two collections bucketed the same way join on id with NO
        shuffle on either side (SortMergeJoin over pre-bucketed files) —
        the layout you give a 100 TB collection that serves id-joins and
        point-gets. Verified by tests/test_ann_collections.py asserting
        the join plan has no Exchange.
        """
        src = df if df is not None else self.scan()
        (
            src.write.mode("overwrite")
            .bucketBy(n_buckets, "id")
            .sortBy("id")
            .format("parquet")
            .saveAsTable(table_name)
        )

    # -- interchange formats (reference S1/S3 read text/JSON files;
    #    SURVEY.md §2.1 S1-S3) ---------------------------------------------
    def export_json(self, path: str) -> None:
        """Write the collection as JSON lines — arrays and the metadata
        map serialize natively; a distributed write, one file per
        partition (the portable interchange dump)."""
        self.scan().write.mode("overwrite").json(path)

    def export_csv(self, path: str) -> None:
        """Write as headered CSV. CSV has no nested types, so the
        embedding and metadata columns travel as JSON strings — the
        standard flat-file escape hatch."""
        self.scan().select(
            "id",
            "document",
            F.to_json("embedding").alias("embedding_json"),
            F.to_json("metadata").alias("metadata_json"),
        ).write.mode("overwrite").option("header", True).csv(path)

    @staticmethod
    def read_json_export(spark: SparkSession, path: str) -> DataFrame:
        """Read a JSON export back with the declared collection schema
        (never inferred — schema inference is a full extra pass and can
        drift on sparse nulls)."""
        return spark.read.schema(COLLECTION_SCHEMA).json(path)

    @staticmethod
    def read_csv_export(spark: SparkSession, path: str) -> DataFrame:
        """Read a CSV export back, rehydrating the nested columns with
        from_json — JVM-side parsing, no Python in the pipeline."""
        return (
            spark.read.option("header", True)
            .csv(path)
            .select(
                F.col("id").cast("string"),
                F.col("document").cast("string"),
                F.from_json(
                    "embedding_json", T.ArrayType(T.FloatType())
                ).alias("embedding"),
                F.from_json(
                    "metadata_json",
                    T.MapType(T.StringType(), T.StringType()),
                ).alias("metadata"),
            )
        )

    @classmethod
    def import_file(
        cls,
        spark: SparkSession,
        name: str,
        base_dir: str,
        src_path: str,
        fmt: str = "json",
        dim: int | None = None,
    ) -> "Collection":
        """Create a collection from a JSON/CSV export (batch import)."""
        if fmt == "json":
            df = cls.read_json_export(spark, src_path)
        elif fmt == "csv":
            df = cls.read_csv_export(spark, src_path)
        else:
            raise ValueError(f"unsupported import format: {fmt!r}")
        coll = cls.create(spark, name, base_dir, dim=dim)
        coll.add(df, id_col="id", metadata_col="metadata")
        return coll

    # -- encrypted variant (reference src/cyborgdb_store.py) -------------
    def add_encrypted(self, df: DataFrame, key: str, **kwargs) -> None:
        """Store with AES-GCM-encrypted embedding + document columns.

        ``metadata_col`` (optional) names a MAP<STRING,STRING> column of
        plaintext metadata to carry alongside the ciphertext; the
        reserved ``embedding_ct`` entry is stripped from it first so a
        round-trip (decrypt → re-encrypt, e.g. key rotation) can't
        smuggle a stale ciphertext through."""
        staged = df
        emb = kwargs.pop("embedding_col", "embedding")
        doc = kwargs.pop("document_col", "document")
        meta = kwargs.pop("metadata_col", None)
        staged = staged.withColumn(
            "__emb_ct", crypto.encrypt_vector(emb, key)
        ).withColumn("__doc_ct", crypto.encrypt_text(doc, key))
        ct_map = F.create_map(F.lit("embedding_ct"), F.base64("__emb_ct"))
        if meta is not None:
            extra = F.map_filter(
                F.coalesce(F.col(meta), F.create_map().cast("map<string,string>")),
                lambda k, _v: k != F.lit("embedding_ct"),
            )
            ct_map = F.map_concat(extra, ct_map)
        out = staged.select(
            (F.col(kwargs["id_col"]).cast("string") if kwargs.get("id_col") else F.expr("uuid()")).alias("id"),
            F.base64("__doc_ct").alias("document"),
            F.array().cast("array<float>").alias("embedding"),
            ct_map.alias("metadata"),
        )
        out.write.mode("append").parquet(self.path)

    def extract_encrypted(self) -> DataFrame:
        """Scan of the encrypted table: yields ciphertext only (the
        mitigation the reference stubs, src/cyborgdb_store.py:10-11)."""
        return self.scan().select("id", F.col("metadata")["embedding_ct"].alias("embedding_ct"))

    def decrypt(self, key: str) -> DataFrame:
        """Authorized read: decrypt embeddings + documents exactly.

        ``metadata`` carries the record's plaintext metadata entries
        (everything except the reserved ``embedding_ct`` ciphertext),
        so consumers — key rotation in particular — see the full
        record, not a lossy projection."""
        return self.scan().select(
            "id",
            crypto.decrypt_text(F.unbase64("document"), key).alias("document"),
            crypto.decrypt_vector(
                F.unbase64(F.col("metadata")["embedding_ct"]), key
            ).alias("embedding"),
            F.map_filter(
                F.col("metadata"), lambda k, _v: k != F.lit("embedding_ct")
            ).alias("metadata"),
        )

    def rotate_key(
        self, old_key: str, new_key: str, dest_base_dir: str
    ) -> "Collection":
        """Batch key rotation: decrypt with the old key and re-encrypt
        with the new one in ONE scan-project job (no shuffle — at
        100 TB this is a pure map over the ciphertext files), written
        to a NEW collection directory so the swap is atomic at the
        directory level and the old ciphertext survives until the
        cutover commits. AES-GCM draws fresh IVs, so rotated
        ciphertexts share nothing with the originals even where the
        plaintext is identical. Plaintext metadata entries ride through
        the rotation untouched (decrypt exposes them; add_encrypted
        merges them back beside the fresh ciphertext). Returns the
        rotated collection."""
        rotated = Collection.create(
            self.spark, self.name, dest_base_dir, dim=self.dim
        )
        rotated.add_encrypted(
            self.decrypt(old_key), new_key, id_col="id", metadata_col="metadata"
        )
        return rotated


def list_collections(base_dir: str) -> list[str]:
    """Names of the collections under ``base_dir`` (Chroma's
    ``client.list_collections()``): any subdirectory holding a parquet
    table or a collection meta sidecar."""
    if not os.path.isdir(base_dir):
        return []
    out = []
    for name in sorted(os.listdir(base_dir)):
        p = os.path.join(base_dir, name)
        if not os.path.isdir(p):
            continue
        if (
            os.path.isfile(os.path.join(p, "_SUCCESS"))
            or os.path.isfile(os.path.join(p, Collection._META_FILE))
            or any(f.endswith(".parquet") for f in os.listdir(p))
        ):
            out.append(name)
    return out


def delete_collection(base_dir: str, name: str) -> bool:
    """Drop a collection (Chroma's ``client.delete_collection()``).
    Returns False if it does not exist."""
    import shutil

    p = os.path.join(base_dir, name)
    if not os.path.isdir(p):
        return False
    shutil.rmtree(p)
    return True


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "id",
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """CDC-style reconciliation of two collection snapshots: one row per
    changed id, classified ``I`` (insert: new only), ``D`` (delete: old
    only), or ``U`` (update: both sides, any compare column differs).
    Unchanged ids are dropped. This is the change-data-capture primitive
    a 100 TB pipeline runs between table versions to feed incremental
    consumers (index maintenance, downstream syncs) a delta instead of
    a full re-read.

    Comparison is null-safe (``eqNullSafe``) per column; array columns
    (embeddings) compare element-wise through Spark's native array
    equality — no serialization round-trip.

    Scale shape: ONE full outer join, shuffling each side once on the
    id. When both snapshots are bucket-partitioned by the same
    ``pmod(xxhash64(id), N)`` layout (Collection.save_bucketed), reading
    per-bucket pairs makes the join co-partitioned — the shuffle
    disappears and the diff streams bucket by bucket (pinned in
    tests/test_round5c.py).
    """
    cols = compare_cols or [c for c in old.columns if c != id_col]
    o = old.select(
        F.col(id_col).alias("__oid"),
        *[F.col(c).alias(f"__o_{c}") for c in cols],
    )
    n = new.select(
        F.col(id_col).alias("__nid"),
        *[F.col(c).alias(f"__n_{c}") for c in cols],
    )
    joined = o.join(n, o["__oid"] == n["__nid"], "full_outer")
    same = F.lit(True)
    for c in cols:
        same = same & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    change = (
        F.when(F.col("__oid").isNull(), F.lit("I"))
        .when(F.col("__nid").isNull(), F.lit("D"))
        .when(~same, F.lit("U"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            F.coalesce(F.col("__oid"), F.col("__nid")).alias(id_col),
            "change",
        )
    )
