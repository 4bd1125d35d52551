"""Command-line entry points mirroring the reference's CLIs.

The reference ships three executables (SURVEY.md §3): a store-and-leak
pipeline (src/main.py), an inversion-search CLI with
--target-text/--target-emb/--mode/--seed-candidates (src/app.py:211-222)
and a kNN demo (src/cod.py). This module re-creates that surface on the
Spark engine:

    python -m cyborgdb_encrypted_vector_search_spark.cli invert --target-text "..." --mode both
    python -m cyborgdb_encrypted_vector_search_spark.cli knn --target-id 42 -k 3
    python -m cyborgdb_encrypted_vector_search_spark.cli pipeline --out /tmp/coll

Config resolution order mirrors S4: CLI flags > environment
(SPARK_GRAFT_SF_DIR etc.) > defaults.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _spark():
    from cyborgdb_encrypted_vector_search_spark.session import get_spark

    return get_spark(app_name="cyborgdb-cli")


def cmd_invert(args) -> int:
    """Inversion search (reference src/app.py): evolve candidate texts
    toward a target embedding; prints the top candidates."""
    from cyborgdb_encrypted_vector_search_spark.functions import embed as E
    from cyborgdb_encrypted_vector_search_spark.operators import search as S

    spark = _spark()
    if args.target_text:
        target = E.embed_text(args.target_text)
    elif args.target_emb:
        with open(args.target_emb, encoding="utf-8") as f:
            target = json.load(f)
        if not isinstance(target, list):  # reference src/app.py:207-208
            print("error: --target-emb file must contain a JSON list", file=sys.stderr)
            return 2
    else:
        print("error: provide --target-text or --target-emb", file=sys.stderr)
        return 2
    seeds = args.seed_candidates or ["data table query", "vector search index"]
    out = S.invert_embedding(
        spark,
        target,
        seeds,
        mode=args.mode,
        seed=args.seed,
        top_n=args.top_n,
        evo_kwargs={"pop_size": args.pop_size, "generations": args.generations},
        greedy_kwargs={"restarts": args.restarts, "iters": args.iters},
    )
    for i, row in enumerate(out.collect(), 1):  # top-k printout (K6)
        print(f"{i:3d}. {row['score']:+.4f}  {row['text']}")
    return 0


def cmd_knn(args) -> int:
    """kNN retrieval (reference src/cod.py): nearest documents to a
    stored vector, plus the reconstruction prompt. Honors ``-k`` and
    ``--target-id`` (reference n_results / target id, src/cod.py:104,127)
    by parameterizing the same plan the ``knn_topk_cosine`` catalog
    entry pins: point-get target → scan+score → TakeOrderedAndProject(k)
    → broadcast join back to text."""
    from pyspark.sql import functions as F

    from cyborgdb_encrypted_vector_search_spark.functions import vector as V
    from cyborgdb_encrypted_vector_search_spark.sources.registry import (
        load,
        unit_embeddings,
    )

    spark = _spark()
    sf_dir = args.sf_dir
    un = unit_embeddings(spark, sf_dir)
    target = un.filter(F.col("vec_id") == args.target_id).select(
        F.col("unit").alias("__tu"), F.col("vnorm").alias("__tn")
    )
    top = (
        un.crossJoin(F.broadcast(target))
        .select(
            "vec_id",
            F.round(V.unit_cosine("unit", "__tu", "vnorm", "__tn"), 7).alias(
                "score"
            ),
        )
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(args.k)
    )
    docs = load(spark, "documents", sf_dir)
    out = docs.join(
        F.broadcast(top), top["vec_id"] == docs["doc_id"]
    ).select("vec_id", "text", "score")
    for row in out.orderBy(F.desc("score"), F.asc("vec_id")).collect():
        print(f"vec_id={row['vec_id']}  score={row['score']:+.5f}  {row['text'][:80]}")
    if args.prompt:
        from cyborgdb_encrypted_vector_search_spark.plans.catalog import entries

        p = entries()["knn_prompt_reconstruction"].fn(spark, sf_dir).collect()[0]
        print("\nreconstruction prompt:\n" + p["prompt"])
    return 0


def cmd_pipeline(args) -> int:
    """Store-and-extract pipeline (reference src/main.py): embed docs,
    store them in a collection, extract all vectors (the 'leak'),
    optionally encrypted so the extract yields ciphertext."""
    from pyspark.sql import functions as F

    from cyborgdb_encrypted_vector_search_spark.functions import embed as E
    from cyborgdb_encrypted_vector_search_spark.sources import registry
    from cyborgdb_encrypted_vector_search_spark.sources.collections import Collection

    spark = _spark()
    docs = registry.load(spark, "documents", args.sf_dir).limit(args.limit)
    embedded = docs.withColumn("embedding", E.make_embed_udf()("text"))
    coll = Collection.create(spark, args.name, args.out)
    if args.encrypt_key:
        coll.add_encrypted(
            embedded, args.encrypt_key, id_col="doc_id", document_col="text"
        )
        n = coll.extract_encrypted().count()
        print(f"stored+extracted {n} ENCRYPTED vectors (ciphertext only)")
    else:
        coll.add(embedded, id_col="doc_id", document_col="text")
        n = coll.extract_embeddings().count()
        print(f"stored+extracted {n} plaintext vectors (the leak)")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="cyborgdb-encrypted-vector-search-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    inv = sub.add_parser("invert", help="inversion search vs a target embedding")
    inv.add_argument("--target-text")
    inv.add_argument("--target-emb", help="path to a JSON list of floats")
    inv.add_argument("--mode", choices=["evo", "greedy", "both"], default="both")
    inv.add_argument("--seed-candidates", nargs="*")
    inv.add_argument("--seed", type=int, default=0)
    inv.add_argument("--top-n", type=int, default=30)
    inv.add_argument("--pop-size", type=int, default=60)
    inv.add_argument("--generations", type=int, default=120)
    inv.add_argument("--restarts", type=int, default=12)
    inv.add_argument("--iters", type=int, default=200)
    inv.set_defaults(fn=cmd_invert)

    knn = sub.add_parser("knn", help="top-k nearest documents to a stored vector")
    knn.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    knn.add_argument("-k", type=int, default=3, help="number of neighbors (reference n_results)")
    knn.add_argument("--target-id", type=int, default=42, help="stored vector id to query by")
    knn.add_argument("--prompt", action="store_true", help="print the reconstruction prompt")
    knn.set_defaults(fn=cmd_knn)

    pipe = sub.add_parser("pipeline", help="embed -> store -> extract")
    pipe.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    pipe.add_argument("--out", required=True)
    pipe.add_argument("--name", default="corpus")
    pipe.add_argument("--limit", type=int, default=100)
    pipe.add_argument("--encrypt-key", help="AES key; if set, vectors stored encrypted")
    pipe.set_defaults(fn=cmd_pipeline)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
