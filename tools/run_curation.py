"""spark-submit driver for the end-to-end corpus curation cascade.

Runs curation.curate_corpus (admission -> near-dup keep-best -> repetition
filter -> token-budget selection -> shard packing) over a documents table
and ships the two artifacts a training ingest needs:

    <output>/verdict/   one row per input doc:
                        (doc_id, verdict, keeper_doc_id, quality,
                         n_tokens, shard, pack_id)
    <output>/kept/      the kept documents WITH their text, written
                        partitioned by shard (shard=N/ dirs) in
                        (shard, pack_id, doc_id) order — the actual
                        training-shard layout downstream packing consumes

Launch (cluster):

    spark-submit --py-files dist/pcompress_spark.zip tools/run_curation.py \
        --input /warehouse/docs --output /warehouse/curated/2026-08-20 \
        --token-budget 2000000000 --n-shards 4096

Reference analog: the whole per-chunk dispatch cascade run corpus-wide
(/root/reference/rabin/rabin_dedup.c:1236-1344 with the filter dispatch
/root/reference/pcompress.c:205-401). Scale notes: n_shards is the write
parallelism knob (set >> executor count); every cascade stage keeps its
audited plan shape (see functions/curation.curate_corpus docstring).
Prints ONE JSON line with per-verdict counts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="documents table: parquet path or table name")
    ap.add_argument("--format", default="parquet",
                    choices=["parquet", "iceberg", "table"],
                    help="'iceberg'/'table' read via spark.read.table(name)")
    ap.add_argument("--output", required=True,
                    help="output dir (verdict/ + kept/ written under it)")
    ap.add_argument("--master", default="inherit",
                    help="'inherit' uses the spark-submit launcher master")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--quality-min", type=float, default=0.25)
    ap.add_argument("--threshold", type=float, default=0.3,
                    help="near-dup verified-Jaccard threshold")
    ap.add_argument("--token-budget", type=int, default=10_000)
    ap.add_argument("--pack-budget", type=int, default=2048)
    ap.add_argument("--n-shards", type=int, default=8)
    ap.add_argument("--embeddings", default=None,
                    help="optional embeddings table (vec_id == doc_id): "
                    "enables the SemDeDup semantic_dup stage between "
                    "near-dup and repetition")
    ap.add_argument("--sem-threshold", type=float, default=0.4,
                    help="semantic-dup cosine threshold (1 - eps)")
    ap.add_argument("--sem-clusters", type=int, default=8,
                    help="k-means cells for the SemDeDup pair search")
    ap.add_argument("--config-json", default=None,
                    help="DedupConfig field overrides as a JSON object")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from pcompress_spark.config import DedupConfig
    from pcompress_spark.functions.curation import curate_corpus
    from pcompress_spark.session import get_spark

    spark = get_spark(
        app_name="pcompress-spark-curation",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    overrides = json.loads(args.config_json) if args.config_json else {}
    cfg = DedupConfig(**{"shingle_k": 3, "substring_enabled": False,
                         "jaccard_threshold": args.threshold, **overrides})

    if args.format == "parquet":
        docs = spark.read.parquet(args.input)
    else:
        docs = spark.read.table(args.input)

    emb = None
    if args.embeddings:
        emb = (spark.read.parquet(args.embeddings)
               if args.format == "parquet"
               else spark.read.table(args.embeddings))
    verdict = curate_corpus(
        docs, cfg=cfg, quality_min=args.quality_min,
        threshold=args.threshold, token_budget=args.token_budget,
        pack_budget=args.pack_budget, n_shards=args.n_shards,
        embeddings=emb, sem_threshold=args.sem_threshold,
        sem_clusters=args.sem_clusters,
    )
    verdict_dir = os.path.join(args.output, "verdict")
    verdict.write.mode("overwrite").parquet(verdict_dir)

    # re-read the materialized verdict (don't recompute the cascade) and
    # join the kept rows back to their text for the shard-laid-out output
    vread = spark.read.parquet(verdict_dir)
    kept = (
        vread.where(F.col("verdict") == "kept")
        .select("doc_id", "shard", "pack_id", "n_tokens")
        .join(docs.select("doc_id", "text"), "doc_id")
        .sortWithinPartitions("shard", "pack_id", "doc_id")
    )
    kept.write.mode("overwrite").partitionBy("shard").parquet(
        os.path.join(args.output, "kept"))

    counts = {r["verdict"]: r["n"] for r in
              vread.groupBy("verdict").agg(
                  F.count(F.lit(1)).cast("long").alias("n")).collect()}
    print(json.dumps({"verdicts": counts,
                      "kept_rows": int(counts.get("kept", 0)),
                      "output": args.output}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
