"""spark-submit driver for the benchmark-decontamination gates.

Scores a documents table against an eval-suite table through one of the
three gates and writes the per-document report a training ingest consumes:

    exact   curation.decontaminate        — n-gram leak ratio, broadcast
                                            eval-gram set
    bloom   curation.decontaminate_bloom  — the same gate through a
                                            fixed-size Bloom bitmap (the
                                            broadcast-won't-fit scale path;
                                            conservative: can only over-flag)
    near    curation.neardup_decontaminate — MinHash near-dup of a benchmark
                                            doc (the paraphrase-leak gate;
                                            report rows are contaminated
                                            docs only)

Launch (cluster):

    spark-submit --py-files dist/pcompress_spark.zip tools/run_decontam.py \
        --input /warehouse/docs --benchmark /warehouse/eval_suite \
        --output /warehouse/decontam/2026-08-20 --mode exact

Both inputs need (doc_id, text). Prints ONE JSON line with the
contaminated-row count. The streaming twins of these gates are
streaming/dedup_stream.start_decontam_stream (exact) and
start_bench_probe_stream (near, transcripts).
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
    ap.add_argument("--benchmark", required=True,
                    help="eval-suite table: parquet path or table name")
    ap.add_argument("--format", default="parquet",
                    choices=["parquet", "iceberg", "table"])
    ap.add_argument("--output", required=True,
                    help="report parquet dir")
    ap.add_argument("--mode", default="exact",
                    choices=["exact", "bloom", "near"])
    ap.add_argument("--master", default="inherit")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--ngram", type=int, default=3,
                    help="word n-gram size (exact/bloom modes)")
    ap.add_argument("--overlap-threshold", type=float, default=0.5,
                    help="contamination ratio cut (exact/bloom modes)")
    ap.add_argument("--jaccard-threshold", type=float, default=0.3,
                    help="verified-Jaccard cut (near mode)")
    ap.add_argument("--bloom-bits", type=int, default=1 << 16,
                    help="Bloom bitmap size in bits (bloom mode)")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from pcompress_spark.functions import curation
    from pcompress_spark.session import get_spark

    spark = get_spark(
        app_name="pcompress-spark-decontam",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )

    def read(name: str):
        return (spark.read.parquet(name) if args.format == "parquet"
                else spark.read.table(name))

    docs = read(args.input).select("doc_id", "text")
    bench = read(args.benchmark).select("doc_id", "text")

    if args.mode == "exact":
        rep = curation.decontaminate(
            docs, bench, n=args.ngram,
            overlap_threshold=args.overlap_threshold)
    elif args.mode == "bloom":
        rep = curation.decontaminate_bloom(
            docs, bench, n=args.ngram,
            overlap_threshold=args.overlap_threshold,
            m_bits=args.bloom_bits)
    else:
        rep = curation.neardup_decontaminate(
            docs, bench, threshold=args.jaccard_threshold)

    rep.write.mode("overwrite").parquet(args.output)
    # count from the materialized report, not a cascade recompute
    written = spark.read.parquet(args.output)
    n_total = written.count()
    n_contam = (n_total if args.mode == "near"  # near emits leaks only
                else written.where(F.col("contaminated")).count())
    print(json.dumps({"mode": args.mode, "rows": int(n_total),
                      "contaminated": int(n_contam),
                      "output": args.output}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
