"""spark-submit driver for the daily-ingest (delta-vs-corpus) admission loop.

The batch pipeline (tools/run_pipeline.py) dedups a corpus once; THIS entry
point runs the loop a web-scale training-data pipeline actually operates:
admit each day's delta against persistent corpus state without re-pairing,
re-banding, or re-clustering the corpus, then fold the admitted docs into
that state so tomorrow's delta probes today's corpus. Reference analog: the
persistent global index admits new blocks against prior occupants without
revisiting them (/root/reference/rabin/global/index.c:140-151, 485-558).

State layout under --state-dir (parquet stage tables, the "persisted
corpus run" inputs of functions/incremental.py):

    sig/     doc signatures        (append-per-run subdirs: run=<tag>/)
    bands/   exploded LSH bands    (append-per-run subdirs)
    md5/     exact-dup index rows  (append-per-run subdirs; re-min'd on read)
    labels/  cluster assignment    (FULL table, atomically replaced per run)

Bootstrap once from the existing corpus:

    spark-submit --py-files dist/pcompress_spark.zip tools/run_incremental.py \
        --bootstrap --corpus /warehouse/docs --state-dir /warehouse/dedup_state

Then per delta batch:

    spark-submit ... tools/run_incremental.py \
        --delta /warehouse/incoming/2026-08-19 \
        --state-dir /warehouse/dedup_state --out /warehouse/admissions/2026-08-19

Outputs under --out: admission/ (doc_id, keep, dup_kind, dup_of), pairs/
(the delta-endpoint near-dup evidence, computed ONCE and reused by both
the admission verdict and the label merge), and delta_sig/ (the delta's
signatures, materialized once — pair generation and the state fold both
read it, so the Arrow kernel chain runs a single time per delta).
Admitted (keep=1) docs'
signature/band/md5 rows are appended to the state; labels/ is rewritten
with the merged assignment (corpus ∪ delta — dropped dups keep a label row
recording which cluster absorbed them). Scale note: state appends and all
probes are O(delta + touched); only the labels rewrite is O(corpus
label rows) — a narrow table; keep per-run label deltas instead (the
streaming store's latest-row-wins layout, streaming/dedup_stream.py) if
even that is too hot.

Crash safety / idempotent re-run protocol:
  - the default run tag is a HASH OF THE DELTA'S FILE LISTING, so
    re-running a crashed (or even completed) delta reuses the same tag;
  - a run first DELETES any partial run=<tag> state subdirs from a prior
    attempt, so state reads always see the pre-run corpus and appends are
    never duplicated;
  - every output that depends on pre-run state (pairs, admission, the
    merged labels) is MATERIALIZED before any state mutation: labels are
    staged to labels._tmp first, the sig/bands/md5 folds run next, and the
    labels commit (delete + rename) happens last;
  - an interrupted commit is recovered at the next run's start: a complete
    labels._tmp (parquet _SUCCESS present) with no labels/ is renamed into
    place; a stale tmp next to an intact labels/ is deleted.
  A killed run at ANY point therefore re-runs to the same end state.

Delta doc_ids must be disjoint from the corpus state's doc_ids (validated
against the signature table before any work; a collision would produce
conflicting duplicate label rows).

Input: parquet with columns (doc_id long, text string).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _hadoop_fs(spark, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm


def _stage_replace(spark, df, path: str) -> None:
    """First half of the full-table replace: materialize the new table to
    ``<path>._tmp`` (parquet _SUCCESS marks completeness). The destination
    is untouched until _commit_replace."""
    df.write.mode("overwrite").parquet(path.rstrip("/") + "._tmp")


def _commit_replace(spark, path: str) -> None:
    """Second half: delete the old table, rename the staged tmp over it.
    A crash between delete and rename leaves a complete tmp and no
    destination — _recover_replace at the next run's start finishes the
    rename (module docstring protocol)."""
    fs, dst, jvm = _hadoop_fs(spark, path)
    hpath = jvm.org.apache.hadoop.fs.Path
    tmp = path.rstrip("/") + "._tmp"
    if fs.exists(dst):
        fs.delete(dst, True)
    if not fs.rename(hpath(tmp), dst):
        raise IOError(f"rename failed: {tmp} -> {path}")


def _replace_dir(spark, df, path: str) -> None:
    """Atomic-ish full-table replace (stage + commit in one step — used by
    bootstrap, where there is no state to keep consistent with)."""
    _stage_replace(spark, df, path)
    _commit_replace(spark, path)


def _recover_replace(spark, path: str) -> None:
    """Finish or abort an interrupted _commit_replace: a COMPLETE tmp
    (_SUCCESS present) with no destination is renamed into place (the
    crash hit between delete and rename); any tmp next to an intact
    destination is a stale pre-commit artifact and is deleted."""
    fs, dst, jvm = _hadoop_fs(spark, path)
    hpath = jvm.org.apache.hadoop.fs.Path
    tmp = path.rstrip("/") + "._tmp"
    tmp_p = hpath(tmp)
    if fs.exists(dst):
        if fs.exists(tmp_p):
            fs.delete(tmp_p, True)
    elif fs.exists(hpath(tmp + "/_SUCCESS")):
        if not fs.rename(tmp_p, dst):
            raise IOError(f"recovery rename failed: {tmp} -> {path}")


def _delete_run_dirs(spark, paths: dict, tag: str, delta) -> bool:
    """Idempotent re-run cleanup: drop any run=<tag> appends a prior
    attempt of THIS delta left behind, so state reads see the pre-run
    corpus and the folds below never duplicate rows. Returns whether a
    prior attempt existed (its labels merge may already be committed —
    the caller relaxes the doc_id collision guard accordingly).

    Guard against a REUSED tag (an operator passing another delta's
    --run-tag by mistake): deleting a different delta's committed appends
    would silently blind all future probes to its docs, so refuse unless
    the existing run dir's doc_ids are a subset of this delta's."""
    from pyspark.sql import functions as F

    prior = False
    sig_run = f"{paths['sig']}/run={tag}"
    fs, p, _ = _hadoop_fs(spark, sig_run)
    id_col = "doc_id" if "md5" in paths else "conv_id"
    if fs.exists(p):
        prior = True
        foreign = (
            spark.read.parquet(sig_run).select(id_col)
            .join(F.broadcast(delta.select(id_col).distinct()),
                  id_col, "left_anti")
            .limit(5)
            .collect()
        )
        if foreign:
            raise SystemExit(
                f"state already holds run={tag} appends for {id_col}s not in "
                f"this delta (sample: {sorted(r[id_col] for r in foreign)})"
                " — the tag belongs to a DIFFERENT delta; deleting it would"
                " orphan those docs from all future dedup probes. Pass a"
                " unique --run-tag (or omit it for the file-listing hash).")
    for k in paths:
        if k == "labels":
            continue
        fs, p, _ = _hadoop_fs(spark, f"{paths[k]}/run={tag}")
        if fs.exists(p):
            prior = True
            fs.delete(p, True)
    return prior


def _default_tag(delta_df) -> str:
    """Deterministic run tag from the delta's file listing, so a re-run of
    the same delta overwrites its own partial state instead of appending a
    duplicate copy under a fresh time-based tag."""
    import hashlib
    import time

    files = sorted(delta_df.inputFiles())
    if files:
        return "d" + hashlib.sha256("\n".join(files).encode()).hexdigest()[:12]
    return str(int(time.time()))


def _transcripts_run(spark, ap, args, cfg) -> int:
    """--mode transcripts: the daily-ingest loop on the PRIMARY axis.
    State is leaner than docs mode — sig/ (the transcript signature table;
    bands derive map-only from its precomputed band_hashes column and the
    exact channel rides its content_hash, so no bands/ or md5/ dirs) plus
    labels/. Same crash-safety protocol (module docstring). Bootstrap can
    also start from an existing pipeline work_dir by pointing --corpus at
    its input table; the signatures computed here are bit-identical to the
    pipeline's checkpointed stage table at the same config."""
    from pyspark.sql import functions as F

    from pcompress_spark.functions import incremental
    from pcompress_spark.operators.assemble import assemble
    from pcompress_spark.operators.candidates import candidate_pairs
    from pcompress_spark.operators.cluster import connected_components
    from pcompress_spark.operators.signatures import compute_signatures
    from pcompress_spark.operators.verify import verify_pairs

    sd = args.state_dir.rstrip("/")
    paths = {k: f"{sd}/{k}" for k in ("sig", "labels")}

    if args.bootstrap:
        if not args.corpus:
            ap.error("--bootstrap requires --corpus")
        corpus = spark.read.parquet(args.corpus)
        compute_signatures(assemble(corpus), cfg).write.mode(
            "overwrite").parquet(f"{paths['sig']}/run=bootstrap")
        sig_t = spark.read.parquet(paths["sig"]).drop("run")
        cand, _ = candidate_pairs(sig_t, cfg, persist_sizes=False)
        labels = connected_components(
            sig_t.select("conv_id", "id_hash"),
            verify_pairs(sig_t, cand, cfg), cfg,
        )
        _replace_dir(spark, labels, paths["labels"])
        print(json.dumps({"bootstrapped": True, "mode": "transcripts",
                          "state_dir": sd,
                          "convs": spark.read.parquet(paths["sig"]).count()}))
        return 0

    if not args.delta or not args.out:
        ap.error("--delta and --out are required (or pass --bootstrap)")
    delta = spark.read.parquet(args.delta)
    tag = args.run_tag or _default_tag(delta)
    prior_attempt = _delete_run_dirs(spark, paths, tag, delta)
    _recover_replace(spark, paths["labels"])
    corpus_sig = spark.read.parquet(paths["sig"]).drop("run")
    corpus_labels = spark.read.parquet(paths["labels"])

    if not prior_attempt:
        ids = corpus_sig.select("conv_id").unionByName(
            corpus_labels.select("conv_id"))
        clash = (
            ids.join(F.broadcast(delta.select("conv_id").distinct()),
                     "conv_id", "left_semi")
            .limit(5)
            .collect()
        )
        if clash:
            raise SystemExit(
                "delta conv_ids collide with corpus state (sample: "
                f"{sorted(set(r['conv_id'] for r in clash))}); conv_id "
                "spaces must be disjoint — re-key the delta before admission")

    # signatures ONCE (kernel chain runs a single time over the delta)
    compute_signatures(assemble(delta), cfg).write.mode("overwrite").parquet(
        f"{args.out}/delta_sig")
    delta_sig = spark.read.parquet(f"{args.out}/delta_sig")
    empty_tr = spark.createDataFrame(
        [], "conv_id string, turn_idx int, text string")
    pairs = incremental.incremental_transcript_pairs(
        empty_tr, empty_tr, cfg, corpus_sig=corpus_sig, delta_sig=delta_sig)
    pairs.write.mode("overwrite").parquet(f"{args.out}/pairs")
    pairs = spark.read.parquet(f"{args.out}/pairs")
    adm = incremental.incremental_transcript_admission(
        delta_sig.select("conv_id"), pairs)
    adm.write.mode("overwrite").parquet(f"{args.out}/admission")
    adm = spark.read.parquet(f"{args.out}/admission")
    labels = incremental.incremental_transcript_clusters(
        empty_tr, empty_tr, cfg, corpus_labels=corpus_labels,
        corpus_sig=corpus_sig, delta_sig=delta_sig, pairs=pairs)
    _stage_replace(spark, labels, paths["labels"])
    delta_sig.join(
        adm.where(F.col("keep") == 1).select("conv_id"), "conv_id", "left_semi"
    ).write.mode("overwrite").parquet(f"{paths['sig']}/run={tag}")
    _commit_replace(spark, paths["labels"])

    counts = {r["dup_kind"]: r["n"] for r in adm.groupBy("dup_kind").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    print(json.dumps({
        "run": tag,
        "mode": "transcripts",
        "delta_convs": delta_sig.count(),
        "admitted": int(counts.get("none", 0)),
        "dropped_exact": int(counts.get("exact", 0)),
        "dropped_near": int(counts.get("near", 0)),
        "out": args.out,
    }))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=("docs", "transcripts"), default="docs",
                    help="docs: (doc_id, text) table; transcripts: the "
                         "primary-axis (conv_id, turn_idx, ...) table — "
                         "conversation-granular admission against the "
                         "pipeline's signature/label state")
    ap.add_argument("--corpus", default=None,
                    help="documents parquet (bootstrap only)")
    ap.add_argument("--delta", default=None, help="delta documents parquet")
    ap.add_argument("--state-dir", required=True,
                    help="persistent corpus state (sig/ bands/ md5/ labels/)")
    ap.add_argument("--out", default=None,
                    help="per-run output dir (admission/ pairs/)")
    ap.add_argument("--bootstrap", action="store_true",
                    help="build state-dir from --corpus and exit")
    ap.add_argument("--threshold", type=float, default=0.3)
    ap.add_argument("--master", default="inherit")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--config-json", default=None,
                    help="JSON dict of DedupConfig field overrides")
    ap.add_argument("--run-tag", default=None,
                    help="state append subdir tag (default: hash of the "
                         "delta's file listing, so re-runs are idempotent; "
                         "an explicit tag must be unique per delta)")
    args = ap.parse_args(argv)

    from pcompress_spark.config import DedupConfig
    from pcompress_spark.functions import doc_dedup, incremental
    from pcompress_spark.session import get_spark

    spark = get_spark(
        app_name="pcompress-spark-incremental",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    overrides = json.loads(args.config_json) if args.config_json else {}
    if args.mode == "transcripts":
        # the pipeline's own defaults, so signatures/labels interoperate
        # with its checkpointed stage tables at the same config hash
        overrides.setdefault("jaccard_threshold", args.threshold)
        cfg = DedupConfig(**overrides)
        return _transcripts_run(spark, ap, args, cfg)
    overrides.setdefault("shingle_k", 3)
    overrides.setdefault("substring_enabled", False)
    overrides.setdefault("jaccard_threshold", args.threshold)
    cfg = DedupConfig(**overrides)
    sd = args.state_dir.rstrip("/")
    paths = {k: f"{sd}/{k}" for k in ("sig", "bands", "md5", "labels")}

    if args.bootstrap:
        if not args.corpus:
            ap.error("--bootstrap requires --corpus")
        corpus = spark.read.parquet(args.corpus)
        sig = doc_dedup.doc_signatures(corpus, cfg)
        sig.write.mode("overwrite").parquet(f"{paths['sig']}/run=bootstrap")
        sig_t = spark.read.parquet(paths["sig"])
        doc_dedup.doc_band_explode(sig_t, cfg).write.mode("overwrite").parquet(
            f"{paths['bands']}/run=bootstrap")
        incremental.corpus_md5_index(corpus).write.mode("overwrite").parquet(
            f"{paths['md5']}/run=bootstrap")
        _replace_dir(
            spark,
            doc_dedup.neardup_clusters(corpus, cfg, args.threshold),
            paths["labels"],
        )
        print(json.dumps({"bootstrapped": True, "state_dir": sd,
                          "docs": spark.read.parquet(paths["sig"]).count()}))
        return 0

    if not args.delta or not args.out:
        ap.error("--delta and --out are required (or pass --bootstrap)")
    delta = spark.read.parquet(args.delta)
    tag = args.run_tag or _default_tag(delta)
    prior_attempt = _delete_run_dirs(spark, paths, tag, delta)
    _recover_replace(spark, paths["labels"])
    # drop the run=<tag> partition column the append layout induces — the
    # stage-table consumers expect the bare signature/band schemas
    corpus_sig = spark.read.parquet(paths["sig"]).drop("run")
    corpus_bands = spark.read.parquet(paths["bands"]).drop("run")
    # admitted docs append RAW (content_md5, c_rep=doc_id) rows; re-min on
    # read keeps the index shape without a rewrite-per-run
    from pyspark.sql import functions as F

    corpus_md5 = (
        spark.read.parquet(paths["md5"])
        .groupBy("content_md5")
        .agg(F.min("c_rep").alias("c_rep"))
    )
    corpus_labels = spark.read.parquet(paths["labels"])

    # doc_id spaces MUST be disjoint: a colliding id would get two
    # conflicting label rows (untouched passthrough + fresh CC) and the
    # admission verdict would compare the doc against itself-as-corpus.
    # Probe labels ∪ signatures: labels also cover DROPPED delta docs
    # (keep=0 rows are merged into labels but never folded into sig),
    # signatures cover a crash window before the labels commit. Both
    # probes are map-side broadcast filters over one narrow column.
    # Skipped on a replay of this same tag — the first attempt validated
    # disjointness, and its own committed labels would now false-positive.
    if not prior_attempt:
        ids = (
            corpus_sig.select("doc_id")
            .unionByName(corpus_labels.select("doc_id"))
        )
        clash = (
            ids.join(F.broadcast(delta.select("doc_id").distinct()),
                     "doc_id", "left_semi")
            .limit(5)
            .collect()
        )
        if clash:
            raise SystemExit(
                "delta doc_ids collide with corpus state (sample: "
                f"{sorted(set(r['doc_id'] for r in clash))}); doc_id spaces "
                "must be disjoint — re-key the delta before admission")

    # corpus text is never read in this loop: every probe rides the stage
    # tables. The `corpus` argument only backstops missing stage tables,
    # so pass an empty frame to make an accidental corpus scan impossible.
    empty_corpus = spark.createDataFrame([], "doc_id long, text string")
    # signatures ONCE: the Arrow kernel chain runs a single time over the
    # delta; the materialized frame feeds pair generation here and the
    # admitted-subset state fold below
    doc_dedup.doc_signatures(delta, cfg).write.mode("overwrite").parquet(
        f"{args.out}/delta_sig")
    delta_sig = spark.read.parquet(f"{args.out}/delta_sig")
    # evidence ONCE: materialize the pair parquet next, then feed it to
    # both the admission verdict and the label merge — the banding/verify
    # chain over the delta runs a single time per daily run
    pairs = incremental.incremental_lsh_pairs(
        empty_corpus, delta, cfg, args.threshold,
        corpus_sig=corpus_sig, corpus_bands=corpus_bands,
        delta_sig=delta_sig,
    )
    pairs.write.mode("overwrite").parquet(f"{args.out}/pairs")
    pairs = spark.read.parquet(f"{args.out}/pairs")
    adm = incremental.incremental_admission(
        empty_corpus, delta, cfg, args.threshold,
        corpus_md5=corpus_md5, corpus_sig=corpus_sig,
        corpus_bands=corpus_bands, pairs=pairs,
    )
    adm.write.mode("overwrite").parquet(f"{args.out}/admission")
    adm = spark.read.parquet(f"{args.out}/admission")
    labels = incremental.incremental_clusters(
        empty_corpus, delta, cfg, args.threshold,
        corpus_labels=corpus_labels, corpus_sig=corpus_sig,
        corpus_bands=corpus_bands, corpus_md5=corpus_md5, pairs=pairs,
    )
    # stage the merged labels BEFORE mutating any state (the clusters plan
    # reads corpus_labels/sig/bands — materialize it while they are still
    # pre-run), fold next, commit the labels rename last
    _stage_replace(spark, labels, paths["labels"])

    admitted = delta.join(
        adm.where(F.col("keep") == 1).select("doc_id"), "doc_id", "left_semi"
    )
    # fold = the already-materialized delta signatures filtered to the
    # admitted subset (signatures are per-doc deterministic, so this is
    # bit-identical to recomputing them — without a second kernel pass)
    dsig = delta_sig.join(
        adm.where(F.col("keep") == 1).select("doc_id"), "doc_id", "left_semi"
    )
    dsig.write.mode("overwrite").parquet(f"{paths['sig']}/run={tag}")
    dsig_t = spark.read.parquet(f"{paths['sig']}/run={tag}")
    doc_dedup.doc_band_explode(dsig_t, cfg).write.mode("overwrite").parquet(
        f"{paths['bands']}/run={tag}")
    admitted.select(
        F.md5("text").alias("content_md5"), F.col("doc_id").alias("c_rep")
    ).groupBy("content_md5").agg(F.min("c_rep").alias("c_rep")).write.mode(
        "overwrite").parquet(f"{paths['md5']}/run={tag}")
    _commit_replace(spark, paths["labels"])

    counts = {r["dup_kind"]: r["n"] for r in adm.groupBy("dup_kind").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    print(json.dumps({
        "run": tag,
        "delta_docs": delta.count(),
        "admitted": int(counts.get("none", 0)),
        "dropped_exact": int(counts.get("exact", 0)),
        "dropped_near": int(counts.get("near", 0)),
        "out": args.out,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
