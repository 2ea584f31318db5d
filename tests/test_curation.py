"""Curation operators: stratified sampling, decontamination, boilerplate
mining — determinism, invariants, and the verify-stage plan shape."""

import io
import re
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from pcompress_spark.functions import curation
from pcompress_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").cache()


def test_stratified_sample_deterministic_and_rate_bound(spark, docs):
    a = curation.stratified_sample(docs, seed=7).toPandas()
    b = curation.stratified_sample(docs, seed=7).toPandas()
    assert a.sort_values("doc_id").reset_index(drop=True).equals(
        b.sort_values("doc_id").reset_index(drop=True))
    # decision table covers every document exactly once
    assert len(a) == docs.count()
    # kept is exactly the threshold predicate, per row
    assert ((a.sample_key < a.rate_per_mille) == a.kept).all()
    # empty stratum keeps nothing; unknown strata never occur here
    assert not a[a.content_class == "empty"].kept.any()
    # a different seed flips some membership (hash actually varies by seed)
    c = curation.stratified_sample(docs, seed=8).toPandas()
    merged = a.merge(c, on="doc_id", suffixes=("_a", "_c"))
    assert (merged.sample_key_a != merged.sample_key_c).any()


def test_stratified_sample_rate_accuracy(spark, docs):
    """Observed keep fraction in each populated stratum tracks its nominal
    rate (binomial tolerance at these counts)."""
    pdf = curation.stratified_sample(docs, seed=7).toPandas()
    for klass, grp in pdf.groupby("content_class"):
        rate = grp.rate_per_mille.iloc[0] / 1000
        if len(grp) >= 50:
            observed = grp.kept.mean()
            assert abs(observed - rate) < 0.2, (klass, observed, rate)


def test_stratified_sample_map_only_plan(spark, docs):
    df = curation.stratified_sample(docs, seed=7)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, "sampling must be map-only"
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_decontaminate_flags_benchmark_copies(spark, docs):
    """A document byte-identical to a benchmark member must report full
    overlap; documents sharing no grams report 0."""
    is_bench = (F.col("doc_id") % 19) == 0
    bench = docs.where(is_bench)
    corpus = docs.where(~is_bench)
    rep = curation.decontaminate(corpus, bench, n=3,
                                 overlap_threshold=0.5).toPandas()
    assert len(rep) == corpus.count()
    assert ((rep.overlap_ratio >= 0.5) == rep.contaminated).all()
    assert (rep.n_overlap <= rep.n_grams).all()
    # inject an exact copy of a benchmark doc with a fresh id
    donor = bench.where(F.size(F.split(F.col("text"), " ")) >= 10).limit(1)
    clone = donor.select((F.lit(10_000_000) + F.col("doc_id")).alias("doc_id"),
                         "text")
    rep2 = curation.decontaminate(
        clone, bench.select("doc_id", "text"), n=3).toPandas()
    assert len(rep2) == 1 and bool(rep2.contaminated.iloc[0])
    assert rep2.overlap_ratio.iloc[0] == 1.0


def test_boilerplate_ngrams_df_counts(spark, docs):
    """df counts distinct documents (grams are distinct per doc before the
    explode), and every reported gram really occurs in >= min_df docs."""
    out = curation.boilerplate_ngrams(docs, n=3, min_df=3).toPandas()
    assert (out.df >= 3).all()
    assert len(out), "fixture corpus has duplicated docs — boilerplate must surface"
    # recount the top gram's document frequency through the same
    # normalization path (grams are distinct per doc, so rows == docs)
    from pcompress_spark.functions.text import norm_words

    gram = out.sort_values(["df", "gram"]).iloc[-1].gram
    recount = (
        docs.select("doc_id", norm_words("text").alias("words"))
        .select("doc_id", F.explode(curation.ngrams_col(3)).alias("g"))
        .where(F.col("g") == gram).count()
    )
    assert recount == int(out[out.gram == gram].df.iloc[0])


def test_verify_pairs_broadcasts_pair_list(spark, smoke_transcripts):
    """The verify stage must broadcast the bare pair list to both probe
    joins and never exchange the signature table on a single pair-end key
    (the O(corpus) array sort this architecture forbids)."""
    from pcompress_spark.config import DedupConfig
    from pcompress_spark.operators.assemble import assemble
    from pcompress_spark.operators.candidates import candidate_pairs
    from pcompress_spark.operators.signatures import compute_signatures
    from pcompress_spark.operators.verify import verify_pairs

    cfg = DedupConfig()
    sig = compute_signatures(assemble(smoke_transcripts), cfg)
    cand, _ = candidate_pairs(sig, cfg, persist_sizes=False)
    plan_buf = io.StringIO()
    with redirect_stdout(plan_buf):
        verify_pairs(sig, cand, cfg, cand_rows=100).explain("formatted")
    plan = plan_buf.getvalue()
    assert plan.count("BroadcastHashJoin") >= 2
    assert not re.search(r"hashpartitioning\(ih_[ab]#\d+L, \d+\)", plan), (
        "signature table exchanged on a single pair-end key")


def test_pack_assignments_watermark_semantics(spark, docs):
    """Every pack's exclusive-start offset is below the budget (a pack only
    closes once it crosses it), packs are contiguous in doc_id order, and
    the plan is deterministic under repartitioning."""
    budget = 300
    a = curation.pack_assignments(docs, budget=budget, n_shards=4).toPandas()
    b = (
        curation.pack_assignments(docs.repartition(7), budget=budget, n_shards=4)
        .toPandas()
    )
    cols = ["doc_id", "shard", "n_tokens", "pack_id"]
    assert a[cols].sort_values("doc_id").reset_index(drop=True).equals(
        b[cols].sort_values("doc_id").reset_index(drop=True))
    assert len(a) == docs.count()
    for shard, grp in a.sort_values("doc_id").groupby("shard"):
        cum = 0
        prev_pack = 0
        for _, r in grp.iterrows():
            assert r.pack_id == cum // budget  # watermark rule, per row
            assert r.pack_id >= prev_pack  # packs never reopen
            prev_pack = r.pack_id
            cum += r.n_tokens


def test_pack_assignments_shard_route_is_hash(spark, docs):
    pdf = curation.pack_assignments(docs, n_shards=8).toPandas()
    assert set(pdf.shard.unique()) <= set(range(8))
    # route must depend on doc_id only: same docs, different partitioning,
    # same shard (covered above); shards should be reasonably balanced
    sizes = pdf.groupby("shard").size()
    assert sizes.max() <= 4 * max(1, sizes.min())
