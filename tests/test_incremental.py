"""Incremental delta-vs-corpus dedup (functions/incremental.py).

The load-bearing claim: the incremental path — which bands only the delta
and probes the corpus band store through a broadcast semi-join on touched
bucket keys — emits EXACTLY the pairs a full-corpus re-run would emit,
restricted to >= 1 delta endpoint. These tests pin that equivalence, the
precomputed-stage-table input path, and the admission rule.
"""

import pytest
from pyspark.sql import functions as F

from pcompress_spark.config import DedupConfig
from pcompress_spark.functions import doc_dedup, incremental
from pcompress_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
CFG = DedupConfig(shingle_k=3, substring_enabled=False, jaccard_threshold=0.3)


@pytest.fixture(scope="module")
def split(spark):
    docs = load_table(spark, SF, "documents").cache()
    is_delta = (F.col("doc_id") % 4) == 0
    return docs.where(~is_delta).cache(), docs.where(is_delta).cache()


def _pairs_set(df):
    return {(r.doc_id_a, r.doc_id_b, r.jaccard) for r in df.collect()}


def test_incremental_equals_filtered_full_batch(spark, split):
    corpus, delta = split
    incr = incremental.incremental_lsh_pairs(corpus, delta, CFG, threshold=0.3)
    full = doc_dedup.minhash_lsh_pairs(
        corpus.unionByName(delta), CFG, threshold=0.3
    ).where((F.col("doc_id_a") % 4 == 0) | (F.col("doc_id_b") % 4 == 0))
    assert _pairs_set(incr) == _pairs_set(full)


def test_precomputed_corpus_stage_tables(spark, split, tmp_path):
    """Production shape: corpus signatures/bands come from persisted stage
    tables of the corpus's own run — results must be identical to the
    compute-inline path."""
    corpus, delta = split
    sig_path = str(tmp_path / "corpus_sig")
    band_path = str(tmp_path / "corpus_bands")
    csig = doc_dedup.doc_signatures(corpus, CFG)
    csig.write.parquet(sig_path)
    doc_dedup.doc_band_explode(spark.read.parquet(sig_path), CFG).write.parquet(
        band_path
    )
    incr = incremental.incremental_lsh_pairs(
        corpus, delta, CFG, threshold=0.3,
        corpus_sig=spark.read.parquet(sig_path),
        corpus_bands=spark.read.parquet(band_path),
    )
    inline = incremental.incremental_lsh_pairs(corpus, delta, CFG, threshold=0.3)
    assert _pairs_set(incr) == _pairs_set(inline)


def test_touched_bucket_probe_is_a_broadcast_semi_join(spark, split):
    """The corpus band scan must be filtered by a BROADCAST semi-join on
    the delta's bucket keys — never shuffled wholesale (per-run work is
    O(delta + touched), the scale contract)."""
    corpus, delta = split
    plan_df = incremental.incremental_lsh_pairs(corpus, delta, CFG, threshold=0.3)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin LeftSemi BuildRight" in plan


def test_admission_rule(spark, split):
    corpus, delta = split
    adm = incremental.incremental_admission(corpus, delta, CFG, threshold=0.3)
    rows = {r.doc_id: r for r in adm.collect()}
    d_ids = {r.doc_id for r in delta.select("doc_id").collect()}
    assert set(rows) == d_ids  # one decision per delta doc, no extras

    # exact dups of corpus docs must be dropped with the corpus rep id
    cmd5 = {r.content_md5: r.c_rep for r in corpus.select(
        F.md5("text").alias("content_md5"), "doc_id").groupBy("content_md5")
        .agg(F.min("doc_id").alias("c_rep")).collect()}
    dmd5 = {r.doc_id: r.content_md5 for r in delta.select(
        "doc_id", F.md5("text").alias("content_md5")).collect()}
    for did, h in dmd5.items():
        if h in cmd5:
            r = rows[did]
            assert r.keep == 0 and r.dup_kind == "exact"
            assert r.dup_of <= cmd5[h]  # corpus rep, or an even-smaller delta dup

    # every kept doc has no partner sentinel; every dropped doc names one
    for r in rows.values():
        if r.keep == 1:
            assert r.dup_kind == "none" and r.dup_of == -1
        else:
            assert r.dup_kind in ("exact", "near") and r.dup_of >= 0
            assert r.dup_of != r.doc_id

    # near partners: corpus priority at any id order, else smaller-id delta
    pairs = incremental.incremental_lsh_pairs(corpus, delta, CFG, threshold=0.3)
    near_partner = {}
    for p in pairs.collect():
        a, b = p.doc_id_a, p.doc_id_b
        if b in d_ids:
            near_partner.setdefault(b, set()).add(a)
        if a in d_ids and b not in d_ids:
            near_partner.setdefault(a, set()).add(b)
    for r in rows.values():
        if r.dup_kind == "near":
            assert r.dup_of == min(near_partner[r.doc_id])


def _uf_labels(nodes, edges):
    """Reference union-find (driver python): min-id labels."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {n: find(n) for n in nodes}


def test_incremental_clusters_contract(spark, split):
    """incremental_clusters == CC over (corpus label star ∪ delta-endpoint
    LSH pairs ∪ delta exact edges) with min-doc_id labels — the defined
    contract, reconstructed independently with a driver union-find."""
    corpus, delta = split
    labels = {r.doc_id: r.cluster_id
              for r in doc_dedup.neardup_clusters(corpus, CFG, 0.3).collect()}
    star = [(c, d) for d, c in labels.items() if d != c]
    ipairs = [(r.doc_id_a, r.doc_id_b) for r in incremental.incremental_lsh_pairs(
        corpus, delta, CFG, threshold=0.3).collect()]
    import hashlib

    cmd5, dmd5 = {}, []
    for r in corpus.select("doc_id", "text").collect():
        h = hashlib.md5(r.text.encode()).hexdigest()
        cmd5[h] = min(cmd5.get(h, r.doc_id), r.doc_id)
    for r in delta.select("doc_id", "text").collect():
        dmd5.append((r.doc_id, hashlib.md5(r.text.encode()).hexdigest()))
    dmin = {}
    for did, h in dmd5:
        dmin[h] = min(dmin.get(h, did), did)
    exact = [(did, cmd5[h]) for did, h in dmd5 if h in cmd5]
    exact += [(did, dmin[h]) for did, h in dmd5 if dmin[h] < did]
    nodes = set(labels) | {r.doc_id for r in delta.select("doc_id").collect()}
    expected = _uf_labels(nodes, star + ipairs + exact)
    got = {r.doc_id: r.cluster_id for r in incremental.incremental_clusters(
        corpus, delta, CFG, threshold=0.3).collect()}
    assert got == expected


def test_incremental_clusters_synthetic_merge(spark):
    """Handcrafted merge: a delta doc near-dups members of TWO separate
    corpus clusters -> they merge under the global min id; an untouched
    corpus cluster passes through verbatim; a unique delta doc is a
    singleton; a delta exact-dup joins its corpus partner's component.
    rows=1 banding + no est-Jaccard prefilter: candidate recall is
    ~exhaustive at this scale, so the merge edges are structural, not a
    lottery on the default 32x4 geometry."""
    cfg_t = DedupConfig(shingle_k=3, substring_enabled=False,
                        jaccard_threshold=0.3, minhash_prefilter=0.0,
                        num_perm=32, bands=32, rows=1)
    ta = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
          "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi")
    tb = ("one two three four five six seven eight nine ten eleven twelve "
          "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty")
    tu = ("untouched cluster text about parquet row groups and column "
          "statistics pruning at the reader level with predicate pushdown")
    corpus = spark.createDataFrame(
        [(1, ta), (2, ta.replace("psi", "omega")),       # cluster {1, 2}
         (3, tb),                                        # cluster {3}
         (5, tu), (6, tu)],                              # untouched {5, 6}
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [(4, ta.replace("psi", "omega").replace("alpha", "alpho") + " " + tb),
         (8, "a totally unrelated singleton delta document about nothing"),
         (12, tb)],                                      # exact dup of 3
        "doc_id long, text string",
    )
    got = {r.doc_id: r.cluster_id for r in incremental.incremental_clusters(
        corpus, delta, cfg_t, threshold=0.3).collect()}
    assert got[5] == 5 and got[6] == 5          # untouched passthrough
    assert got[8] == 8                          # delta singleton
    assert got[12] == got[3]                    # exact edge joins 3's component
    # doc 4 bridges {1,2} and {3,12}: all merge under min id 1
    assert got[1] == got[2] == got[3] == got[4] == got[12] == 1


def test_incremental_clusters_persisted_stage_tables(spark, split, tmp_path):
    """Production shape: labels/signatures/bands/md5-index all come from
    persisted stage tables — output identical to the inline path."""
    corpus, delta = split
    p = {k: str(tmp_path / k) for k in ("labels", "sig", "bands", "md5")}
    doc_dedup.neardup_clusters(corpus, CFG, 0.3).write.parquet(p["labels"])
    doc_dedup.doc_signatures(corpus, CFG).write.parquet(p["sig"])
    doc_dedup.doc_band_explode(spark.read.parquet(p["sig"]), CFG).write.parquet(
        p["bands"])
    incremental.corpus_md5_index(corpus).write.parquet(p["md5"])
    staged = incremental.incremental_clusters(
        corpus, delta, CFG, threshold=0.3,
        corpus_labels=spark.read.parquet(p["labels"]),
        corpus_sig=spark.read.parquet(p["sig"]),
        corpus_bands=spark.read.parquet(p["bands"]),
        corpus_md5=spark.read.parquet(p["md5"]),
    )
    inline = incremental.incremental_clusters(corpus, delta, CFG, threshold=0.3)
    as_map = lambda df: {r.doc_id: r.cluster_id for r in df.collect()}
    assert as_map(staged) == as_map(inline)


def test_admission_exact_branch_synthetic(spark):
    """Handcrafted corpus/delta exercising every admission branch: corpus
    exact dup, earlier-delta exact dup, corpus-priority near dup, and a
    clean keep. (The sf0.001 %4 split happens to contain no cross-split
    exact dup, so this pins the exact branch deterministically.)"""
    base = ("the quick brown fox jumps over the lazy dog and then "
            "wanders far away into the deep green forest tonight")
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely unrelated corpus text about spark "
                        "shuffle partitions and adaptive execution plans")],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [
            (4, base),                       # exact dup of corpus doc 1
            (8, "something else entirely unique about minhash bands"),
            (12, "something else entirely unique about minhash bands"),
            # near (not exact) dup of corpus doc 1: one word changed
            (16, base.replace("tonight", "tomorrow")),
        ],
        "doc_id long, text string",
    )
    adm = incremental.incremental_admission(corpus, delta, CFG, threshold=0.3)
    rows = {r.doc_id: r for r in adm.collect()}
    assert rows[4].keep == 0 and rows[4].dup_kind == "exact" and rows[4].dup_of == 1
    assert rows[8].keep == 1 and rows[8].dup_kind == "none" and rows[8].dup_of == -1
    assert rows[12].keep == 0 and rows[12].dup_kind == "exact" and rows[12].dup_of == 8
    assert rows[16].keep == 0 and rows[16].dup_kind == "near" and rows[16].dup_of == 1


def test_cli_state_compaction(spark, tmp_path):
    """tools/run_incremental.py --compact: K deltas -> compact -> delta
    K+1 must produce byte-identical admission/pairs/labels to the
    uncompacted state (VERDICT r3 'done' criterion); plus crash recovery
    of an interrupted compaction and the compacted-tag replay refusal."""
    import os
    import shutil
    import sys as _sys

    import pandas as pd

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _sys.path.insert(0, os.path.join(REPO, "tools"))
    import run_incremental as ri

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")[
        ["doc_id", "text"]].head(240)
    corpus = docs[docs["doc_id"] % 4 != 0]
    delta1 = docs[docs["doc_id"] % 8 == 0]
    delta2 = docs[docs["doc_id"] % 8 == 4]
    # delta3 reuses delta1 text (exercises near/exact drops vs folded state)
    delta3 = delta1.head(10).assign(
        doc_id=lambda d: d.doc_id + 900000)
    paths = {}
    for name, frame in (("corpus", corpus), ("delta1", delta1),
                        ("delta2", delta2), ("delta3", delta3)):
        p = str(tmp_path / f"{name}.parquet")
        frame.to_parquet(p, index=False)
        paths[name] = p
    state_a = str(tmp_path / "state_a")
    common = ["--state-dir", state_a, "--master", "inherit"]

    assert ri.main(["--bootstrap", "--corpus", paths["corpus"]] + common) == 0
    assert ri.main(["--delta", paths["delta1"], "--run-tag", "day1",
                    "--out", str(tmp_path / "o1")] + common) == 0
    assert ri.main(["--delta", paths["delta2"], "--run-tag", "day2",
                    "--out", str(tmp_path / "o2")] + common) == 0

    # branch the state: B stays uncompacted, A compacts
    state_b = str(tmp_path / "state_b")
    shutil.copytree(state_a, state_b)
    assert ri.main(["--compact", "--state-dir", state_a,
                    "--master", "inherit"]) == 0
    for t in ("sig", "bands", "md5"):
        subs = [d for d in os.listdir(os.path.join(state_a, t))
                if d.startswith("run=")]
        assert subs == ["run=c1"], (t, subs)
    # md5 re-min'd at merge: one row per content hash
    md5 = pd.read_parquet(os.path.join(state_a, "md5"))
    assert md5["content_md5"].is_unique

    # delta K+1 on both branches: byte-identical outputs and labels
    for st, out in ((state_a, "oa"), (state_b, "ob")):
        assert ri.main(["--delta", paths["delta3"], "--run-tag", "day3",
                        "--out", str(tmp_path / out),
                        "--state-dir", st, "--master", "inherit"]) == 0

    def table(path):
        df = pd.read_parquet(path)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    for sub in ("admission", "pairs"):
        pd.testing.assert_frame_equal(
            table(str(tmp_path / "oa" / sub)),
            table(str(tmp_path / "ob" / sub)))
    pd.testing.assert_frame_equal(
        table(os.path.join(state_a, "labels")),
        table(os.path.join(state_b, "labels")))

    # replay of a compacted tag is refused with the real story
    with pytest.raises(SystemExit, match="compacted"):
        ri.main(["--delta", paths["delta2"], "--run-tag", "day2",
                 "--out", str(tmp_path / "oc")] + common)

    # crash recovery, incomplete tmp: discarded, originals untouched
    sig_dir = os.path.join(state_a, "sig")
    dead = os.path.join(sig_dir, ".compact_tmp_c9")
    os.makedirs(dead)
    ri._recover_state_compaction(spark, state_a, "sig")
    assert not os.path.exists(dead)

    # crash recovery, complete tmp: originals deleted, tmp renamed in,
    # rows preserved exactly (the tmp holds the full merge)
    import numpy as np

    def sig_table(path):
        df = pd.read_parquet(path)
        df = df[[c for c in df.columns if c != "run"]]
        for c in df.columns:
            if len(df) and isinstance(df[c].iloc[0], (list, np.ndarray)):
                df[c] = df[c].map(tuple)
        return df.sort_values("doc_id").reset_index(drop=True)

    before = sig_table(sig_dir)
    runs = [d for d in os.listdir(sig_dir) if d.startswith("run=")]
    assert len(runs) == 2  # run=c1 + run=day3
    spark.read.parquet(
        *[os.path.join(sig_dir, d) for d in runs]
    ).write.mode("overwrite").parquet(os.path.join(sig_dir, ".compact_tmp_c2"))
    ri._recover_state_compaction(spark, state_a, "sig")
    assert [d for d in os.listdir(sig_dir)
            if d.startswith("run=")] == ["run=c2"]
    pd.testing.assert_frame_equal(before, sig_table(sig_dir))
    # day3's tag is now recorded as compacted too
    assert ri._manifest_read(spark, state_a)["day3"] == 2
