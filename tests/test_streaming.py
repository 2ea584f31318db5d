"""Structured Streaming: incremental signatures + exact dedup match batch.

Streaming semantics need time-coherent input: each conversation's turns fall
inside one event-time window, and files arrive in event-time order (so the
watermark never drops live rows). The fixture rewrites datagen's random ts
accordingly; signatures don't depend on ts, so batch comparison is exact.
"""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pcompress_spark.config import DedupConfig
from pcompress_spark.operators.assemble import assemble
from pcompress_spark.operators.signatures import compute_signatures
from pcompress_spark.streaming.dedup_stream import (
    signatures_stream,
    stateful_assemble_signatures,
    streaming_exact_dedup,
)

CFG = DedupConfig()
_BASE = pd.Timestamp("2026-01-01T00:00:00")


@pytest.fixture(scope="module")
def timed_transcripts(smoke_data):
    t = smoke_data.transcripts.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    rank = {c: i for i, c in enumerate(sorted(t["conv_id"].unique()))}
    t["ts"] = (
        _BASE
        + pd.to_timedelta([rank[c] * 300 for c in t["conv_id"]], unit="s")
        + pd.to_timedelta(t["turn_idx"].astype(int), unit="s")
    ).astype("datetime64[us]")
    return t


@pytest.fixture(scope="module")
def stream_input_dir(tmp_path_factory, timed_transcripts):
    """4 files in event-time order (consecutive conversation ranges)."""
    d = tmp_path_factory.mktemp("stream_in")
    t = timed_transcripts
    convs = sorted(t["conv_id"].unique())
    step = (len(convs) + 3) // 4
    for i in range(4):
        sel = set(convs[i * step:(i + 1) * step])
        part = t[t["conv_id"].isin(sel)]
        part.to_parquet(os.path.join(str(d), f"part-{i:02d}.parquet"), index=False)
    return str(d)


def _run_stream(spark, df_stream, tmp_dir, name):
    q = (
        df_stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp_dir, f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"select * from {name}").toPandas()


def test_streaming_signatures_match_batch(spark, timed_transcripts, stream_input_dir, tmp_path):
    batch_df = spark.createDataFrame(timed_transcripts)
    batch_sig = compute_signatures(assemble(batch_df), CFG).toPandas()
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_input_dir)
    )
    out = signatures_stream(stream, CFG, watermark="10 minutes")
    got = _run_stream(spark, out, str(tmp_path), "sig_stream")
    assert len(got) > 0, "append-mode stream emitted nothing"
    # most windows must have closed (all but the trailing watermark horizon)
    assert len(got) >= 0.8 * len(batch_sig)
    got = got.sort_values("conv_id").reset_index(drop=True)
    want = batch_sig[batch_sig["conv_id"].isin(set(got["conv_id"]))].sort_values(
        "conv_id").reset_index(drop=True)
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["content_hash"].tolist() == want["content_hash"].tolist()
    assert got["simhash"].tolist() == want["simhash"].tolist()
    assert got["n_turns"].tolist() == want["n_turns"].tolist()


def test_stateful_assemble_signatures(spark, timed_transcripts,
                                      stream_input_dir, tmp_path):
    """applyInPandasWithState sessionization: conversations closed by
    event-time quiescence carry signatures identical to batch."""
    batch_df = spark.createDataFrame(timed_transcripts)
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_input_dir)
    )
    out = stateful_assemble_signatures(stream, CFG, gap="10 minutes")
    got = _run_stream(spark, out, str(tmp_path), "stateful_sig")
    assert len(got) > 0, "no conversations timed out"
    from pcompress_spark.operators.assemble import assemble
    from pcompress_spark.operators.signatures import compute_signatures
    batch_sig = compute_signatures(assemble(batch_df), CFG).toPandas().set_index("conv_id")
    for r in got.itertuples():
        assert batch_sig.at[r.conv_id, "content_hash"] == r.content_hash, r.conv_id
        assert int(batch_sig.at[r.conv_id, "simhash"]) == r.simhash, r.conv_id
        assert int(batch_sig.at[r.conv_id, "n_tokens"]) == r.n_tokens, r.conv_id
        assert int(batch_sig.at[r.conv_id, "id_hash"]) == r.id_hash, r.conv_id
        assert list(batch_sig.at[r.conv_id, "minhash"]) == list(r.minhash), r.conv_id
        assert list(batch_sig.at[r.conv_id, "shingles"]) == list(r.shingles), r.conv_id
    # most conversations should have closed (all but the trailing horizon)
    assert len(got) >= 0.7 * len(batch_sig)


def test_streaming_exact_dedup_suppresses_clones(spark, timed_transcripts,
                                                 stream_input_dir, tmp_path, smoke_data):
    batch_df = spark.createDataFrame(timed_transcripts)
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_input_dir)
    )
    out = streaming_exact_dedup(stream, CFG, watermark="10 minutes")
    got = _run_stream(spark, out, str(tmp_path), "dedup_stream")
    assert len(got) > 0
    # horizon semantics (bounded state): a content hash is unique WITHIN an
    # assembly window; clones in windows past the watermark horizon may
    # legitimately re-emit (state evicted — the reference's capacity-evict
    # analog). Window end recomputed from the fixture's event times.
    t = timed_transcripts
    win_end = (
        t.groupby("conv_id")["ts"].min()
        .apply(lambda x: (int(x.value) // (600 * 10**9) + 1) * 600)
    )
    got = got.assign(win_end=got["conv_id"].map(win_end))
    assert not got.duplicated(["content_hash", "win_end"]).any()


def test_streaming_exact_dedup_horizon_semantics(spark, tmp_path):
    """Surgical fixture for the bounded-state contract: a same-window clone
    is suppressed; a clone arriving after its key's state expired re-emits
    (dropDuplicatesWithinWatermark, NOT an ever-growing dropDuplicates)."""
    t0 = pd.Timestamp("2026-01-01T00:00:10")

    def conv(cid, text, offset_s):
        return [(cid, 0, "user", text, None,
                 (t0 + pd.Timedelta(seconds=offset_s)).to_datetime64())]

    clone = "the same exact conversation text repeated verbatim"
    files = [
        conv("a_first", clone, 0) + conv("b_same_window", clone, 60)
        + conv("d_unique", "something entirely different here", 90),
        conv("f_filler", "filler that advances the watermark", 3600),
        conv("c_far_clone", clone, 7200),
        conv("e_flusher", "flusher closing the far window", 21600),
    ]
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    d = tmp_path / "horizon_in"
    d.mkdir()
    for i, rows in enumerate(files):
        pdf = pd.DataFrame(rows, columns=cols)
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(d / f"part-{i:02d}.parquet", index=False)
    schema = spark.createDataFrame(pd.DataFrame(files[0], columns=cols)).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    out = streaming_exact_dedup(stream, CFG, watermark="10 minutes")
    got = _run_stream(spark, out, str(tmp_path), "horizon_dedup")
    by_conv = set(got["conv_id"])
    # exactly one of the same-window clones survives
    assert len({"a_first", "b_same_window"} & by_conv) == 1
    # the far clone re-emits after its key's state expired
    assert "c_far_clone" in by_conv
    assert "d_unique" in by_conv and "f_filler" in by_conv


def test_streaming_near_dup_pairs_match_batch(spark, timed_transcripts,
                                              stream_input_dir, tmp_path):
    """foreachBatch incremental LSH (pipe-mode index analog): accumulated
    streamed pairs == batch-pipeline pairs over the closed conversations."""
    import pandas as pd
    from pcompress_spark.operators.candidates import candidate_pairs
    from pcompress_spark.operators.verify import verify_pairs
    from pcompress_spark.streaming.dedup_stream import start_near_dup_stream

    batch_df = spark.createDataFrame(timed_transcripts)
    sig_b = compute_signatures(assemble(batch_df), CFG)
    cand_b, _ = candidate_pairs(sig_b, CFG)
    pairs_b = verify_pairs(sig_b, cand_b, CFG).toPandas()

    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_input_dir)
    )
    wd = str(tmp_path / "neardup_wd")
    q = start_near_dup_stream(stream, wd, CFG, watermark="10 minutes")
    assert q.awaitTermination(300), "near-dup stream did not finish in time"

    closed = set(spark.read.parquet(f"{wd}/sig_store").toPandas()["conv_id"])
    assert len(closed) > 0, "no conversations closed"
    try:
        got = spark.read.parquet(f"{wd}/pairs").toPandas()
    except Exception:
        got = pd.DataFrame(columns=["conv_id_a", "conv_id_b", "jaccard", "match_kind"])

    want = pairs_b[pairs_b["conv_id_a"].isin(closed) & pairs_b["conv_id_b"].isin(closed)]
    got_set = set(zip(got["conv_id_a"], got["conv_id_b"], got["match_kind"]))
    want_set = set(zip(want["conv_id_a"], want["conv_id_b"], want["match_kind"]))
    # near pairs must agree exactly; exact-star edges may differ in their
    # deterministic representative when the batch saw a smaller min conv_id
    # that had not yet closed in the stream — compare star MEMBERSHIP instead
    assert {t for t in got_set if t[2] == "near"} == {t for t in want_set if t[2] == "near"}
    def members(s):
        out = set()
        for a, b, k in s:
            if k == "exact":
                out.add(a); out.add(b)
        return out
    assert members(got_set) == members(want_set)
    # each emitted pair appears exactly once across all micro-batches
    assert len(got) == len(got.drop_duplicates(["conv_id_a", "conv_id_b"]))


def test_streaming_decontam_matches_batch(spark, timed_transcripts,
                                          stream_input_dir, tmp_path):
    """The ingest-time decontamination gate equals the batch op applied
    to the closed conversations, row for row (no cross-batch state)."""
    from pcompress_spark.functions.curation import decontaminate
    from pcompress_spark.streaming.dedup_stream import start_decontam_stream

    batch_df = spark.createDataFrame(timed_transcripts)
    # stand-in eval suite: every 7th conversation's assembled text
    asm_b = assemble(batch_df).select(
        F.col("conv_id").alias("doc_id"), F.col("doc_text").alias("text"))
    bench = asm_b.where(
        F.expr("CAST(substring(doc_id, 6) AS BIGINT) % 7 = 0"))
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_input_dir)
    )
    wd = str(tmp_path / "deco_wd")
    q = start_decontam_stream(stream, bench, wd, n=3, overlap_threshold=0.5)
    assert q.awaitTermination(300), "decontam stream did not finish"
    got = spark.read.parquet(f"{wd}/report").drop("batch").toPandas()
    assert len(got) > 0 and got.conv_id.is_unique
    want = decontaminate(asm_b, bench, n=3, overlap_threshold=0.5).toPandas()
    want = want[want.doc_id.isin(set(got.conv_id))].rename(
        columns={"doc_id": "conv_id"})
    g = got.sort_values("conv_id").reset_index(drop=True)
    w = want.sort_values("conv_id").reset_index(drop=True)[g.columns]
    assert g.equals(w)
    # benchmark members themselves report full overlap (they ARE the suite)
    bench_ids = set(bench.toPandas().doc_id)
    hit = g[g.conv_id.isin(bench_ids) & (g.n_grams > 0)]
    assert len(hit) and (hit.overlap_ratio == 1.0).all()


def test_streaming_bench_probe_matches_batch(spark, timed_transcripts,
                                             stream_input_dir, tmp_path):
    """The static-index paraphrase-leak gate: streamed per-batch verdicts
    equal the batch probe over the closed conversations ROW FOR ROW (the
    index is bench-capped, so a verdict is per-conversation independent)."""
    from pcompress_spark.functions.curation import (
        bench_probe_index,
        probe_bench_neardup,
    )
    from pcompress_spark.streaming.dedup_stream import start_bench_probe_stream

    batch_df = spark.createDataFrame(timed_transcripts)
    is_bench = F.expr("CAST(substring(conv_id, 6) AS BIGINT) % 7 = 0")
    bench_tr = batch_df.where(is_bench)

    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_input_dir)
    )
    wd = str(tmp_path / "probe_wd")
    q = start_bench_probe_stream(stream, bench_tr, wd, CFG,
                                 watermark="10 minutes")
    assert q.awaitTermination(300), "bench-probe stream did not finish"
    got = spark.read.parquet(f"{wd}/report").drop("batch").toPandas()
    assert len(got) > 0 and got.conv_id.is_unique

    # batch twin over the SAME population (all conversations), restricted
    # to the ones that closed in the stream
    all_sig = compute_signatures(assemble(batch_df), CFG)
    bsig = compute_signatures(assemble(bench_tr), CFG)
    buckets, bs, md5 = bench_probe_index(bsig, CFG)
    want = probe_bench_neardup(all_sig, buckets, bs, md5, CFG).toPandas()
    closed = set(spark.read.parquet(f"{wd}/probed").toPandas().conv_id)
    assert len(closed) >= 0.8 * batch_df.select("conv_id").distinct().count()
    assert set(got.conv_id) <= closed
    want = want[want.conv_id.isin(closed)]
    g = got.sort_values("conv_id").reset_index(drop=True)
    w = want.sort_values("conv_id").reset_index(drop=True)[g.columns]
    assert g.equals(w)
    bench_ids = set(bench_tr.select("conv_id").distinct().toPandas().conv_id)
    assert set(g.top_bench_id) <= bench_ids


def test_near_dup_process_replay_idempotent(spark, timed_transcripts, tmp_path):
    """foreachBatch is at-least-once: replaying the same (batch_df, batch_id)
    must leave store and pairs unchanged (batch-keyed overwrite)."""
    from pcompress_spark.streaming.dedup_stream import _near_dup_process

    batch_df = spark.createDataFrame(timed_transcripts)
    sig = compute_signatures(assemble(batch_df), CFG)
    half = sig.where(F.hash("conv_id") % 2 == 0)
    store, pairs = str(tmp_path / "store"), str(tmp_path / "pairs")
    _near_dup_process(half, 0, store=store, pairs_out=pairs, cfg=CFG)
    _near_dup_process(sig.subtract(half), 1, store=store, pairs_out=pairs, cfg=CFG)
    p1 = spark.read.parquet(pairs).toPandas().sort_values(
        ["conv_id_a", "conv_id_b"]).reset_index(drop=True)
    n_store1 = spark.read.parquet(store).count()
    # replay batch 1 (simulated failure after commit-to-sink, before ckpt)
    _near_dup_process(sig.subtract(half), 1, store=store, pairs_out=pairs, cfg=CFG)
    p2 = spark.read.parquet(pairs).toPandas().sort_values(
        ["conv_id_a", "conv_id_b"]).reset_index(drop=True)
    assert n_store1 == spark.read.parquet(store).count()
    assert p1[["conv_id_a", "conv_id_b", "match_kind"]].equals(
        p2[["conv_id_a", "conv_id_b", "match_kind"]])


def test_incremental_band_store_is_per_batch(spark, timed_transcripts, tmp_path):
    """The banded store persists each batch's OWN bands only — per-batch
    banding work is proportional to the batch, never to stream lifetime
    (the round-1 O(N^2)-lifetime rebuild is gone)."""
    from pcompress_spark.operators.candidates import band_explode
    from pcompress_spark.streaming.dedup_stream import _near_dup_process

    batch_df = spark.createDataFrame(timed_transcripts)
    sig = compute_signatures(assemble(batch_df), CFG)
    half_a = sig.where(F.hash("conv_id") % 2 == 0).cache()
    half_b = sig.subtract(half_a).cache()
    store, pairs = str(tmp_path / "store"), str(tmp_path / "pairs")
    _near_dup_process(half_a, 0, store=store, pairs_out=pairs, cfg=CFG)
    _near_dup_process(half_b, 1, store=store, pairs_out=pairs, cfg=CFG)
    for batch_id, half in ((0, half_a), (1, half_b)):
        got = spark.read.parquet(f"{store}_bands/batch={batch_id}").count()
        want = band_explode(half, CFG).count()
        assert got == want, f"batch {batch_id}: band store {got} != own bands {want}"


def test_compact_near_dup_store(spark, timed_transcripts, tmp_path):
    from pcompress_spark.streaming.dedup_stream import (
        _near_dup_process, compact_near_dup_store)

    batch_df = spark.createDataFrame(timed_transcripts)
    sig = compute_signatures(assemble(batch_df), CFG)
    half_a = sig.where(F.hash("conv_id") % 2 == 0).cache()
    half_b = sig.subtract(half_a).cache()
    wd = tmp_path / "wd"
    store, pairs = str(wd / "sig_store"), str(wd / "pairs")
    _near_dup_process(half_a, 0, store=store, pairs_out=pairs, cfg=CFG)
    _near_dup_process(half_b, 1, store=store, pairs_out=pairs, cfg=CFG)
    before_sig = spark.read.parquet(store).toPandas()
    before_band = spark.read.parquet(store + "_bands").count()
    compact_near_dup_store(spark, str(wd))
    after_dirs = [d for d in os.listdir(store) if d.startswith("batch=")]
    assert after_dirs == ["batch=c1"]
    after_sig = spark.read.parquet(store).toPandas()
    assert len(after_sig) == len(before_sig)
    assert set(after_sig["conv_id"]) == set(before_sig["conv_id"])
    assert spark.read.parquet(store + "_bands").count() == before_band
    # a subsequent batch still probes the compacted store
    extra = half_b.limit(5).withColumn("conv_id", F.concat(F.lit("re_"), "conv_id"))
    _near_dup_process(extra, 2, store=store, pairs_out=pairs, cfg=CFG)
    assert spark.read.parquet(store).count() == len(after_sig) + 5


def test_compaction_crash_recovery(spark, timed_transcripts, tmp_path):
    """A crash between compaction's delete loop and its final rename must
    not lose the store: the next listing finishes the rename (complete tmp)
    or discards an unmarked tmp with the originals untouched."""
    import shutil

    from pcompress_spark.streaming.dedup_stream import (
        _COMPACT_TMP_PREFIX, _near_dup_process, _prior_batch_dirs)

    batch_df = spark.createDataFrame(timed_transcripts)
    sig = compute_signatures(assemble(batch_df), CFG)
    half_a = sig.where(F.hash("conv_id") % 2 == 0).cache()
    half_b = sig.subtract(half_a).cache()
    wd = tmp_path / "wd_crash"
    store, pairs = str(wd / "sig_store"), str(wd / "pairs")
    _near_dup_process(half_a, 0, store=store, pairs_out=pairs, cfg=CFG)
    _near_dup_process(half_b, 1, store=store, pairs_out=pairs, cfg=CFG)
    n_store = spark.read.parquet(store).count()

    # simulate the crash window: full merge written to the tagged tmp
    # (with _SUCCESS), one original already deleted, rename never ran
    tmp = f"{store}/{_COMPACT_TMP_PREFIX}1"
    spark.read.parquet(f"{store}/batch=0", f"{store}/batch=1").write.parquet(tmp)
    shutil.rmtree(f"{store}/batch=0")
    # recovery runs inside the next listing: finishes delete + rename
    dirs = _prior_batch_dirs(spark, store, batch_id=99)
    assert [os.path.basename(d) for d in dirs] == ["batch=c1"]
    assert spark.read.parquet(store).count() == n_store, "rows lost"

    # an UNMARKED tmp (crash mid-write) is discarded, originals untouched
    band_store = store + "_bands"
    n_bands = spark.read.parquet(band_store).count()
    os.makedirs(f"{band_store}/{_COMPACT_TMP_PREFIX}1")
    dirs = _prior_batch_dirs(spark, band_store, batch_id=99)
    assert sorted(os.path.basename(d) for d in dirs) == ["batch=0", "batch=1"]
    assert not os.path.exists(f"{band_store}/{_COMPACT_TMP_PREFIX}1")
    assert spark.read.parquet(band_store).count() == n_bands


def test_streaming_labels_match_batch(spark, timed_transcripts, tmp_path):
    """with_labels cluster maintenance: accumulated streaming labels ==
    the batch pipeline's connected components over the same conversations
    (components are the closure of the same pair evidence; min-conv_id
    labels), and they survive store compaction unchanged."""
    from pcompress_spark.operators.candidates import candidate_pairs
    from pcompress_spark.operators.cluster import connected_components
    from pcompress_spark.operators.verify import verify_pairs
    from pcompress_spark.streaming.dedup_stream import (
        _near_dup_process, compact_near_dup_store, read_stream_labels)

    batch_df = spark.createDataFrame(timed_transcripts)
    sig = compute_signatures(assemble(batch_df), CFG).cache()
    half_a = sig.where(F.hash("conv_id") % 2 == 0).cache()
    half_b = sig.subtract(half_a).cache()
    wd = tmp_path / "wd_labels"
    kw = dict(store=str(wd / "sig_store"), pairs_out=str(wd / "pairs"),
              labels_store=str(wd / "labels"), cfg=CFG)
    _near_dup_process(half_a, 0, **kw)
    _near_dup_process(half_b, 1, **kw)
    got = {r.conv_id: r.cluster_id
           for r in read_stream_labels(spark, str(wd)).collect()}
    cand, _ = candidate_pairs(sig, CFG)
    pairs = verify_pairs(sig, cand, CFG)
    want = {r.conv_id: r.cluster_id for r in connected_components(
        sig.select("conv_id", "id_hash"), pairs, CFG).collect()}
    assert got == want

    # untouched passthrough: batch 1 rewrites only touched members + its
    # own docs — at least one batch-0 conversation stays unwritten
    b1 = set(spark.read.parquet(str(wd / "labels" / "batch=1")).toPandas()["conv_id"])
    assert {r.conv_id for r in half_b.select("conv_id").collect()} <= b1
    assert len(b1) < len(want)

    # compaction (union-merge; src_batch rides in-row) preserves labels
    compact_near_dup_store(spark, str(wd))
    got2 = {r.conv_id: r.cluster_id
            for r in read_stream_labels(spark, str(wd)).collect()}
    assert got2 == got


def test_streaming_labels_replay_idempotent(spark, timed_transcripts, tmp_path):
    """Replaying a batch (at-least-once foreachBatch) leaves the labels
    store byte-stable: same rows, same resolved assignment."""
    from pcompress_spark.streaming.dedup_stream import (
        _near_dup_process, read_stream_labels)

    batch_df = spark.createDataFrame(timed_transcripts)
    sig = compute_signatures(assemble(batch_df), CFG)
    half_a = sig.where(F.hash("conv_id") % 2 == 0).cache()
    half_b = sig.subtract(half_a).cache()
    wd = tmp_path / "wd_labels_replay"
    kw = dict(store=str(wd / "sig_store"), pairs_out=str(wd / "pairs"),
              labels_store=str(wd / "labels"), cfg=CFG)
    _near_dup_process(half_a, 0, **kw)
    _near_dup_process(half_b, 1, **kw)
    before = {r.conv_id: r.cluster_id
              for r in read_stream_labels(spark, str(wd)).collect()}
    n_rows = spark.read.parquet(str(wd / "labels")).count()
    _near_dup_process(half_b, 1, **kw)  # replay
    after = {r.conv_id: r.cluster_id
             for r in read_stream_labels(spark, str(wd)).collect()}
    assert after == before
    assert spark.read.parquet(str(wd / "labels")).count() == n_rows


def test_streaming_labels_enabled_mid_stream(spark, timed_transcripts, tmp_path):
    """Turning with_labels on over a work_dir that already holds label-less
    batches must not lose connectivity: the first labeled batch folds the
    accumulated pair store into its evidence and endpoints enter the CC
    straight from the edge rows, so labels agree with FULL pair history
    (components the pre-enablement pairs connect are not split)."""
    from pcompress_spark.operators.cluster import connected_components
    from pcompress_spark.streaming.dedup_stream import (
        _near_dup_process, read_stream_labels)

    batch_df = spark.createDataFrame(timed_transcripts)
    sig = compute_signatures(assemble(batch_df), CFG).cache()
    half_a = sig.where(F.hash("conv_id") % 2 == 0).cache()
    half_b = sig.subtract(half_a).cache()
    wd = tmp_path / "wd_labels_mid"
    base = dict(store=str(wd / "sig_store"), pairs_out=str(wd / "pairs"), cfg=CFG)
    _near_dup_process(half_a, 0, labels_store=None, **base)          # label-less era
    _near_dup_process(half_b, 1, labels_store=str(wd / "labels"), **base)

    got = {r.conv_id: r.cluster_id
           for r in read_stream_labels(spark, str(wd)).collect()}
    all_pairs = spark.read.parquet(str(wd / "pairs")).select(
        "conv_id_a", "conv_id_b", "ih_a", "ih_b")
    a_ids = {r.conv_id for r in half_a.select("conv_id").collect()}
    rows1 = spark.read.parquet(str(wd / "pairs" / "batch=1")).collect()
    cross = ({r.conv_id_a for r in rows1} | {r.conv_id_b for r in rows1}) & a_ids
    assert cross, "fixture must produce >= 1 cross-batch pair"
    # every pre-enablement endpoint is labeled (the bug dropped them)
    assert cross <= set(got)
    # and the labels equal CC over batch-1 docs + ALL pair-history
    # endpoints with the FULL accumulated edge set — pre-enablement pairs
    # included (without the seed, components they connect stay split)
    ep_nodes = (
        all_pairs.select(F.col("conv_id_a").alias("conv_id"),
                         F.col("ih_a").alias("id_hash"))
        .unionByName(all_pairs.select(F.col("conv_id_b").alias("conv_id"),
                                      F.col("ih_b").alias("id_hash")))
    )
    nodes = half_b.select("conv_id", "id_hash").unionByName(ep_nodes).distinct()
    want = {r.conv_id: r.cluster_id for r in connected_components(
        nodes, all_pairs.select("ih_a", "ih_b"), CFG).collect()}
    assert got == want


def test_per_store_replay_watermark(spark, timed_transcripts, tmp_path):
    """A crash between the sig-store and band-store writes followed by a
    quiesced compaction leaves the batch inside sig_store's c<N> but absent
    from the band store — the replay must rewrite ONLY the missing store
    (band) and not duplicate the present one (sig)."""
    from pcompress_spark.operators.candidates import band_explode
    from pcompress_spark.streaming.dedup_stream import (
        _compacted_through, _near_dup_process, compact_near_dup_store)

    batch_df = spark.createDataFrame(timed_transcripts)
    sig = compute_signatures(assemble(batch_df), CFG)
    half_a = sig.where(F.hash("conv_id") % 2 == 0).cache()
    half_b = sig.subtract(half_a).cache()
    extra = half_b.limit(5).withColumn(
        "conv_id", F.concat(F.lit("x_"), "conv_id")
    ).withColumn("id_hash", F.xxhash64("conv_id")).cache()
    wd = tmp_path / "wd_split"
    store, pairs = str(wd / "sig_store"), str(wd / "pairs")
    _near_dup_process(half_a, 0, store=store, pairs_out=pairs, cfg=CFG)
    _near_dup_process(half_b, 1, store=store, pairs_out=pairs, cfg=CFG)
    # batch 2 "crashes" after the sig-store write, before the band write
    extra.write.parquet(f"{store}/batch=2")
    compact_near_dup_store(spark, str(wd))
    assert _compacted_through(spark, store) == 2
    assert _compacted_through(spark, store + "_bands") == 1
    n_sig = spark.read.parquet(store).count()

    _near_dup_process(extra, 2, store=store, pairs_out=pairs, cfg=CFG)
    assert spark.read.parquet(store).count() == n_sig, "sig rows duplicated"
    got = spark.read.parquet(f"{store}_bands/batch=2").count()
    assert got == band_explode(extra, CFG).count(), (
        "band store missing the replayed batch's bands")


def test_compact_file_uri_and_replay_watermark(spark, timed_transcripts, tmp_path):
    """Compaction must run through the Hadoop FileSystem API (here via an
    explicit file: URI — the same code path as HDFS/S3A), and a batch
    replayed AFTER its rows were compacted (stream stopped mid-checkpoint,
    operator compacted anyway) must neither see its own rows in the store
    nor duplicate them: pairs and store contents stay identical."""
    from pcompress_spark.streaming.dedup_stream import (
        _compacted_through, _near_dup_process, compact_near_dup_store)

    batch_df = spark.createDataFrame(timed_transcripts)
    sig = compute_signatures(assemble(batch_df), CFG)
    half_a = sig.where(F.hash("conv_id") % 2 == 0).cache()
    half_b = sig.subtract(half_a).cache()
    wd = "file://" + str(tmp_path / "wd_uri")
    store, pairs = wd + "/sig_store", wd + "/pairs"
    _near_dup_process(half_a, 0, store=store, pairs_out=pairs, cfg=CFG)
    _near_dup_process(half_b, 1, store=store, pairs_out=pairs, cfg=CFG)
    p1 = spark.read.parquet(pairs).toPandas()
    n_store = spark.read.parquet(store).count()
    n_bands = spark.read.parquet(store + "_bands").count()

    compact_near_dup_store(spark, wd)
    assert _compacted_through(spark, store) == 1
    assert _compacted_through(spark, store + "_bands") == 1
    assert spark.read.parquet(store).count() == n_store
    assert spark.read.parquet(store + "_bands").count() == n_bands

    # replay batch 1 into the compacted store
    _near_dup_process(half_b, 1, store=store, pairs_out=pairs, cfg=CFG)
    assert spark.read.parquet(store).count() == n_store, "rows duplicated"
    assert spark.read.parquet(store + "_bands").count() == n_bands
    p2 = spark.read.parquet(pairs).toPandas()
    key = lambda df: set(zip(df["conv_id_a"], df["conv_id_b"], df["match_kind"]))
    assert key(p1) == key(p2)
