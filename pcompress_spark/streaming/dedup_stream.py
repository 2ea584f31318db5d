"""Structured Streaming front-end: incremental signature computation and
exact dedup over an arriving transcript stream.

Reference analog: pipe mode (`pcompress -p < in > out`,
/root/reference/pcompress.c:2397-2420) — same single-pass pipeline, with the
segmented index sized for bounded memory (/root/reference/rabin/global/
index.c:140-151). Here bounded state comes from a watermark: conversations
are assembled per event-time window, signatures computed by the SAME Arrow
kernels as batch, and exact dedup runs with dropDuplicates within the
watermark horizon.

Like the reference (global-dedup decompress "not possible in pipe mode",
/root/reference/rabin/rabin_dedup.c:1615-1617), cross-horizon near-dup
clustering is out of streaming scope — the batch pipeline handles it; the
stream handles ingest-time signatures + same-window exact suppression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupConfig
from ..operators.signatures import compute_signatures


def assemble_windowed(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Assemble conversations from streaming turn rows: group by conv_id
    within the watermark horizon, stable turn order via array_sort (same
    construction as batch assemble). Works on append-mode aggregation."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id", F.window("ts", watermark).alias("win"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                    lambda s: F.coalesce(s["text"], F.lit("")),
                ),
                "\n",
            ).alias("doc_text"),
        )
        .drop("win")
    )


def signatures_stream(stream: DataFrame, cfg: DedupConfig | None = None,
                      watermark: str = "10 minutes") -> DataFrame:
    """Streaming signatures: identical schema/values to the batch stage for
    conversations fully contained in one watermark window."""
    cfg = cfg or DedupConfig()
    return compute_signatures(assemble_windowed(stream, watermark), cfg)


def stateful_assemble_signatures(
    stream: DataFrame,
    cfg: DedupConfig | None = None,
    gap: str = "10 minutes",
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): conversation
    sessionization with event-time timeout.

    Turns accumulate in per-conv_id state across micro-batches; when the
    watermark passes a conversation's last turn + gap (no more turns can
    arrive), the conversation is assembled under stable turn ordering,
    signed with the SAME shared kernels as batch, emitted, and its state
    dropped. This is the streaming analog of the reference's content-
    aligned chunk boundary — a conversation is "closed" by content-defined
    quiescence, never split mid-stream (Read_Adjusted,
    /root/reference/utils/utils.c:234-278).

    Single stateful operator on the raw turn stream (Spark disallows
    applyInPandasWithState after a streaming aggregation). State per key is
    one conversation's turns — bounded and sharded across executors by the
    state store.

    Emits the FULL batch signature schema (operators/signatures.py
    SIGNATURE_SCHEMA), so downstream batch operators (LSH candidates,
    verify) run unchanged on the stream's output.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    cfg = cfg or DedupConfig()
    gap_ms = int(pd.Timedelta(gap).total_seconds() * 1000)
    out_schema = (
        "conv_id string, id_hash long, n_turns long, n_tokens long, "
        "content_hash string, shingles array<long>, minhash array<long>, "
        "simhash long, win_hashes array<long>, win_positions array<long>"
    )
    _cols = ["conv_id", "id_hash", "n_turns", "n_tokens", "content_hash",
             "shingles", "minhash", "simhash", "win_hashes", "win_positions"]
    state_schema = "turn_idxs array<int>, texts array<string>, max_ts long"

    def assemble_fn(key, pdf_iter, state: GroupState):
        from pcompress_spark.kernels import hash_tokens, signatures_for_texts
        from pcompress_spark.operators.assemble import TURN_SEP

        if state.hasTimedOut:
            turn_idxs, texts, _ = state.get
            texts = ["" if t is None else t for t in texts]
            # (turn_idx, text) ordering — same tie-break as batch assemble's
            # array_sort(struct(turn_idx, text)) for duplicate turn_idx rows
            order = sorted(range(len(texts)), key=lambda i: (turn_idxs[i], texts[i]))
            doc = TURN_SEP.join(texts[i] for i in order)
            sig = signatures_for_texts(pd.Series([doc]), cfg)
            if "win_hashes" not in sig.columns:
                sig["win_hashes"] = [[]]
                sig["win_positions"] = [[]]
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]],
                    "id_hash": [int(hash_tokens(
                        np.asarray([key[0]], dtype=np.str_)).view(np.int64)[0])],
                    "n_turns": [len(turn_idxs)],
                    "n_tokens": [int(sig.loc[0, "n_tokens"])],
                    "content_hash": [sig.loc[0, "content_hash"]],
                    "shingles": [np.asarray(sig.loc[0, "shingles"], dtype=np.int64)],
                    "minhash": [np.asarray(sig.loc[0, "minhash"], dtype=np.int64)],
                    "simhash": [int(sig.loc[0, "simhash"])],
                    "win_hashes": [np.asarray(sig.loc[0, "win_hashes"], dtype=np.int64)],
                    "win_positions": [np.asarray(sig.loc[0, "win_positions"], dtype=np.int64)],
                }
            )
            return
        turn_idxs, texts, max_ts = ([], [], 0)
        if state.exists:
            turn_idxs, texts, max_ts = state.get
            turn_idxs, texts = list(turn_idxs), list(texts)
        for pdf in pdf_iter:
            turn_idxs.extend(int(x) for x in pdf["turn_idx"])
            texts.extend("" if x is None else str(x) for x in pdf["text"])
            batch_max = int(pdf["ts"].max().value // 10**6)
            max_ts = max(max_ts, batch_max)
        state.update((turn_idxs, texts, max_ts))
        # late stragglers (event time already behind the watermark) would
        # otherwise request a timeout in the past, which Spark rejects —
        # clamp so the resurrected conversation closes at the next trigger
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(max_ts + gap_ms, wm + 1))
        yield pd.DataFrame(columns=_cols)

    return (
        stream.withWatermark("ts", gap)
        .groupBy("conv_id")
        .applyInPandasWithState(
            assemble_fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _near_dup_process(batch_df: DataFrame, batch_id: int, *, store: str,
                      pairs_out: str, cfg: DedupConfig) -> None:
    """foreachBatch body for start_near_dup_stream (module-level so replay
    idempotence is directly testable). Writes are keyed by batch_id and
    overwritten on replay; the store read EXCLUDES this batch's own subdir,
    so a replayed batch joins against exactly the state it saw first.
    Store discovery goes through the Hadoop FileSystem API so work_dir may
    live on HDFS/S3 (the spark-submit deployment target), not only the
    driver's local disk."""
    import os

    from ..operators.candidates import candidate_pairs
    from ..operators.verify import verify_pairs

    spark = batch_df.sparkSession
    batch_df = batch_df.persist()
    try:
        if batch_df.count() == 0:
            return
        jvm = spark._jvm
        store_path = jvm.org.apache.hadoop.fs.Path(store)
        fs = store_path.getFileSystem(spark._jsc.hadoopConfiguration())
        prior = []
        if fs.exists(store_path):
            for status in fs.listStatus(store_path):
                name = status.getPath().getName()
                if name.startswith("batch=") and name != f"batch={batch_id}":
                    prior.append(str(status.getPath()))
        all_sigs = (
            batch_df.unionByName(spark.read.parquet(*prior)) if prior else batch_df
        )
        # persist_sizes=False: stats aren't collected here, so the bucket-
        # size frame is consumed once (hot-bucket broadcast) — persisting it
        # per micro-batch would leak cache entries over a long-running stream
        cand, _stats = candidate_pairs(all_sigs, cfg, persist_sizes=False)
        new_ids = batch_df.select("conv_id")
        new_ihs = batch_df.select("id_hash")

        def touching_new(df: DataFrame, a: str, b: str, keys: DataFrame,
                         key: str) -> DataFrame:
            return (
                df.join(keys.withColumnRenamed(key, a), a, "left_semi")
                .unionByName(df.join(keys.withColumnRenamed(key, b), b, "left_semi"))
                .distinct()
            )

        verified = verify_pairs(
            all_sigs, touching_new(cand, "ih_a", "ih_b", new_ihs, "id_hash"), cfg
        )
        incremental = touching_new(
            verified, "conv_id_a", "conv_id_b", new_ids, "conv_id"
        )
        incremental.write.mode("overwrite").parquet(
            os.path.join(pairs_out, f"batch={batch_id}"))
        batch_df.write.mode("overwrite").parquet(
            os.path.join(store, f"batch={batch_id}"))
    finally:
        batch_df.unpersist()


def start_near_dup_stream(
    stream: DataFrame,
    work_dir: str,
    cfg: DedupConfig | None = None,
    watermark: str = "10 minutes",
    trigger_available_now: bool = True,
):
    """Incremental near-duplicate PAIR detection on a transcript stream.

    Spark disallows stream-stream joins downstream of stateful operators, so
    the incremental index probe is expressed the idiomatic micro-batch way:
    ``foreachBatch`` joins each batch of newly-closed conversation signatures
    (same Arrow kernels as batch) against an accumulated signature store —
    the exact shape of the reference's pipe-mode segmented index, where each
    incoming segment's sketch values probe an index built from everything
    seen so far (/root/reference/rabin/global/index.c:140-151, first
    occurrence wins /root/reference/rabin/global/index.c:485-558).

    Conversations are closed by the stateful sessionizer
    (stateful_assemble_signatures: event-time quiescence, never split
    mid-stream), so each conv_id emits exactly ONE full signature row —
    window-straddling fragments cannot occur. Per micro-batch: LSH
    candidates + verification run over store ∪ batch with the SAME batch
    operators (candidate_pairs / verify_pairs), then only pairs touching a
    conversation from this batch are appended — a pair is emitted exactly
    once, when its later endpoint arrives. With no hot buckets the
    accumulated pair set equals the batch pipeline's pairs over the same
    closed conversations (deterministic kernels end to end); under
    hot-bucket salting the cap is applied to incremental bucket sizes, so
    drops can differ from batch order (same recall bound, logged caps).

    Layout under ``work_dir``: ``sig_store/batch=N/`` and ``pairs/batch=N/``
    (parquet, one subdir per micro-batch — foreachBatch is at-least-once, so
    a replayed batch OVERWRITES its own subdir instead of double-appending;
    same idempotent-resume rule as the batch pipeline's checkpoints),
    ``ckpt/`` (streaming checkpoint). Returns the started StreamingQuery;
    read results with ``spark.read.parquet(work_dir + "/pairs")`` (the
    ``batch`` partition column records provenance).
    """
    import functools
    import os

    cfg = cfg or DedupConfig()
    store = os.path.join(work_dir, "sig_store")
    pairs_out = os.path.join(work_dir, "pairs")
    sigs = stateful_assemble_signatures(stream, cfg, gap=watermark)

    process = functools.partial(
        _near_dup_process, store=store, pairs_out=pairs_out, cfg=cfg
    )
    writer = sigs.writeStream.foreachBatch(process).outputMode("append").option(
        "checkpointLocation", os.path.join(work_dir, "ckpt")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_exact_dedup(stream: DataFrame, cfg: DedupConfig | None = None,
                          watermark: str = "10 minutes") -> DataFrame:
    """Exact-dup suppression within the watermark horizon: first conversation
    per content_hash survives (state bounded by the watermark, the memlimit
    analog). Emits (conv_id, content_hash, n_turns, n_tokens)."""
    sig = signatures_stream(stream, cfg, watermark)
    return sig.select("conv_id", "content_hash", "n_turns", "n_tokens").dropDuplicates(
        ["content_hash"]
    )
