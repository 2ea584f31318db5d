"""Turn-level dedup index — the reference's *block-granularity* dedup.

pcompress dedups at rabin-block granularity inside each chunk: every block
either becomes a backward reference to an earlier identical block (index
entry MSB=1) or is stored as a literal run (MSB=0)
(/root/reference/rabin/rabin_dedup.h:116-134, reference-vs-literal emit at
/root/reference/rabin/rabin_dedup.c:1236-1344). The transcript engine's
conversation-level channels are the *chunk/segment* analogs; this module is
the *block* analog: the dedup granule is a single turn, and the output is
the same literal/backward-ref index, re-expressed relationally.

Blocks below the minimum block size are never dedup candidates in the
reference (RAB_BLK_MIN_BITS floor, /root/reference/rabin/rabin_dedup.c:120-126);
here the analog is a minimum normalized-char floor (``min_chars``) below
which a turn is always stored literal.

The index is JVM-side built-ins (sha2 over the shared normalization
expression) — no Python UDF, whole-stage codegen end to end; the stats
rollup instead normalizes+hashes through the shared Arrow kernels
(java.util.regex is the bottleneck at corpus scale — see
turn_dedup_stats). In both, the only shuffle is the groupBy(turn_hash),
and a viral boilerplate turn ("ok", a canned greeting) produces a large
group but only min/count aggs — membership is never materialized, so
there is no hot-reducer risk at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def norm_text_col(col):
    """JVM twin of kernels.normalize_one for ASCII corpora: lowercase,
    collapse non-[a-z0-9] runs to one space, trim. Matches the DuckDB
    oracle expression verbatim (``_NORM`` in __spark_entry__.py)."""
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def turn_dedup_index(transcripts: DataFrame, min_chars: int = 16) -> DataFrame:
    """Per-turn dedup index: (conv_id, turn_idx, kind, src_conv_id,
    src_turn_idx, n_chars).

    ``kind='ref'`` marks a turn whose normalized text already occurred at a
    globally earlier (conv_id, turn_idx) — the backward-reference entry;
    ``kind='literal'`` is the first occurrence (or a below-floor turn).
    Literal rows self-reference (src == self) so the schema is null-free.
    The "earlier" order is lexicographic (conv_id, turn_idx) — a
    deterministic total order, the relational analog of the reference's
    file-offset order (earlier offset wins the index slot,
    /root/reference/rabin/global/index.c:286-323).
    """
    # norm is projected once so the sha2/length pair shares one regexp pass
    # (codegen subexpression elimination); a single LEFT join replaces a
    # union-of-branches so the (scan -> normalize -> hash) work runs exactly
    # twice (build + probe), not once per branch. Below-floor turns can
    # never collide with an eligible turn_hash (same hash => same text =>
    # same length), so their join miss is structural, and coalesce routes
    # them to the literal self-reference.
    h = transcripts.select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        norm_text_col(F.col("text")).alias("norm"),
    ).select(
        "conv_id",
        "turn_idx",
        F.sha2("norm", 256).alias("turn_hash"),
        F.length("norm").cast("long").alias("n_chars"),
    )
    # min over a packed "conv_id \x01 zero-padded-turn" string instead of
    # min(struct(...)): struct min falls back to interpreted ordering in the
    # aggregate (~3x slower here); the packed key keeps the agg in codegen.
    # \x01 sorts below every printable character, so packed order equals
    # tuple order for any printable conv_id (incl. a prefix of another) and
    # non-negative turn_idx up to 12 digits — both are table invariants.
    packed = F.concat(
        "conv_id", F.lit("\x01"), F.lpad(F.col("turn_idx").cast("string"), 12, "0")
    )
    firsts = (
        h.where(F.col("n_chars") >= min_chars)
        .groupBy("turn_hash")
        .agg(F.min(packed).alias("src_key"))
        .select(
            "turn_hash",
            F.substring_index("src_key", "\x01", 1).alias("f_conv"),
            F.substring_index("src_key", "\x01", -1).cast("long").alias("f_turn"),
        )
    )
    return h.join(firsts, "turn_hash", "left").select(
        "conv_id",
        "turn_idx",
        F.when(
            F.col("f_conv").isNull()
            | ((F.col("conv_id") == F.col("f_conv")) & (F.col("turn_idx") == F.col("f_turn"))),
            F.lit("literal"),
        )
        .otherwise(F.lit("ref"))
        .alias("kind"),
        F.coalesce(F.col("f_conv"), F.col("conv_id")).alias("src_conv_id"),
        F.coalesce(F.col("f_turn"), F.col("turn_idx")).alias("src_turn_idx"),
        "n_chars",
    )


def turn_dedup_stats(transcripts: DataFrame, min_chars: int = 16) -> DataFrame:
    """One-row savings rollup over the turn dedup index — the analog of the
    reference's end-of-run dedup ratio report (chunks_deduped / ratio
    printout, /root/reference/rabin/rabin_dedup.c:1469-1489 and final stats
    at /root/reference/pcompress.c:1082-1118).

    Columns: n_turns, n_literal, n_ref, total_chars, ref_chars,
    savings_ratio (= ref_chars / total_chars, the fraction of normalized
    text a turn-granular store would not re-store), each rounded/cast to
    match the DuckDB twin exactly.
    """
    # The rollup never needs the index's src attribution — only how many
    # turns share each hash. Within a turn_hash group every member has the
    # same normalized text (hence the same n_chars), so per group:
    # eligible (n_chars >= floor): 1 literal + (cnt-1) refs, ref_chars =
    # (cnt-1) * n_chars; below-floor: cnt literals, 0 refs. That collapses
    # the index's build-side self-join (two scan+normalize+sha2 passes plus
    # two full-width shuffles of every turn) into ONE scan and ONE
    # map-side-combined shuffle of (hash, cnt) partials — at the 3.3M-turn
    # bench corpus this is the difference between ~60 s and ~15 s, and at
    # 100 TB it is the difference between shuffling the corpus twice and
    # shuffling the distinct-hash set once.
    # normalize+hash through the shared Python kernels (one Arrow pass):
    # kernels.normalize_one is byte-identical to the JVM/DuckDB regex for
    # ASCII corpora but ~5x faster than java.util.regex here (the regexp
    # projection alone costs ~15 s of the 3.3M-turn bench corpus vs ~4 s
    # for the kernel pass). Two boundary optimizations (guide §4), each
    # measured on the 3.3M-turn corpus:
    # - mapInArrow rather than mapInPandas, RAW 32-byte digest rather
    #   than the 64-char hexdigest (12.3 s -> 9.9 s): only the rollup's
    #   group STRUCTURE matters, and digest bytes key identical groups;
    # - batches COALESCED to ~4096 rows inside the UDF (interleaved A/B:
    #   21.6-26.4 s -> 17.6-17.8 s on a noisy window): the session's
    #   512-row Arrow batch bounds the heavyweight signature UDF's
    #   working set, but these rows are ~700 B — per-batch kernel-call
    #   overhead dominated, and the iterator form lets this op pick its
    #   own granularity without touching the session conf.
    from .. import kernels

    @kernels.trim_after
    def _hash_gen(batches):
        import hashlib

        import pyarrow as pa

        def flush(buf):
            texts = pa.Table.from_batches(buf).column(0).to_pandas()
            norm_bytes, n_chars = kernels.normalize_bytes_batch(texts)
            return pa.RecordBatch.from_arrays(
                [
                    pa.array([hashlib.sha256(b).digest()
                              for b in norm_bytes], type=pa.binary()),
                    pa.array(n_chars, type=pa.int64()),
                ],
                names=["turn_hash", "n_chars"],
            )

        buf, n = [], 0
        for rb in batches:
            buf.append(rb)
            n += rb.num_rows
            if n >= 4096:
                yield flush(buf)
                buf, n = [], 0
        if buf:
            yield flush(buf)

    g = (
        transcripts.select("text")
        .mapInArrow(_hash_gen, "turn_hash binary, n_chars long")
        .groupBy("turn_hash")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("n_chars").alias("nc"))
    )
    elig = F.col("nc") >= min_chars
    return g.agg(
        F.sum("cnt").cast("long").alias("n_turns"),
        F.sum(F.when(elig, F.lit(1)).otherwise(F.col("cnt"))).cast("long").alias(
            "n_literal"
        ),
        F.sum(F.when(elig, F.col("cnt") - 1).otherwise(F.lit(0))).cast("long").alias(
            "n_ref"
        ),
        F.sum(F.col("cnt") * F.col("nc")).cast("long").alias("total_chars"),
        F.sum(
            F.when(elig, (F.col("cnt") - 1) * F.col("nc")).otherwise(F.lit(0))
        ).cast("long").alias("ref_chars"),
        F.round(
            F.sum(F.when(elig, (F.col("cnt") - 1) * F.col("nc")).otherwise(F.lit(0)))
            / F.greatest(F.sum(F.col("cnt") * F.col("nc")), F.lit(1)),
            6,
        ).alias("savings_ratio"),
    )


def boilerplate_turns(
    transcripts: DataFrame, min_convs: int = 4, min_chars: int = 16
) -> DataFrame:
    """Cross-conversation repeated-turn report: (conv_id, turn_idx,
    n_convs) for every turn whose normalized text occurs in >= min_convs
    DISTINCT conversations — canned greetings, templated tool preambles,
    viral boilerplate. This is corpus-level line-dedup (the C4/RefinedWeb
    hygiene pass) transposed to the transcript schema: suppression by
    document frequency, a different verdict from turn_dedup_index's
    first-occurrence backward refs (a turn repeated 100x inside ONE
    conversation is a ref there but never boilerplate here).

    Below-floor turns (< min_chars normalized chars) are exempt, same
    floor as turn_dedup_index (reference min-block analog,
    /root/reference/rabin/rabin_dedup.c:120-126).

    Scale: the frequency agg shuffles only (turn_hash, conv_id) pairs
    (count-distinct partial agg, membership never materialized); the
    boilerplate key set is small by construction (df >= min_convs), so the
    join back rides an AQE broadcast — the corpus text is scanned, hashed,
    and never shuffled. No UDF, whole-stage codegen end to end."""
    norm = norm_text_col(F.col("text"))
    h = transcripts.select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        F.sha2(norm, 256).alias("th"),
        F.length(norm).alias("n_chars"),
    ).where(F.col("n_chars") >= int(min_chars))
    hot = (
        h.groupBy("th")
        .agg(F.countDistinct("conv_id").cast("long").alias("n_convs"))
        .where(F.col("n_convs") >= int(min_convs))
    )
    return h.join(hot, "th").select("conv_id", "turn_idx", "n_convs")


def remove_boilerplate_turns(
    transcripts: DataFrame, min_convs: int = 4, min_chars: int = 16
) -> DataFrame:
    """The APPLYING transform for ``boilerplate_turns``: the corpus with
    flagged turns REMOVED — every input column preserved, rows dropped
    when their normalized text occurs in >= min_convs distinct
    conversations (and clears the min_chars floor). This is the rewrite a
    hygiene pass actually ships, not just the report.

    The drop is a bare-hash LEFT ANTI join against the (small by
    construction) hot-hash set: a hash in the hot set can only come from
    at-floor text, and equal normalized text implies equal length, so no
    below-floor row can collide into a drop — the floor exemption needs
    no extra predicate. Same plan shape as the report: count-distinct
    partial agg on (hash, conv) pairs, AQE-broadcast anti-join back, the
    corpus text scanned once and never shuffled, no UDF."""
    norm = norm_text_col(F.col("text"))
    t = transcripts.withColumn("th", F.sha2(norm, 256)).withColumn(
        "nn", F.length(norm))
    hot = (
        t.where(F.col("nn") >= int(min_chars))
        .groupBy("th")
        .agg(F.countDistinct("conv_id").alias("n_convs"))
        .where(F.col("n_convs") >= int(min_convs))
        .select("th")
    )
    return t.join(hot, "th", "left_anti").select(*transcripts.columns)


def turn_census(transcripts: DataFrame) -> DataFrame:
    """Per-role x content-class turn census — the transcript twin of the
    documents table's type census (A4), answering "what does each role
    actually emit" (assistant prose vs tool numeric dumps vs airy logs).
    Reuses THE shared character-class classifier
    (functions.text.content_class_col — the reference's byte-histogram
    analyzer analog, /root/reference/filters/analyzer/analyzer.c:33-98)
    so the routing path, the doc census, and this census can never
    disagree on a class. Returns (role, content_class, n_turns, n_convs).
    Map-only classify + one count-distinct partial agg; no UDF."""
    from ..functions.text import content_class_col

    return (
        transcripts.select(
            "conv_id", "role", content_class_col().alias("content_class"))
        .groupBy("role", "content_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.countDistinct("conv_id").cast("long").alias("n_convs"),
        )
    )


def tool_sequence_ngrams(
    transcripts: DataFrame, n: int = 2, min_convs: int = 1
) -> DataFrame:
    """Agent-behavior census over the input schema's ``tool`` column:
    frequency of CONSECUTIVE tool-invocation n-grams per conversation —
    which tool chains (search>browser, editor>bash>bash, ...) dominate
    the corpus. Non-tool turns between calls are skipped: the sequence is
    the conversation's tool turns in stable turn order, exactly as
    ``assemble`` orders text. Returns (tools, n_occurrences, n_convs)
    with ``tools`` the '>'-joined n-gram, counted per occurrence and per
    distinct conversation, filtered to n_convs >= min_convs.

    Plan shape: one hash exchange on conv_id feeds the lead() window
    (per-conversation state only — never a global sort), then a
    count-distinct partial agg on the (gram, conv_id) pairs; text is
    never read, no UDF, whole-stage codegen end to end.

    The window orders by (turn_idx, tool) — the tool tie-break makes the
    sequence TOTAL-ordered when duplicate turn_idx rows exist (assemble
    tolerates them via its own (turn_idx, text) tie-break; turn_idx alone
    would make those chains partition-order-dependent). Mirrored in the
    tr_tool_ngrams oracle SQL."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx", "tool")
    t = transcripts.where(
        F.col("tool").isNotNull() & (F.col("tool") != "")
    ).select("conv_id", "turn_idx", "tool")
    cols = [F.col("tool")] + [
        F.lead("tool", i).over(w) for i in range(1, int(n))
    ]
    grams = t.select(
        "conv_id", F.concat_ws(">", *cols).alias("tools"),
        cols[-1].isNotNull().alias("full"),
    ).where(F.col("full"))
    return (
        grams.groupBy("tools")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.countDistinct("conv_id").cast("long").alias("n_convs"),
        )
        .where(F.col("n_convs") >= int(min_convs))
    )
