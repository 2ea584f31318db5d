"""Text-analysis operators over document tables — JVM-first.

The training-data-pipeline counterparts of the reference's content analyzers
(byte-histogram TEXT/BINARY/XML classifier, /root/reference/filters/analyzer/
analyzer.c:33-98; type-routed preprocessing dispatch,
/root/reference/pcompress.c:205-401).

Everything here is built-in pyspark.sql.functions (whole-stage codegen; no
Python in the hot path) except the rolling-hash fingerprint, which reuses
the shared numpy kernels. Each op has an exact DuckDB-SQL twin in
__spark_entry__.oracle_sql for the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Small fixed stopword lists for the language-ID heuristic (shared with the
# SQL oracle strings in __spark_entry__).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "es", "por"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "ein", "eine", "nicht"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"],
}


def norm_words(col: str | Column = "text") -> Column:
    """Normalized word array: lower, non-[a-z0-9] -> space, trim, split,
    drop empties. Matches kernels.normalize_texts + split."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " ")), " "),
        lambda w: w != "",
    )


def materialized_words(df: DataFrame, *cols: str | Column,
                       text_col: str | Column = "text") -> DataFrame:
    """``df`` projected to (*cols, words) with words = norm_words(text_col)
    MATERIALIZED per row behind a one-row ``explode(array(..))`` Generate
    barrier.

    Why this exists: Catalyst's projection collapse inlines a `words`
    alias into every reference in the consuming projection — including
    the ``words[i + j]`` element accesses inside ngram ``transform``
    lambdas. Higher-order functions are interpreted (no whole-stage
    codegen, no common-subexpression elimination), so the collapsed plan
    re-runs the full normalize+split over the document once PER GRAM
    ELEMENT: O(n_words × doc_length) per doc. Measured on 5.2k assembled
    sf0.1 conversations: 487 s collapsed vs 6 s behind the barrier for
    the repetition report. A Generate is a collapse barrier, and
    exploding a one-element array emits exactly one row per input row —
    value-identical, plan-shape only. Every gram builder over normalized
    words MUST consume this frame (or apply the same barrier inline)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return df.select(*cols, F.explode(F.array(norm_words(c))).alias("words"))


def token_stats(docs: DataFrame) -> DataFrame:
    """doc_id, n_tokens, n_distinct_tokens, avg_token_len (6dp).

    Kept as one inline projection (NOT behind materialized_words): the
    Generate barrier would block count-time column pruning for consumers
    that never read the stat columns, and the three references to the
    word array cost ~2 extra splits only when the stats are actually
    materialized — the prunable form measured faster for the common
    count/exists pattern."""
    w = norm_words("text")
    return docs.select(
        "doc_id",
        F.size(w).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(w)).cast("long").alias("n_distinct_tokens"),
        F.round(
            F.when(
                F.size(w) > 0,
                F.aggregate(w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
                .cast("double") / F.size(w),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("avg_token_len"),
    )


def text_features(df: DataFrame, *cols: str | Column,
                  text_col: str | Column = "text") -> DataFrame:
    """``df`` projected to (*cols, tf_n_tokens, tf_total_chars,
    tf_alnum_chars, tf_digit_chars, tf_space_chars, tf_sw_<lang>) — every
    character/token statistic the quality, language-ID, and content-class
    heuristics consume, each computed EXACTLY ONCE per row.

    Why two Generate barriers (see materialized_words): the statistics are
    referenced many times by the consuming CASE cascades (the language
    argmax alone references each stopword count up to six times), and
    Catalyst's projection collapse inlines an alias into every reference.
    Higher-order functions are interpreted — no codegen, no common-
    subexpression elimination — so the collapsed plan re-runs the full
    normalize+split pipeline once per reference: measured 3.6 s for the
    admission projection over the 5k-doc sf0.1 table vs ~0.4 s behind the
    barriers, and the blowup scales with corpus size (it is per-row CPU).
    Barrier 1 materializes the word array + lowercased text; barrier 2
    materializes the scalar counts; consumers then reference plain
    attributes, which collapse can duplicate for free.

    The emitted statistics are the EXACT expressions the inline
    heuristics (_quality_parts, _lang_counts, content_class_col) compute —
    quality_expr/lang_guess_expr/content_class_expr below rebuild the
    identical arithmetic over them, so results are bit-identical."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    # passthrough expressions (e.g. md5(text)) are evaluated ONCE in the
    # first projection; later projections reference them by output NAME —
    # their source columns no longer exist past the barrier
    names = df.select(*cols).columns if cols else []
    b1 = df.select(
        *cols,
        F.explode(F.array(F.struct(
            norm_words(c).alias("words"),
            F.lower(c).alias("lower"),
        ))).alias("_tf"),
    ).select(*names, F.col("_tf.words").alias("words"),
             F.col("_tf.lower").alias("lower"))
    total = F.length("lower")
    # complement-run forms — see _quality_parts / content_class_col
    alnum = total - F.length(F.regexp_replace("lower", "[a-z0-9 ]+", ""))
    digits = total - F.length(F.regexp_replace("lower", "[0-9]+", ""))
    spaces = total - F.length(F.regexp_replace("lower", " +", ""))

    def _count(sw: list[str]) -> Column:
        arr = F.array([F.lit(s) for s in sw])
        return F.size(F.filter("words", lambda x: F.array_contains(arr, x)))

    return b1.select(
        *names,
        F.explode(F.array(F.struct(
            F.size("words").alias("tf_n_tokens"),
            total.alias("tf_total_chars"),
            alnum.alias("tf_alnum_chars"),
            digits.alias("tf_digit_chars"),
            spaces.alias("tf_space_chars"),
            *[_count(sw).alias(f"tf_sw_{lang}")
              for lang, sw in STOPWORDS.items()],
        ))).alias("_tf2"),
    ).select(*names, "_tf2.*")


def _quality_parts_from_features() -> tuple[Column, Column, Column]:
    """(alnum_ratio, stopword_ratio, len_score) over text_features columns
    — the same arithmetic as _quality_parts, referencing materialized
    statistics instead of recomputing them."""
    total_chars = F.col("tf_total_chars")
    n_tok = F.col("tf_n_tokens")
    alnum_ratio = F.when(
        total_chars > 0, F.col("tf_alnum_chars").cast("double") / total_chars
    ).otherwise(0.0)
    stop_ratio = F.when(
        n_tok > 0, F.col("tf_sw_en").cast("double") / n_tok
    ).otherwise(0.0)
    len_score = F.least(n_tok.cast("double") / F.lit(50.0), F.lit(1.0))
    return alnum_ratio, stop_ratio, len_score


def quality_expr() -> Column:
    """quality_col over text_features columns (bit-identical values)."""
    alnum_ratio, stop_ratio, len_score = _quality_parts_from_features()
    return F.round((alnum_ratio + stop_ratio + len_score) / F.lit(3.0), 6)


def lang_guess_expr() -> Column:
    """lang_guess_col over text_features columns (same argmax cascade,
    same fixed tie-break order, same 'und' rule)."""
    counts = {lang: F.col(f"tf_sw_{lang}") for lang in STOPWORDS}
    best = F.greatest(*counts.values())
    guess = F.when(best <= 0, F.lit("und"))
    for lang in STOPWORDS:
        guess = guess.when(counts[lang] == best, F.lit(lang))
    return guess


def content_class_expr() -> Column:
    """content_class_col over text_features columns (same thresholds)."""
    total = F.col("tf_total_chars")
    digit_ratio = F.when(
        total > 0, F.col("tf_digit_chars").cast("double") / total
    ).otherwise(0.0)
    space_ratio = F.when(
        total > 0, F.col("tf_space_chars").cast("double") / total
    ).otherwise(0.0)
    return (
        F.when(total == 0, "empty")
        .when(digit_ratio > 0.10, "numeric")
        .when(space_ratio > 0.25, "airy")
        .otherwise("dense")
    )


def _quality_parts(col: str | Column = "text") -> tuple[Column, Column, Column]:
    """(alnum_ratio, stopword_ratio, len_score) raw (unrounded) columns —
    shared by quality_score and corpus_admission."""
    w = norm_words(col)
    lower = F.lower(F.col(col) if isinstance(col, str) else col)
    total_chars = F.length(lower)
    # complement-run form of length(regexp_replace(lower, "[^a-z0-9 ]", ""))
    # — value-identical (both count remaining-vs-removed code units), but
    # the per-char negated class goes match-per-character on JSON-heavy
    # agent text (millions of tiny matches; measured 12.8 s -> 0.3 s on
    # 73 MB of assembled transcripts) while "[a-z0-9 ]+" matches few long
    # runs. Regex cost here scales with MATCH COUNT, not input length.
    alnum_chars = total_chars - F.length(F.regexp_replace(lower, "[a-z0-9 ]+", ""))
    sw = F.array([F.lit(s) for s in STOPWORDS["en"]])
    n_tok = F.size(w)
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(sw, x)))
    alnum_ratio = F.when(total_chars > 0, alnum_chars.cast("double") / total_chars).otherwise(0.0)
    stop_ratio = F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(0.0)
    len_score = F.least(n_tok.cast("double") / F.lit(50.0), F.lit(1.0))
    return alnum_ratio, stop_ratio, len_score


def quality_col(col: str | Column = "text") -> Column:
    """Rounded composite quality score (mean of the three parts, 6dp)."""
    alnum_ratio, stop_ratio, len_score = _quality_parts(col)
    return F.round((alnum_ratio + stop_ratio + len_score) / F.lit(3.0), 6)


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality features + composite score (the reference's
    10/30/50% byte-class thresholds analog, analyzer.c:33-98):
    - alnum_ratio: [a-z0-9 ] chars / total chars (lowercased)
    - stopword_ratio: English stopwords / tokens
    - len_score: min(n_tokens / 50, 1)
    - quality: rounded mean of the three.
    Rides text_features (statistics materialized once per row — the
    four output columns would otherwise each re-run normalize+split)."""
    alnum_ratio, stop_ratio, len_score = _quality_parts_from_features()
    return text_features(docs, "doc_id").select(
        "doc_id",
        F.round(alnum_ratio, 6).alias("alnum_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(len_score, 6).alias("len_score"),
        F.round((alnum_ratio + stop_ratio + len_score) / F.lit(3.0), 6).alias("quality"),
    )


def _lang_counts(col: str | Column = "text") -> dict[str, Column]:
    """Per-language stopword-hit counts — shared by lang_guess and
    corpus_admission."""
    w = norm_words(col)

    def _count(sw: list[str]) -> Column:
        arr = F.array([F.lit(s) for s in sw])
        return F.size(F.filter(w, lambda x: F.array_contains(arr, x)))

    return {lang: _count(sw) for lang, sw in STOPWORDS.items()}


def lang_guess_col(col: str | Column = "text") -> Column:
    """Deterministic stopword-argmax language guess (ties broken by fixed
    language order en,es,de,fr; 'und' if no stopword hits)."""
    counts = _lang_counts(col)
    best = F.greatest(*counts.values())
    guess = F.when(best <= 0, F.lit("und"))
    for lang in STOPWORDS:  # first max wins (insertion order = fixed)
        guess = guess.when(counts[lang] == best, F.lit(lang))
    return guess


def lang_guess(docs: DataFrame) -> DataFrame:
    """Stopword-ratio language ID over fixed lists; the guess column IS
    lang_guess_expr over the same materialized counts (one cascade, shared
    with corpus_admission — a tweak to the tie-break or 'und' rule can't
    silently diverge the two). text_features materializes each stopword
    count once — the argmax cascade references every count up to six
    times, and the inline form re-ran the full normalize+split per
    reference (see text_features)."""
    return text_features(docs, "doc_id", "lang").select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        lang_guess_expr().alias("lang_guess"),
        *[F.col(f"tf_sw_{lang}").cast("long").alias(f"sw_{lang}")
          for lang in STOPWORDS],
    )


BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"


def bpe_ish_token_count(docs: DataFrame) -> DataFrame:
    """Token counting with a BPE-ish regex (letters / digit runs /
    punctuation runs as separate tokens — the shape GPT-style pre-tokenizers
    use) alongside whitespace counting. Both engines' regexes (Java /
    RE2) agree on this ASCII pattern."""
    toks = F.regexp_extract_all(F.lower("text"), F.lit(BPE_ISH_PATTERN), 0)
    ws = norm_words("text")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        F.size(ws).cast("long").alias("n_ws_tokens"),
    )


def content_class_col(col: str | Column = "text") -> Column:
    """Per-document content class from character-class ratios — the analog
    of the reference's byte-histogram TEXT/BINARY/XML classifier with its
    fixed percentage thresholds
    (/root/reference/filters/analyzer/analyzer.c:33-98). Shared by the
    census query AND the D6 routing path (doc_dedup.route_docs)."""
    lower = F.lower(F.col(col) if isinstance(col, str) else col)
    total = F.length(lower)
    # complement-run forms (see _quality_parts): value-identical to the
    # per-char negated classes but O(runs) matches instead of O(chars)
    digits = total - F.length(F.regexp_replace(lower, "[0-9]+", ""))
    spaces = total - F.length(F.regexp_replace(lower, " +", ""))
    digit_ratio = F.when(total > 0, digits.cast("double") / total).otherwise(0.0)
    space_ratio = F.when(total > 0, spaces.cast("double") / total).otherwise(0.0)
    return (
        F.when(total == 0, "empty")
        .when(digit_ratio > 0.10, "numeric")
        .when(space_ratio > 0.25, "airy")
        .otherwise("dense")
    )


def content_census(docs: DataFrame) -> DataFrame:
    """Dataset-type census: count documents per (lang, content_class).
    Pure JVM expressions; exact SQL twin in the oracle."""
    return (
        docs.select("lang", content_class_col().alias("content_class"))
        .groupBy("lang", "content_class")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


_FP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("rank", T.LongType(), False),
        T.StructField("fp", T.LongType(), False),
    ]
)


def doc_fingerprints(docs: DataFrame, k: int = 5, keep: int = 16) -> DataFrame:
    """Winnowing-style document fingerprint: the ``keep`` smallest k-gram
    rolling hashes (shared kernels) — a bottom-k sketch usable as a compact
    near-dup key. Reference analog: the K-min-values block sketch
    (/root/reference/rabin/rabin_dedup.c:684-706).

    Emitted as scalar rows (doc_id, rank, fp) with rank 1..keep in unsigned
    ascending fp order — array columns break order-insensitive result
    canonicalization downstream, scalar rows are the exchange format.
    Docs with fewer than ``keep`` distinct shingles emit fewer rows; empty
    docs emit none."""
    from ..config import DedupConfig
    from ..kernels import signatures_for_texts, trim_after

    cfg = DedupConfig(shingle_k=k, substring_enabled=False)

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sig = signatures_for_texts(pdf["text"], cfg)
            ids, ranks, fps = [], [], []
            for doc_id, s in zip(pdf["doc_id"].values, sig["shingles"]):
                # shingles are sorted ascending as uint64 already (np.unique
                # on the uint64 view) — the bottom-k IS the prefix
                bot = np.asarray(s, dtype=np.int64)[:keep]
                ids.extend([doc_id] * len(bot))
                ranks.extend(range(1, len(bot) + 1))
                fps.extend(bot)
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(ids, dtype=np.int64),
                    "rank": np.asarray(ranks, dtype=np.int64),
                    "fp": np.asarray(fps, dtype=np.int64),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(trim_after(_fp), schema=_FP_SCHEMA)
