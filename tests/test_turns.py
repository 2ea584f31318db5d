"""Turn-level dedup index (block-granularity literal/backward-ref analog)."""

import datetime

from pcompress_spark.operators.turns import turn_dedup_index, turn_dedup_stats


def _mk(spark, rows):
    ts = datetime.datetime(2025, 1, 1)
    return spark.createDataFrame(
        [(c, i, "user", t, "", ts) for (c, i, t) in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def test_turn_index_refs_point_backward(spark):
    df = _mk(
        spark,
        [
            ("c1", 0, "Hello there, how can I help you today?"),
            ("c1", 1, "please refactor the billing module now"),
            ("c2", 0, "hello THERE -- how can I help you, today"),  # same normalized
            ("c2", 1, "a genuinely unique turn about gardening tips"),
            ("c3", 0, "ok"),  # below min_chars floor -> always literal
        ],
    )
    out = {(r.conv_id, r.turn_idx): r for r in turn_dedup_index(df).collect()}
    assert len(out) == 5
    first = out[("c1", 0)]
    assert first.kind == "literal"
    assert (first.src_conv_id, first.src_turn_idx) == ("c1", 0)
    dup = out[("c2", 0)]
    assert dup.kind == "ref"
    assert (dup.src_conv_id, dup.src_turn_idx) == ("c1", 0)
    short = out[("c3", 0)]
    assert short.kind == "literal" and short.n_chars < 16
    # every ref points at a literal that exists, strictly earlier in
    # (conv_id, turn_idx) order — the backward-ref invariant
    for r in out.values():
        src = out[(r.src_conv_id, r.src_turn_idx)]
        assert src.kind == "literal"
        if r.kind == "ref":
            assert (r.src_conv_id, r.src_turn_idx) < (r.conv_id, r.turn_idx)


def test_turn_index_order_invariant(spark, smoke_transcripts):
    base = turn_dedup_index(smoke_transcripts)
    shuffled = turn_dedup_index(
        smoke_transcripts.orderBy("text").repartition(5)
    )
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, shuffled.collect()))


def test_turn_stats_consistent_with_index(spark, smoke_transcripts):
    idx = turn_dedup_index(smoke_transcripts).collect()
    st = turn_dedup_stats(smoke_transcripts).collect()[0]
    assert st.n_turns == len(idx)
    assert st.n_ref == sum(1 for r in idx if r.kind == "ref")
    assert st.n_literal + st.n_ref == st.n_turns
    assert st.ref_chars == sum(r.n_chars for r in idx if r.kind == "ref")
    assert 0.0 <= st.savings_ratio <= 1.0
    # the smoke corpus plants exact-dup conversations, so turn-level refs exist
    assert st.n_ref > 0


def test_transcript_recall_report_empty_truth(spark):
    """No conversation pair shares a shingle -> n_truth = 0 and recall
    reports 1.0 (vacuous success), never a divide-by-zero or null."""
    from pcompress_spark.operators.verify import transcript_recall_report

    sig = spark.createDataFrame(
        [("c1", [1, 2, 3]), ("c2", [9, 10, 11]), ("c3", [])],
        "conv_id string, shingles array<bigint>",
    )
    clusters = spark.createDataFrame(
        [("c1", "c1"), ("c2", "c2"), ("c3", "c3")],
        "conv_id string, cluster_id string",
    )
    row = transcript_recall_report(sig, clusters).collect()[0]
    assert row.n_truth == 0
    assert row.n_found == 0
    assert row.recall == 1.0


def test_boilerplate_turns_df_threshold(spark):
    from pcompress_spark.operators.turns import boilerplate_turns

    canned = "thanks for contacting support, how can I help you today?"
    rows = []
    # canned greeting in 4 distinct conversations (c1 has it TWICE —
    # within-conversation repetition must not inflate the distinct count)
    for c in ["c1", "c2", "c3", "c4"]:
        rows.append((c, 0, canned))
    rows.append(("c1", 1, canned))
    # a turn repeated across only 2 conversations: below min_convs=4
    for c in ["c5", "c6"]:
        rows.append((c, 0, "this pair of conversations shares this turn"))
    # a short viral turn below the char floor: exempt
    for c in ["c1", "c2", "c3", "c4", "c5"]:
        rows.append((c, 9, "ok!"))
    out = boilerplate_turns(_mk(spark, rows), min_convs=4).toPandas()
    flagged = set(map(tuple, out[["conv_id", "turn_idx"]].values))
    assert flagged == {("c1", 0), ("c1", 1), ("c2", 0), ("c3", 0), ("c4", 0)}
    assert (out.n_convs == 4).all()


def test_tool_sequence_ngrams_skip_and_order(spark):
    """Bigrams follow stable turn order over TOOL turns only: non-tool
    turns in between are skipped, sequences never cross conversations,
    and a single-tool conversation yields no bigram."""
    from pcompress_spark.operators.turns import tool_sequence_ngrams

    ts = datetime.datetime(2025, 1, 1)
    rows = [
        # c1: search -> (text) -> bash -> editor  => search>bash, bash>editor
        ("c1", 0, "user", "find the bug", "", ts),
        ("c1", 1, "tool", "results", "search", ts),
        ("c1", 2, "assistant", "let me check", None, ts),
        ("c1", 3, "tool", "ran", "bash", ts),
        ("c1", 4, "tool", "edited", "editor", ts),
        # c2: bash -> editor again, plus a lone trailing search
        ("c2", 0, "tool", "ran", "bash", ts),
        ("c2", 1, "tool", "edited", "editor", ts),
        # c3: single tool turn -> nothing
        ("c3", 0, "tool", "x", "search", ts),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = tool_sequence_ngrams(df, n=2).toPandas().set_index("tools")
    assert set(out.index) == {"search>bash", "bash>editor"}
    assert out.loc["bash>editor"].n_occurrences == 2
    assert out.loc["bash>editor"].n_convs == 2
    assert out.loc["search>bash"].n_convs == 1
    # trigrams: only c1 has three consecutive tool turns
    tri = tool_sequence_ngrams(df, n=3).toPandas()
    assert list(tri.tools) == ["search>bash>editor"]


def test_remove_boilerplate_is_exact_complement(spark):
    """The applying transform drops exactly the report's rows — all input
    columns preserved, below-floor viral turns kept."""
    from pcompress_spark.operators.turns import (
        boilerplate_turns,
        remove_boilerplate_turns,
    )

    rows = []
    canned = "thanks for contacting support, how can I help you today?"
    for c in ["c1", "c2", "c3", "c4"]:
        rows.append((c, 0, canned))
        rows.append((c, 1, f"unique content for {c} that stays in place"))
    for c in ["c1", "c2", "c3", "c4", "c5"]:
        rows.append((c, 9, "ok!"))  # viral but below the char floor
    df = _mk(spark, rows)
    rep = boilerplate_turns(df, min_convs=4).toPandas()
    kept = remove_boilerplate_turns(df, min_convs=4).toPandas()
    assert list(kept.columns) == df.columns
    assert len(kept) == df.count() - len(rep)
    flagged = set(map(tuple, rep[["conv_id", "turn_idx"]].values))
    assert flagged.isdisjoint(set(zip(kept.conv_id, kept.turn_idx)))
    # the short viral turn survives the rewrite
    assert len(kept[(kept.turn_idx == 9)]) == 5
