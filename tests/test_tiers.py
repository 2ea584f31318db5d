"""Tier attribution: the exact > near > substring > kept cascade."""

import numpy as np

from pcompress_spark.config import DedupConfig
from pcompress_spark.operators.assemble import assemble
from pcompress_spark.operators.substring import verify_substring_pairs
from pcompress_spark.operators.tiers import tier_attribution
from pcompress_spark.pipeline import DedupPipeline

CFG = DedupConfig()


def test_tier_attribution_cascade(spark):
    """One conversation per tier, engineered so each lands in exactly the
    intended branch: byte-identical (exact), one-token edit (near), a long
    contained run with low overall jaccard (substring), a unique doc
    (kept), plus an equal-token-count substring pair that exercises the
    lexicographic tie-break."""
    rng = np.random.default_rng(7)

    def words(n, tag):
        return " ".join(f"{tag}{w}" for w in rng.integers(0, 30_000, size=n))

    base = words(200, "b")
    near = base.split()
    near[17] = "zzz"
    near = " ".join(near)
    run = words(300, "r")            # shared long run (substring tier)
    host = words(200, "h") + " " + run + " " + words(200, "h2")
    contained = run + " " + words(20, "u")   # jaccard vs host ~0.4 < 0.5
    tie_run = words(150, "s")
    tie1 = tie_run + " " + words(200, "f1")  # 350 tokens each; overall
    tie2 = tie_run + " " + words(200, "f2")  # jaccard ~0.27 — not near

    rows = [
        ("a-one", 0, "user", base, ""),
        ("a-two", 0, "user", base, ""),
        ("b-near", 0, "user", near, ""),
        ("c-host", 0, "user", host, ""),
        ("d-contained", 0, "user", contained, ""),
        ("e-unique", 0, "user", words(150, "e"), ""),
        ("f-tie1", 0, "user", tie1, ""),
        ("f-tie2", 0, "user", tie2, ""),
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "role", "text", "tool"])

    tabs = DedupPipeline(spark, CFG).run(df).tables
    asm = assemble(df)
    ver = verify_substring_pairs(tabs["substring_pairs"], asm, CFG)
    out = (
        tier_attribution(tabs["signatures"], tabs["clusters"], ver, CFG)
        .toPandas()
        .set_index("conv_id")
    )

    assert len(out) == 8
    assert out.at["a-two", "tier"] == "exact"
    assert out.at["a-two", "removed_by"] == "a-one"
    assert out.at["b-near", "tier"] == "near"
    assert out.at["b-near", "removed_by"] == "a-one"
    assert out.at["d-contained", "tier"] == "substring"
    assert out.at["d-contained", "removed_by"] == "c-host"
    # equal token counts -> lexicographically greater conv_id loses
    assert out.at["f-tie2", "tier"] == "substring"
    assert out.at["f-tie2", "removed_by"] == "f-tie1"
    for kept in ("a-one", "c-host", "e-unique", "f-tie1"):
        assert out.at[kept, "tier"] == "kept", kept
        assert out.at[kept, "removed_by"] == kept


def test_doc_tier_attribution_semantics(spark):
    """Doc-table cascade: exact dup -> 'exact'; LSH near-dup cluster member
    -> 'near'; a short doc wholly embedded in a longer one (tiny Jaccard)
    -> 'substring'; everything else 'kept'. Priority exact > near."""
    from pcompress_spark.functions import doc_dedup

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu ") * 4
    near = base.replace("zulu", "zulus")  # high-Jaccard variant
    # disjoint vocabulary from `base` so the containment pair can't sneak
    # into the near tier via shared shingles
    short = " ".join(f"w{i:03d}token" for i in range(40))
    # filler is all-distinct tokens so Jaccard(short, host) ~ 38/840 << 0.3
    host = short + " " + " ".join(f"f{i:04d}x" for i in range(800))
    rows = [(1, base), (2, base), (3, near), (4, host), (5, short),
            (6, "completely different standalone text about nothing much")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in doc_dedup.doc_tier_attribution(docs).collect()}
    assert out[1].tier == "kept" and out[1].removed_by == 1
    assert out[2].tier == "exact" and out[2].removed_by == 1
    assert out[3].tier == "near" and out[3].removed_by == 1
    assert out[5].tier == "substring" and out[5].removed_by == 4
    assert out[4].tier == "kept"
    assert out[6].tier == "kept"
