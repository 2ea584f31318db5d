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
