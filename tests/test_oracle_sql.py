"""oracle_sql (DuckDB) vs kernels (numpy) — exact parity of the SQL twins.

Every statement builder in pcompress_spark/oracle_sql.py must reproduce the
shared kernels bit-for-bit; these tests are the foundation the driver-facing
oracle scripts in __spark_entry__ stand on."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from pcompress_spark import datagen, kernels, oracle
from pcompress_spark import oracle_sql as osql
from pcompress_spark.config import DedupConfig

CFG = DedupConfig()


@pytest.fixture(scope="module")
def docs() -> pd.DataFrame:
    data = datagen.generate(seed=7, n_conv=40, dup_frac=0.4)
    asm = oracle.assemble(data.transcripts)
    rows = list(zip(asm["conv_id"], asm["doc_text"]))
    rows += [
        ("edge_empty", ""),
        ("edge_space", "   \t\n "),
        ("edge_one", "single"),
        ("edge_longtok", "x" * 200 + " " + "y" * 63 + " done"),
        ("edge_uni", "héllo wörld ünïcode 123 héllo wörld again and again"),
        ("edge_rep", ("the quick brown fox jumps over the lazy dog " * 12)),
    ]
    return pd.DataFrame(rows, columns=["sid", "text"])


@pytest.fixture(scope="module")
def con(docs):
    """Connection with the full signature staging executed once."""
    c = duckdb.connect()
    c.execute(osql.PRELUDE)
    c.register("docs", docs)
    c.execute(osql.token_stmts("t", "docs", "sid", "text", CFG.max_token_chars))
    c.execute(osql.shingle_stmts("t", "ttok", CFG.shingle_k))
    c.execute(osql.minhash_stmts("m", "tshd", CFG.num_perm, CFG.seed))
    c.execute(osql.simhash_stmts("x", "tshd", CFG.simhash_sample))
    c.execute(osql.window_stmts("w", "tshr", CFG.shingle_k,
                                CFG.substring_window, CFG.substring_stride))
    c.execute(osql.prefix_stmts("p", "ttok"))
    return c


@pytest.fixture(scope="module")
def ksig(docs):
    return kernels.signatures_for_texts(docs["text"], CFG)


def _by_sid(rows):
    return {r[0]: r[1] for r in rows}


def test_token_hashes_match(con, docs):
    got = _by_sid(con.sql(
        "SELECT sid, list(th ORDER BY pos) FROM ttok GROUP BY sid").fetchall())
    for sid, text in zip(docs["sid"], docs["text"]):
        want = kernels.tokens_to_hashes(text, CFG.max_token_chars)
        if len(want) == 0:
            assert sid not in got
        else:
            assert [int(x) for x in got[sid]] == [int(x) for x in want], sid


def test_id_hash_matches(con, docs):
    got = _by_sid(con.sql(f"""
        WITH ih AS ({osql.smix_chain(['sid'], 'fnv_raw(left(sid, 64))',
                                     'idh', '(SELECT DISTINCT sid FROM docs)')})
        SELECT sid, idh FROM ih""").fetchall())
    want = kernels.hash_tokens(docs["sid"].to_numpy(dtype=np.str_))
    for sid, w in zip(docs["sid"], want):
        assert int(got[sid]) == int(w), sid


def test_shingles_match(con, docs, ksig):
    got_p = _by_sid(con.sql(
        "SELECT sid, list(sh ORDER BY pos) FROM tshr GROUP BY sid").fetchall())
    got_d = _by_sid(con.sql(
        "SELECT sid, list(sh ORDER BY sh) FROM tshd GROUP BY sid").fetchall())
    for i, sid in enumerate(docs["sid"]):
        want_d = np.asarray(ksig.loc[i, "shingles"], dtype=np.int64).view(np.uint64)
        if len(want_d) == 0:
            assert sid not in got_d
            continue
        assert [int(x) for x in got_d[sid]] == [int(x) for x in want_d], sid
        th = kernels.tokens_to_hashes(docs["text"].iloc[i], CFG.max_token_chars)
        want_p = kernels.shingle_hashes(th, CFG.shingle_k)
        assert [int(x) for x in got_p[sid]] == [int(x) for x in want_p], sid


def test_minhash_oph_matches(con, docs, ksig):
    got = _by_sid(con.sql("SELECT sid, mh FROM mmh").fetchall())
    for i, sid in enumerate(docs["sid"]):
        want = np.asarray(ksig.loc[i, "minhash"], dtype=np.int64).view(np.uint64)
        if len(np.asarray(ksig.loc[i, "shingles"])) == 0:
            assert sid not in got  # engine band-path excludes these too
            continue
        assert [int(x) for x in got[sid]] == [int(x) for x in want], sid


def test_simhash_matches(con, docs, ksig):
    got = _by_sid(con.sql("SELECT sid, simh FROM xsimh").fetchall())
    for i, sid in enumerate(docs["sid"]):
        want = int(np.int64(ksig.loc[i, "simhash"]).view(np.uint64))
        if len(np.asarray(ksig.loc[i, "shingles"])) == 0:
            assert sid not in got
            continue
        assert int(got[sid]) == want, sid


def test_simhash_sample_cap():
    """A doc with > sample_cap distinct shingles votes with the bottom-k
    prefix only — same content-stable sample as the kernel."""
    text = " ".join(f"tok{i} alpha beta gamma delta" for i in range(400))
    pdf = pd.DataFrame({"sid": ["big"], "text": [text]})
    sig = kernels.signatures_for_texts(pdf["text"], CFG)
    assert len(sig.loc[0, "shingles"]) > CFG.simhash_sample
    c = duckdb.connect()
    c.execute(osql.PRELUDE)
    c.register("bigdocs", pdf)
    c.execute(osql.token_stmts("t", "bigdocs", "sid", "text"))
    c.execute(osql.shingle_stmts("t", "ttok", CFG.shingle_k))
    c.execute(osql.simhash_stmts("x", "tshd", CFG.simhash_sample))
    got = c.sql("SELECT simh FROM xsimh").fetchone()[0]
    assert int(got) == int(np.int64(sig.loc[0, "simhash"]).view(np.uint64))


def test_window_fingerprints_match(con, docs, ksig):
    got = _by_sid(con.sql(
        "SELECT sid, list(wh) FROM wwin GROUP BY sid").fetchall())
    for i, sid in enumerate(docs["sid"]):
        want = set(
            int(x) for x in np.asarray(ksig.loc[i, "win_hashes"],
                                       dtype=np.int64).view(np.uint64)
        )
        if not want:
            assert sid not in got
            continue
        assert set(int(x) for x in got[sid]) == want, sid


def test_prefix_hashes_and_lcs_match(con, docs):
    res = con.sql("SELECT sid, n, pref FROM ppref").fetchall()
    pref_by_sid = {r[0]: (r[1], r[2]) for r in res}
    texts = dict(zip(docs["sid"], docs["text"]))
    for sid, (n, pref) in list(pref_by_sid.items())[:20]:
        th = kernels.tokens_to_hashes(texts[sid], CFG.max_token_chars)
        want = kernels._prefix_hashes(th)
        assert n == len(th)
        assert [int(x) for x in pref] == [int(x) for x in want], sid
    # window-hash reconstruction: h[i..i+L) = pref[i+L] - pref[i]*GOLD^L
    sid = max(pref_by_sid, key=lambda s: pref_by_sid[s][0])
    th = kernels.tokens_to_hashes(texts[sid], CFG.max_token_chars)
    L = min(7, len(th))
    powL = np.uint64(pow(osql.GOLD, L, 1 << 64))
    want_wh = kernels._window_hash_all(th, L, powL, kernels._prefix_hashes(th))
    got_wh = con.sql(f"""
        SELECT list_transform(range(1, n - {L} + 2),
                              i -> submod(pref[i + {L}],
                                          mulmod(pref[i], {pow(osql.GOLD, L, 1 << 64)}::HUGEINT)))
        FROM ppref WHERE sid = '{sid}'""").fetchone()[0]
    assert [int(x) for x in got_wh] == [int(x) for x in want_wh]


def test_empty_token_hash_sentinel(con):
    """kernels.hash_tokens of an empty token = splitmix64(FNV_OFFSET)."""
    got = con.sql("SELECT smix(fnv_raw(''))").fetchone()[0]
    want = int(kernels.splitmix64(np.uint64(osql.FNV_OFFSET)))
    assert int(got) == want


def test_python_splitmix_constant_twin():
    for v in [0, 1, 0xE0F1, 2**63, 2**64 - 1]:
        assert osql.splitmix64_int(v) == int(kernels.splitmix64(np.uint64(v)))


def test_xxh64_long_matches_spark(spark, con):
    from pyspark.sql import functions as F

    vals = [0, 1, -1, 42, 2**62, -(2**62), 123456789, -987654321]
    sdf = spark.createDataFrame([(v,) for v in vals], "v long")
    want = {r["v"]: r["h"] for r in
            sdf.select("v", F.xxhash64("v").alias("h")).collect()}
    got = con.sql(f"""
        WITH vals AS (SELECT unnest({vals}) AS v),
        {osql.xxh64_long_ctes('x', 'vals', ['v'], 'v', 'xh')}
        SELECT v, tobig(xh) FROM xx5""").fetchall()
    for v, h in got:
        assert int(h) == want[v], v


def test_horner_lead_stmts_k1_valid_sql():
    """n_terms=1 (shingle_k=1) renders no lead terms — the generated SQL
    must stay valid and equal smix(val) per row."""
    c = duckdb.connect()
    c.execute(osql.PRELUDE)
    c.execute("CREATE OR REPLACE TEMP TABLE k1src AS "
              "SELECT 1 AS sid, i AS pos, (i + 7)::HUGEINT AS th "
              "FROM range(5) t(i)")
    c.execute(osql._horner_lead_stmts("k1", "k1src", "th", 1, 1,
                                      "k1out", "sh"))
    got = c.execute("SELECT sh FROM k1out ORDER BY pos").fetchall()
    assert len(got) == 5
    want = kernels.splitmix64(np.arange(7, 12, dtype=np.uint64))
    assert [int(v) & ((1 << 64) - 1) for (v,) in got] == [int(w) for w in want]


def test_pow_stage_ctes_raises_past_bound():
    """Exponents >= 2^n_stages must RAISE (no silent bit truncation)."""
    c = duckdb.connect()
    c.execute(osql.PRELUDE)
    sql = ("WITH src AS (SELECT 1025 AS i), "
           + osql._pow_stage_ctes("p", "src", n_stages=10)
           + " SELECT * FROM ppw")
    with pytest.raises(Exception, match="pow stage overflow"):
        c.execute(sql).fetchall()
    # in-bound exponents still compute GOLD^i exactly
    sql_ok = ("WITH src AS (SELECT 1023 AS i), "
              + osql._pow_stage_ctes("p", "src", n_stages=10)
              + " SELECT pp FROM ppw")
    got = int(c.execute(sql_ok).fetchone()[0]) & ((1 << 64) - 1)
    assert got == pow(osql.GOLD, 1023, 1 << 64)
