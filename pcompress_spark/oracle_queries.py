"""Full DuckDB oracle queries for every hash-bearing Spark query.

Composes the kernel-twin statement builders from oracle_sql.py into
self-contained multi-statement SQL scripts (macro prelude + TEMP TABLE
staging + one final SELECT) that the driver's correctness gate can run
verbatim against the same parquet inputs. Column names/aliases match the
Spark queries exactly.

Why statements instead of one big WITH: DuckDB inlines plain CTEs (every
reference re-evaluates the chain) and parallelizes pipelines over base-
table row groups — a million-token chain rooted at a 1000-row CTE runs
near single-threaded. TEMP TABLE staging fixed the transcript signature
chain from ~170 s to a few seconds at sf0.01."""

from __future__ import annotations

from .config import DedupConfig
from . import oracle_sql as osql

_H = "::HUGEINT"

_NORM = "trim(regexp_replace(lower({x}), '[^a-z0-9]+', ' ', 'g'))"


def _script(*parts: str) -> str:
    return osql.PRELUDE + "\n" + "\n".join(parts)


# ---------------------------------------------------------------------------
# shared bucket -> candidate-pair statement (engine bucket_members twin:
# hot-bucket salting by pymod(salt, ceil(m/cap)), sort-by-member cap, >= 2)
# ---------------------------------------------------------------------------

def _bucket_pair_stmt(bands_table: str, cap: int, out: str = "cand") -> str:
    """``{bands_table}`` must provide (mem, salt, band_idx, key). Creates
    TEMP TABLE ``{out}`` (ma, mb distinct pairs, ma < mb in member order)."""
    return f"""
CREATE OR REPLACE TEMP TABLE {out} AS
WITH bsize_ AS (SELECT band_idx, key, count(*) AS m FROM {bands_table}
                GROUP BY band_idx, key),
bkept_ AS (SELECT bd.mem, bd.band_idx, bd.key
           FROM {bands_table} bd
           JOIN bsize_ s ON s.band_idx = bd.band_idx AND s.key = bd.key
           WHERE s.m <= {cap} OR pymod(bd.salt, (s.m + {cap - 1}) // {cap}) = 0),
bcap_ AS (SELECT band_idx, key, list_sort(list(mem))[1 : {cap}] AS ids
          FROM bkept_ GROUP BY band_idx, key HAVING count(*) >= 2)
SELECT DISTINCT pr['a'] AS ma, pr['b'] AS mb FROM (
    SELECT unnest(flatten(list_transform(range(1, len(ids) + 1), i ->
        list_transform(range(i + 1, len(ids) + 1), j ->
            {{'a': ids[i], 'b': ids[j]}})))) AS pr
    FROM bcap_);
"""


# ---------------------------------------------------------------------------
# documents-table oracles
# ---------------------------------------------------------------------------

def _doc_sig_stmts(k: int, with_minhash: bool, with_simhash: bool,
                   cfg: DedupConfig, src: str = "documents",
                   pfx: str = "") -> str:
    """TEMP TABLE ``{pfx}dsig`` over ALL rows of ``src`` (a table name or a
    parenthesized subquery with (doc_id, text)). Engine parity: docs below
    the shingle floor keep sh = [] and the sentinel simhash — the SimHash
    path bands them, the MinHash path filters len(sh) > 0. ``pfx``
    namespaces every temp table so two signature pipelines (e.g. per-class
    adaptive-k) can coexist in one script."""
    parts = [
        f"CREATE OR REPLACE TEMP TABLE {pfx}dsrc AS "
        f"SELECT doc_id, text FROM {src};",
        osql.token_stmts(f"{pfx}t", f"{pfx}dsrc", "doc_id", "text",
                         cfg.max_token_chars),
        osql.shingle_stmts(f"{pfx}t", f"{pfx}ttok", k),
    ]
    cols = ["d.doc_id AS sid", "coalesce(s.sh, []) AS sh"]
    joins = (f" LEFT JOIN (SELECT sid, list(sh ORDER BY sh) AS sh "
             f"FROM {pfx}tshd GROUP BY sid) s ON s.sid = d.doc_id")
    if with_minhash:
        parts.append(osql.minhash_stmts(f"{pfx}m", f"{pfx}tshd",
                                        cfg.num_perm, cfg.seed))
        cols.append("m.mh")
        joins += f" LEFT JOIN {pfx}mmh m ON m.sid = d.doc_id"
    if with_simhash:
        parts.append(osql.simhash_stmts(f"{pfx}x", f"{pfx}tshd",
                                        cfg.simhash_sample))
        cols.append(f"coalesce(x.simh, {osql.EMPTY_SENTINEL}{_H}) AS simh")
        joins += f" LEFT JOIN {pfx}xsimh x ON x.sid = d.doc_id"
    parts.append(f"""
CREATE OR REPLACE TEMP TABLE {pfx}dih AS
{osql.smix_chain(['sid'], 'unsig(sid)', 'idh',
                 f'(SELECT doc_id AS sid FROM {pfx}dsrc)')};
CREATE OR REPLACE TEMP TABLE {pfx}dsig AS
SELECT {', '.join(cols)}, i.idh
FROM {pfx}dsrc d{joins} JOIN {pfx}dih i ON i.sid = d.doc_id;
""")
    return "\n".join(parts)


def doc_fingerprints_sql(k: int = 5, keep: int = 16) -> str:
    return _script(
        osql.token_stmts("t", "documents", "doc_id", "text"),
        osql.shingle_stmts("t", "ttok", k),
        f"""
WITH fp_ AS (
    SELECT sid, sh, row_number() OVER (PARTITION BY sid ORDER BY sh) AS rank
    FROM tshd)
SELECT sid::BIGINT AS doc_id, rank::BIGINT AS rank, tobig(sh) AS fp
FROM fp_ WHERE rank <= {keep}""",
    )


# the shingle-routed class subset (doc_dedup.route_docs twin: NOT empty,
# NOT numeric — digit ratio <= 0.10); airy/dense keep the LSH path
ROUTED_DOC_SRC = """(SELECT doc_id, text FROM documents
 WHERE length(lower(text)) > 0
   AND length(regexp_replace(lower(text), '[^0-9]', '', 'g'))::DOUBLE
       / length(lower(text)) <= 0.10)"""


def _class_doc_src(klass: str) -> str:
    """Single content-class subset of documents (text.content_class_col
    twin): airy = space ratio > 0.25 of the shingle-routed set, dense =
    the rest of it."""
    cmp = ">" if klass == "airy" else "<="
    return f"""(SELECT doc_id, text FROM documents
 WHERE length(lower(text)) > 0
   AND length(regexp_replace(lower(text), '[^0-9]', '', 'g'))::DOUBLE
       / length(lower(text)) <= 0.10
   AND length(regexp_replace(lower(text), '[^ ]', '', 'g'))::DOUBLE
       / length(lower(text)) {cmp} 0.25)"""


def doc_adaptive_k_sql(k_airy: int = 3, k_dense: int = 5,
                       threshold: float = 0.3) -> str:
    """Per-class adaptive shingle-k twin (doc_dedup.adaptive_k_lsh_pairs):
    two namespaced signature pipelines (prefixes ak/dk) at different k,
    LSH pairs per class, unioned with the class's k column. The jaccard
    values depend on the class's shingle width, so the value-hash check
    pins that each class really used its own k."""
    parts = []
    finals = []
    for pfx, klass, k in (("ak", "airy", k_airy), ("dk", "dense", k_dense)):
        cfg = DedupConfig(shingle_k=k, substring_enabled=False,
                          jaccard_threshold=threshold)
        r = cfg.rows
        parts.append(_doc_sig_stmts(k, with_minhash=True, with_simhash=False,
                                    cfg=cfg, src=_class_doc_src(klass),
                                    pfx=pfx))
        parts.append(f"""
CREATE OR REPLACE TEMP TABLE {pfx}bands AS
SELECT sid AS mem, tobig(idh) AS salt, b.b AS band_idx,
       mh[b.b * {r} + 1 : b.b * {r} + {r}] AS key
FROM {pfx}dsig CROSS JOIN (SELECT unnest(range(0, {cfg.bands}))::INT AS b) b
WHERE len(sh) > 0;""")
        parts.append(_bucket_pair_stmt(f"{pfx}bands", cfg.bucket_cap,
                                       out=f"{pfx}cand"))
        finals.append(f"""
SELECT ma::BIGINT AS doc_id_a, mb::BIGINT AS doc_id_b,
       round(jac, 6) AS jaccard, {k}::INT AS k
FROM (SELECT ma, mb, CASE WHEN la + lb - inter > 0
                          THEN inter::DOUBLE / (la + lb - inter)
                          ELSE 1.0 END AS jac
      FROM (SELECT c.ma, c.mb, len(a.sh) AS la, len(b.sh) AS lb,
                   len(list_intersect(a.sh, b.sh)) AS inter
            FROM {pfx}cand c JOIN {pfx}dsig a ON a.sid = c.ma
            JOIN {pfx}dsig b ON b.sid = c.mb))
WHERE round(jac, 6) >= {threshold}""")
    return _script(*parts, "\nUNION ALL\n".join(finals))


def doc_minhash_lsh_sql(k: int = 3, threshold: float = 0.3,
                        cfg: DedupConfig | None = None,
                        src: str = "documents") -> str:
    cfg = cfg or DedupConfig(shingle_k=k, substring_enabled=False)
    r = cfg.rows
    return _script(
        _doc_sig_stmts(k, with_minhash=True, with_simhash=False, cfg=cfg,
                       src=src),
        f"""
CREATE OR REPLACE TEMP TABLE bands AS
SELECT sid AS mem, tobig(idh) AS salt, b.b AS band_idx,
       mh[b.b * {r} + 1 : b.b * {r} + {r}] AS key
FROM dsig CROSS JOIN (SELECT unnest(range(0, {cfg.bands}))::INT AS b) b
WHERE len(sh) > 0;""",
        _bucket_pair_stmt("bands", cfg.bucket_cap),
        f"""
WITH ver_ AS (SELECT c.ma, c.mb, len(a.sh) AS la, len(b.sh) AS lb,
                     len(list_intersect(a.sh, b.sh)) AS inter
              FROM cand c JOIN dsig a ON a.sid = c.ma
              JOIN dsig b ON b.sid = c.mb),
ver2_ AS (SELECT ma, mb,
                 CASE WHEN la + lb - inter > 0
                      THEN inter::DOUBLE / (la + lb - inter) ELSE 1.0 END AS jac
          FROM ver_)
SELECT ma::BIGINT AS doc_id_a, mb::BIGINT AS doc_id_b, round(jac, 6) AS jaccard
FROM ver2_ WHERE round(jac, 6) >= {threshold}""",
    )


def doc_recall_sql(k: int = 3, truth_threshold: float = 0.5,
                   design_threshold: float = 0.3,
                   cfg: DedupConfig | None = None) -> str:
    """Twin for doc_dedup.recall_report: brute-force same-lang shingle
    Jaccard truth at ``truth_threshold`` vs the LSH pair set at
    ``design_threshold`` -> one row (truth_threshold, n_truth, n_found,
    recall)."""
    cfg = cfg or DedupConfig(shingle_k=k, substring_enabled=False)
    r = cfg.rows
    return _script(
        _doc_sig_stmts(k, with_minhash=True, with_simhash=False, cfg=cfg),
        f"""
CREATE OR REPLACE TEMP TABLE bands AS
SELECT sid AS mem, tobig(idh) AS salt, b.b AS band_idx,
       mh[b.b * {r} + 1 : b.b * {r} + {r}] AS key
FROM dsig CROSS JOIN (SELECT unnest(range(0, {cfg.bands}))::INT AS b) b
WHERE len(sh) > 0;""",
        _bucket_pair_stmt("bands", cfg.bucket_cap),
        f"""
CREATE OR REPLACE TEMP TABLE lpairs AS
WITH ver_ AS (SELECT c.ma, c.mb, len(a.sh) AS la, len(b.sh) AS lb,
                     len(list_intersect(a.sh, b.sh)) AS inter
              FROM cand c JOIN dsig a ON a.sid = c.ma
              JOIN dsig b ON b.sid = c.mb),
ver2_ AS (SELECT ma, mb,
                 CASE WHEN la + lb - inter > 0
                      THEN inter::DOUBLE / (la + lb - inter) ELSE 1.0 END AS jac
          FROM ver_)
SELECT ma::BIGINT AS doc_id_a, mb::BIGINT AS doc_id_b
FROM ver2_ WHERE round(jac, 6) >= {design_threshold};
CREATE OR REPLACE TEMP TABLE rtruth AS
WITH s_ AS (SELECT d.sid, d.sh, doc.lang
            FROM dsig d JOIN documents doc ON doc.doc_id = d.sid
            WHERE len(d.sh) > 0),
j_ AS (SELECT a.sid AS doc_id_a, b.sid AS doc_id_b,
              len(a.sh) AS la, len(b.sh) AS lb,
              len(list_intersect(a.sh, b.sh)) AS inter
       FROM s_ a JOIN s_ b ON a.lang = b.lang AND a.sid < b.sid)
SELECT doc_id_a, doc_id_b
FROM (SELECT doc_id_a, doc_id_b,
             round(CASE WHEN la + lb - inter > 0
                        THEN inter::DOUBLE / (la + lb - inter)
                        ELSE 1.0 END, 6) AS jac FROM j_)
WHERE jac >= {truth_threshold};""",
        f"""
WITH nt AS (SELECT count(*)::BIGINT AS n_truth FROM rtruth),
nf AS (SELECT count(*)::BIGINT AS n_found
       FROM rtruth t JOIN lpairs l
         ON l.doc_id_a = t.doc_id_a AND l.doc_id_b = t.doc_id_b)
SELECT {truth_threshold}::DOUBLE AS truth_threshold, n_truth, n_found,
       round(CASE WHEN n_truth > 0 THEN n_found::DOUBLE / n_truth
                  ELSE 1.0 END, 6) AS recall
FROM nt, nf""",
    )


DELTA_PRED = "{x} % 4 = 0"  # the deterministic corpus/delta split used by
# the doc_incremental_* queries (engine twin in __spark_entry__.py)


def _doc_incr_pair_stmts(k: int, threshold: float, cfg: DedupConfig,
                         delta: str = DELTA_PRED) -> str:
    """TEMP TABLE ``ipairs``: FULL-batch verified MinHash-LSH pairs filtered
    to >= 1 delta endpoint. Incremental equivalence (proof sketch in
    functions/incremental.py): the engine probes only buckets the delta
    touches, but membership within a touched bucket — including the
    hot-bucket salting and the sorted cap, both functions of the bucket's
    full membership — matches a full-corpus run bit-for-bit, so the
    engine's incremental pair set equals this filtered full set exactly.
    ``delta`` is a predicate template with {x} for the doc-id expression."""
    r = cfg.rows
    return "\n".join([
        _doc_sig_stmts(k, with_minhash=True, with_simhash=False, cfg=cfg),
        f"""
CREATE OR REPLACE TEMP TABLE bands AS
SELECT sid AS mem, tobig(idh) AS salt, b.b AS band_idx,
       mh[b.b * {r} + 1 : b.b * {r} + {r}] AS key
FROM dsig CROSS JOIN (SELECT unnest(range(0, {cfg.bands}))::INT AS b) b
WHERE len(sh) > 0;""",
        _bucket_pair_stmt("bands", cfg.bucket_cap),
        f"""
CREATE OR REPLACE TEMP TABLE ipairs AS
WITH ver_ AS (SELECT c.ma, c.mb, len(a.sh) AS la, len(b.sh) AS lb,
                     len(list_intersect(a.sh, b.sh)) AS inter
              FROM cand c JOIN dsig a ON a.sid = c.ma
              JOIN dsig b ON b.sid = c.mb),
ver2_ AS (SELECT ma, mb,
                 CASE WHEN la + lb - inter > 0
                      THEN inter::DOUBLE / (la + lb - inter) ELSE 1.0 END AS jac
          FROM ver_)
SELECT ma::BIGINT AS doc_id_a, mb::BIGINT AS doc_id_b, round(jac, 6) AS jaccard
FROM ver2_
WHERE round(jac, 6) >= {threshold}
  AND ({delta.format(x='ma')} OR {delta.format(x='mb')});""",
    ])


def doc_incremental_pairs_sql(k: int = 3, threshold: float = 0.3,
                              cfg: DedupConfig | None = None) -> str:
    cfg = cfg or DedupConfig(shingle_k=k, substring_enabled=False)
    return _script(
        _doc_incr_pair_stmts(k, threshold, cfg),
        "SELECT doc_id_a, doc_id_b, jaccard FROM ipairs",
    )


BENCH_PRED = "{x} % 17 = 0"  # the deterministic train/benchmark split used
# by doc_neardup_decontam (engine twin in __spark_entry__.py)


def doc_neardup_decontam_sql(k: int = 3, threshold: float = 0.3,
                             cfg: DedupConfig | None = None) -> str:
    """Twin for curation.neardup_decontaminate over the %17 benchmark
    split: the shared incremental pair staging (delta predicate = bench),
    oriented to exactly-one-bench-endpoint (train, bench) hits, then one
    per-train-doc rollup with the (jaccard DESC, bench ASC) arg-max
    partner."""
    cfg = cfg or DedupConfig(shingle_k=k, substring_enabled=False)
    b = BENCH_PRED
    return _script(
        _doc_incr_pair_stmts(k, threshold, cfg, delta=b),
        f"""
WITH hits_ AS (
    SELECT doc_id_a AS doc_id, doc_id_b AS bench_id, jaccard FROM ipairs
    WHERE {b.format(x='doc_id_b')} AND NOT ({b.format(x='doc_id_a')})
    UNION ALL
    SELECT doc_id_b AS doc_id, doc_id_a AS bench_id, jaccard FROM ipairs
    WHERE {b.format(x='doc_id_a')} AND NOT ({b.format(x='doc_id_b')})),
w_ AS (SELECT doc_id, bench_id AS top_bench_id FROM (
    SELECT doc_id, bench_id,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY jaccard DESC, bench_id ASC) AS rn
    FROM hits_) WHERE rn = 1)
SELECT h.doc_id, count(*)::BIGINT AS n_bench_hits,
       round(max(h.jaccard), 6) AS max_jaccard,
       min(w.top_bench_id)::BIGINT AS top_bench_id
FROM hits_ h JOIN w_ w USING (doc_id)
GROUP BY h.doc_id""",
    )


def doc_incremental_dedup_sql(k: int = 3, threshold: float = 0.3,
                              cfg: DedupConfig | None = None) -> str:
    """Admission twin for incremental.incremental_admission: exact (md5 vs
    corpus rep or earlier delta doc, smaller partner wins, exact outranks
    near) then near (corpus neighbor at any id order — corpus priority —
    or smaller-id delta neighbor)."""
    cfg = cfg or DedupConfig(shingle_k=k, substring_enabled=False)
    d = DELTA_PRED
    is_delta = d.format(x="doc_id")
    return _script(
        _doc_incr_pair_stmts(k, threshold, cfg),
        f"""
WITH cmd5_ AS (SELECT md5(text) AS h, min(doc_id) AS c_rep FROM dsrc
               WHERE NOT ({is_delta}) GROUP BY 1),
dmd5_ AS (SELECT doc_id, md5(text) AS h FROM dsrc WHERE {is_delta}),
dmin_ AS (SELECT h, min(doc_id) AS d_min FROM dmd5_ GROUP BY 1),
exact_ AS (SELECT dm.doc_id,
                  CASE WHEN c.c_rep IS NOT NULL
                            AND (m.d_min >= dm.doc_id OR c.c_rep < m.d_min)
                       THEN c.c_rep
                       WHEN m.d_min < dm.doc_id THEN m.d_min END AS exact_of
           FROM dmd5_ dm LEFT JOIN cmd5_ c ON c.h = dm.h
           JOIN dmin_ m ON m.h = dm.h),
partners_ AS (
    SELECT doc_id_b AS doc_id, doc_id_a AS partner FROM ipairs
    WHERE {d.format(x='doc_id_b')}
    UNION ALL
    SELECT doc_id_a AS doc_id, doc_id_b AS partner FROM ipairs
    WHERE {d.format(x='doc_id_a')} AND NOT ({d.format(x='doc_id_b')})),
near_ AS (SELECT doc_id, min(partner) AS near_of FROM partners_ GROUP BY 1)
SELECT dd.doc_id,
       (CASE WHEN e.exact_of IS NOT NULL OR n.near_of IS NOT NULL
             THEN 0 ELSE 1 END)::INT AS keep,
       CASE WHEN e.exact_of IS NOT NULL THEN 'exact'
            WHEN n.near_of IS NOT NULL THEN 'near' ELSE 'none' END AS dup_kind,
       coalesce(e.exact_of, n.near_of, -1)::BIGINT AS dup_of
FROM (SELECT doc_id FROM dsrc WHERE {is_delta}) dd
LEFT JOIN exact_ e ON e.doc_id = dd.doc_id
LEFT JOIN near_ n ON n.doc_id = dd.doc_id""",
    )


def doc_incremental_clusters_sql(k: int = 3, threshold: float = 0.3,
                                 cfg: DedupConfig | None = None) -> str:
    """Twin for incremental.incremental_clusters: connected components over
    (corpus-run evidence as the label star of a CORPUS-ONLY cluster pass)
    ∪ (delta-endpoint LSH pairs — the shared ``ipairs`` staging) ∪
    (delta exact-md5 edges to the corpus index rep and/or the earliest
    same-hash delta doc), min-doc_id labels over ALL docs. Untouched
    corpus components keep their corpus label automatically (the corpus
    label IS the component min, and the star preserves membership), so
    one global reach pins both the passthrough and the merged relabels.

    Staging order matters: ``ipairs`` and ``iexact`` are materialized from
    the FULL tables first; dsig/dsrc are then stashed and replaced with
    their corpus-only subsets so the shared _doc_cluster_stmts runs the
    corpus's own cluster pass bit-for-bit (banding a doc is independent of
    other docs, and bucket caps see corpus-only membership — exactly what
    the corpus's own run saw)."""
    cfg = cfg or DedupConfig(shingle_k=k, substring_enabled=False)
    d = DELTA_PRED
    is_delta = d.format(x="doc_id")
    return _script(
        _doc_incr_pair_stmts(k, threshold, cfg),
        f"""
CREATE OR REPLACE TEMP TABLE iexact AS
WITH cmd5_ AS (SELECT md5(text) AS h, min(doc_id) AS c_rep FROM dsrc
               WHERE NOT ({is_delta}) GROUP BY 1),
dmd5_ AS (SELECT doc_id, md5(text) AS h FROM dsrc WHERE {is_delta}),
dmin_ AS (SELECT h, min(doc_id) AS d_min FROM dmd5_ GROUP BY 1)
SELECT dm.doc_id AS a, c.c_rep AS b
FROM dmd5_ dm JOIN cmd5_ c ON c.h = dm.h
UNION
SELECT dm.doc_id AS a, m.d_min AS b
FROM dmd5_ dm JOIN dmin_ m ON m.h = dm.h
WHERE m.d_min < dm.doc_id;
CREATE OR REPLACE TEMP TABLE dsig_full AS SELECT * FROM dsig;
CREATE OR REPLACE TEMP TABLE dsrc_full AS SELECT * FROM dsrc;
CREATE OR REPLACE TEMP TABLE dsig AS
SELECT * FROM dsig_full WHERE NOT ({d.format(x='sid')});
CREATE OR REPLACE TEMP TABLE dsrc AS
SELECT * FROM dsrc_full WHERE NOT ({is_delta});""",
        _doc_cluster_stmts(threshold, cfg),
        """
CREATE OR REPLACE TEMP TABLE iedges AS
SELECT doc_id_a AS a, doc_id_b AS b FROM ipairs
UNION SELECT a, b FROM iexact
UNION SELECT cluster_id AS a, doc_id AS b FROM dclusters
WHERE doc_id != cluster_id;
CREATE OR REPLACE TEMP TABLE isym AS
SELECT a, b FROM iedges UNION SELECT b AS a, a AS b FROM iedges;
CREATE OR REPLACE TEMP TABLE ireach AS
WITH RECURSIVE reach(src, dst) AS (
    SELECT doc_id, doc_id FROM dsrc_full
    UNION
    SELECT r.src, s.b FROM reach r JOIN isym s ON r.dst = s.a)
SELECT src::BIGINT AS doc_id, min(dst)::BIGINT AS cluster_id
FROM reach GROUP BY src;
SELECT doc_id, cluster_id FROM ireach""",
    )


def doc_substring_sql(k: int = 3, cfg: DedupConfig | None = None) -> str:
    """Twin for doc_dedup.doc_substring_pairs: content-defined window
    fingerprints -> salted/capped window buckets (member doc_id, salt
    id_hash — same rule as the engine's shared bucket_members) -> pairs
    with n_windows evidence -> exact longest-common-token-run via the SAME
    unrolled rolling-hash binary search the transcript oracle uses (the
    bs-iteration tables are named conv_id_a/conv_id_b internally; the
    final select renames to doc ids)."""
    cfg = cfg or DedupConfig(shingle_k=k, substring_enabled=True)
    return _script(
        _doc_sig_stmts(k, with_minhash=False, with_simhash=False, cfg=cfg),
        _doc_substring_stmts(cfg),
        """SELECT doc_id_a, doc_id_b, n_windows, lcs_tokens FROM dsubfinal""",
    )


def _doc_substring_stmts(cfg: DedupConfig) -> str:
    """TEMP TABLE ``dsubfinal`` (doc_id_a, doc_id_b, n_windows, lcs_tokens)
    — the doc containment pairs. Requires _doc_sig_stmts tables (tshr,
    ttok, dih)."""
    cap = cfg.bucket_cap
    return "\n".join([
        osql.window_stmts("w", "tshr", cfg.shingle_k, cfg.substring_window,
                          cfg.substring_stride),
        f"""
CREATE OR REPLACE TEMP TABLE dsubpairs AS
WITH wrows_ AS (SELECT w.sid AS mem, tobig(i.idh) AS salt, w.wh
                FROM wwin w JOIN dih i ON i.sid = w.sid),
wsize_ AS (SELECT wh, count(*) AS m FROM wrows_ GROUP BY wh),
wkept_ AS (SELECT r.mem, r.wh
           FROM wrows_ r JOIN wsize_ s ON s.wh = r.wh
           WHERE s.m <= {cap}
              OR pymod(r.salt, (s.m + {cap - 1}) // {cap}) = 0),
wcap_ AS (SELECT wh, list_sort(list(mem))[1 : {cap}] AS ids
          FROM wkept_ GROUP BY wh HAVING count(*) >= 2)
SELECT pr['a'] AS conv_id_a, pr['b'] AS conv_id_b,
       count(*)::INT AS n_windows
FROM (SELECT unnest(flatten(list_transform(range(1, len(ids) + 1), i ->
          list_transform(range(i + 1, len(ids) + 1), j ->
              {{'a': ids[i], 'b': ids[j]}})))) AS pr
      FROM wcap_)
GROUP BY 1, 2 HAVING count(*) >= {cfg.substring_min_windows};""",
        osql.prefix_stmts("p", "ttok"),
        """
CREATE OR REPLACE TEMP TABLE pairpre AS
SELECT s.conv_id_a, s.conv_id_b, s.n_windows,
       pa.pref AS pa, pa.n AS na, pb.pref AS pb, pb.n AS nb
FROM dsubpairs s
JOIN ppref pa ON pa.sid = s.conv_id_a
JOIN ppref pb ON pb.sid = s.conv_id_b;
CREATE OR REPLACE TEMP TABLE bs0 AS
SELECT conv_id_a, conv_id_b, 0::BIGINT AS lo, least(na, nb)::BIGINT AS hi
FROM pairpre;""",
        *[_bs_iter_stmt(t) for t in range(1, _BS_ITERS + 1)],
        f"""
CREATE OR REPLACE TEMP TABLE dsubfinal AS
SELECT p.conv_id_a::BIGINT AS doc_id_a, p.conv_id_b::BIGINT AS doc_id_b,
       p.n_windows, coalesce(f.lo, 0)::BIGINT AS lcs_tokens
FROM pairpre p
LEFT JOIN bs{_BS_ITERS} f
  ON f.conv_id_a = p.conv_id_a AND f.conv_id_b = p.conv_id_b;""",
    ])


def doc_neardup_clusters_sql(k: int = 3, threshold: float = 0.3,
                             cfg: DedupConfig | None = None) -> str:
    """CC twin for doc_dedup.neardup_clusters: LSH near edges + exact
    md5-star edges -> recursive reachability -> min doc_id label."""
    cfg = cfg or DedupConfig(shingle_k=k, substring_enabled=False)
    return _script(
        _doc_sig_stmts(k, with_minhash=True, with_simhash=False, cfg=cfg),
        _doc_cluster_stmts(threshold, cfg),
        """SELECT doc_id, cluster_id FROM dclusters""",
    )


def doc_dup_weights_sql(k: int = 3, threshold: float = 0.3,
                        cfg: DedupConfig | None = None) -> str:
    """Twin for doc_dedup.duplicate_weights: the shared dclusters staging,
    per-cluster size count, weight = round(1/size, 6)."""
    cfg = cfg or DedupConfig(shingle_k=k, substring_enabled=False)
    return _script(
        _doc_sig_stmts(k, with_minhash=True, with_simhash=False, cfg=cfg),
        _doc_cluster_stmts(threshold, cfg),
        """
WITH s AS (SELECT cluster_id, count(*)::BIGINT AS cluster_size
           FROM dclusters GROUP BY cluster_id)
SELECT d.doc_id, d.cluster_id, s.cluster_size,
       round(1.0 / s.cluster_size, 6) AS weight
FROM dclusters d JOIN s USING (cluster_id)""",
    )


def tr_dup_weights_sql(tr_path: str, cfg: DedupConfig | None = None) -> str:
    """Twin for the transcript duplicate-weights query: the shared
    clusters staging (pipeline-equivalent CC labels), size count,
    weight = round(1/size, 6)."""
    cfg = cfg or DedupConfig()
    return _script(
        _tr_clusters_stmts(tr_path, cfg),
        """
WITH s AS (SELECT cluster_id, count(*)::BIGINT AS cluster_size
           FROM clusters GROUP BY cluster_id)
SELECT c.conv_id, c.cluster_id, s.cluster_size,
       round(1.0 / s.cluster_size, 6) AS weight
FROM clusters c JOIN s USING (cluster_id)""",
    )


def doc_keep_best_sql(k: int = 3, threshold: float = 0.3,
                      quality_sql: str = "",
                      cfg: DedupConfig | None = None) -> str:
    """Twin for doc_dedup.dedup_keep_best: near-dup clusters (shared
    dclusters staging) joined to per-doc quality, arg-max quality with min
    doc_id tie-break per cluster. ``quality_sql`` is a SELECT yielding
    (doc_id, quality) — passed in from the caller so the quality expression
    lives in exactly one place (the doc_quality oracle)."""
    cfg = cfg or DedupConfig(shingle_k=k, substring_enabled=False)
    return _script(
        _doc_sig_stmts(k, with_minhash=True, with_simhash=False, cfg=cfg),
        _doc_cluster_stmts(threshold, cfg),
        f"""
CREATE OR REPLACE TEMP TABLE kbq AS {quality_sql};
CREATE OR REPLACE TEMP TABLE kbm AS
SELECT c.cluster_id, c.doc_id, q.quality
FROM dclusters c JOIN kbq q USING (doc_id);
SELECT cluster_id, doc_id, quality, n_members FROM (
    SELECT cluster_id, doc_id, quality,
           count(*) OVER (PARTITION BY cluster_id)::BIGINT AS n_members,
           row_number() OVER (PARTITION BY cluster_id
                              ORDER BY quality DESC, doc_id ASC) AS rn
    FROM kbm) WHERE rn = 1""",
    )


def _doc_cluster_stmts(threshold: float, cfg: DedupConfig) -> str:
    """TEMP TABLE ``dclusters`` (doc_id, cluster_id). Requires
    _doc_sig_stmts(with_minhash=True) tables (dsig, dsrc)."""
    r = cfg.rows
    return "\n".join([
        f"""
CREATE OR REPLACE TEMP TABLE bands AS
SELECT sid AS mem, tobig(idh) AS salt, b.b AS band_idx,
       mh[b.b * {r} + 1 : b.b * {r} + {r}] AS key
FROM dsig CROSS JOIN (SELECT unnest(range(0, {cfg.bands}))::INT AS b) b
WHERE len(sh) > 0;""",
        _bucket_pair_stmt("bands", cfg.bucket_cap),
        f"""
CREATE OR REPLACE TEMP TABLE dedges AS
WITH ver_ AS (SELECT c.ma, c.mb, len(a.sh) AS la, len(b.sh) AS lb,
                     len(list_intersect(a.sh, b.sh)) AS inter
              FROM cand c JOIN dsig a ON a.sid = c.ma
              JOIN dsig b ON b.sid = c.mb),
near_ AS (SELECT ma, mb FROM (
              SELECT ma, mb, CASE WHEN la + lb - inter > 0
                                  THEN inter::DOUBLE / (la + lb - inter)
                                  ELSE 1.0 END AS jac
              FROM ver_)
          WHERE round(jac, 6) >= {threshold}),
star_ AS (SELECT rep AS ma, doc_id AS mb FROM (
              SELECT doc_id,
                     min(doc_id) OVER (PARTITION BY md5(text)) AS rep,
                     count(*) OVER (PARTITION BY md5(text)) AS n
              FROM dsrc)
          WHERE n > 1 AND doc_id != rep)
SELECT ma, mb FROM near_ UNION SELECT ma, mb FROM star_;
CREATE OR REPLACE TEMP TABLE dsym AS
SELECT ma AS a, mb AS b FROM dedges UNION SELECT mb AS a, ma AS b FROM dedges;""",
        """
CREATE OR REPLACE TEMP TABLE dclusters AS
WITH RECURSIVE reach(src, dst) AS (
    SELECT doc_id, doc_id FROM dsrc
    UNION
    SELECT r.src, s.b FROM reach r JOIN dsym s ON r.dst = s.a)
SELECT src::BIGINT AS doc_id, min(dst)::BIGINT AS cluster_id
FROM reach GROUP BY src;""",
    ])


def doc_tier_attribution_sql(k: int = 3, threshold: float = 0.3,
                             cfg: DedupConfig | None = None) -> str:
    """Twin for doc_dedup.doc_tier_attribution — the reference's chunk
    cascade (exact index hit -> similarity delta -> stored whole,
    rabin_dedup.c:1236-1344, 1469-1489) at document granularity:
    'exact' = not the min doc_id of its md5 group; 'near' = cluster
    non-representative; 'substring' = representative losing a verified
    containment pair (loser = fewer tokens, tie -> greater doc_id;
    removed_by = min winner); else 'kept'. Composes the cluster and
    containment stmt helpers over ONE shared signature pipeline."""
    cfg = cfg or DedupConfig(shingle_k=k, substring_enabled=True)
    return _script(
        _doc_sig_stmts(k, with_minhash=True, with_simhash=False, cfg=cfg),
        _doc_cluster_stmts(threshold, cfg),
        _doc_substring_stmts(cfg),
        f"""
CREATE OR REPLACE TEMP TABLE dexrep AS
SELECT d.doc_id, r.exact_rep, c.cluster_id
FROM dsrc d
JOIN (SELECT md5(text) AS h, min(doc_id) AS exact_rep
      FROM dsrc GROUP BY 1) r ON md5(d.text) = r.h
JOIN dclusters c ON c.doc_id = d.doc_id;
CREATE OR REPLACE TEMP TABLE dsubrm AS
WITH reps_ AS (SELECT doc_id FROM dclusters WHERE cluster_id = doc_id),
qual_ AS (
    SELECT v.doc_id_a, v.doc_id_b, pa.n AS na, pb.n AS nb
    FROM dsubfinal v
    JOIN reps_ ra ON ra.doc_id = v.doc_id_a
    JOIN reps_ rb ON rb.doc_id = v.doc_id_b
    JOIN ppref pa ON pa.sid = v.doc_id_a
    JOIN ppref pb ON pb.sid = v.doc_id_b
    WHERE v.lcs_tokens >= {cfg.substring_window}),
lw_ AS (
    SELECT CASE WHEN na < nb OR (na = nb AND doc_id_a > doc_id_b)
                THEN doc_id_a ELSE doc_id_b END AS loser,
           CASE WHEN na < nb OR (na = nb AND doc_id_a > doc_id_b)
                THEN doc_id_b ELSE doc_id_a END AS winner
    FROM qual_)
SELECT loser, min(winner) AS sub_winner FROM lw_ GROUP BY loser;""",
        """
SELECT e.doc_id,
       CASE WHEN e.doc_id != e.exact_rep THEN 'exact'
            WHEN e.doc_id != e.cluster_id THEN 'near'
            WHEN s.sub_winner IS NOT NULL THEN 'substring'
            ELSE 'kept' END AS tier,
       CASE WHEN e.doc_id != e.exact_rep THEN e.exact_rep
            WHEN e.doc_id != e.cluster_id THEN e.cluster_id
            WHEN s.sub_winner IS NOT NULL THEN s.sub_winner
            ELSE e.doc_id END AS removed_by
FROM dexrep e
LEFT JOIN dsubrm s ON s.loser = e.doc_id""",
    )


def doc_source_overlap_sql(k: int = 3, threshold: float = 0.3,
                           cfg: DedupConfig | None = None) -> str:
    """Twin for doc_dedup.source_overlap: the cluster edge set (verified
    LSH near pairs UNION exact md5-star edges — the shared ``dedges``
    staging) joined to each endpoint's source column, counted per
    unordered source pair."""
    cfg = cfg or DedupConfig(shingle_k=k, substring_enabled=False)
    return _script(
        _doc_sig_stmts(k, with_minhash=True, with_simhash=False, cfg=cfg),
        _doc_cluster_stmts(threshold, cfg),
        """SELECT least(sa.source, sb.source) AS source_a,
       greatest(sa.source, sb.source) AS source_b,
       count(*)::BIGINT AS n_pairs
FROM dedges e
JOIN documents sa ON sa.doc_id = e.ma
JOIN documents sb ON sb.doc_id = e.mb
GROUP BY 1, 2""",
    )


def ann_label_purity_sql(k: int = 5, dim: int = 64) -> str:
    """Twin for similarity.knn_label_purity: brute-force cosine top-k per
    query (same staging as ann_recall_sql's truth set), each neighborhood
    joined to the corpus label column, per-query label-match fraction."""
    brute = f"""
CREATE OR REPLACE TEMP TABLE bruteres AS
WITH q_ AS (SELECT vec_id, v, nv FROM nrm WHERE vec_id % 100 = 0),
scored_ AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   round(CASE WHEN q.nv > 0 AND c.nv > 0
                         THEN {_dot("q.v", "c.v", dim)} / (q.nv * c.nv)
                         ELSE 0.0 END, 6) AS cosine
            FROM nrm c, q_ q WHERE q.vec_id != c.vec_id)
SELECT query_id, neighbor_id
FROM (SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM scored_) WHERE rank <= {k};"""
    n_match = "sum(CASE WHEN nl.label = ql.label THEN 1 ELSE 0 END)"
    return _script(
        _emb_norm_stmt(),
        brute,
        f"""
SELECT b.query_id, ql.label AS query_label,
       count(*)::BIGINT AS n_neighbors,
       {n_match}::BIGINT AS n_match,
       round({n_match}::DOUBLE / count(*), 6) AS purity
FROM bruteres b
JOIN embeddings ql ON ql.vec_id = b.query_id
JOIN embeddings nl ON nl.vec_id = b.neighbor_id
GROUP BY 1, 2""",
    )


def ann_hard_negatives_sql(k: int = 5, dim: int = 64) -> str:
    """Twin for similarity.hard_negatives: the brute cosine scoring
    restricted to DIFFERENT-label pairs before the per-query rank window,
    labels re-attached in the final projection."""
    return _script(
        _emb_norm_stmt(),
        f"""
CREATE OR REPLACE TEMP TABLE negres AS
WITH q_ AS (SELECT n.vec_id, n.v, n.nv, e.label
            FROM nrm n JOIN embeddings e USING (vec_id)
            WHERE n.vec_id % 100 = 0),
scored_ AS (SELECT q.vec_id AS query_id, q.label AS query_label,
                   c.vec_id AS neighbor_id, ce.label AS neighbor_label,
                   round(CASE WHEN q.nv > 0 AND c.nv > 0
                         THEN {_dot("q.v", "c.v", dim)} / (q.nv * c.nv)
                         ELSE 0.0 END, 6) AS cosine
            FROM nrm c JOIN embeddings ce USING (vec_id), q_ q
            WHERE q.vec_id != c.vec_id AND ce.label != q.label)
SELECT query_id, query_label, neighbor_id, neighbor_label, cosine,
       rank::BIGINT AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC)
             AS rank
      FROM scored_) WHERE rank <= {k};""",
        """SELECT query_id, query_label, neighbor_id, neighbor_label,
cosine, rank FROM negres""",
    )


def ann_hard_negatives_lsh_sql(k: int = 5, n_planes: int = 6,
                               n_tables: int = 8, dim: int = 64,
                               seed: int = 42) -> str:
    """Twin for similarity.hard_negatives_lsh: the multi-probe candidate
    set (shared _ann_multiprobe_parts staging — exact bucket plus
    least-confident-plane flip), DIFFERENT-label filter applied to the
    candidate IDs before scoring, exact cosine rescore, rank window over
    the surviving negatives, labels in the projection."""
    stmts, _ = _ann_multiprobe_parts(k, n_planes, n_tables, dim, seed)
    final = f"""
WITH cand_ AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
               FROM qprobes q
               JOIN sigs c ON c.t = q.t AND c.bucket = q.bucket
               WHERE c.vec_id != q.vec_id),
lab_ AS (SELECT cd.query_id, cd.neighbor_id,
                eq.label AS query_label, en.label AS neighbor_label
         FROM cand_ cd
         JOIN embeddings eq ON eq.vec_id = cd.query_id
         JOIN embeddings en ON en.vec_id = cd.neighbor_id
         WHERE en.label != eq.label),
scored_ AS (SELECT l.query_id, l.query_label, l.neighbor_id,
                   l.neighbor_label,
                   round(CASE WHEN a.nv > 0 AND b.nv > 0
                         THEN {_dot("a.v", "b.v", dim)} / (a.nv * b.nv)
                         ELSE 0.0 END, 6) AS cosine
            FROM lab_ l
            JOIN nrm a ON a.vec_id = l.query_id
            JOIN nrm b ON b.vec_id = l.neighbor_id)
SELECT query_id, query_label, neighbor_id, neighbor_label, cosine,
       rank::BIGINT AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC)
             AS rank
      FROM scored_) WHERE rank <= {k}"""
    return _script(*stmts, final)


def ann_label_purity_lsh_sql(k: int = 5, n_planes: int = 6,
                             n_tables: int = 8, dim: int = 64,
                             seed: int = 42) -> str:
    """Twin for similarity.knn_label_purity_lsh: the multi-probe top-k
    neighborhood (staged exactly as ann_recall_sql stages mpres), then the
    same per-query label-match aggregation as the brute purity twin."""
    stmts, mp_final = _ann_multiprobe_parts(k, n_planes, n_tables, dim, seed)
    n_match = "sum(CASE WHEN nl.label = ql.label THEN 1 ELSE 0 END)"
    return _script(
        *stmts,
        f"CREATE OR REPLACE TEMP TABLE mpres AS {mp_final};",
        f"""
SELECT b.query_id, ql.label AS query_label,
       count(*)::BIGINT AS n_neighbors,
       {n_match}::BIGINT AS n_match,
       round({n_match}::DOUBLE / count(*), 6) AS purity
FROM mpres b
JOIN embeddings ql ON ql.vec_id = b.query_id
JOIN embeddings nl ON nl.vec_id = b.neighbor_id
GROUP BY 1, 2""",
    )


def doc_simhash_sql(max_hamming: int = 6, k: int = 3,
                    cfg: DedupConfig | None = None) -> str:
    cfg = cfg or DedupConfig(shingle_k=k, substring_enabled=False)
    n_segs = 8
    seg_pairs = [(i, j) for i in range(n_segs) for j in range(i + 1, n_segs)]
    vals = ", ".join(f"({p}, {i}, {j})" for p, (i, j) in enumerate(seg_pairs))
    return _script(
        _doc_sig_stmts(k, with_minhash=False, with_simhash=True, cfg=cfg),
        f"""
CREATE OR REPLACE TEMP TABLE bands AS
SELECT d.sid AS mem, tobig(d.idh) AS salt, sp.p AS band_idx,
       (rsh64(d.simh, sp.i * 8) % 256) * 256
       + (rsh64(d.simh, sp.j * 8) % 256) AS key
FROM dsig d CROSS JOIN (VALUES {vals}) sp(p, i, j);""",
        _bucket_pair_stmt("bands", cfg.bucket_cap),
        f"""
WITH ver_ AS (SELECT c.ma, c.mb,
                     bit_count(xor(tobig(a.simh), tobig(b.simh)))::BIGINT AS hamming
              FROM cand c JOIN dsig a ON a.sid = c.ma
              JOIN dsig b ON b.sid = c.mb)
SELECT ma::BIGINT AS doc_id_a, mb::BIGINT AS doc_id_b, hamming
FROM ver_ WHERE hamming <= {max_hamming}""",
    )


# ---------------------------------------------------------------------------
# transcript-pipeline oracles
# ---------------------------------------------------------------------------

def _tr_src(tr_path: str) -> str:
    """Path -> FROM-able source. Paths pass through read_parquet; anything
    already parenthesized (a union subquery) is used verbatim."""
    return tr_path if tr_path.lstrip().startswith("(") else f"read_parquet('{tr_path}')"


def _tr_sig_stmts(tr_path: str, cfg: DedupConfig) -> str:
    """TEMP TABLE ``tsig`` (conv_id, ih signed, chash, sh list, mh list)
    for ALL conversations (empty docs carry sh = []); plus the token /
    shingle staging tables (ttok, tshr, tshd) downstream oracles reuse.
    ``tr_path`` is a parquet path or a parenthesized SQL source providing
    (conv_id, turn_idx, text)."""
    norm = _NORM.format(x="doc_text")
    return "\n".join([
        f"""
CREATE OR REPLACE TEMP TABLE asm AS
SELECT conv_id, string_agg(text, chr(10) ORDER BY turn_idx) AS doc_text
FROM {_tr_src(tr_path)} GROUP BY conv_id;""",
        osql.token_stmts("t", "asm", "conv_id", "doc_text",
                         cfg.max_token_chars),
        osql.shingle_stmts("t", "ttok", cfg.shingle_k),
        osql.minhash_stmts("m", "tshd", cfg.num_perm, cfg.seed),
        f"""
CREATE OR REPLACE TEMP TABLE tih AS
{osql.smix_chain(['conv_id'],
                 'fnv_raw(conv_id)', 'idh',
                 'asm')};
CREATE OR REPLACE TEMP TABLE tsig AS
SELECT a.conv_id, tobig(i.idh) AS ih, sha256({norm}) AS chash,
       coalesce(s.sh, []) AS sh, m.mh
FROM asm a
JOIN tih i USING (conv_id)
LEFT JOIN (SELECT sid, list(sh ORDER BY sh) AS sh FROM tshd GROUP BY sid) s
  ON s.sid = a.conv_id
LEFT JOIN mmh m ON m.sid = a.conv_id;""",
    ])


def tr_simhash_sql(tr_path: str, max_hamming: int = 6,
                   cfg: DedupConfig | None = None) -> str:
    """Twin for operators.candidates.simhash_candidate_pairs: the SimHash
    channel on TRANSCRIPTS. Segment-pair bands keyed AND salted by the
    signed 64-bit ih (exactly like the tr MinHash path), shared capped
    bucket rule, popcount verify, conv-id pair output. Empty conversations
    carry the sentinel fingerprint in both engines."""
    cfg = cfg or DedupConfig()
    n_segs = 8
    seg_pairs = [(i, j) for i in range(n_segs) for j in range(i + 1, n_segs)]
    vals = ", ".join(f"({p}, {i}, {j})" for p, (i, j) in enumerate(seg_pairs))
    return _script(
        _tr_sig_stmts(tr_path, cfg),
        osql.simhash_stmts("x", "tshd", cfg.simhash_sample),
        f"""
CREATE OR REPLACE TEMP TABLE tsim AS
SELECT t.conv_id, t.ih, coalesce(x.simh, {osql.EMPTY_SENTINEL}{_H}) AS simh
FROM tsig t LEFT JOIN xsimh x ON x.sid = t.conv_id;
CREATE OR REPLACE TEMP TABLE bands AS
SELECT d.ih AS mem, d.ih AS salt, sp.p AS band_idx,
       (rsh64(d.simh, sp.i * 8) % 256) * 256
       + (rsh64(d.simh, sp.j * 8) % 256) AS key
FROM tsim d CROSS JOIN (VALUES {vals}) sp(p, i, j);""",
        _bucket_pair_stmt("bands", cfg.bucket_cap),
        f"""
WITH ver_ AS (SELECT a.conv_id AS ca, b.conv_id AS cb,
                     bit_count(xor(tobig(a.simh), tobig(b.simh)))::BIGINT AS hamming
              FROM cand c JOIN tsim a ON a.ih = c.ma
              JOIN tsim b ON b.ih = c.mb)
SELECT least(ca, cb) AS conv_id_a, greatest(ca, cb) AS conv_id_b, hamming
FROM ver_ WHERE hamming <= {max_hamming}""",
    )


def _tr_pairs_stmts(tr_path: str, cfg: DedupConfig) -> str:
    """Adds TEMP TABLE ``allpairs`` — the verified-pairs twin (LSH
    candidates -> est-jaccard prefilter -> exact shingle jaccard; exact
    star from content-hash groups)."""
    return "\n".join([
        _tr_sig_stmts(tr_path, cfg),
        _tr_pairs_from_tsig_stmts(cfg),
    ])


def _tr_pairs_from_tsig_stmts(cfg: DedupConfig) -> str:
    """The banding -> capped buckets -> verify statements alone, deriving
    ``allpairs`` from an EXISTING ``tsig``. Split out so a script can
    re-run the pair pass over a redefined tsig subset (the incremental
    clusters oracle's corpus-only pass) — the token/shingle staging in
    _tr_sig_stmts holds a named WINDOW, which DuckDB's parser refuses to
    define twice within one script batch, and per-conversation signatures
    are subset-stable anyway (hashing a conversation is independent of
    the rest of the table)."""
    r = cfg.rows
    return "\n".join([
        f"""
CREATE OR REPLACE TEMP TABLE bands AS
SELECT ih AS mem, ih AS salt, b.b AS band_idx,
       mh[b.b * {r} + 1 : b.b * {r} + {r}] AS key
FROM tsig CROSS JOIN (SELECT unnest(range(0, {cfg.bands}))::INT AS b) b
WHERE len(sh) > 0;""",
        _bucket_pair_stmt("bands", cfg.bucket_cap),
        f"""
CREATE OR REPLACE TEMP TABLE allpairs AS
WITH ver_ AS (SELECT a.conv_id AS ca, b.conv_id AS cb, a.chash AS cha,
                     b.chash AS chb,
                     len(list_filter(range(1, {cfg.num_perm} + 1),
                                     i -> a.mh[i] = b.mh[i])) AS nmatch,
                     len(a.sh) AS la, len(b.sh) AS lb,
                     len(list_intersect(a.sh, b.sh)) AS inter
              FROM cand c JOIN tsig a ON a.ih = c.ma
              JOIN tsig b ON b.ih = c.mb),
ver2_ AS (SELECT *, CASE WHEN la + lb - inter > 0
                         THEN inter::DOUBLE / (la + lb - inter)
                         ELSE 1.0 END AS jac
          FROM ver_),
near_ AS (SELECT least(ca, cb) AS conv_id_a, greatest(ca, cb) AS conv_id_b,
                 jac AS jaccard, 'near' AS match_kind
          FROM ver2_
          WHERE cha != chb
            AND nmatch::DOUBLE / {cfg.num_perm} >= {cfg.minhash_prefilter}
            AND jac >= {cfg.jaccard_threshold}),
exact_ AS (SELECT rep AS conv_id_a, conv_id AS conv_id_b,
                  1.0 AS jaccard, 'exact' AS match_kind
           FROM (SELECT conv_id, chash,
                        min(conv_id) OVER (PARTITION BY chash) AS rep,
                        count(*) OVER (PARTITION BY chash) AS n
                 FROM tsig)
           WHERE n > 1 AND conv_id != rep)
SELECT * FROM near_ UNION ALL SELECT * FROM exact_;""",
    ])


def tr_near_pairs_sql(tr_path: str, cfg: DedupConfig | None = None) -> str:
    cfg = cfg or DedupConfig()
    return _script(
        _tr_pairs_stmts(tr_path, cfg),
        """
SELECT conv_id_a, conv_id_b, round(jaccard, 6) AS jaccard, match_kind
FROM allpairs""",
    )


_CLUSTERS_ONLY_STMTS = """
CREATE OR REPLACE TEMP TABLE sym AS
SELECT conv_id_a AS a, conv_id_b AS b FROM allpairs
UNION
SELECT conv_id_b AS a, conv_id_a AS b FROM allpairs;
CREATE OR REPLACE TEMP TABLE clusters AS
WITH RECURSIVE reach(src, dst) AS (
    SELECT conv_id, conv_id FROM tsig
    UNION
    SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a)
SELECT src AS conv_id, min(dst) AS cluster_id FROM reach GROUP BY src;"""


def _tr_clusters_stmts(tr_path: str, cfg: DedupConfig) -> str:
    """Adds TEMP TABLE ``clusters`` (conv_id, cluster_id = min conv_id of
    the transitive closure over allpairs) via recursive reachability over
    the (tiny, materialized) symmetric edge table."""
    return "\n".join([
        _tr_pairs_stmts(tr_path, cfg),
        _CLUSTERS_ONLY_STMTS,
    ])


def tr_clusters_sql(tr_path: str, cfg: DedupConfig | None = None) -> str:
    cfg = cfg or DedupConfig()
    return _script(
        _tr_clusters_stmts(tr_path, cfg),
        "SELECT conv_id, cluster_id FROM clusters",
    )


# deterministic corpus/delta split for the tr_incremental_* queries: the
# numeric conv-id suffix ("conv-00000174" -> 174) mod 4 (engine twin in
# __spark_entry__._tr_corpus_delta)
TR_DELTA_PRED = "(CAST(substr({x}, 6) AS BIGINT) % 4 = 0)"


def tr_incremental_pairs_sql(tr_path: str, cfg: DedupConfig | None = None) -> str:
    """Twin for incremental.incremental_transcript_pairs: the FULL-run
    verified pair set (shared ``allpairs`` staging over corpus ∪ delta)
    filtered to >= 1 delta endpoint. Incremental equivalence (same proof
    as the doc twin, _doc_incr_pair_stmts): a touched bucket's membership
    — including hot-bucket salting and the sorted cap, both functions of
    the bucket's full membership — matches the full run bit-for-bit, and
    the exact star over delta-touched content groups equals the full star
    restricted to the same endpoint predicate."""
    cfg = cfg or DedupConfig()
    d = TR_DELTA_PRED
    return _script(
        _tr_pairs_stmts(tr_path, cfg),
        f"""
SELECT conv_id_a, conv_id_b, round(jaccard, 6) AS jaccard, match_kind
FROM allpairs
WHERE {d.format(x='conv_id_a')} OR {d.format(x='conv_id_b')}""",
    )


TR_BENCH_PRED = "(CAST(substr({x}, 6) AS BIGINT) % 17 = 0)"


def tr_neardup_decontam_sql(tr_path: str,
                            cfg: DedupConfig | None = None) -> str:
    """Twin for curation.neardup_decontaminate_transcripts over the %17
    conv-suffix benchmark split: the shared ``allpairs`` staging supplies
    the near channel (oriented to exactly-one-bench-endpoint hits; the
    engine's incremental pair set equals the full set restricted to a
    bench endpoint — same equivalence tr_incremental_pairs pins); the
    exact channel joins train content hashes directly against the
    benchmark's per-hash min conv (the star-rep blindspot fix documented
    in the engine); channels collapse per (train, bench) before the
    per-conversation rollup with the (jaccard DESC, bench ASC) arg-max
    partner."""
    cfg = cfg or DedupConfig()
    b = TR_BENCH_PRED
    return _script(
        _tr_pairs_stmts(tr_path, cfg),
        f"""
WITH nearh_ AS (
    SELECT conv_id_a AS conv_id, conv_id_b AS bench_id,
           round(jaccard, 6) AS jaccard
    FROM allpairs
    WHERE match_kind = 'near' AND {b.format(x='conv_id_b')}
      AND NOT {b.format(x='conv_id_a')}
    UNION ALL
    SELECT conv_id_b AS conv_id, conv_id_a AS bench_id,
           round(jaccard, 6) AS jaccard
    FROM allpairs
    WHERE match_kind = 'near' AND {b.format(x='conv_id_a')}
      AND NOT {b.format(x='conv_id_b')}),
exh_ AS (
    SELECT t.conv_id, bh.bench_id, 1.0 AS jaccard
    FROM tsig t
    JOIN (SELECT chash, min(conv_id) AS bench_id FROM tsig
          WHERE {b.format(x='conv_id')} GROUP BY chash) bh
      ON t.chash = bh.chash
    WHERE NOT {b.format(x='t.conv_id')}),
hits_ AS (
    SELECT conv_id, bench_id, max(jaccard) AS jaccard
    FROM (SELECT * FROM nearh_ UNION ALL SELECT * FROM exh_)
    GROUP BY conv_id, bench_id),
w_ AS (SELECT conv_id, bench_id AS top_bench_id FROM (
    SELECT conv_id, bench_id,
           row_number() OVER (PARTITION BY conv_id
                              ORDER BY jaccard DESC, bench_id ASC) AS rn
    FROM hits_) WHERE rn = 1)
SELECT h.conv_id, count(*)::BIGINT AS n_bench_hits,
       round(max(h.jaccard), 6) AS max_jaccard,
       min(w.top_bench_id) AS top_bench_id
FROM hits_ h JOIN w_ w USING (conv_id)
GROUP BY h.conv_id""",
    )


def tr_bench_probe_sql(tr_path: str, cfg: DedupConfig | None = None) -> str:
    """Twin for curation.bench_probe_index + probe_bench_neardup over the
    %17 conv-suffix benchmark split: bench-only bands -> the shared
    salted/capped bucket rule WITHOUT the >= 2 floor (min_size=1 — a
    singleton bench bucket is still a probe target), corpus bands joined
    in, near channel = exact shingle Jaccard at the rounded threshold (no
    est prefilter, by design), exact channel = content-hash hit against
    the bench per-hash min conv, channels collapsed per (conv, bench),
    then the standard per-conversation rollup."""
    cfg = cfg or DedupConfig()
    r, cap = cfg.rows, cfg.bucket_cap
    thr = cfg.jaccard_threshold
    b = TR_BENCH_PRED
    bands_src = (
        f"SELECT ih AS mem, b.b AS band_idx, "
        f"mh[b.b * {r} + 1 : b.b * {r} + {r}] AS key "
        f"FROM tsig CROSS JOIN "
        f"(SELECT unnest(range(0, {cfg.bands}))::INT AS b) b "
        f"WHERE len(sh) > 0"
    )
    return _script(
        _tr_sig_stmts(tr_path, cfg),
        f"""
CREATE OR REPLACE TEMP TABLE pb_buckets AS
WITH bb_ AS ({bands_src} AND {b.format(x='conv_id')}),
bsize_ AS (SELECT band_idx, key, count(*) AS m FROM bb_
           GROUP BY band_idx, key),
bkept_ AS (SELECT bd.mem, bd.band_idx, bd.key
           FROM bb_ bd
           JOIN bsize_ s ON s.band_idx = bd.band_idx AND s.key = bd.key
           WHERE s.m <= {cap}
              OR pymod(bd.mem, (s.m + {cap - 1}) // {cap}) = 0)
SELECT band_idx, key, list_sort(list(mem))[1 : {cap}] AS ids
FROM bkept_ GROUP BY band_idx, key;""",
        f"""
CREATE OR REPLACE TEMP TABLE pb_cand0 AS
SELECT cb.mem AS ih_c, unnest(k.ids) AS ih_b
FROM ({bands_src} AND NOT {b.format(x='conv_id')}) cb
JOIN pb_buckets k ON k.band_idx = cb.band_idx AND k.key = cb.key;
CREATE OR REPLACE TEMP TABLE pb_cand AS
SELECT DISTINCT ih_c, ih_b FROM pb_cand0 WHERE ih_c != ih_b;""",
        f"""
CREATE OR REPLACE TEMP TABLE pb_hits AS
WITH ver_ AS (SELECT a.conv_id, bb.conv_id AS bench_id,
                     len(a.sh) AS la, len(bb.sh) AS lb,
                     len(list_intersect(a.sh, bb.sh)) AS inter
              FROM pb_cand c
              JOIN tsig a ON a.ih = c.ih_c
              JOIN tsig bb ON bb.ih = c.ih_b),
near_ AS (SELECT conv_id, bench_id,
                 round(CASE WHEN la + lb - inter > 0
                       THEN inter::DOUBLE / (la + lb - inter)
                       ELSE 1.0 END, 6) AS jaccard
          FROM ver_),
nearf_ AS (SELECT * FROM near_ WHERE jaccard >= {thr}),
ex_ AS (SELECT t.conv_id, bh.bench_id, 1.0 AS jaccard
        FROM tsig t
        JOIN (SELECT chash, min(conv_id) AS bench_id FROM tsig
              WHERE {b.format(x='conv_id')} GROUP BY chash) bh
          ON t.chash = bh.chash
        WHERE NOT {b.format(x='t.conv_id')})
SELECT conv_id, bench_id, max(jaccard) AS jaccard
FROM (SELECT * FROM nearf_ UNION ALL SELECT * FROM ex_)
GROUP BY conv_id, bench_id;""",
        """
WITH w_ AS (SELECT conv_id, bench_id AS top_bench_id FROM (
    SELECT conv_id, bench_id,
           row_number() OVER (PARTITION BY conv_id
                              ORDER BY jaccard DESC, bench_id ASC) AS rn
    FROM pb_hits) WHERE rn = 1)
SELECT h.conv_id, count(*)::BIGINT AS n_bench_hits,
       round(max(h.jaccard), 6) AS max_jaccard,
       min(w.top_bench_id) AS top_bench_id
FROM pb_hits h JOIN w_ w USING (conv_id)
GROUP BY h.conv_id""",
    )


def tr_incremental_dedup_sql(tr_path: str,
                             cfg: DedupConfig | None = None) -> str:
    """Twin for incremental.incremental_transcript_admission: per delta
    conversation, partner = MIN conv_id over pair neighbors that are
    corpus conversations (priority at any lexicographic order) or earlier
    (smaller) delta conversations; exact outranks near; dup_of = '' when
    kept. Derived from the same ``ipairs`` evidence the engine reuses."""
    cfg = cfg or DedupConfig()
    d = TR_DELTA_PRED
    return _script(
        _tr_pairs_stmts(tr_path, cfg),
        f"""
CREATE OR REPLACE TEMP TABLE ipairs AS
SELECT * FROM allpairs
WHERE {d.format(x='conv_id_a')} OR {d.format(x='conv_id_b')};
WITH sym_ AS (
    SELECT conv_id_a AS cid, conv_id_b AS nbr, match_kind FROM ipairs
    UNION ALL
    SELECT conv_id_b AS cid, conv_id_a AS nbr, match_kind FROM ipairs),
val_ AS (SELECT cid, nbr, match_kind FROM sym_
         WHERE {d.format(x='cid')}
           AND (NOT {d.format(x='nbr')} OR nbr < cid)),
ex_ AS (SELECT cid, min(nbr) AS exact_of FROM val_
        WHERE match_kind = 'exact' GROUP BY cid),
nr_ AS (SELECT cid, min(nbr) AS near_of FROM val_
        WHERE match_kind = 'near' GROUP BY cid),
dd_ AS (SELECT conv_id FROM tsig WHERE {d.format(x='conv_id')})
SELECT dd_.conv_id,
       (CASE WHEN e.exact_of IS NOT NULL OR n.near_of IS NOT NULL
             THEN 0 ELSE 1 END)::INT AS keep,
       CASE WHEN e.exact_of IS NOT NULL THEN 'exact'
            WHEN n.near_of IS NOT NULL THEN 'near'
            ELSE 'none' END AS dup_kind,
       coalesce(e.exact_of, n.near_of, '') AS dup_of
FROM dd_
LEFT JOIN ex_ e ON e.cid = dd_.conv_id
LEFT JOIN nr_ n ON n.cid = dd_.conv_id""",
    )


def tr_incremental_clusters_sql(tr_path: str,
                                cfg: DedupConfig | None = None) -> str:
    """Twin for incremental.incremental_transcript_clusters, staged like
    doc_incremental_clusters_sql: (1) full pass -> ``ipairs`` (the
    delta-endpoint evidence); (2) corpus-only pass (the corpus's own run —
    bucket caps see corpus-only membership, exactly what the corpus
    pipeline saw) -> ``clusters``; (3) ONE global recursive reach over
    (corpus label stars ∪ ipairs) labels every conversation. Untouched
    corpus components keep their corpus label automatically (the corpus
    label IS the component min and the star preserves membership), so the
    single reach pins both the engine's anti-join passthrough and its
    touched-component relabels."""
    cfg = cfg or DedupConfig()
    d = TR_DELTA_PRED
    return _script(
        _tr_pairs_stmts(tr_path, cfg),
        f"""
CREATE OR REPLACE TEMP TABLE ipairs AS
SELECT * FROM allpairs
WHERE {d.format(x='conv_id_a')} OR {d.format(x='conv_id_b')};
CREATE OR REPLACE TEMP TABLE tsig_full AS SELECT * FROM tsig;
CREATE OR REPLACE TEMP TABLE tsig AS
SELECT * FROM tsig_full WHERE NOT {d.format(x='conv_id')};""",
        # corpus-only pair pass over the redefined tsig (signatures are
        # subset-stable; bucket caps now see corpus-only membership,
        # exactly what the corpus pipeline's own run saw) — staging order
        # matters, ipairs is materialized above from the full tables first
        _tr_pairs_from_tsig_stmts(cfg),
        _CLUSTERS_ONLY_STMTS,
        """
CREATE OR REPLACE TEMP TABLE msym AS
WITH medges AS (
    SELECT cluster_id AS a, conv_id AS b FROM clusters
    WHERE conv_id != cluster_id
    UNION
    SELECT conv_id_a AS a, conv_id_b AS b FROM ipairs)
SELECT a, b FROM medges UNION SELECT b AS a, a AS b FROM medges;
WITH RECURSIVE mreach(src, dst) AS (
    SELECT conv_id, conv_id FROM tsig_full
    UNION
    SELECT r.src, s.b FROM mreach r JOIN msym s ON r.dst = s.a)
SELECT src AS conv_id, min(dst) AS cluster_id FROM mreach GROUP BY src""",
    )


def tr_recall_sql(tr_path: str, cfg: DedupConfig | None = None,
                  truth_threshold: float = 0.7) -> str:
    """Twin for operators.verify.transcript_recall_report: exact
    shingle-Jaccard truth pairs (shingle-ROW self-join on tshd — never
    list_intersect over all pairs, per the quadratic-list rule) checked
    against the recursive-CC cluster assignments; one row
    (truth_threshold, n_truth, n_found, recall)."""
    cfg = cfg or DedupConfig()
    return _script(
        _tr_clusters_stmts(tr_path, cfg),
        f"""
CREATE OR REPLACE TEMP TABLE rlen AS
SELECT sid, count(*) AS n FROM tshd GROUP BY sid;
CREATE OR REPLACE TEMP TABLE rinter AS
SELECT a.sid AS ca, b.sid AS cb, count(*) AS inter
FROM tshd a JOIN tshd b ON a.sh = b.sh AND a.sid < b.sid
GROUP BY a.sid, b.sid;
CREATE OR REPLACE TEMP TABLE rtruth AS
SELECT r.ca, r.cb
FROM rinter r JOIN rlen la ON la.sid = r.ca JOIN rlen lb ON lb.sid = r.cb
WHERE r.inter::DOUBLE / (la.n + lb.n - r.inter) >= {truth_threshold};
CREATE OR REPLACE TEMP TABLE rfound AS
SELECT t.ca, t.cb
FROM rtruth t
JOIN clusters x ON x.conv_id = t.ca
JOIN clusters y ON y.conv_id = t.cb
WHERE x.cluster_id = y.cluster_id;
SELECT {truth_threshold}::DOUBLE AS truth_threshold,
       nt.n AS n_truth, nf.n AS n_found,
       round(CASE WHEN nt.n > 0 THEN nf.n::DOUBLE / nt.n ELSE 1.0 END, 6)
           AS recall
FROM (SELECT count(*)::BIGINT AS n FROM rtruth) nt,
     (SELECT count(*)::BIGINT AS n FROM rfound) nf""",
    )


def tr_dedup_view_sql(tr_path: str, cfg: DedupConfig | None = None) -> str:
    cfg = cfg or DedupConfig()
    return _script(
        _tr_clusters_stmts(tr_path, cfg),
        f"""
SELECT t.conv_id, t.turn_idx, t.role, t.text
FROM {_tr_src(tr_path)} t
JOIN clusters c ON c.conv_id = t.conv_id AND c.cluster_id = t.conv_id""",
    )


def tr_provenance_clusters_sql(srcs: list[tuple[str, str]],
                               cfg: DedupConfig | None = None) -> str:
    """Near-dup clusters over the multi-source union corpus, rolled up per
    cluster with provenance: how many members, how many distinct sources.
    ``srcs`` is [(tag, parquet_path)] — conv_ids are namespaced ``tag/id``
    exactly like sources.tables.load_transcripts_multi."""
    cfg = cfg or DedupConfig()
    union = "\nUNION ALL\n".join(
        f"SELECT '{tag}/' || conv_id AS conv_id, turn_idx, text "
        f"FROM read_parquet('{path}')"
        for tag, path in srcs
    )
    return _script(
        _tr_clusters_stmts(f"({union})", cfg),
        """
SELECT c.cluster_id,
       count(*)::BIGINT AS n_members,
       count(DISTINCT split_part(c.conv_id, '/', 1))::BIGINT AS n_sources
FROM clusters c GROUP BY c.cluster_id""",
    )


def tr_keep_latest_sql(tr_path: str, cfg: DedupConfig | None = None) -> str:
    """Twin for the freshest-copy-wins keep policy: per near-dup cluster
    keep the member with the latest conversation activity (max turn ts),
    min conv_id on exact-timestamp ties."""
    cfg = cfg or DedupConfig()
    return _script(
        _tr_clusters_stmts(tr_path, cfg),
        f"""
CREATE OR REPLACE TEMP TABLE kts AS
SELECT conv_id, max(ts) AS last_ts
FROM {_tr_src(tr_path)} GROUP BY conv_id;
SELECT cluster_id, conv_id, last_ts FROM (
    SELECT c.cluster_id, c.conv_id, k.last_ts,
           row_number() OVER (PARTITION BY c.cluster_id
                              ORDER BY k.last_ts DESC, c.conv_id ASC) AS rn
    FROM clusters c JOIN kts k USING (conv_id)) WHERE rn = 1""",
    )


def tr_source_overlap_sql(srcs: list[tuple[str, str]],
                          cfg: DedupConfig | None = None) -> str:
    """Twin for the cross-source overlap matrix: verified duplicate pairs
    (near + exact star) over the multi-source union corpus, rolled up per
    unordered source pair — how much each crawl duplicates each other
    crawl. Same namespaced-conv_id union source as
    tr_provenance_clusters_sql."""
    cfg = cfg or DedupConfig()
    union = "\nUNION ALL\n".join(
        f"SELECT '{tag}/' || conv_id AS conv_id, turn_idx, text "
        f"FROM read_parquet('{path}')"
        for tag, path in srcs
    )
    return _script(
        _tr_pairs_stmts(f"({union})", cfg),
        """
SELECT least(split_part(conv_id_a, '/', 1), split_part(conv_id_b, '/', 1))
           AS source_a,
       greatest(split_part(conv_id_a, '/', 1), split_part(conv_id_b, '/', 1))
           AS source_b,
       count(*)::BIGINT AS n_pairs
FROM allpairs GROUP BY 1, 2""",
    )


def _tr_substring_stmts(tr_path: str, cfg: DedupConfig) -> str:
    """Adds TEMP TABLE ``subpairs`` (conv_id_a, conv_id_b lexicographic,
    n_windows): window-fingerprint buckets (id_hash sorted-cap) minus
    verified pairs."""
    return "\n".join([
        _tr_pairs_stmts(tr_path, cfg),
        osql.window_stmts("w", "tshr", cfg.shingle_k, cfg.substring_window,
                          cfg.substring_stride),
        f"""
CREATE OR REPLACE TEMP TABLE subpairs AS
WITH wrows_ AS (SELECT t.ih AS mem, w.wh
                FROM wwin w JOIN tsig t ON t.conv_id = w.sid),
wsize_ AS (SELECT wh, count(*) AS m FROM wrows_ GROUP BY wh),
wkept_ AS (SELECT w.mem, w.wh
           FROM wrows_ w JOIN wsize_ s ON s.wh = w.wh
           WHERE s.m <= {cfg.bucket_cap}
              OR pymod(w.mem, (s.m + {cfg.bucket_cap - 1}) // {cfg.bucket_cap}) = 0),
wcap_ AS (SELECT wh, list_sort(list(mem))[1 : {cfg.bucket_cap}] AS ids
          FROM wkept_ GROUP BY wh HAVING count(*) >= 2),
wpair_ AS (SELECT pr['a'] AS ma, pr['b'] AS mb, count(*) AS n_windows FROM (
    SELECT unnest(flatten(list_transform(range(1, len(ids) + 1), i ->
        list_transform(range(i + 1, len(ids) + 1), j ->
            {{'a': ids[i], 'b': ids[j]}})))) AS pr
    FROM wcap_) GROUP BY ma, mb
    HAVING count(*) >= {cfg.substring_min_windows})
SELECT least(a.conv_id, b.conv_id) AS conv_id_a,
       greatest(a.conv_id, b.conv_id) AS conv_id_b,
       p.n_windows
FROM wpair_ p JOIN tsig a ON a.ih = p.ma JOIN tsig b ON b.ih = p.mb
WHERE NOT EXISTS (
    SELECT 1 FROM allpairs v
    WHERE v.conv_id_a = least(a.conv_id, b.conv_id)
      AND v.conv_id_b = greatest(a.conv_id, b.conv_id));""",
    ])


def tr_substring_pairs_sql(tr_path: str, cfg: DedupConfig | None = None) -> str:
    cfg = cfg or DedupConfig()
    return _script(
        _tr_substring_stmts(tr_path, cfg),
        "SELECT conv_id_a, conv_id_b, n_windows FROM subpairs",
    )


_BS_ITERS = 22  # covers least(na, nb) up to 2^22 tokens; converged rows no-op


def _bs_iter_stmt(t: int) -> str:
    """One unrolled binary-search iteration (kernels.longest_common_run
    twin). The probe — 'do the two convs share ANY common token run of
    length mid?' — is row-based: explode each side's windows of length mid
    (prefix-hash reconstruction, one row per start position) and hash-join
    on (pair, window hash). The earlier recursive-CTE form used
    list_has_any over two ~n-element lists per pair per iteration (O(n^2)
    per probe) and took >10 min at sf0.01; this is O(n) rows per probe."""
    return f"""
CREATE OR REPLACE TEMP TABLE bs{t} AS
WITH alive_ AS (
    SELECT conv_id_a, conv_id_b, lo, hi, (lo + hi + 1) // 2 AS mid
    FROM bs{t - 1} WHERE lo < hi),
aw_ AS (SELECT a.conv_id_a, a.conv_id_b,
               unnest(list_transform(range(1, p.na - a.mid + 2),
                   i -> submod(p.pa[i + a.mid], mulmod(p.pa[i], w.pp)))) AS wh
        FROM alive_ a
        JOIN pairpre p USING (conv_id_a, conv_id_b)
        JOIN ppw w ON w.i = a.mid),
bw_ AS (SELECT a.conv_id_a, a.conv_id_b,
               unnest(list_transform(range(1, p.nb - a.mid + 2),
                   i -> submod(p.pb[i + a.mid], mulmod(p.pb[i], w.pp)))) AS wh
        FROM alive_ a
        JOIN pairpre p USING (conv_id_a, conv_id_b)
        JOIN ppw w ON w.i = a.mid),
hit_ AS (SELECT DISTINCT a.conv_id_a, a.conv_id_b
         FROM aw_ a JOIN bw_ b
           ON b.conv_id_a = a.conv_id_a AND b.conv_id_b = a.conv_id_b
          AND b.wh = a.wh)
SELECT s.conv_id_a, s.conv_id_b,
       CASE WHEN h.conv_id_a IS NOT NULL THEN s.mid ELSE s.lo END AS lo,
       CASE WHEN h.conv_id_a IS NOT NULL THEN s.hi ELSE s.mid - 1 END AS hi
FROM alive_ s LEFT JOIN hit_ h USING (conv_id_a, conv_id_b)
UNION ALL
SELECT conv_id_a, conv_id_b, lo, hi FROM bs{t - 1} WHERE lo >= hi;"""


def _tr_subver_stmts(tr_path: str, cfg: DedupConfig) -> str:
    """Adds TEMP TABLE ``subver`` (conv_id_a, conv_id_b, n_windows,
    lcs_tokens): subpairs + exact longest-common-token-run via rolling-hash
    binary search (kernels.longest_common_run twin), unrolled into
    _BS_ITERS temp-table iterations halving (lo, hi] per pair."""
    return "\n".join([
        _tr_substring_stmts(tr_path, cfg),
        osql.prefix_stmts("p", "ttok"),
        """
CREATE OR REPLACE TEMP TABLE pairpre AS
SELECT s.conv_id_a, s.conv_id_b, s.n_windows,
       pa.pref AS pa, pa.n AS na, pb.pref AS pb, pb.n AS nb
FROM subpairs s
JOIN ppref pa ON pa.sid = s.conv_id_a
JOIN ppref pb ON pb.sid = s.conv_id_b;
CREATE OR REPLACE TEMP TABLE bs0 AS
SELECT conv_id_a, conv_id_b, 0::BIGINT AS lo, least(na, nb)::BIGINT AS hi
FROM pairpre;""",
        *[_bs_iter_stmt(t) for t in range(1, _BS_ITERS + 1)],
        f"""
CREATE OR REPLACE TEMP TABLE subver AS
SELECT p.conv_id_a, p.conv_id_b, p.n_windows,
       coalesce(f.lo, 0)::BIGINT AS lcs_tokens
FROM pairpre p
LEFT JOIN bs{_BS_ITERS} f
  ON f.conv_id_a = p.conv_id_a AND f.conv_id_b = p.conv_id_b;""",
    ])


def tr_substring_verified_sql(tr_path: str, cfg: DedupConfig | None = None) -> str:
    """subpairs + exact longest-common-token-run (see _tr_subver_stmts)."""
    cfg = cfg or DedupConfig()
    return _script(
        _tr_subver_stmts(tr_path, cfg),
        "SELECT conv_id_a, conv_id_b, n_windows, lcs_tokens FROM subver",
    )


def tr_tier_attribution_sql(tr_path: str, cfg: DedupConfig | None = None) -> str:
    """operators/tiers.tier_attribution twin: per conversation, which tier
    removed it (exact > near > substring > kept) and who removed it.

    Tier rules mirror the engine exactly: 'exact' = conv_id != min over its
    content-hash group; 'near' = cluster non-representative (exact takes
    priority); 'substring' = a representative that loses a verified pair
    with lcs_tokens >= substring_window against another representative
    (loser = fewer tokens, tie -> lexicographically greater conv_id;
    removed_by = min winner); else 'kept'."""
    cfg = cfg or DedupConfig()
    return _script(
        _tr_subver_stmts(tr_path, cfg),
        _CLUSTERS_ONLY_STMTS,
        f"""
CREATE OR REPLACE TEMP TABLE exrep AS
SELECT t.conv_id, r.exact_rep, c.cluster_id
FROM tsig t
JOIN (SELECT chash, min(conv_id) AS exact_rep FROM tsig GROUP BY chash) r
  ON r.chash = t.chash
JOIN clusters c ON c.conv_id = t.conv_id;
CREATE OR REPLACE TEMP TABLE subrm AS
WITH reps_ AS (SELECT conv_id FROM clusters WHERE cluster_id = conv_id),
qual_ AS (
    SELECT v.conv_id_a, v.conv_id_b, pa.n AS na, pb.n AS nb
    FROM subver v
    JOIN reps_ ra ON ra.conv_id = v.conv_id_a
    JOIN reps_ rb ON rb.conv_id = v.conv_id_b
    JOIN ppref pa ON pa.sid = v.conv_id_a
    JOIN ppref pb ON pb.sid = v.conv_id_b
    WHERE v.lcs_tokens >= {cfg.substring_window}),
lw_ AS (
    SELECT CASE WHEN na < nb OR (na = nb AND conv_id_a > conv_id_b)
                THEN conv_id_a ELSE conv_id_b END AS loser,
           CASE WHEN na < nb OR (na = nb AND conv_id_a > conv_id_b)
                THEN conv_id_b ELSE conv_id_a END AS winner
    FROM qual_)
SELECT loser, min(winner) AS sub_winner FROM lw_ GROUP BY loser;""",
        """
SELECT e.conv_id,
       CASE WHEN e.conv_id != e.exact_rep THEN 'exact'
            WHEN e.conv_id != e.cluster_id THEN 'near'
            WHEN s.sub_winner IS NOT NULL THEN 'substring'
            ELSE 'kept' END AS tier,
       CASE WHEN e.conv_id != e.exact_rep THEN e.exact_rep
            WHEN e.conv_id != e.cluster_id THEN e.cluster_id
            WHEN s.sub_winner IS NOT NULL THEN s.sub_winner
            ELSE e.conv_id END AS removed_by
FROM exrep e
LEFT JOIN subrm s ON s.loser = e.conv_id""",
    )


# ---------------------------------------------------------------------------
# ANN oracles
# ---------------------------------------------------------------------------

_FOLD_SUM = "list_reduce(list_prepend(0.0, {xs}), (a, x) -> a + x)"


def _emb_norm_stmt(name: str = "nrm") -> str:
    sq = _FOLD_SUM.format(xs="list_transform(v, x -> x * x)")
    return f"""
CREATE OR REPLACE TEMP TABLE {name} AS
SELECT vec_id, v, sqrt({sq}) AS nv FROM (
    SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
    FROM embeddings);
"""


def _dot(a: str, b: str, dim: int) -> str:
    return _FOLD_SUM.format(
        xs=f"list_transform(range(1, {dim} + 1), i -> {a}[i] * {b}[i])")


def _emb_lsh_sig_stmts(n_planes: int = 6, n_tables: int = 8, dim: int = 64,
                       seed: int = 42) -> list[str]:
    """TEMP TABLEs ``planes``, ``nrm``, ``sigs`` — the hyperplane-sign
    bucket signatures shared by the ANN top-k twin and the embedding
    near-dup pairs twin (similarity._hyperplanes / _prep parity)."""
    c = (seed * 0x9E37) % osql.M64
    total = n_tables * n_planes * dim
    dot = _dot("n.v", "pl.coefs", dim)
    return [
        f"""
CREATE OR REPLACE TEMP TABLE planes AS
WITH pe_ AS ({osql.smix_chain(['idx'], f'(idx + {c}{_H}) % {osql.M64}{_H}', 'u',
                              f'(SELECT unnest(range(0, {total})) AS idx)')})
SELECT (idx // {n_planes * dim})::INT AS t,
       ((idx % {n_planes * dim}) // {dim})::INT AS p,
       list(u::DOUBLE / 9223372036854775808.0 - 1.0
            ORDER BY idx % {dim}) AS coefs
FROM pe_ GROUP BY 1, 2;""",
        _emb_norm_stmt(),
        f"""
CREATE OR REPLACE TEMP TABLE sigs AS
SELECT n.vec_id, pl.t,
       sum(CASE WHEN {dot} >= 0 THEN (1 << pl.p) ELSE 0 END)::BIGINT AS bucket
FROM nrm n CROSS JOIN planes pl
GROUP BY n.vec_id, pl.t;""",
    ]


def _emb_pair_stmts(threshold: float = 0.4, n_planes: int = 6,
                    n_tables: int = 8, dim: int = 64, seed: int = 42,
                    cfg: DedupConfig | None = None) -> list[str]:
    """Statements building TEMP TABLE ``epairs`` (vec_id_a, vec_id_b,
    cosine): hyperplane-sign buckets -> the shared salted/capped pair rule
    (_bucket_pair_stmt, same pymod sampling the engine's bucket_members
    applies with vec_id as the salt) -> exact cosine on the surviving
    pairs, filtered on the rounded value. Shared by the pairs, clusters,
    and recall twins."""
    cfg = cfg or DedupConfig()
    return [
        *_emb_lsh_sig_stmts(n_planes, n_tables, dim, seed),
        """
CREATE OR REPLACE TEMP TABLE ebands AS
SELECT vec_id AS mem, vec_id AS salt, t AS band_idx, bucket AS key
FROM sigs;""",
        _bucket_pair_stmt("ebands", cfg.bucket_cap, out="ecand"),
        f"""
CREATE OR REPLACE TEMP TABLE epairs AS
SELECT vec_id_a, vec_id_b, cosine FROM (
    SELECT c.ma AS vec_id_a, c.mb AS vec_id_b,
           round(CASE WHEN a.nv > 0 AND b.nv > 0
                 THEN {_dot("a.v", "b.v", dim)} / (a.nv * b.nv)
                 ELSE 0.0 END, 6) AS cosine
    FROM ecand c
    JOIN nrm a ON a.vec_id = c.ma
    JOIN nrm b ON b.vec_id = c.mb)
WHERE cosine >= {threshold};""",
    ]


def embedding_lsh_pairs_sql(threshold: float = 0.4, n_planes: int = 6,
                            n_tables: int = 8, dim: int = 64, seed: int = 42,
                            cfg: DedupConfig | None = None) -> str:
    """Twin for similarity.embedding_lsh_pairs."""
    return _script(
        *_emb_pair_stmts(threshold, n_planes, n_tables, dim, seed, cfg),
        "SELECT vec_id_a, vec_id_b, cosine FROM epairs",
    )


def embedding_clusters_sql(threshold: float = 0.4, n_planes: int = 6,
                           n_tables: int = 8, dim: int = 64, seed: int = 42,
                           cfg: DedupConfig | None = None) -> str:
    """Twin for similarity.embedding_clusters: epairs edges -> symmetric
    closure -> recursive reachability -> min vec_id label (singletons map
    to self). Same construction as the doc-table CC twin."""
    return _script(
        *_emb_pair_stmts(threshold, n_planes, n_tables, dim, seed, cfg),
        """
CREATE OR REPLACE TEMP TABLE esym AS
SELECT vec_id_a AS a, vec_id_b AS b FROM epairs
UNION SELECT vec_id_b AS a, vec_id_a AS b FROM epairs;""",
        """
WITH RECURSIVE reach(src, dst) AS (
    SELECT vec_id, vec_id FROM embeddings
    UNION
    SELECT r.src, s.b FROM reach r JOIN esym s ON r.dst = s.a)
SELECT src::BIGINT AS vec_id, min(dst)::BIGINT AS cluster_id
FROM reach GROUP BY src""",
    )


def embedding_pair_recall_sql(threshold: float = 0.4, n_planes: int = 6,
                              n_tables: int = 8, dim: int = 64,
                              seed: int = 42,
                              cfg: DedupConfig | None = None) -> str:
    """Twin for similarity.embedding_pair_recall_report: brute all-pairs
    truth at the same rounded-cosine threshold vs the epairs found set —
    one row (threshold, n_truth, n_found, recall)."""
    return _script(
        *_emb_pair_stmts(threshold, n_planes, n_tables, dim, seed, cfg),
        f"""
CREATE OR REPLACE TEMP TABLE etruth AS
SELECT vec_id_a, vec_id_b FROM (
    SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
           round(CASE WHEN a.nv > 0 AND b.nv > 0
                 THEN {_dot("a.v", "b.v", dim)} / (a.nv * b.nv)
                 ELSE 0.0 END, 6) AS cosine
    FROM nrm a JOIN nrm b ON a.vec_id < b.vec_id)
WHERE cosine >= {threshold};""",
        f"""
WITH nt AS (SELECT count(*)::BIGINT AS n_truth FROM etruth),
nf AS (SELECT count(*)::BIGINT AS n_found
       FROM epairs p JOIN etruth t USING (vec_id_a, vec_id_b))
SELECT {threshold}::DOUBLE AS threshold, nt.n_truth, nf.n_found,
       round(nf.n_found::DOUBLE / greatest(nt.n_truth, 1), 6) AS recall
FROM nt, nf""",
    )


def _ann_lsh_parts(k: int = 5, n_planes: int = 6, n_tables: int = 8,
                   dim: int = 64, seed: int = 42) -> tuple[list[str], str]:
    """(setup statements, final SELECT) for the hyperplane-LSH top-k twin —
    split so ann_recall_sql can stage the SELECT into a TEMP TABLE."""
    stmts = _emb_lsh_sig_stmts(n_planes, n_tables, dim, seed)
    final = f"""
WITH qids_ AS (SELECT vec_id FROM embeddings WHERE vec_id % 100 = 0),
cand_ AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
          FROM sigs q JOIN qids_ USING (vec_id)
          JOIN sigs c ON c.t = q.t AND c.bucket = q.bucket
          WHERE c.vec_id != q.vec_id),
scored_ AS (SELECT cd.query_id, cd.neighbor_id,
                   round(CASE WHEN a.nv > 0 AND b.nv > 0
                         THEN {_dot("a.v", "b.v", dim)} / (a.nv * b.nv)
                         ELSE 0.0 END, 6) AS cosine
            FROM cand_ cd
            JOIN nrm a ON a.vec_id = cd.query_id
            JOIN nrm b ON b.vec_id = cd.neighbor_id)
SELECT query_id, neighbor_id, cosine,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, neighbor_id ASC)::BIGINT AS rank
FROM scored_ QUALIFY rank <= {k}"""
    return stmts, final


def ann_lsh_sql(k: int = 5, n_planes: int = 6, n_tables: int = 8,
                dim: int = 64, seed: int = 42) -> str:
    stmts, final = _ann_lsh_parts(k, n_planes, n_tables, dim, seed)
    return _script(*stmts, final)


def _ann_multiprobe_parts(k: int = 5, n_planes: int = 6, n_tables: int = 8,
                          dim: int = 64, seed: int = 42) -> tuple[list, str]:
    """(setup statements, final SELECT) for the multi-probe LSH twin
    (similarity.hyperplane_multiprobe_topk): the single-probe candidate
    set UNION the probe across each table's least-confident plane — flip
    p = the (abs(dot) ASC, p ASC) rank-1 plane, alt bucket = bucket XOR
    (1 << p). Same exact-cosine scoring and rank window as the
    single-probe twin. Split so ann_recall_sql can stage the SELECT."""
    dot = _dot("n.v", "pl.coefs", dim)
    stmts = [
        *_emb_lsh_sig_stmts(n_planes, n_tables, dim, seed),
        f"""
CREATE OR REPLACE TEMP TABLE qdots AS
SELECT n.vec_id, pl.t, pl.p, {dot} AS dot
FROM nrm n CROSS JOIN planes pl
WHERE n.vec_id % 100 = 0;""",
        """
CREATE OR REPLACE TEMP TABLE qprobes AS
SELECT s.vec_id, s.t, s.bucket
FROM sigs s WHERE s.vec_id % 100 = 0
UNION
SELECT f.vec_id, f.t, xor(s.bucket, (1 << f.p))::BIGINT AS bucket
FROM (SELECT vec_id, t, p FROM (
          SELECT vec_id, t, p,
                 row_number() OVER (PARTITION BY vec_id, t
                                    ORDER BY abs(dot) ASC, p ASC) AS rn
          FROM qdots) WHERE rn = 1) f
JOIN sigs s ON s.vec_id = f.vec_id AND s.t = f.t;""",
    ]
    final = f"""
WITH cand_ AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
               FROM qprobes q
               JOIN sigs c ON c.t = q.t AND c.bucket = q.bucket
               WHERE c.vec_id != q.vec_id),
scored_ AS (SELECT cd.query_id, cd.neighbor_id,
                   round(CASE WHEN a.nv > 0 AND b.nv > 0
                         THEN {_dot("a.v", "b.v", dim)} / (a.nv * b.nv)
                         ELSE 0.0 END, 6) AS cosine
            FROM cand_ cd
            JOIN nrm a ON a.vec_id = cd.query_id
            JOIN nrm b ON b.vec_id = cd.neighbor_id)
SELECT query_id, neighbor_id, cosine,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, neighbor_id ASC)::BIGINT AS rank
FROM scored_ QUALIFY rank <= {k}"""
    return stmts, final


def ann_multiprobe_sql(k: int = 5, n_planes: int = 6, n_tables: int = 8,
                       dim: int = 64, seed: int = 42) -> str:
    stmts, final = _ann_multiprobe_parts(k, n_planes, n_tables, dim, seed)
    return _script(*stmts, final)


def _ann_ivf_parts(k: int = 5, n_cells: int = 16, n_probe: int = 4,
                   dim: int = 64) -> tuple[list[str], str]:
    """(setup statements, final SELECT) for the IVF top-k twin."""
    stmts = [
        _emb_norm_stmt(),
        f"""
CREATE OR REPLACE TEMP TABLE anchors AS
WITH {osql.xxh64_long_ctes('r', 'nrm', ['vec_id'], 'vec_id', 'rk')}
SELECT (row_number() OVER (ORDER BY tobig(x.rk)) - 1)::INT AS cell,
       n.v AS av, n.nv AS an
FROM rx5 x JOIN nrm n USING (vec_id)
ORDER BY tobig(x.rk) LIMIT {n_cells};""",
        f"""
CREATE OR REPLACE TEMP TABLE ranked AS
WITH cellscore_ AS (
    SELECT n.vec_id, a.cell,
           CASE WHEN a.an > 0 AND n.nv > 0
                THEN {_dot("n.v", "a.av", dim)} / (a.an * n.nv)
                ELSE -2.0 END AS score
    FROM nrm n CROSS JOIN anchors a)
SELECT vec_id, cell,
       row_number() OVER (PARTITION BY vec_id
                          ORDER BY score DESC, cell DESC) AS rc
FROM cellscore_;""",
    ]
    final = f"""
WITH corpus_ AS (SELECT vec_id AS neighbor_id, cell FROM ranked WHERE rc = 1),
probes_ AS (SELECT r.vec_id AS query_id, r.cell
            FROM ranked r
            JOIN (SELECT vec_id FROM embeddings WHERE vec_id % 100 = 0) q
              USING (vec_id)
            WHERE r.rc <= {n_probe}),
cand_ AS (SELECT DISTINCT p.query_id, c.neighbor_id
          FROM probes_ p JOIN corpus_ c USING (cell)
          WHERE p.query_id != c.neighbor_id),
scored_ AS (SELECT cd.query_id, cd.neighbor_id,
                   round(CASE WHEN a.nv > 0 AND b.nv > 0
                         THEN {_dot("a.v", "b.v", dim)} / (a.nv * b.nv)
                         ELSE 0.0 END, 6) AS cosine
            FROM cand_ cd
            JOIN nrm a ON a.vec_id = cd.query_id
            JOIN nrm b ON b.vec_id = cd.neighbor_id)
SELECT query_id, neighbor_id, cosine,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, neighbor_id ASC)::BIGINT AS rank
FROM scored_ QUALIFY rank <= {k}"""
    return stmts, final


def ann_ivf_sql(k: int = 5, n_cells: int = 16, n_probe: int = 4,
                dim: int = 64) -> str:
    stmts, final = _ann_ivf_parts(k, n_cells, n_probe, dim)
    return _script(*stmts, final)


def _kmeans_parts(n_clusters: int = 8, n_iters: int = 3,
                  dim: int = 64) -> tuple[list, str]:
    """(setup statements, final SELECT) for the spherical-k-means twin —
    split so emb_semdedup_sql can stage the final assignment into a TEMP
    TABLE and keep composing. Twin for similarity._kmeans_fit: Lloyd's
    with the IVF anchor init, mirrored iteration-for-iteration as staged
    TEMP TABLEs (cent{i} / asg{i}). Parity hinges on three shared rules
    the other ANN twins already pin: the left-to-right _dot fold over
    bit-identical 6dp centroid doubles, the ties->larger-cell argmax
    (ORDER BY score DESC, cell DESC), and the exact-decimal mean
    (sum(round(x,6)::DECIMAL(18,6)) divided once as DOUBLE, rounded 6dp).
    Empty clusters carry the previous centroid via the LEFT JOIN
    coalesce."""
    cn_fold = _FOLD_SUM.format(xs="list_transform(cv, x -> x * x)")
    pos_src = f"(SELECT unnest(range(1, {dim} + 1))::INT AS pos) p"

    def cnorm(i: int) -> str:
        return f"""
CREATE OR REPLACE TEMP TABLE cnorm{i} AS
SELECT cell, cv, sqrt({cn_fold}) AS cn FROM cent{i};"""

    def best(i: int, select: str, where_rc: str) -> str:
        dot = _dot("n.v", "c.cv", dim)
        return f"""
WITH s_ AS (SELECT n.vec_id, c.cell,
                   CASE WHEN c.cn > 0 AND n.nv > 0
                        THEN {dot} / (c.cn * n.nv) ELSE -2.0 END AS score
            FROM nrm n CROSS JOIN cnorm{i} c)
SELECT {select}
FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY score DESC, cell DESC) AS rc
      FROM s_) {where_rc}"""

    stmts = [
        _emb_norm_stmt(),
        f"""
CREATE OR REPLACE TEMP TABLE cent0 AS
WITH {osql.xxh64_long_ctes('r', 'nrm', ['vec_id'], 'vec_id', 'rk')}
SELECT (row_number() OVER (ORDER BY tobig(x.rk)) - 1)::BIGINT AS cell,
       list_transform(n.v, x -> round(x, 6)) AS cv
FROM rx5 x JOIN nrm n USING (vec_id)
ORDER BY tobig(x.rk) LIMIT {n_clusters};""",
    ]
    for i in range(1, n_iters + 1):
        stmts.append(cnorm(i - 1))
        stmts.append(
            f"CREATE OR REPLACE TEMP TABLE asg{i} AS "
            + best(i - 1, "vec_id, cell", "WHERE rc = 1") + ";"
        )
        stmts.append(f"""
CREATE OR REPLACE TEMP TABLE cm{i} AS
SELECT a.cell, p.pos,
       round(sum(round(n.v[p.pos], 6)::DECIMAL(18,6))::DOUBLE
             / count(*), 6) AS cval
FROM asg{i} a JOIN nrm n USING (vec_id)
CROSS JOIN {pos_src}
GROUP BY a.cell, p.pos;
CREATE OR REPLACE TEMP TABLE cent{i} AS
SELECT c.cell, coalesce(m.cv, c.cv) AS cv
FROM cent{i - 1} c
LEFT JOIN (SELECT cell, list(cval ORDER BY pos) AS cv
           FROM cm{i} GROUP BY cell) m USING (cell);""")
    stmts.append(cnorm(n_iters))
    final = best(
        n_iters,
        "vec_id, cell AS cluster, round(score, 6) AS score",
        "WHERE rc = 1",
    )
    return stmts, final


def emb_kmeans_sql(n_clusters: int = 8, n_iters: int = 3,
                   dim: int = 64) -> str:
    """Twin for similarity.kmeans_clusters (see _kmeans_parts)."""
    stmts, final = _kmeans_parts(n_clusters, n_iters, dim)
    return _script(*stmts, final)


def _semdedup_stmts(threshold: float = 0.4, n_clusters: int = 8,
                    n_iters: int = 3, dim: int = 64,
                    cfg: DedupConfig | None = None) -> list:
    """Statements for the similarity.semdedup twin, ending in TEMP TABLE
    ``sem`` (vec_id, cluster, score, group_id, keep): the staged k-means
    assignment -> intra-cell pairs under the shared salted/capped bucket
    rule (cell id as the bucket key, vec_id as the salt) -> exact-cosine
    edges at the rounded threshold -> recursive-reach groups (min vec_id
    label, singletons self) -> keep = the group's (score ASC, vec_id ASC)
    arg-min (SemDeDup's keep-low-centroid-similarity representative).
    Split out so the curation cascade twin can chain the same stage."""
    cfg = cfg or DedupConfig()
    kstmts, kfinal = _kmeans_parts(n_clusters, n_iters, dim)
    return [
        *kstmts,
        f"CREATE OR REPLACE TEMP TABLE kasg AS {kfinal};",
        """
CREATE OR REPLACE TEMP TABLE kbands AS
SELECT vec_id AS mem, vec_id AS salt, 0 AS band_idx, cluster AS key
FROM kasg;""",
        _bucket_pair_stmt("kbands", cfg.bucket_cap, out="kcand"),
        f"""
CREATE OR REPLACE TEMP TABLE kpairs AS
SELECT vec_id_a, vec_id_b FROM (
    SELECT c.ma AS vec_id_a, c.mb AS vec_id_b,
           round(CASE WHEN a.nv > 0 AND b.nv > 0
                 THEN {_dot("a.v", "b.v", dim)} / (a.nv * b.nv)
                 ELSE 0.0 END, 6) AS cosine
    FROM kcand c
    JOIN nrm a ON a.vec_id = c.ma
    JOIN nrm b ON b.vec_id = c.mb)
WHERE cosine >= {threshold};""",
        """
CREATE OR REPLACE TEMP TABLE ksym AS
SELECT vec_id_a AS a, vec_id_b AS b FROM kpairs
UNION SELECT vec_id_b AS a, vec_id_a AS b FROM kpairs;""",
        """
CREATE OR REPLACE TEMP TABLE kcc AS
WITH RECURSIVE reach(src, dst) AS (
    SELECT vec_id, vec_id FROM embeddings
    UNION
    SELECT r.src, s.b FROM reach r JOIN ksym s ON r.dst = s.a)
SELECT src::BIGINT AS vec_id, min(dst)::BIGINT AS group_id
FROM reach GROUP BY src;""",
        """
CREATE OR REPLACE TEMP TABLE sem AS
WITH w_ AS (SELECT group_id, vec_id AS wvec FROM (
    SELECT c.group_id, k.vec_id,
           row_number() OVER (PARTITION BY c.group_id
                              ORDER BY k.score ASC, k.vec_id ASC) AS rn
    FROM kcc c JOIN kasg k USING (vec_id)) WHERE rn = 1)
SELECT k.vec_id, k.cluster, k.score, c.group_id,
       (k.vec_id = w.wvec) AS keep
FROM kasg k JOIN kcc c USING (vec_id) JOIN w_ w USING (group_id);""",
    ]


def emb_semdedup_sql(threshold: float = 0.4, n_clusters: int = 8,
                     n_iters: int = 3, dim: int = 64,
                     cfg: DedupConfig | None = None) -> str:
    """Twin for similarity.semdedup (see _semdedup_stmts)."""
    return _script(
        *_semdedup_stmts(threshold, n_clusters, n_iters, dim, cfg),
        "SELECT vec_id, cluster, score, group_id, keep FROM sem",
    )


def ann_recall_sql(k: int = 5, dim: int = 64) -> str:
    """Twin for similarity.ann_recall_report: recall@k of each approximate
    method (hyperplane LSH, multi-probe LSH, IVF) against the brute-force
    cosine top-k truth over the same % 100 = 0 query sample — three rows
    (method, k, n_truth, n_found, recall). Every heavy level is staged in a
    TEMP TABLE (plain CTEs re-expand in DuckDB)."""
    lsh_stmts, lsh_final = _ann_lsh_parts(k=k, dim=dim)
    mp_stmts, mp_final = _ann_multiprobe_parts(k=k, dim=dim)
    ivf_stmts, ivf_final = _ann_ivf_parts(k=k, dim=dim)
    brute = f"""
CREATE OR REPLACE TEMP TABLE bruteres AS
WITH q_ AS (SELECT vec_id, v, nv FROM nrm WHERE vec_id % 100 = 0),
scored_ AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   round(CASE WHEN q.nv > 0 AND c.nv > 0
                         THEN {_dot("q.v", "c.v", dim)} / (q.nv * c.nv)
                         ELSE 0.0 END, 6) AS cosine
            FROM nrm c, q_ q WHERE q.vec_id != c.vec_id)
SELECT query_id, neighbor_id
FROM (SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM scored_) WHERE rank <= {k};"""
    rec = ("round(n_found::DOUBLE / greatest(n_truth, 1), 6)")
    return _script(
        *lsh_stmts,
        f"CREATE OR REPLACE TEMP TABLE lshres AS {lsh_final};",
        *mp_stmts,
        f"CREATE OR REPLACE TEMP TABLE mpres AS {mp_final};",
        *ivf_stmts,
        f"CREATE OR REPLACE TEMP TABLE ivfres AS {ivf_final};",
        brute,
        f"""
WITH nt AS (SELECT count(*)::BIGINT AS n_truth FROM bruteres),
l AS (SELECT count(*)::BIGINT AS n_found
      FROM bruteres t JOIN lshres f USING (query_id, neighbor_id)),
m AS (SELECT count(*)::BIGINT AS n_found
      FROM bruteres t JOIN mpres f USING (query_id, neighbor_id)),
v AS (SELECT count(*)::BIGINT AS n_found
      FROM bruteres t JOIN ivfres f USING (query_id, neighbor_id))
SELECT 'lsh' AS method, {k}::BIGINT AS k, nt.n_truth, l.n_found,
       {rec} AS recall FROM nt, l
UNION ALL
SELECT 'multiprobe' AS method, {k}::BIGINT AS k, nt.n_truth, m.n_found,
       {rec} AS recall FROM nt, m
UNION ALL
SELECT 'ivf' AS method, {k}::BIGINT AS k, nt.n_truth, v.n_found,
       {rec} AS recall FROM nt, v""",
    )


# ---------------------------------------------------------------------------
# multimodal oracle (reads the same deterministic media parquet)
# ---------------------------------------------------------------------------

def multimodal_sql(media_path: str, feature_dim: int = 32) -> str:
    fnv_bytes = (f"list_reduce(list_prepend({osql.FNV_OFFSET}{_H}, "
                 f"list_transform(bs, c -> (c + 1){_H})), "
                 f"(h, c) -> (xor64(h, c) * {osql.FNV_PRIME}{_H}) % {osql.M64}{_H})")
    return _script(
        f"""
CREATE OR REPLACE TEMP TABLE byts AS
SELECT media_id, kind, width, height, nb,
       list_transform(range(1, nb + 1), i ->
           (strpos('0123456789ABCDEF', substr(hx, 2 * i - 1, 1)) - 1) * 16
           + strpos('0123456789ABCDEF', substr(hx, 2 * i, 1)) - 1) AS bs
FROM (SELECT media_id, kind, width, height,
             hex(payload) AS hx, octet_length(payload) AS nb
      FROM read_parquet('{media_path}'));""",
        f"""
CREATE OR REPLACE TEMP TABLE mchash AS
{osql.smix_chain(['media_id', 'kind', 'width', 'height', 'nb', 'bs'],
                 'fr', 'chash',
                 f'(SELECT *, {fnv_bytes} AS fr FROM byts)')};""",
        f"""
CREATE OR REPLACE TEMP TABLE pngh AS
-- png rows now FULLY decode (deflate + unfilter). The fixture's raster
-- follows the documented generation rule raster[j] = splitmix64(
-- media_id * 2^24 + j) & 255, so the expected bin-0 histogram ratio is
-- recomputable here from (media_id, width, height) WITHOUT decoding —
-- the engine must invert real zlib + scanline filtering to match it
SELECT media_id,
       len(list_filter(range(0, width::BIGINT * height),
                       j -> smix(media_id{_H} * 16777216 + j) % 256 < 8)
           )::DOUBLE / (width * height) AS png_hist0
FROM read_parquet('{media_path}') WHERE kind = 'png';""",
        f"""
CREATE OR REPLACE TEMP TABLE jfh AS
-- jpeg_full rows FULLY decode (jpeg_baseline: Huffman entropy decode +
-- dequant + IDCT). The fixture raster is 8x8-BLOCK-CONSTANT with block
-- level v[j] = splitmix64(media_id * 2^24 + j) & 255, so the decode
-- roundtrip has the closed form (q00 read from the DQT's first byte,
-- payload offset 25; snap guard 2^-20 shared with the engine):
--   sq = floor(8*(v-128)/q00 + 0.5 + eps)
--   px = clamp(floor(sq*q00/8 + 128.5 + eps), 0, 255)
-- and the expected bin-0 histogram ratio is the fraction of BLOCKS whose
-- px lands in bin 0 — recomputable here without decoding, while the
-- engine must run the real entropy decode + IDCT to reproduce it
SELECT media_id,
       -- bin-0 test is px < 8 (px is DOUBLE from floor(); DuckDB's //
       -- on non-integers is plain division, so a bs-style `// 8 = 0`
       -- membership test would silently never match)
       len(list_filter(range(0, (width // 8)::BIGINT * (height // 8)),
           j -> least(255, greatest(0, floor(
                    floor(8.0 * ((smix(media_id{_H} * 16777216 + j) % 256)
                                 - 128) / q00 + 0.5 + 1.0/1048576)
                    * q00 / 8.0 + 128.5 + 1.0/1048576))) < 8)
           )::DOUBLE / ((width // 8) * (height // 8)) AS jf_hist0
FROM (SELECT media_id, width, height,
             -- q00 = payload byte at 0-based offset 25 (hex chars 51-52)
             (strpos('0123456789ABCDEF', substr(hex(payload), 51, 1)) - 1)
                 * 16
               + strpos('0123456789ABCDEF', substr(hex(payload), 52, 1))
               - 1 AS q00
      FROM read_parquet('{media_path}') WHERE kind = 'jpeg_full');""",
        f"""
WITH feat_ AS (
    SELECT media_id, kind, chash,
           kind IN ('image', 'audio', 'png', 'jpeg_full') AS decoded,
           -- header tier: PNM/WAV/PNG fully decode; JPEG parses SOI/SOF
           -- only. jpeg/png dims read from the
           -- actual payload bytes at the containers' canonical offsets
           -- (JPEG: SOI 2B + APP0 18B + DQT 69B + SOF0, height BE at
           -- bytes 94-95, width 96-97; PNG: 8B signature + 4B len +
           -- 'IHDR', width BE u32 at bytes 17-20, height 21-24) —
           -- independent checks of the engine's parsers; PNM dims come
           -- from the parquet metadata columns the generator derived the
           -- header text from
           kind IN ('image', 'audio', 'jpeg', 'png', 'video',
                    'jpeg_full') AS header_decoded,
           -- video: fixed-layout MP4 fixture (make_mp4) — tkhd 16.16 width
           -- int part at bytes 228-229, height at 232-233 (the engine does
           -- a general box walk; the oracle exploits the fixed layout)
           CASE WHEN kind = 'image' THEN width::DOUBLE
                WHEN kind = 'video' THEN (bs[229] * 256 + bs[230])::DOUBLE
                WHEN kind IN ('jpeg', 'jpeg_full')
                    THEN (bs[97] * 256 + bs[98])::DOUBLE
                WHEN kind = 'png' THEN (bs[17] * 16777216 + bs[18] * 65536
                                        + bs[19] * 256 + bs[20])::DOUBLE
                ELSE NULL END AS hdr_width,
           CASE WHEN kind = 'image' THEN height::DOUBLE
                WHEN kind = 'video' THEN (bs[233] * 256 + bs[234])::DOUBLE
                WHEN kind IN ('jpeg', 'jpeg_full')
                    THEN (bs[95] * 256 + bs[96])::DOUBLE
                WHEN kind = 'png' THEN (bs[21] * 16777216 + bs[22] * 65536
                                        + bs[23] * 256 + bs[24])::DOUBLE
                ELSE NULL END AS hdr_height,
           -- jpeg quality from the luminance DQT (64 coefs at bytes
           -- 25-88, 1-based bs[26..89]): the engine's integer estimator —
           -- scale = round(100*S/3688), q = (200-scale)//2 when <= 100
           -- else round(5000/scale), clamped to [1,100]
           CASE WHEN kind IN ('jpeg', 'jpeg_full') THEN
               (SELECT CASE WHEN list_sum(bs[26:89]) <= 64 THEN 100
                            WHEN sc <= 0 THEN 100
                            WHEN sc <= 100 THEN
                                least(100, greatest(1, (200 - sc) // 2))
                            ELSE least(100, greatest(1,
                                (10000 + sc) // (2 * sc)))
                       END
                FROM (SELECT (100 * list_sum(bs[26:89]) + 1844) // 3688
                          AS sc))::BIGINT
                ELSE NULL END AS jpeg_quality,
           CASE WHEN kind = 'image' THEN
               -- P5 header 'P5\\n{{w}} {{h}}\\n255\\n' -> 9 + digits(w) + digits(h)
               len(list_filter(
                   bs[10 + length(width::VARCHAR) + length(height::VARCHAR) :
                      9 + length(width::VARCHAR) + length(height::VARCHAR)
                      + width * height],
                   b -> b // 8 = 0))::DOUBLE / (width * height)
           WHEN kind = 'audio' THEN
               -- canonical 44-byte WAV header; PCM-16 LE mono samples:
               -- high byte of sample i (1-based) at bs[44 + 2*i]; unsigned
               -- amplitude = (hi + 128) % 256, same //8 bins as the raster
               len(list_filter(
                   list_transform(range(1, (nb - 44) // 2 + 1),
                                  i -> bs[44 + 2 * i]),
                   b -> ((b + 128) % 256) // 8 = 0))::DOUBLE
               / ((nb - 44) // 2)
           WHEN kind = 'png' THEN png_hist0
           WHEN kind = 'jpeg_full' THEN jf_hist0
           ELSE NULL END AS hist0
    FROM mchash LEFT JOIN pngh USING (media_id)
                LEFT JOIN jfh USING (media_id)),
sh_ AS ({osql.smix_chain(['media_id', 'kind', 'chash', 'decoded',
                          'header_decoded', 'hdr_width', 'hdr_height',
                          'jpeg_quality', 'hist0'],
                         f'mulmod(chash, 2654435761{_H})', 'sh0', 'feat_')})
SELECT media_id, kind, tobig(chash) AS payload_sha_like, decoded,
       header_decoded, hdr_width, hdr_height, jpeg_quality,
       round((CASE WHEN decoded THEN hist0
                   ELSE sh0::DOUBLE / 18446744073709551616.0
              END)::FLOAT::DOUBLE, 6) AS feat_0,
       {feature_dim}::BIGINT AS feat_dim
FROM sh_""",
    )


# ---------------------------------------------------------------------------
# curation oracles (functions/curation.py twins)
# ---------------------------------------------------------------------------

_WORDS = (
    "list_filter(string_split_regex(trim(regexp_replace(lower({x}), "
    "'[^a-z0-9]+', ' ', 'g')), '\\s+'), w -> w != '')"
)

_CLASS_CASE = """CASE WHEN length(lower(text)) = 0 THEN 'empty'
         WHEN length(regexp_replace(lower(text), '[^0-9]', '', 'g'))::DOUBLE
              / length(lower(text)) > 0.10 THEN 'numeric'
         WHEN length(regexp_replace(lower(text), '[^ ]', '', 'g'))::DOUBLE
              / length(lower(text)) > 0.25 THEN 'airy'
         ELSE 'dense' END"""


def _grams3_expr(w: str) -> str:
    """Distinct word 3-gram list — the exact twin of doc_dedup.ngrams_col(3)
    (and of the inline doc_ngram_jaccard_pairs oracle)."""
    return (
        f"list_distinct(CASE WHEN len({w}) >= 3 THEN "
        f"list_transform(range(1, len({w}) - 1), "
        f"i -> {w}[i] || ' ' || {w}[i+1] || ' ' || {w}[i+2]) ELSE [] END)"
    )


def doc_stratified_sample_sql(rates: dict[str, int] | None = None,
                              seed: int = 7) -> str:
    """curation.stratified_sample twin: Spark-compatible
    xxhash64(doc_id XOR seed) (xxh64_long_ctes, seed 42 = Spark's fixed
    seed) -> pymod(tobig(.), 1000) = Spark pmod on the signed value."""
    rates = rates or {"empty": 0, "numeric": 100, "airy": 500, "dense": 800}
    rate_case = "CASE " + " ".join(
        f"WHEN content_class = '{k}' THEN {int(v)}"
        for k, v in sorted(rates.items())
    ) + " ELSE 1000 END"
    return _script(f"""
CREATE OR REPLACE TEMP TABLE strat_base AS
SELECT doc_id, lang, {_CLASS_CASE} AS content_class FROM documents;
WITH {osql.xxh64_long_ctes('sk', 'strat_base',
                           ['doc_id', 'lang', 'content_class'],
                           f'xor(doc_id, {seed})', 'xh', seed=42)}
SELECT doc_id, lang, content_class,
       ({rate_case})::BIGINT AS rate_per_mille,
       pymod(tobig(xh), 1000)::BIGINT AS sample_key,
       pymod(tobig(xh), 1000) < ({rate_case}) AS kept
FROM skx5
""")


def tr_stratified_sample_sql(tr_path: str, rates: dict[str, int] | None = None,
                             seed: int = 7) -> str:
    """Transcript twin of the stratified sample: assembled conversations
    keyed by the md5_60 surrogate (a long — the xxhash64 sampling hash
    applies verbatim), content-class strata over the assembled text,
    conv_ids carried through."""
    rates = rates or {"empty": 0, "numeric": 100, "airy": 500, "dense": 800}
    rate_case = "CASE " + " ".join(
        f"WHEN content_class = '{k}' THEN {int(v)}"
        for k, v in sorted(rates.items())
    ) + " ELSE 1000 END"
    return _script(f"""
CREATE OR REPLACE TEMP TABLE asm AS
SELECT conv_id, string_agg(text, chr(10) ORDER BY turn_idx) AS doc_text
FROM {_tr_src(tr_path)} GROUP BY conv_id;
CREATE OR REPLACE TEMP TABLE tstrat AS
SELECT md5_60(conv_id) AS doc_id, conv_id, {_CLASS_CASE} AS content_class
FROM (SELECT conv_id, doc_text AS text FROM asm);""", f"""
WITH {osql.xxh64_long_ctes('sk', 'tstrat',
                           ['doc_id', 'conv_id', 'content_class'],
                           f'xor(doc_id, {seed})', 'xh', seed=42)}
SELECT conv_id, content_class,
       ({rate_case})::BIGINT AS rate_per_mille,
       pymod(tobig(xh), 1000)::BIGINT AS sample_key,
       pymod(tobig(xh), 1000) < ({rate_case}) AS kept
FROM skx5
""")


def _deco_sql(src: str, id_col: str, bench_pred: str, out_id: str,
              overlap_threshold: float = 0.5) -> str:
    """curation.decontaminate twin over ``src`` (any FROM-able source with
    ({id_col}, text)); ``bench_pred`` (over {id_col}) selects the stand-in
    eval suite rows."""
    w = _WORDS.format(x="text")
    ratio = ("round(CASE WHEN len(g.grams) > 0 "
             "THEN coalesce(h.n_overlap, 0)::DOUBLE / len(g.grams) "
             "ELSE 0.0 END, 6)")
    return f"""
CREATE OR REPLACE TEMP TABLE deco_g AS
SELECT sid, {_grams3_expr('w')} AS grams, is_bench
FROM (SELECT {id_col} AS sid, ({bench_pred}) AS is_bench, {w} AS w
      FROM {src});
CREATE OR REPLACE TEMP TABLE deco_bench AS
SELECT DISTINCT unnest(grams) AS gram FROM deco_g WHERE is_bench;
CREATE OR REPLACE TEMP TABLE deco_hits AS
SELECT c.sid, count(*)::BIGINT AS n_overlap
FROM (SELECT sid, unnest(grams) AS gram FROM deco_g WHERE NOT is_bench) c
JOIN deco_bench USING (gram) GROUP BY c.sid;
SELECT g.sid AS {out_id}, len(g.grams)::BIGINT AS n_grams,
       coalesce(h.n_overlap, 0)::BIGINT AS n_overlap,
       {ratio} AS overlap_ratio,
       {ratio} >= {overlap_threshold} AS contaminated
FROM deco_g g LEFT JOIN deco_hits h ON h.sid = g.sid
WHERE NOT g.is_bench
"""


def _bloom_deco_sql(src: str, id_col: str, bench_pred: str, out_id: str,
                    overlap_threshold: float = 0.5,
                    m_bits: int = 1 << 16, k_hashes: int = 3) -> str:
    """Twin for curation.decontaminate_bloom over ``src`` (any FROM-able
    source with ({id_col}, text)): the SAME Bloom filter the engine
    builds (md5_60(ki || ':' || gram) bit positions, bit_or word
    bitmap), probed per gram OCCURRENCE — false positives are a
    deterministic function of the shared hash, so the approximate counts
    value-match exactly."""
    w = _WORDS.format(x="text")
    ks = ", ".join(str(i) for i in range(int(k_hashes)))
    ratio = ("round(CASE WHEN g.n_grams > 0 "
             "THEN coalesce(h.n_overlap, 0)::DOUBLE / g.n_grams "
             "ELSE 0.0 END, 6)")
    return _script(f"""
CREATE OR REPLACE TEMP TABLE bdeco_g AS
SELECT sid, {_grams3_expr('w')} AS grams, is_bench
FROM (SELECT {id_col} AS sid, ({bench_pred}) AS is_bench, {w} AS w
      FROM {src});
CREATE OR REPLACE TEMP TABLE bloom_bits AS
WITH bg_ AS (SELECT DISTINCT unnest(grams) AS gram FROM bdeco_g
             WHERE is_bench),
b_ AS (SELECT md5_60(ki::VARCHAR || ':' || gram) % {int(m_bits)} AS bit
       FROM bg_ CROSS JOIN (SELECT unnest([{ks}]) AS ki) k)
SELECT (bit // 64)::BIGINT AS word_idx,
       bit_or(1::UBIGINT << (bit % 64)::INT) AS word
FROM b_ GROUP BY 1;
CREATE OR REPLACE TEMP TABLE bdeco_occ AS
SELECT sid, unnest(list_transform(range(1, len(grams) + 1),
                   i -> {{'pos': i, 'gram': grams[i]}}),
              recursive := true)
FROM bdeco_g WHERE NOT is_bench;
CREATE OR REPLACE TEMP TABLE bprobe AS
WITH h_ AS (SELECT sid, pos,
                   md5_60(ki::VARCHAR || ':' || gram) % {int(m_bits)} AS bit
            FROM bdeco_occ CROSS JOIN (SELECT unnest([{ks}]) AS ki) k)
SELECT h_.sid, h_.pos,
       CASE WHEN w.word IS NOT NULL
                 AND ((w.word >> (h_.bit % 64)::INT) & 1) = 1
            THEN 1 ELSE 0 END AS hit
FROM h_ LEFT JOIN bloom_bits w ON w.word_idx = (h_.bit // 64);
CREATE OR REPLACE TEMP TABLE bhits AS
SELECT sid, count(*)::BIGINT AS n_overlap FROM (
    SELECT sid, pos FROM bprobe GROUP BY sid, pos
    HAVING sum(hit) = {int(k_hashes)})
GROUP BY sid;""", f"""
SELECT g.sid AS {out_id}, g.n_grams,
       coalesce(h.n_overlap, 0)::BIGINT AS n_overlap,
       {ratio} AS overlap_ratio,
       {ratio} >= {overlap_threshold} AS contaminated
FROM (SELECT sid, len(grams)::BIGINT AS n_grams FROM bdeco_g
      WHERE NOT is_bench) g
LEFT JOIN bhits h ON h.sid = g.sid""")


def doc_decontam_bloom_sql(bench_mod: int = 19,
                           overlap_threshold: float = 0.5,
                           m_bits: int = 1 << 16,
                           k_hashes: int = 3) -> str:
    return _bloom_deco_sql("documents", "doc_id",
                           f"doc_id % {bench_mod} = 0", "doc_id",
                           overlap_threshold, m_bits, k_hashes)


def tr_decontam_bloom_sql(tr_path: str, bench_mod: int = 19,
                          overlap_threshold: float = 0.5,
                          m_bits: int = 1 << 16,
                          k_hashes: int = 3) -> str:
    """Transcript twin of the Bloom gate over assembled conversations."""
    return (
        f"""
CREATE OR REPLACE TEMP TABLE asm AS
SELECT conv_id, string_agg(text, chr(10) ORDER BY turn_idx) AS doc_text
FROM {_tr_src(tr_path)} GROUP BY conv_id;"""
        + _bloom_deco_sql(
            "(SELECT conv_id, doc_text AS text FROM asm)", "conv_id",
            f"CAST(substr(conv_id, 6) AS BIGINT) % {bench_mod} = 0",
            "conv_id", overlap_threshold, m_bits, k_hashes,
        )
    )


def doc_decontamination_sql(bench_mod: int = 19,
                            overlap_threshold: float = 0.5) -> str:
    """curation.decontaminate twin over the deterministic benchmark split
    doc_id % bench_mod == 0 (the stand-in eval suite)."""
    return _deco_sql("documents", "doc_id", f"doc_id % {bench_mod} = 0",
                     "doc_id", overlap_threshold)


def tr_decontamination_sql(tr_path: str, bench_mod: int = 19,
                           overlap_threshold: float = 0.5) -> str:
    """Transcript twin: the same leak test over assembled conversations,
    benchmark split on the numeric conv-id suffix (engine twin uses the
    identical CAST(substring(conv_id, 6)) expression)."""
    return (
        f"""
CREATE OR REPLACE TEMP TABLE asm AS
SELECT conv_id, string_agg(text, chr(10) ORDER BY turn_idx) AS doc_text
FROM {_tr_src(tr_path)} GROUP BY conv_id;"""
        + _deco_sql(
            "(SELECT conv_id, doc_text AS text FROM asm)", "conv_id",
            f"CAST(substr(conv_id, 6) AS BIGINT) % {bench_mod} = 0",
            "conv_id", overlap_threshold,
        )
    )


def doc_boilerplate_sql(min_df: int = 8) -> str:
    """curation.boilerplate_ngrams twin: document frequency of distinct
    3-grams, df >= min_df (count cutoff, no rank boundary)."""
    w = _WORDS.format(x="text")
    return f"""
WITH g AS (SELECT doc_id, {_grams3_expr('w')} AS grams
           FROM (SELECT doc_id, {w} AS w FROM documents)),
e AS (SELECT doc_id, unnest(grams) AS gram FROM g)
SELECT gram, count(*)::BIGINT AS df FROM e GROUP BY gram
HAVING count(*) >= {min_df}
"""


# Exact SQL twin of __spark_entry__._pii_overlay (deterministic PII fixture
# appended to the synthetic documents, pure function of doc_id).
PII_OVERLAY_SQL = (
    "text"
    " || CASE WHEN doc_id % 7 = 0 THEN ' contact user' ||"
    " CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN ' call 555-' ||"
    " CAST(doc_id % 900 + 100 AS VARCHAR) || '-' ||"
    " CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END"
    " || CASE WHEN doc_id % 13 = 0 THEN ' host 10.' ||"
    " CAST(doc_id % 256 AS VARCHAR) || '.0.' ||"
    " CAST(doc_id % 254 + 1 AS VARCHAR) ELSE '' END"
    " || CASE WHEN doc_id % 17 = 0 THEN ' ssn ' ||"
    " CAST(doc_id % 900 + 100 AS VARCHAR) || '-' ||"
    " CAST(doc_id % 90 + 10 AS VARCHAR) || '-' ||"
    " CAST(doc_id % 8000 + 2000 AS VARCHAR) ELSE '' END"
)


def _pii_steps_stmt(src: str = "documents", id_sql: str = "doc_id",
                    overlay_sql: str = PII_OVERLAY_SQL) -> str:
    """Staged progressive redaction, the exact twin of
    curation._pii_progressive: pii_steps carries t0 (lowered overlay text)
    and t1..tK with classes 1..K already replaced, so class k's count
    (n_<class>) is taken on t{k-1} — sequential-disjoint, per-class counts
    sum to the replacements performed. One chained temp table per step
    (plain CTEs would re-expand the regexp chain per reference).

    Parameterized over (src relation, id column list, overlay text expr)
    so the transcript twin stages the same chain per TURN row."""
    from .functions.curation import PII_PATTERNS

    stmts = [f"""
CREATE OR REPLACE TEMP TABLE pii_s0 AS
SELECT {id_sql}, lower({overlay_sql}) AS t0 FROM {src};
"""]
    for i, (_, pat, token) in enumerate(PII_PATTERNS):
        stmts.append(f"""
CREATE OR REPLACE TEMP TABLE pii_s{i + 1} AS
SELECT *, regexp_replace(t{i}, '{pat}', '{token}', 'g') AS t{i + 1}
FROM pii_s{i};
""")
    return "".join(stmts)


def _pii_count_cols() -> str:
    """Per-class counts on the progressive text (RE2 regexp_extract_all ==
    Java regexp_count non-overlapping semantics on these ASCII patterns)."""
    from .functions.curation import PII_PATTERNS

    return ",\n       ".join(
        f"len(regexp_extract_all(t{i}, '{pat}'))::BIGINT AS n_{name}"
        for i, (name, pat, _) in enumerate(PII_PATTERNS)
    )


def doc_pii_report_sql() -> str:
    """curation.pii_report twin over the PII overlay corpus."""
    from .functions.curation import PII_PATTERNS

    total = " + ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    last = len(PII_PATTERNS)
    return f"""
{_pii_steps_stmt()}
CREATE OR REPLACE TEMP TABLE pii_cnt AS
SELECT doc_id,
       {_pii_count_cols()}
FROM pii_s{last};
SELECT doc_id, n_email, n_phone, n_ipv4, n_ssn,
       ({total})::BIGINT AS n_pii,
       ({total}) > 0 AS has_pii
FROM pii_cnt
"""


def doc_pii_redact_sql() -> str:
    """curation.pii_redact twin: the staged progressive redaction's final
    text plus the sequential counts."""
    from .functions.curation import PII_PATTERNS

    total = " + ".join(
        f"len(regexp_extract_all(t{i}, '{pat}'))"
        for i, (_, pat, _) in enumerate(PII_PATTERNS)
    )
    last = len(PII_PATTERNS)
    return f"""
{_pii_steps_stmt()}
SELECT doc_id,
       t{last} AS clean_text,
       ({total})::BIGINT AS n_redacted
FROM pii_s{last}
"""


# Exact SQL twin of __spark_entry__._tr_pii_overlay: the per-TURN PII
# fixture keyed by k = conv_num * 1000 + turn_idx (conv_num is the numeric
# conv-id suffix, the same substr(conv_id, 6) expression the engine uses).
TR_PII_KEY_SQL = "(CAST(substr(conv_id, 6) AS BIGINT) * 1000 + turn_idx)"
TR_PII_OVERLAY_SQL = (
    "text"
    f" || CASE WHEN {TR_PII_KEY_SQL} % 7 = 0 THEN ' contact user' ||"
    f" CAST({TR_PII_KEY_SQL} AS VARCHAR) || '@example.com now' ELSE '' END"
    f" || CASE WHEN {TR_PII_KEY_SQL} % 11 = 0 THEN ' call 555-' ||"
    f" CAST({TR_PII_KEY_SQL} % 900 + 100 AS VARCHAR) || '-' ||"
    f" CAST({TR_PII_KEY_SQL} % 9000 + 1000 AS VARCHAR) ELSE '' END"
    f" || CASE WHEN {TR_PII_KEY_SQL} % 13 = 0 THEN ' host 10.' ||"
    f" CAST({TR_PII_KEY_SQL} % 256 AS VARCHAR) || '.0.' ||"
    f" CAST({TR_PII_KEY_SQL} % 254 + 1 AS VARCHAR) ELSE '' END"
    f" || CASE WHEN {TR_PII_KEY_SQL} % 17 = 0 THEN ' ssn ' ||"
    f" CAST({TR_PII_KEY_SQL} % 900 + 100 AS VARCHAR) || '-' ||"
    f" CAST({TR_PII_KEY_SQL} % 90 + 10 AS VARCHAR) || '-' ||"
    f" CAST({TR_PII_KEY_SQL} % 8000 + 2000 AS VARCHAR) ELSE '' END"
)


def tr_pii_report_sql(tr_path: str) -> str:
    """curation.pii_report twin at TURN granularity over the transcript
    fixture + deterministic per-turn overlay."""
    from .functions.curation import PII_PATTERNS

    total = " + ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    last = len(PII_PATTERNS)
    return f"""
{_pii_steps_stmt(_tr_src(tr_path), "conv_id, turn_idx", TR_PII_OVERLAY_SQL)}
CREATE OR REPLACE TEMP TABLE pii_cnt AS
SELECT conv_id, turn_idx,
       {_pii_count_cols()}
FROM pii_s{last};
SELECT conv_id, turn_idx, n_email, n_phone, n_ipv4, n_ssn,
       ({total})::BIGINT AS n_pii,
       ({total}) > 0 AS has_pii
FROM pii_cnt
"""


def tr_pii_redact_sql(tr_path: str) -> str:
    """curation.pii_redact twin at TURN granularity: redacted turn text
    keyed (conv_id, turn_idx), so the scrubbed corpus keeps its
    conversation structure."""
    from .functions.curation import PII_PATTERNS

    total = " + ".join(
        f"len(regexp_extract_all(t{i}, '{pat}'))"
        for i, (_, pat, _) in enumerate(PII_PATTERNS)
    )
    last = len(PII_PATTERNS)
    return f"""
{_pii_steps_stmt(_tr_src(tr_path), "conv_id, turn_idx", TR_PII_OVERLAY_SQL)}
SELECT conv_id, turn_idx,
       t{last} AS clean_text,
       ({total})::BIGINT AS n_redacted
FROM pii_s{last}
"""


def tr_repetition_sql(tr_path: str, top_frac_max: float = 0.2,
                      dup_ratio_max: float = 0.3) -> str:
    """curation.repetition_report twin on the PRIMARY axis: assemble
    conversations under stable turn order (the same string_agg twin as
    tr_decontamination_sql), then the staged repetition verdict per
    conversation."""
    return (
        f"""
CREATE OR REPLACE TEMP TABLE asm AS
SELECT conv_id, string_agg(text, chr(10) ORDER BY turn_idx) AS doc_text
FROM {_tr_src(tr_path)} GROUP BY conv_id;"""
        + _repetition_stmts(
            "(SELECT conv_id AS doc_id, doc_text AS text FROM asm)",
            top_frac_max, dup_ratio_max,
        )
        + """
SELECT doc_id AS conv_id, n_words, dup_word_ratio, dup_2gram_ratio,
       dup_3gram_ratio, top_2gram_frac, repetitive
FROM rep_verdict"""
    )


def _repetition_stmts(src: str = "documents", top_frac_max: float = 0.2,
                      dup_ratio_max: float = 0.3) -> str:
    """TEMP TABLE ``rep_verdict`` (doc_id, n_words, dup ratios,
    top_2gram_frac, repetitive) over ``src`` — the repetition_report twin
    staged so composed oracles (doc_curation) can consume the verdict."""
    w = _WORDS.format(x="text")
    g2 = ("CASE WHEN len(w) >= 2 THEN list_transform(range(1, len(w)), "
          "i -> w[i] || ' ' || w[i+1]) ELSE [] END")
    g3 = ("CASE WHEN len(w) >= 3 THEN list_transform(range(1, len(w) - 1), "
          "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) ELSE [] END")

    def dup(col: str) -> str:
        return (f"round(CASE WHEN len({col}) > 0 THEN 1.0 - "
                f"len(list_distinct({col}))::DOUBLE / len({col}) "
                f"ELSE 0.0 END, 6)")

    return f"""
CREATE OR REPLACE TEMP TABLE rep_g AS
SELECT doc_id, w, {g2} AS g2, {g3} AS g3
FROM (SELECT doc_id, {w} AS w FROM {src});
CREATE OR REPLACE TEMP TABLE rep_top AS
SELECT doc_id, max(cnt)::BIGINT AS top2_n
FROM (SELECT doc_id, gram, count(*) AS cnt
      FROM (SELECT doc_id, unnest(g2) AS gram FROM rep_g)
      GROUP BY doc_id, gram)
GROUP BY doc_id;
CREATE OR REPLACE TEMP TABLE rep_stats AS
SELECT b.doc_id,
       len(b.w)::BIGINT AS n_words,
       {dup('b.w')} AS dup_word_ratio,
       {dup('b.g2')} AS dup_2gram_ratio,
       {dup('b.g3')} AS dup_3gram_ratio,
       round(CASE WHEN len(b.g2) > 0
             THEN coalesce(t.top2_n, 0)::DOUBLE / len(b.g2)
             ELSE 0.0 END, 6) AS top_2gram_frac
FROM rep_g b LEFT JOIN rep_top t USING (doc_id);
CREATE OR REPLACE TEMP TABLE rep_verdict AS
SELECT doc_id, n_words, dup_word_ratio, dup_2gram_ratio, dup_3gram_ratio,
       top_2gram_frac,
       (top_2gram_frac > {float(top_frac_max)}
        OR dup_3gram_ratio > {float(dup_ratio_max)}) AS repetitive
FROM rep_stats;
"""


def doc_repetition_sql(top_frac_max: float = 0.2,
                       dup_ratio_max: float = 0.3) -> str:
    """curation.repetition_report twin: multiset n-gram lists (1-based
    DuckDB indexing, end-exclusive range) + per-doc 2-gram mode via
    unnest/group-by; the repetitive verdict compares the ROUNDED columns,
    matching the Spark query."""
    return (_repetition_stmts("documents", top_frac_max, dup_ratio_max)
            + "\nSELECT * FROM rep_verdict")


# the whitespace token-count heuristic — the default everywhere a
# precomputed count column isn't supplied (engine twin: curation._ntok_col)
NTOK_SQL = r"len(regexp_split_to_array(trim(text), '\s+'))::BIGINT"


def _pack_stmts(src: str = "documents", budget: int = 2048,
                n_shards: int = 8, ntok_expr: str = NTOK_SQL) -> str:
    """TEMP TABLE ``pack_out`` (doc_id, shard, n_tokens, pack_id) over
    ``src`` — the pack_assignments twin staged for composed oracles.
    ``ntok_expr``: SQL for the token count — pass a precomputed column
    name to mirror the engine's ``token_col`` override."""
    return f"""
CREATE OR REPLACE TEMP TABLE pack_base AS
SELECT doc_id,
       {ntok_expr} AS n_tokens
FROM {src};
CREATE OR REPLACE TEMP TABLE pack_out AS
WITH {osql.xxh64_long_ctes('pk', 'pack_base', ['doc_id', 'n_tokens'],
                           'doc_id', 'xh', seed=42)}
SELECT doc_id,
       pymod(tobig(xh), {int(n_shards)})::BIGINT AS shard,
       n_tokens,
       floor(coalesce(sum(n_tokens) OVER (
                 PARTITION BY pymod(tobig(xh), {int(n_shards)})
                 ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0) / {int(budget)})::BIGINT AS pack_id
FROM pkx5;
"""


def tr_pack_sql(tr_path: str, budget: int = 2048,
                n_shards: int = 8) -> str:
    """Transcript packing twin: assembled conversations keyed by the
    md5_60 surrogate run the document pack stage verbatim (the surrogate
    IS a long, so the xxhash64 shard route applies unchanged), conv_ids
    mapped back."""
    return _script(
        f"""
CREATE OR REPLACE TEMP TABLE asm AS
SELECT conv_id, string_agg(text, chr(10) ORDER BY turn_idx) AS doc_text
FROM {_tr_src(tr_path)} GROUP BY conv_id;
CREATE OR REPLACE TEMP TABLE tdocs AS
SELECT md5_60(conv_id) AS doc_id, doc_text AS text FROM asm;
CREATE OR REPLACE TEMP TABLE cmap AS
SELECT md5_60(conv_id) AS doc_id, conv_id FROM asm;""",
        _pack_stmts("tdocs", budget, n_shards),
        """
SELECT m.conv_id, p.shard, p.n_tokens, p.pack_id
FROM pack_out p JOIN cmap m USING (doc_id)""",
    )


def doc_pack_sql(budget: int = 2048, n_shards: int = 8,
                 ntok_expr: str = NTOK_SQL) -> str:
    """curation.pack_assignments twin: Spark-compatible xxhash64(doc_id)
    shard route (xxh64_long_ctes, Spark's fixed seed 42), then watermark
    packing — pack_id = floor(preceding shard tokens / budget) over the
    doc_id order within each shard. ``ntok_expr`` mirrors the engine's
    ``token_col`` override (pass a precomputed count column name)."""
    return _script(
        _pack_stmts("documents", budget, n_shards, ntok_expr),
        "SELECT doc_id, shard, n_tokens, pack_id FROM pack_out",
    )


def _curation_stmts(admission_sql: str, src: str = "documents",
                    k: int = 3, threshold: float = 0.3,
                    top_frac_max: float = 0.2, dup_ratio_max: float = 0.3,
                    token_budget: int = 10_000, pack_budget: int = 2048,
                    n_shards: int = 8,
                    cfg: DedupConfig | None = None,
                    with_semantic: bool = False,
                    sem_threshold: float = 0.4, sem_clusters: int = 8,
                    sem_iters: int = 3, sem_dim: int = 64) -> str:
    """Statements for the composed curate_corpus cascade over ``src``
    (any table with (doc_id BIGINT, text)), ending in TEMP TABLE
    ``curation_out`` (doc_id, verdict, keeper_doc_id, quality, n_tokens,
    shard, pack_id). Every stage reuses the statement builder its
    standalone oracle uses (admission SELECT passed in from the caller so
    the quality/lang/class expressions live in exactly one place; cluster
    staging via _doc_sig_stmts/_doc_cluster_stmts over the admitted
    survivors; _repetition_stmts / _pack_stmts over the surviving
    subsets; the budget stage is the doc_budget_selection window over
    cadm.quality)."""
    cfg = cfg or DedupConfig(shingle_k=k, substring_enabled=False)
    # optional stage 2b (semantic_dup): the shared semdedup staging over
    # the embeddings view (vec_id == doc_id), applied to near-stage
    # survivors; downstream stages then read csrc2b instead of csrc2
    if with_semantic:
        sem_sql = "\n".join([
            *_semdedup_stmts(sem_threshold, sem_clusters, sem_iters,
                             sem_dim, cfg),
            """
CREATE OR REPLACE TEMP TABLE csem AS
SELECT s.doc_id, kp.vec_id AS sem_keeper
FROM csrc2 s
JOIN sem g ON g.vec_id = s.doc_id AND NOT g.keep
JOIN (SELECT group_id, vec_id FROM sem WHERE keep) kp
  ON kp.group_id = g.group_id;
CREATE OR REPLACE TEMP TABLE csrc2b AS
SELECT s.doc_id, s.text FROM csrc2 s
WHERE s.doc_id NOT IN (SELECT doc_id FROM csem);""",
        ])
    else:
        sem_sql = """
CREATE OR REPLACE TEMP TABLE csem AS
SELECT NULL::BIGINT AS doc_id, NULL::BIGINT AS sem_keeper WHERE FALSE;
CREATE OR REPLACE TEMP TABLE csrc2b AS
SELECT doc_id, text FROM csrc2;"""
    return "\n".join([
        f"CREATE OR REPLACE TEMP TABLE cadm AS {admission_sql};",
        f"""
CREATE OR REPLACE TEMP TABLE csrc1 AS
SELECT d.doc_id, d.text FROM {src} d
JOIN cadm a USING (doc_id) WHERE a.reason = 'ok';""",
        _doc_sig_stmts(k, with_minhash=True, with_simhash=False, cfg=cfg,
                       src="csrc1"),
        _doc_cluster_stmts(threshold, cfg),
        """
CREATE OR REPLACE TEMP TABLE cnear AS
SELECT c.doc_id, w.winner FROM dclusters c
JOIN (SELECT cluster_id, doc_id AS winner FROM (
          SELECT c2.cluster_id, c2.doc_id,
                 row_number() OVER (PARTITION BY c2.cluster_id
                                    ORDER BY a.quality DESC, c2.doc_id)
                     AS rn
          FROM dclusters c2 JOIN cadm a USING (doc_id)) WHERE rn = 1) w
    USING (cluster_id)
WHERE c.doc_id != w.winner;
CREATE OR REPLACE TEMP TABLE csrc2 AS
SELECT s.doc_id, s.text FROM csrc1 s
WHERE s.doc_id NOT IN (SELECT doc_id FROM cnear);""",
        sem_sql,
        _repetition_stmts("csrc2b", top_frac_max, dup_ratio_max),
        f"""
CREATE OR REPLACE TEMP TABLE csrc3 AS
SELECT s.doc_id, s.text FROM csrc2b s
JOIN rep_verdict r USING (doc_id) WHERE NOT r.repetitive;
CREATE OR REPLACE TEMP TABLE cbud AS
SELECT doc_id,
       coalesce(sum(n_tokens) OVER (
           ORDER BY quality DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         0) < {int(token_budget)} AS kept
FROM (SELECT s.doc_id, a.quality,
             len(regexp_split_to_array(trim(s.text), '\\s+'))::BIGINT
                 AS n_tokens
      FROM csrc3 s JOIN cadm a USING (doc_id));
CREATE OR REPLACE TEMP TABLE csrc4 AS
SELECT s.doc_id, s.text FROM csrc3 s
JOIN cbud b USING (doc_id) WHERE b.kept;""",
        _pack_stmts("csrc4", pack_budget, n_shards),
        f"""
CREATE OR REPLACE TEMP TABLE curation_out AS
SELECT a.doc_id,
       CASE WHEN a.reason != 'ok' THEN a.reason
            WHEN n.winner IS NOT NULL THEN 'near_dup'
            WHEN sm.sem_keeper IS NOT NULL THEN 'semantic_dup'
            WHEN r.repetitive THEN 'repetitive'
            WHEN NOT b.kept THEN 'over_budget'
            ELSE 'kept' END AS verdict,
       (CASE WHEN a.reason = 'exact_dup' THEN a.keeper_doc_id
             WHEN n.winner IS NOT NULL THEN n.winner
             WHEN sm.sem_keeper IS NOT NULL THEN sm.sem_keeper
             ELSE NULL END)::BIGINT AS keeper_doc_id,
       a.quality,
       len(regexp_split_to_array(trim(d.text), '\\s+'))::BIGINT AS n_tokens,
       p.shard::BIGINT AS shard,
       p.pack_id::BIGINT AS pack_id
FROM cadm a
JOIN {src} d USING (doc_id)
LEFT JOIN cnear n USING (doc_id)
LEFT JOIN csem sm USING (doc_id)
LEFT JOIN rep_verdict r USING (doc_id)
LEFT JOIN cbud b USING (doc_id)
LEFT JOIN pack_out p USING (doc_id);""",
    ])


def doc_curation_sql(admission_sql: str, k: int = 3, threshold: float = 0.3,
                     top_frac_max: float = 0.2, dup_ratio_max: float = 0.3,
                     token_budget: int = 10_000, pack_budget: int = 2048,
                     n_shards: int = 8,
                     cfg: DedupConfig | None = None,
                     with_semantic: bool = False) -> str:
    """Twin for curation.curate_corpus — the composed end-to-end cascade
    over the documents table (stages in _curation_stmts); with_semantic
    adds the SemDeDup stage between near-dup and repetition."""
    return _script(
        _curation_stmts(admission_sql, "documents", k, threshold,
                        top_frac_max, dup_ratio_max, token_budget,
                        pack_budget, n_shards, cfg,
                        with_semantic=with_semantic),
        """
SELECT doc_id, verdict, keeper_doc_id, quality, n_tokens, shard, pack_id
FROM curation_out""",
    )


def tr_curation_sql(tr_path: str, admission_sql: str, k: int = 3,
                    threshold: float = 0.3, top_frac_max: float = 0.2,
                    dup_ratio_max: float = 0.3, token_budget: int = 10_000,
                    pack_budget: int = 2048, n_shards: int = 8,
                    cfg: DedupConfig | None = None) -> str:
    """Twin for curation.curate_transcripts — the same composed cascade
    over assembled conversations. Stages the engine's exact mapping:
    assemble under stable turn order, key by md5_60(conv_id) (the
    bit-identical macro twin of kmv.md5_60), run _curation_stmts over the
    keyed view, then map surrogate ids back to conv_ids. ``admission_sql``
    must SELECT over ``tdocs`` (the caller builds it from the same
    template as the documents admission body)."""
    return _script(
        f"""
CREATE OR REPLACE TEMP TABLE asm AS
SELECT conv_id, string_agg(text, chr(10) ORDER BY turn_idx) AS doc_text
FROM {_tr_src(tr_path)} GROUP BY conv_id;
CREATE OR REPLACE TEMP TABLE tdocs AS
SELECT md5_60(conv_id) AS doc_id, doc_text AS text FROM asm;
CREATE OR REPLACE TEMP TABLE cmap AS
SELECT md5_60(conv_id) AS doc_id, conv_id FROM asm;""",
        _curation_stmts(admission_sql, "tdocs", k, threshold,
                        top_frac_max, dup_ratio_max, token_budget,
                        pack_budget, n_shards, cfg),
        """
SELECT m.conv_id, c.verdict, km.conv_id AS keeper_conv_id, c.quality,
       c.n_tokens, c.shard, c.pack_id
FROM curation_out c
JOIN cmap m USING (doc_id)
LEFT JOIN cmap km ON km.doc_id = c.keeper_doc_id""",
    )


# ---------------------------------------------------------------------------
# pure-JVM KMV channel (functions/kmv.py) — md5-60bit twin
# ---------------------------------------------------------------------------

def _kmv_stmts(p: str, src: str, sid_expr: str, text_expr: str,
               k: int, k_min: int, cap: int) -> str:
    """TEMP TABLEs for the KMV channel twin over ``src`` (table name or
    parenthesized subquery): ``{p}ksig`` (sid, idh, sh sorted-distinct
    60-bit shingle hashes, kmv bottom-k_min) and ``{p}kcand`` (ma, mb
    candidate pairs through the shared capped-bucket rule). Mirrors
    kmv_signatures + _kmv_pairs expression-for-expression: same
    normalization (norm_words), same ' '-joined k-gram strings, same
    md5_60 hash, same positive-BIGINT ordering for the bottom-K."""
    return f"""
CREATE OR REPLACE TEMP TABLE {p}kw AS
SELECT {sid_expr} AS sid, norm_words({text_expr}) AS ws FROM {src};
CREATE OR REPLACE TEMP TABLE {p}kg AS
SELECT sid, unnest(list_distinct(
    CASE WHEN len(ws) >= {k} THEN
        list_transform(range(1, len(ws) - {k} + 2),
                       i -> array_to_string(ws[i : i + {k} - 1], ' '))
    ELSE [] END)) AS gram
FROM {p}kw;
CREATE OR REPLACE TEMP TABLE {p}kh AS
SELECT gram, md5_60(gram) AS gh FROM (SELECT DISTINCT gram FROM {p}kg);
CREATE OR REPLACE TEMP TABLE {p}ksh AS
SELECT g.sid, list_sort(list_distinct(list(h.gh))) AS sh
FROM {p}kg g JOIN {p}kh h USING (gram) GROUP BY g.sid;
CREATE OR REPLACE TEMP TABLE {p}ksig AS
SELECT w.sid, md5_60(w.sid::VARCHAR) AS idh,
       coalesce(s.sh, []) AS sh,
       coalesce(s.sh[1 : {k_min}], []) AS kmv
FROM (SELECT DISTINCT sid FROM {p}kw) w LEFT JOIN {p}ksh s ON s.sid = w.sid;
CREATE OR REPLACE TEMP TABLE {p}kbands AS
SELECT sid AS mem, idh AS salt, 0 AS band_idx, unnest(kmv) AS key
FROM {p}ksig WHERE len(kmv) > 0;
{_bucket_pair_stmt(f"{p}kbands", cap, out=f"{p}kcand")}
"""


def _kmv_final(p: str, a_alias: str, b_alias: str, a_cast: str,
               threshold: float) -> str:
    """Final SELECT verifying ``{p}kcand`` by exact Jaccard over the full
    sorted-distinct shingle-hash lists (engine: array_intersect)."""
    return f"""
WITH ver_ AS (SELECT c.ma, c.mb, len(a.sh) AS la, len(b.sh) AS lb,
                     len(list_intersect(a.sh, b.sh)) AS inter
              FROM {p}kcand c JOIN {p}ksig a ON a.sid = c.ma
              JOIN {p}ksig b ON b.sid = c.mb),
ver2_ AS (SELECT ma, mb,
                 CASE WHEN la + lb - inter > 0
                      THEN inter::DOUBLE / (la + lb - inter) ELSE 1.0 END AS jac
          FROM ver_)
SELECT ma{a_cast} AS {a_alias}, mb{a_cast} AS {b_alias}, round(jac, 6) AS jaccard
FROM ver2_ WHERE round(jac, 6) >= {threshold}"""


def doc_kmv_sql(k: int = 3, k_min: int = 20, threshold: float = 0.3,
                cfg: DedupConfig | None = None) -> str:
    """Twin for functions.kmv.kmv_near_pairs over the documents table."""
    cfg = cfg or DedupConfig(shingle_k=k, substring_enabled=False)
    return _script(
        _kmv_stmts("dv", "documents", "doc_id", "text", k, k_min,
                   cfg.bucket_cap),
        _kmv_final("dv", "doc_id_a", "doc_id_b", "::BIGINT", threshold),
    )


def tr_kmv_sql(tr_path: str, k_min: int = 20,
               cfg: DedupConfig | None = None) -> str:
    """Twin for functions.kmv.kmv_near_pairs_transcripts: assemble (string
    agg in turn order, chr(10) separator — byte-identical to the engine's
    array_sort+array_join) then the shared KMV statements at the judged
    default geometry (k=5, verify >= jaccard_threshold)."""
    cfg = cfg or DedupConfig()
    return _script(
        f"""
CREATE OR REPLACE TEMP TABLE kasm AS
SELECT conv_id, string_agg(text, chr(10) ORDER BY turn_idx) AS doc_text
FROM {_tr_src(tr_path)} GROUP BY conv_id;""",
        _kmv_stmts("tv", "kasm", "conv_id", "doc_text", cfg.shingle_k,
                   k_min, cfg.bucket_cap),
        _kmv_final("tv", "conv_id_a", "conv_id_b", "", cfg.jaccard_threshold),
    )


def tr_kmv_clusters_sql(tr_path: str, k_min: int = 20,
                        cfg: DedupConfig | None = None) -> str:
    """Twin for functions.kmv.kmv_clusters_transcripts: KMV verified pairs
    UNION exact star edges (md5 of the channel's normalized doc text),
    then min-conv_id transitive closure via recursive reachability."""
    cfg = cfg or DedupConfig()
    norm = _NORM.format(x="doc_text")
    return _script(
        f"""
CREATE OR REPLACE TEMP TABLE kasm AS
SELECT conv_id, string_agg(text, chr(10) ORDER BY turn_idx) AS doc_text
FROM {_tr_src(tr_path)} GROUP BY conv_id;""",
        _kmv_stmts("tv", "kasm", "conv_id", "doc_text", cfg.shingle_k,
                   k_min, cfg.bucket_cap),
        f"""
CREATE OR REPLACE TEMP TABLE kpairs AS
{_kmv_final("tv", "conv_id_a", "conv_id_b", "", cfg.jaccard_threshold)};
CREATE OR REPLACE TEMP TABLE kexact AS
WITH h AS (SELECT conv_id, md5({norm}) AS cm FROM kasm),
g AS (SELECT conv_id, min(conv_id) OVER (PARTITION BY cm) AS rep,
             count(*) OVER (PARTITION BY cm) AS n FROM h)
SELECT rep AS a, conv_id AS b FROM g WHERE n > 1 AND conv_id != rep;
CREATE OR REPLACE TEMP TABLE ksym AS
WITH e AS (SELECT conv_id_a AS a, conv_id_b AS b FROM kpairs
           UNION SELECT a, b FROM kexact)
SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e;
WITH RECURSIVE reach(src, dst) AS (
    SELECT conv_id, conv_id FROM kasm
    UNION
    SELECT r.src, s.b FROM reach r JOIN ksym s ON r.dst = s.a)
SELECT src AS conv_id, min(dst) AS cluster_id FROM reach GROUP BY src""",
    )


def doc_kmv_recall_sql(k: int = 3, k_min: int = 20,
                       truth_threshold: float = 0.5,
                       design_threshold: float = 0.3,
                       cfg: DedupConfig | None = None) -> str:
    """Twin for functions.kmv.kmv_recall_report: brute all-pairs Jaccard
    truth over the md5-60bit shingle lists vs the bucketed KMV pair set."""
    cfg = cfg or DedupConfig(shingle_k=k, substring_enabled=False)
    return _script(
        _kmv_stmts("dv", "documents", "doc_id", "text", k, k_min,
                   cfg.bucket_cap),
        f"""
CREATE OR REPLACE TEMP TABLE kfound AS
{_kmv_final("dv", "doc_id_a", "doc_id_b", "::BIGINT", design_threshold)};
CREATE OR REPLACE TEMP TABLE ktruth AS
WITH s AS (SELECT sid, sh FROM dvksig WHERE len(sh) > 0),
v_ AS (SELECT a.sid AS pa, b.sid AS pb, len(a.sh) AS la, len(b.sh) AS lb,
              len(list_intersect(a.sh, b.sh)) AS inter
       FROM s a JOIN s b ON a.sid < b.sid)
SELECT pa, pb FROM (
    SELECT pa, pb, round(CASE WHEN la + lb - inter > 0
                              THEN inter::DOUBLE / (la + lb - inter)
                              ELSE 1.0 END, 6) AS jac
    FROM v_)
WHERE jac >= {truth_threshold};
SELECT {float(truth_threshold)} AS truth_threshold,
       (SELECT count(*) FROM ktruth)::BIGINT AS n_truth,
       (SELECT count(*) FROM ktruth t
        WHERE EXISTS (SELECT 1 FROM kfound f
                      WHERE f.doc_id_a = t.pa AND f.doc_id_b = t.pb))::BIGINT
           AS n_found,
       round(CASE WHEN (SELECT count(*) FROM ktruth) > 0
                  THEN (SELECT count(*) FROM ktruth t
                        WHERE EXISTS (SELECT 1 FROM kfound f
                                      WHERE f.doc_id_a = t.pa
                                        AND f.doc_id_b = t.pb))::DOUBLE
                       / (SELECT count(*) FROM ktruth)
                  ELSE 1.0 END, 6) AS recall
""",
    )
