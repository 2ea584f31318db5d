"""LSH banding + candidate-pair generation (the scalable similarity path).

Reference analog: the segmented similarity index (MODE_SIMILARITY) — probe
the global index with each of K sketch values; ANY single match nominates a
candidate segment (/root/reference/rabin/rabin_dedup.c:897-1183,
/root/reference/rabin/global/index.c:184-196). Here the shuffle IS the
index: explode (band_idx, band_hash), group, and every bucket with >= 2
members nominates candidate pairs. No shared mutable state, no semaphore
ring — determinism comes from sorted bucket membership.

Long keys through every shuffle: banding, buckets, and pairs carry only the
64-bit ``id_hash`` (derived deterministically from conv_id by the shared
kernel), never the conv_id string — at 10^12-turn scale the string id would
multiply shuffle bytes by ~4x across the three hottest exchanges. conv_ids
are joined back from the signatures table at verify time. A 64-bit id
collision (P ~ n^2/2^65; ~3e4 pairs at 10^12 docs) can only DROP a
candidate pair (equal keys never pair) or merge two clusters — far inside
the 0.99-recall budget; tests assert injectivity on real fixtures.

Skew handling (north_rule: explicit salting of hot LSH buckets; reference
analog: lossy eviction of the oldest chain entry at capacity,
/root/reference/rabin/global/index.c:539-547 — theirs is silent, ours is
deterministic and LOGGED):
  1. bucket sizes via groupBy().count() — cheap, map-side partial agg;
  2. hot buckets (size > bucket_cap) broadcast back to the exploded rows;
  3. salt-sample hot buckets map-side: keep members with
     pmod(salt, n_groups) == 0, n_groups = ceil(size / cap) — so the
     expensive collect_list reducer never sees more than ~cap rows for a
     hot bucket (prevents the 10M-member boilerplate bucket from creating
     a straggler/OOM at 10^12-turn scale);
  4. final deterministic cap: sorted members truncated to bucket_cap.
The same rule runs in the oracle (same id_hash kernel), so engine and
oracle candidate sets stay identical. Dropped-membership counts surface in
the metrics table — no silent caps. ``bucket_members`` is THE shared bucket
implementation: the transcript pipeline, the documents MinHash-LSH path,
and the documents SimHash path all route through it.

Pair generation is entirely JVM (transform/slice/flatten over the sorted
member array): bucket of m members -> C(m,2) struct rows, m <= bucket_cap.

Scale: one shuffle keyed by (band_idx, band_hash) — high cardinality, near
uniform after hot-bucket salting; AQE coalesces small reduces. Output pairs
are aggregated by (a, b) with a map-side combine (n_bands evidence counter,
the A2 early-abort analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupConfig


def band_explode(
    sig: DataFrame, cfg: DedupConfig, band_range: tuple[int, int] | None = None
) -> DataFrame:
    """signatures -> (id_hash, band_idx, band_hash); docs below the
    shingle floor (empty shingle set) take the exact-hash path only, exactly
    like the reference's trailing-block handling
    (/root/reference/rabin/rabin_dedup.c:717-757).

    band_range=(lo, hi) explodes only bands lo..hi-1 — the knob for running
    banding as several sequential passes when the full
    n_convs x bands exploded shuffle must be bounded in-flight at extreme
    scale (buckets are independent across bands, so pass-splitting is
    semantics-preserving: union the per-pass pairs and sum n_bands)."""
    lo, hi = band_range if band_range is not None else (0, cfg.bands)
    if not (0 <= lo < hi <= cfg.bands):
        raise ValueError(f"band_range {band_range} outside [0, {cfg.bands})")
    r = cfg.rows
    # n_tokens >= k  <=>  non-empty shingle set (shingle count per doc is
    # max(n_tokens - (k-1), 0) before distinct; kernels.shingle_hashes_flat).
    # Filtering on the scalar lets Parquet prune the wide array columns
    # from this stage's scan entirely.
    base = sig.where(F.col("n_tokens") >= cfg.shingle_k)
    # Prefer the precomputed band_hashes column (compute_signatures writes
    # it): the scan reads bands x 8 B per row instead of decoding the
    # num_perm-long minhash array and re-hashing — and this stage scans the
    # signature table twice (sizes + salted membership). posexplode the
    # stored array DIRECTLY (pos IS the band index) instead of building an
    # intermediate transform(sequence -> struct) array per row: one fewer
    # per-row array materialization in the hottest generator of the run.
    # Fallback computes the identical xxhash64-over-slice expression from
    # minhash (streaming batches and ad-hoc frames without the column).
    if "band_hashes" in sig.columns:
        arr = (F.col("band_hashes") if (lo, hi) == (0, cfg.bands)
               else F.slice("band_hashes", lo + 1, hi - lo))
        return (
            base.select(
                "id_hash",
                F.posexplode(arr).alias("band_pos", "band_hash"),
            )
            .select(
                "id_hash",
                (F.col("band_pos") + F.lit(lo)).cast("int").alias("band_idx"),
                "band_hash",
            )
        )
    band_expr = (
        f"transform(sequence({lo}, {hi - 1}), b -> "
        f"struct(b as band_idx, "
        f"xxhash64(b, slice(minhash, b * {r} + 1, {r})) as band_hash))"
    )
    return (
        base.select("id_hash", F.explode(F.expr(band_expr)).alias("band"))
        .select("id_hash", "band.band_idx", "band.band_hash")
    )


def bucket_members(
    banded: DataFrame,
    cfg: DedupConfig,
    id_col: str = "id_hash",
    salt_col: str | None = None,
    persist_sizes: bool = True,
    min_size: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """-> (buckets, bucket_stats). THE shared salted/capped/logged bucket
    implementation (see module docstring).

    banded: (id_col, [salt_col,] band_idx, band_hash) exploded rows.
    buckets: (band_idx, band_hash, ids sorted-by-id_col array <= bucket_cap)
    bucket_stats: per-bucket raw size / kept size for the metrics table.

    id_col is the member identity collected into buckets (long id_hash for
    transcripts, doc_id for document tables); salt_col (default id_col) is
    the 64-bit hash used for deterministic hot-bucket sampling.

    persist_sizes: cache the bucket-size frame, which the batch pipeline
    consumes twice (hot-bucket broadcast + stats collect). Pass False from
    repeated callers that ignore stats (e.g. the per-micro-batch streaming
    path) — Spark's cache holds strong references, so per-batch persists
    would accumulate for the life of a stream.

    min_size: self-join callers keep the default 2 (a singleton bucket
    can't pair); BIPARTITE probes (a foreign key set probing these
    buckets, e.g. the benchmark probe index) pass 1 — a single-member
    bucket is still a valid probe target.
    """
    salt_col = salt_col or id_col
    sizes = banded.groupBy("band_idx", "band_hash").agg(
        F.count(F.lit(1)).alias("raw_size")
    )
    if persist_sizes:
        sizes = sizes.persist()
    hot = sizes.where(F.col("raw_size") > cfg.bucket_cap)
    salted = (
        banded.join(F.broadcast(hot), ["band_idx", "band_hash"], "left")
        .where(
            F.col("raw_size").isNull()
            | (
                F.pmod(
                    F.col(salt_col),
                    F.ceil(F.col("raw_size") / F.lit(cfg.bucket_cap)).cast("long"),
                )
                == 0
            )
        )
        .drop("raw_size")
    )
    buckets = (
        salted.groupBy("band_idx", "band_hash")
        .agg(F.slice(F.sort_array(F.collect_list(id_col)), 1, cfg.bucket_cap).alias("ids"))
        .where(F.size("ids") >= int(min_size))
    )
    stats = sizes.select(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.when(F.col("raw_size") > cfg.hot_bucket_threshold, 1).otherwise(0)).alias("n_hot_buckets"),
        F.sum(F.when(F.col("raw_size") > cfg.bucket_cap, F.col("raw_size")).otherwise(0)).alias("hot_member_rows"),
        F.max("raw_size").alias("max_bucket_size"),
    )
    return buckets, stats


def bucket_pairs(buckets: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Explode each bucket's sorted member array into C(m,2) (a, b) pairs
    with a < b — entirely JVM (transform/slice/flatten)."""
    return buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (x, i) -> "
                "transform(slice(ids, i + 2, size(ids)), y -> "
                f"struct(x as {a_col}, y as {b_col}))))"
            )
        ).alias("p")
    ).select(f"p.{a_col}", f"p.{b_col}")


def candidate_pairs(
    sig: DataFrame,
    cfg: DedupConfig,
    persist_sizes: bool = True,
    band_range: tuple[int, int] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """signatures -> ((ih_a, ih_b, n_bands) with ih_a < ih_b signed, stats).
    Long keys only — conv_ids are resolved at verify time. band_range
    restricts to one banding pass (see band_explode; the planner splits
    passes when rows x bands would exceed the in-flight budget)."""
    banded = band_explode(sig, cfg, band_range=band_range)
    buckets, stats = bucket_members(banded, cfg, persist_sizes=persist_sizes)
    pairs = bucket_pairs(buckets, "ih_a", "ih_b")
    agg = pairs.groupBy("ih_a", "ih_b").agg(
        F.count(F.lit(1)).cast("int").alias("n_bands")
    )
    return agg, stats


def simhash_band_expr(col: str = "simhash", n_segs: int = 8,
                      seg_bits: int = 8) -> F.Column:
    """Array of C(n_segs,2) (band_idx, band_hash) structs from a 64-bit
    SimHash column — the segment-PAIR multi-index shared by the document
    and transcript SimHash channels (functions/doc_dedup.simhash_pairs,
    simhash_candidate_pairs). 16-bit pair keys give a 65536-value keyspace
    per band; pigeonhole guarantees recall for hamming <= n_segs - 2.
    Arithmetic shiftright is safe under the & mask."""
    seg_pairs = [(i, j) for i in range(n_segs) for j in range(i + 1, n_segs)]
    mask = (1 << seg_bits) - 1
    return F.array(*[
        F.struct(
            F.lit(p).alias("band_idx"),
            (
                (F.shiftright(col, i * seg_bits).bitwiseAND(F.lit(mask))
                 * F.lit(1 << seg_bits))
                + F.shiftright(col, j * seg_bits).bitwiseAND(F.lit(mask))
            ).cast("long").alias("band_hash"),
        )
        for p, (i, j) in enumerate(seg_pairs)
    ])


def simhash_candidate_pairs(
    sig: DataFrame, cfg: DedupConfig, max_hamming: int = 6
) -> DataFrame:
    """SimHash similarity self-join for TRANSCRIPTS (J2 on the primary
    axis, reference per-block similarity_hash probe
    /root/reference/rabin/rabin_dedup.c:684-706, 1469-1489) over the
    pipeline signatures table (conv_id, id_hash, simhash):
    (conv_id_a, conv_id_b, hamming) with conv_id_a < conv_id_b.

    Scale shape mirrors the MinHash path exactly: bands ride the 64-bit
    id_hash through the shared salted/capped/logged bucket_members (member
    AND salt = id_hash, like candidate_pairs), pairs explode JVM-side, and
    conv_ids resolve only at verify time. Empty docs carry the sentinel
    fingerprint and pair among themselves — identical in the oracle."""
    n_segs = 8
    if max_hamming > n_segs - 2:
        raise ValueError(
            f"segment-pair multi-index guarantees recall only for "
            f"max_hamming <= {n_segs - 2}; got {max_hamming}"
        )
    base = sig.select("conv_id", "id_hash", "simhash")
    banded = base.select(
        F.col("id_hash").alias("mem"),
        F.explode(simhash_band_expr("simhash", n_segs)).alias("band"),
    ).select("mem", "band.band_idx", "band.band_hash")
    buckets, _stats = bucket_members(
        banded, cfg, id_col="mem", persist_sizes=False
    )
    cand = bucket_pairs(buckets, "ih_a", "ih_b").distinct()
    a = base.select(F.col("id_hash").alias("ih_a"),
                    F.col("conv_id").alias("ca"),
                    F.col("simhash").alias("sh_a"))
    b = base.select(F.col("id_hash").alias("ih_b"),
                    F.col("conv_id").alias("cb"),
                    F.col("simhash").alias("sh_b"))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long")
    return (
        cand.join(a, "ih_a").join(b, "ih_b")
        .select(
            F.least("ca", "cb").alias("conv_id_a"),
            F.greatest("ca", "cb").alias("conv_id_b"),
            ham.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )
