"""Pure pandas/numpy reference implementation ("the oracle").

Plays the role of the reference repo's round-trip `diff` oracle
(/root/reference/test/t1.tst:22-41): an independent, single-process
implementation of the *same* pipeline semantics the Spark engine must match
with dup-pair recall >= 0.99 (BASELINE.json north_rule).

It imports the very same signature kernels (kernels.py) the engine's Arrow
UDFs use, so "same shingle/signature config" is literal; only orchestration
differs: dict-based LSH buckets instead of a shuffle, brute-force pair
verification, union-find connected components instead of iterative joins.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass

import numpy as np
import pandas as pd

from .config import DedupConfig
from .kernels import hash_tokens, jaccard_sorted, signatures_for_texts


@dataclass
class OracleResult:
    signatures: pd.DataFrame    # conv_id, n_turns, n_tokens, content_hash, ...
    candidates: pd.DataFrame    # conv_id_a, conv_id_b (a<b), n_bands
    pairs: pd.DataFrame         # verified: conv_id_a, conv_id_b, jaccard, match_kind
    clusters: pd.DataFrame      # conv_id, cluster_id
    substring_pairs: pd.DataFrame  # conv_id_a, conv_id_b, n_windows


def assemble(transcripts: pd.DataFrame) -> pd.DataFrame:
    """Stable-turn-order assembly: one row per conv_id with doc_text =
    turn texts joined by '\\n' in turn_idx order. Must match the engine's
    assemble stage byte-for-byte (input_hint invariant)."""
    t = transcripts.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    g = t.groupby("conv_id", sort=True)
    return pd.DataFrame(
        {
            "conv_id": list(g.groups.keys()),
            "n_turns": g.size().values,
            "doc_text": g["text"].apply(lambda s: "\n".join(x if x is not None else "" for x in s)).values,
        }
    )


def signatures(assembled: pd.DataFrame, cfg: DedupConfig) -> pd.DataFrame:
    sig = signatures_for_texts(assembled["doc_text"], cfg)
    sig.insert(0, "conv_id", assembled["conv_id"].values)
    sig.insert(
        1,
        "id_hash",
        hash_tokens(assembled["conv_id"].to_numpy(dtype=np.str_), None).view(np.int64),
    )
    sig.insert(2, "n_turns", assembled["n_turns"].values)
    return sig


def lsh_candidates(sig: pd.DataFrame, cfg: DedupConfig) -> pd.DataFrame:
    """Bucket by (band_idx, tuple of r minhash values); emit all in-bucket
    pairs. Bucket membership depends only on equality of the minhash slice,
    so any injective-enough band hash in the engine yields the same buckets.

    Bucket members are sorted and capped by the signed 64-bit id_hash —
    the engine's long-key shuffle order (operators/candidates.py) — and the
    emitted pairs are then normalized to lexicographic conv_id order, which
    is how the engine's verify stage publishes them."""
    buckets: dict[tuple, list[tuple[str, int]]] = {}
    ids = sig["conv_id"].tolist()
    id_hashes = sig["id_hash"].tolist()
    mhs = sig["minhash"].tolist()
    has_sh = [len(s) > 0 for s in sig["shingles"]]
    for cid, ih, mh, nonempty in zip(ids, id_hashes, mhs, has_sh):
        if not nonempty:
            continue  # below shingle floor: exact-hash path only
        mh = np.asarray(mh)
        for b in range(cfg.bands):
            key = (b, tuple(mh[b * cfg.rows : (b + 1) * cfg.rows]))
            buckets.setdefault(key, []).append((cid, int(ih)))
    counts: dict[tuple[str, str], int] = {}
    for key, members in buckets.items():
        # hot-bucket salting, same rule as the engine (candidates.py):
        # keep id_hash % ceil(m/cap) == 0, then id_hash-sorted cap.
        m = len(members)
        if m > cfg.bucket_cap:
            n_groups = -(-m // cfg.bucket_cap)
            members = [(c, h) for c, h in members if h % n_groups == 0]
        kept = sorted(members, key=lambda ch: ch[1])[: cfg.bucket_cap]
        for (ca, _), (cb, _) in itertools.combinations(kept, 2):
            pair = (ca, cb) if ca < cb else (cb, ca)
            counts[pair] = counts.get(pair, 0) + 1
    if not counts:
        return pd.DataFrame(columns=["conv_id_a", "conv_id_b", "n_bands"])
    out = pd.DataFrame(
        [(a, b, n) for (a, b), n in counts.items()],
        columns=["conv_id_a", "conv_id_b", "n_bands"],
    )
    return out.sort_values(["conv_id_a", "conv_id_b"]).reset_index(drop=True)


def verify(sig: pd.DataFrame, candidates: pd.DataFrame, cfg: DedupConfig) -> pd.DataFrame:
    """Near pairs: exact shingle-set Jaccard >= threshold on each LSH
    candidate (pairs with identical content hash are excluded — they are
    covered completely by the exact path). Exact pairs: star edges
    (min_conv_id -> other) per content_hash group, independent of LSH —
    mirrors the reference's crypto-hash exact path
    (/root/reference/rabin/global/index.c:485-558) and matches the engine's
    scalable star construction (operators/verify.py) pair-for-pair."""
    by_id = sig.set_index("conv_id")
    recs = []
    for a, b in zip(candidates["conv_id_a"], candidates["conv_id_b"]):
        if by_id.at[a, "content_hash"] == by_id.at[b, "content_hash"]:
            continue
        # est-Jaccard prefilter (A2 early-abort) is part of the judged
        # config: the engine (operators/verify.py) and the DuckDB twin
        # (oracle_queries nmatch/num_perm) apply the same cut, so the
        # oracle must too — all three implementations agree on which
        # candidates reach the exact verify
        mha = np.asarray(by_id.at[a, "minhash"], dtype=np.int64)
        mhb = np.asarray(by_id.at[b, "minhash"], dtype=np.int64)
        if (mha == mhb).sum() / cfg.num_perm < cfg.minhash_prefilter:
            continue
        sa = np.asarray(by_id.at[a, "shingles"], dtype=np.int64)
        sb = np.asarray(by_id.at[b, "shingles"], dtype=np.int64)
        jac = jaccard_sorted(sa, sb)
        if jac >= cfg.jaccard_threshold:
            recs.append((a, b, jac, "near"))
    for _, grp in sig.groupby("content_hash"):
        if len(grp) > 1:
            ids = sorted(grp["conv_id"])
            rep = ids[0]
            recs.extend((rep, other, 1.0, "exact") for other in ids[1:])
    out = pd.DataFrame(recs, columns=["conv_id_a", "conv_id_b", "jaccard", "match_kind"])
    return out.sort_values(["conv_id_a", "conv_id_b"]).reset_index(drop=True)


def substring_pairs(
    sig: pd.DataFrame, cfg: DedupConfig, verified: pd.DataFrame | None = None
) -> pd.DataFrame:
    """Pairs sharing >= substring_min_windows window fingerprints (long exact
    run detector; bsdiff/qsufsort analog). Pairs already verified exact/near
    are excluded (matches engine operators/substring.py)."""
    if not cfg.substring_enabled or "win_hashes" not in sig.columns:
        return pd.DataFrame(columns=["conv_id_a", "conv_id_b", "n_windows"])
    buckets: dict[int, list[tuple[str, int]]] = {}
    for cid, ih, whs in zip(sig["conv_id"], sig["id_hash"], sig["win_hashes"]):
        for h in set(int(x) for x in whs):
            buckets.setdefault(h, []).append((cid, int(ih)))
    counts: dict[tuple[str, str], int] = {}
    for members in buckets.values():
        # same salted/capped rule as the LSH buckets (shared engine path:
        # operators/substring.py -> candidates.bucket_members): hot buckets
        # keep id_hash % ceil(m/cap) == 0, then signed-id_hash-sorted cap.
        m = len(members)
        if m > cfg.bucket_cap:
            n_groups = -(-m // cfg.bucket_cap)
            members = [(c, h) for c, h in members if h % n_groups == 0]
        kept = sorted(members, key=lambda ch: ch[1])[: cfg.bucket_cap]
        for (ca, _), (cb, _) in itertools.combinations(kept, 2):
            pair = (ca, cb) if ca < cb else (cb, ca)
            counts[pair] = counts.get(pair, 0) + 1
    skip = (
        set(zip(verified["conv_id_a"], verified["conv_id_b"]))
        if verified is not None
        else set()
    )
    recs = [
        (a, b, n)
        for (a, b), n in counts.items()
        if n >= cfg.substring_min_windows and (a, b) not in skip
    ]
    out = pd.DataFrame(recs, columns=["conv_id_a", "conv_id_b", "n_windows"])
    return out.sort_values(["conv_id_a", "conv_id_b"]).reset_index(drop=True)


def cluster(sig: pd.DataFrame, pairs: pd.DataFrame) -> pd.DataFrame:
    """Union-find transitive closure; representative = lexicographic min
    conv_id (the reference's deterministic first-occurrence-wins,
    /root/reference/rabin/rabin_dedup.c:1466-1467)."""
    parent: dict[str, str] = {c: c for c in sig["conv_id"]}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["conv_id_a"], pairs["conv_id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted([ra, rb])
            parent[hi] = lo
    out = pd.DataFrame(
        {"conv_id": sorted(parent), "cluster_id": [find(c) for c in sorted(parent)]}
    )
    return out


def run(transcripts: pd.DataFrame, cfg: DedupConfig | None = None) -> OracleResult:
    cfg = cfg or DedupConfig()
    asm = assemble(transcripts)
    sig = signatures(asm, cfg)
    cand = lsh_candidates(sig, cfg)
    pairs = verify(sig, cand, cfg)
    clus = cluster(sig, pairs)
    sub = substring_pairs(sig, cfg, verified=pairs)
    return OracleResult(sig, cand, pairs, clus, sub)


def pair_recall(engine_pairs: set[tuple[str, str]],
                truth_pairs: pd.DataFrame,
                families: tuple[str, ...] = ("exact", "near_high")) -> float:
    """|engine ∩ truth| / |truth| over the given families."""
    want = {
        (a, b)
        for a, b, f in zip(truth_pairs["conv_id_a"], truth_pairs["conv_id_b"],
                           truth_pairs["family"])
        if f in families
    }
    if not want:
        return 1.0
    return len(want & engine_pairs) / len(want)


def cluster_pairs(clusters: pd.DataFrame) -> set[tuple[str, str]]:
    """All unordered same-cluster pairs implied by a cluster assignment."""
    out: set[tuple[str, str]] = set()
    for _, grp in clusters.groupby("cluster_id"):
        ids = sorted(grp["conv_id"])
        if len(ids) > 1:
            out.update(itertools.combinations(ids, 2))
    return out
