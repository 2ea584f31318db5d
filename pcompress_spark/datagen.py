"""Deterministic synthetic transcript generator + ground-truth tables.

Mirrors the reference's test-corpus construction, which plants guaranteed
duplicate content (`comb_d.dat` = the same data concatenated twice,
/root/reference/test/run_test.sh:17-28). Families per FIXTURES.md §2:
exact / near_high / near_mid / substring / distinct / hot_bucket / tiny.

Everything derives from one numpy PCG64 seed — no wall clock, no external
data. Output is plain pandas/pyarrow (usable without a SparkSession); rows
are emitted in a deterministic shuffle so tests exercise the stable-ordering
assemble stage rather than insertion order.

Schema (BASELINE.json input_hint):
  conv_id:string, turn_idx:int32, role:string, text:string,
  tool:string(nullable), ts:timestamp
"""

from __future__ import annotations

import itertools
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd

_ROLES = ["user", "assistant", "tool", "system"]
_TOOLS = ["search", "bash", "python", "browser", "editor", None, None]
_EPOCH = pd.Timestamp("2026-01-01T00:00:00")


def _vocab(rng: np.random.Generator, size: int = 2000) -> np.ndarray:
    syll = np.array(
        ["ka", "ro", "mi", "ta", "zen", "lor", "vex", "dun", "pol", "qua",
         "sil", "mar", "ten", "bro", "fix", "gal", "hem", "jin", "kul", "nor"]
    )
    n_syll = rng.integers(2, 5, size=size)
    words = ["".join(rng.choice(syll, k)) + str(i % 97) for i, k in enumerate(n_syll)]
    return np.array(words)


@dataclass
class GenResult:
    transcripts: pd.DataFrame
    truth_pairs: pd.DataFrame      # conv_id_a < conv_id_b, family, edit_frac
    truth_clusters: pd.DataFrame   # conv_id, cluster_id (min conv_id of component)


def _make_turns(rng: np.random.Generator, vocab: np.ndarray, n_turns: int) -> list[dict]:
    turns = []
    for t in range(n_turns):
        role = _ROLES[t % len(_ROLES)] if t > 0 else "user"
        n_tok = int(rng.integers(5, 120))
        words = rng.choice(vocab, n_tok)
        tool = None
        if role == "tool":
            tool = str(rng.choice([x for x in _TOOLS if x]))
            text = f"call {tool} args " + " ".join(words)
        else:
            text = " ".join(words)
        turns.append({"turn_idx": t, "role": role, "text": text, "tool": tool})
    return turns


def _edit_turns(
    rng: np.random.Generator, vocab: np.ndarray, turns: list[dict], frac: float,
    drop_append: bool = False,
) -> list[dict]:
    """Clone with ~frac of turns lightly edited (1-2 token substitutions)."""
    out = [dict(t) for t in turns]
    n_edit = max(1, int(round(frac * len(out))))
    idxs = rng.choice(len(out), size=min(n_edit, len(out)), replace=False)
    for i in idxs:
        words = out[i]["text"].split()
        for _ in range(int(rng.integers(1, 3))):
            if not words:
                break
            words[int(rng.integers(0, len(words)))] = str(rng.choice(vocab))
        out[i]["text"] = " ".join(words)
    if drop_append:
        if len(out) > 5 and rng.random() < 0.5:
            out = out[:-int(rng.integers(1, 3))]
        if rng.random() < 0.5:
            out.extend(_make_turns(rng, vocab, int(rng.integers(1, 3))))
        for t, turn in enumerate(out):
            turn["turn_idx"] = t
    return out


def generate(
    seed: int = 42,
    n_conv: int = 200,
    dup_frac: float = 0.30,
) -> GenResult:
    """Generate n_conv conversations; ~dup_frac of them belong to planted
    duplicate families. Deterministic in (seed, n_conv, dup_frac)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = _vocab(rng)

    n_dup_bases = max(2, int(n_conv * dup_frac / 2))
    n_hot = max(4, n_conv // 20)
    n_tiny = max(2, n_conv // 25)
    n_substr = max(2, n_conv // 25)
    n_base = n_conv - n_dup_bases - n_hot - n_tiny - n_substr  # distinct + bases

    conv_counter = itertools.count()

    def new_id() -> str:
        return f"conv-{next(conv_counter):08d}"

    rows: list[dict] = []
    pairs: list[tuple[str, str, str, float]] = []
    convs: dict[str, list[dict]] = {}

    def add_conv(cid: str, turns: list[dict]) -> None:
        convs[cid] = turns
        for turn in turns:
            rows.append({"conv_id": cid, **turn})

    # --- distinct base population (also donates clone bases) ---
    base_ids = []
    for _ in range(max(n_base, n_dup_bases + 2)):
        cid = new_id()
        add_conv(cid, _make_turns(rng, vocab, int(rng.integers(4, 40))))
        base_ids.append(cid)

    # --- duplicate families: exact / near_high / near_mid clones ---
    family_cycle = ["exact", "near_high", "near_mid"]
    donor_ids = list(rng.choice(base_ids, size=n_dup_bases, replace=False))
    for i, donor in enumerate(donor_ids):
        fam = family_cycle[i % 3]
        n_clones = 1 if rng.random() < 0.7 else 2
        members = [donor]
        for _ in range(n_clones):
            cid = new_id()
            if fam == "exact":
                clone = [dict(t) for t in convs[donor]]
                frac = 0.0
            elif fam == "near_high":
                frac = float(rng.uniform(0.02, 0.05))
                clone = _edit_turns(rng, vocab, convs[donor], frac)
            else:
                frac = float(rng.uniform(0.20, 0.40))
                clone = _edit_turns(rng, vocab, convs[donor], frac, drop_append=True)
            add_conv(cid, clone)
            members.append(cid)
        for a, b in itertools.combinations(sorted(members), 2):
            pairs.append((a, b, fam, 1.0 - frac))

    # --- substring family: long exact span embedded in otherwise-new conv ---
    for _ in range(n_substr):
        donor = str(rng.choice(base_ids))
        donor_turns = [t for t in convs[donor] if len(t["text"].split()) >= 30]
        if len(donor_turns) < 5:
            continue
        j = int(rng.integers(0, len(donor_turns) - 4))
        span = [dict(t) for t in donor_turns[j : j + 5]]  # >= 150 tokens verbatim
        cid = new_id()
        host = _make_turns(rng, vocab, int(rng.integers(6, 20)))
        ins = int(rng.integers(0, len(host)))
        merged = host[:ins] + span + host[ins:]
        for t, turn in enumerate(merged):
            turn["turn_idx"] = t
        add_conv(cid, merged)
        a, b = sorted([donor, cid])
        pairs.append((a, b, "substring", 0.0))

    # --- hot_bucket family: shared boilerplate preamble, rest distinct ---
    boiler = " ".join(rng.choice(vocab, 40))
    for _ in range(n_hot):
        cid = new_id()
        turns = _make_turns(rng, vocab, int(rng.integers(4, 12)))
        turns[0]["text"] = boiler
        add_conv(cid, turns)

    # --- tiny family: below shingle floor ---
    for _ in range(n_tiny):
        cid = new_id()
        turns = _make_turns(rng, vocab, int(rng.integers(1, 3)))
        for t in turns:
            t["text"] = " ".join(t["text"].split()[:3])
        add_conv(cid, turns)

    # --- assemble DataFrame with deterministic ts + row shuffle ---
    df = pd.DataFrame(rows)
    df["ts"] = (_EPOCH + pd.to_timedelta(
        rng.integers(0, 10**7, size=len(df)), unit="s"
    )).astype("datetime64[us]")  # microseconds: Spark can't scan TIMESTAMP(NANOS)
    perm = rng.permutation(len(df))
    df = df.iloc[perm].reset_index(drop=True)
    df = df.astype({"conv_id": "string", "turn_idx": "int32", "role": "string",
                    "text": "string", "tool": "string"})

    truth_pairs = pd.DataFrame(
        pairs, columns=["conv_id_a", "conv_id_b", "family", "sim_est"]
    ).sort_values(["conv_id_a", "conv_id_b"]).reset_index(drop=True)

    # transitive closure -> truth_clusters (min-id representative)
    parent: dict[str, str] = {c: c for c in convs}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, fam, _ in pairs:
        if fam == "substring":
            continue  # substring pairs are flagged, not clustered
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted([ra, rb])
            parent[hi] = lo
    truth_clusters = pd.DataFrame(
        {"conv_id": sorted(convs), "cluster_id": [find(c) for c in sorted(convs)]}
    )
    return GenResult(df, truth_pairs, truth_clusters)


def write_dataset(out_dir: str, seed: int = 42, n_conv: int = 200,
                  dup_frac: float = 0.30) -> GenResult:
    """Materialize transcripts + truth tables as parquet under out_dir."""
    os.makedirs(out_dir, exist_ok=True)
    res = generate(seed=seed, n_conv=n_conv, dup_frac=dup_frac)
    res.transcripts.to_parquet(os.path.join(out_dir, "transcripts.parquet"), index=False)
    res.truth_pairs.to_parquet(os.path.join(out_dir, "truth_pairs.parquet"), index=False)
    res.truth_clusters.to_parquet(os.path.join(out_dir, "truth_clusters.parquet"), index=False)
    return res


def ensure_dataset(out_dir: str, seed: int = 42, n_conv: int = 200,
                   dup_frac: float = 0.30) -> str:
    """Idempotent materialization (skips if transcripts.parquet exists)."""
    marker = os.path.join(out_dir, "transcripts.parquet")
    if not os.path.exists(marker):
        write_dataset(out_dir, seed=seed, n_conv=n_conv, dup_frac=dup_frac)
    return out_dir
