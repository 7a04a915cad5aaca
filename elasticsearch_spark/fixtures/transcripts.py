"""Deterministic synthetic transcript corpus (FIXTURES.md F1/F2).

Shape per BASELINE.json input_hint:
  (conv_id string, turn_idx int32, role string, text string, tool string,
   ts timestamp)

numpy-vectorized generation (seed-stable): Zipf turn counts for conversation
skew, Zipf vocabulary for term-frequency skew, seeded injections of hot terms
(WAND/skew exercise), rare terms (df=1), tokenizer-hazard strings, and 1%
late-duplicate keys (keep-latest dedup exercise — the reference's versionMap
analog, index/engine/internal/LiveVersionMap.java).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_ROLES = np.array(["user", "assistant", "system", "tool"])
_ROLE_W = np.array([0.40, 0.40, 0.05, 0.15])
_TOOLS = np.array(["bash", "search", "editor", "browser"])

HOT_TERMS = ["error", "timeout", "retry"]
RARE_PREFIX = "rareterm"
HAZARD_SNIPPETS = [
    "don't panic",
    "C++ and a_b-c",
    "visit http://example.com/x?y=1 now",
    "pi 3.14 and 1,000 units",
    "naïve café résumé",
    "漢字 テスト",
    "email user@example.com today",
    "O'Neil's l'avion",
]


def _vocab(n: int = 5000) -> np.ndarray:
    return np.array([f"tok{i:04d}" for i in range(n)])


def generate_transcripts(
    n_convs: int = 100,
    seed: int = 42,
    base_ts: str = "2025-01-01",
) -> pd.DataFrame:
    """Deterministic transcript table. ~20x n_convs turns."""
    rng = np.random.default_rng(seed)
    vocab = _vocab()

    # Zipf-ish turn counts in [1, 64]
    n_turns = np.minimum(1 + rng.zipf(1.4, size=n_convs), 64)
    conv_ids = np.repeat([f"conv-{i:06d}" for i in range(n_convs)], n_turns)
    turn_idx = np.concatenate([np.arange(n, dtype=np.int32) for n in n_turns])
    n_rows = len(conv_ids)

    roles = rng.choice(_ROLES, size=n_rows, p=_ROLE_W)
    tool_mask = rng.random(n_rows) < 0.30
    tools = np.where(tool_mask, rng.choice(_TOOLS, size=n_rows), None)

    # token soup: Zipf-distributed draws from vocab, 5..200 tokens per turn
    lens = rng.integers(5, 201, size=n_rows)
    total = int(lens.sum())
    draws = np.minimum(rng.zipf(1.25, size=total) - 1, len(vocab) - 1)
    words = vocab[draws]
    bounds = np.cumsum(lens)[:-1]
    texts = [" ".join(chunk) for chunk in np.split(words, bounds)]

    # seeded injections
    hot_rows = rng.random(n_rows) < 0.35
    for i in np.flatnonzero(hot_rows):
        texts[i] = texts[i] + " " + HOT_TERMS[i % len(HOT_TERMS)]
    rare_rows = rng.choice(n_rows, size=min(20, n_rows), replace=False)
    for j, i in enumerate(sorted(rare_rows)):
        texts[i] = texts[i] + f" {RARE_PREFIX}{j:03d}"
    hazard_rows = rng.choice(n_rows, size=min(len(HAZARD_SNIPPETS), n_rows), replace=False)
    for j, i in enumerate(sorted(hazard_rows)):
        texts[i] = texts[i] + " " + HAZARD_SNIPPETS[j % len(HAZARD_SNIPPETS)]
    # score ties: identical texts in different conversations
    if n_rows >= 8:
        tie_text = "tiebreak alpha beta gamma"
        for i in (0, n_rows // 2, n_rows - 1):
            texts[i] = tie_text

    ts = pd.Timestamp(base_ts).value + (
        np.arange(n_rows, dtype=np.int64) * 61_000_000_000
    )
    df = pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx,
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": pd.to_datetime(ts),
        }
    )

    # 1% late duplicates: same (conv_id, turn_idx), later ts, marker text —
    # keep-latest dedup must retain these rows.
    n_dups = max(1, n_rows // 100)
    dup_idx = rng.choice(n_rows, size=n_dups, replace=False)
    dups = df.iloc[dup_idx].copy()
    dups["text"] = dups["text"] + " latedup"
    dups["ts"] = dups["ts"] + pd.Timedelta(hours=1)
    out = pd.concat([df, dups], ignore_index=True)
    # shuffle row order deterministically (arrival order != key order)
    out = out.sample(frac=1.0, random_state=seed).reset_index(drop=True)
    out["turn_idx"] = out["turn_idx"].astype("int32")
    return out


def reference_query_set() -> list[dict]:
    """F2 reference query corpus — ≥50 queries over vocabulary strata."""
    qs: list[dict] = []

    def add(kind, text, **kw):
        qs.append({"query_id": f"q-{len(qs):03d}", "kind": kind, "query_text": text, **kw})

    # single terms: hot / medium / rare / absent
    for t in HOT_TERMS:
        add("term", t)
    for t in ["tok0000", "tok0001", "tok0010", "tok0100", "tok0500", "tok1000", "tok2500"]:
        add("term", t)
    add("term", f"{RARE_PREFIX}000")
    add("term", f"{RARE_PREFIX}007")
    add("term", "zzz_absent_term")
    # OR of 2-4 terms
    add("match_or", "error timeout")
    add("match_or", "tok0001 tok0002 tok0003")
    add("match_or", "error tok0500 rareterm001")
    add("match_or", "retry timeout error tok0000")
    add("match_or", "tok0040 tok0041 tok0042 tok0043")
    add("match_or", "don't panic")
    add("match_or", "3.14 1,000")
    add("match_or", "漢字 テスト")
    add("match_or", "zzz_absent_term tok0005")
    add("match_or", "tiebreak alpha")
    # AND of 2-3 terms
    add("match_and", "error timeout", operator="and")
    add("match_and", "tok0000 tok0001", operator="and")
    add("match_and", "tok0002 tok0005 tok0011", operator="and")
    add("match_and", "error zzz_absent_term", operator="and")
    add("match_and", "alpha beta gamma", operator="and")
    # minimum_should_match = 2
    add("match_msm2", "error timeout retry", minimum_should_match=2)
    add("match_msm2", "tok0003 tok0007 tok0019 tok0031", minimum_should_match=2)
    # all-hot (WAND stress)
    add("match_or", "error timeout retry")
    # filtered
    add("bool_filtered", "error timeout", filters={"role": "assistant"})
    add("bool_filtered", "tok0001 tok0004", filters={"role": "user"})
    add("bool_filtered", "retry", filters={"tool": "bash"})
    add("bool_filtered", "error", filters={"role": "assistant", "tool": "search"})
    add("bool_filtered", "tok0000", filters={"ts_min": "2025-01-01T00:00:00"})
    # k edge cases
    add("term", "error", k=1)
    add("term", "tok0000", k=100)
    add("match_or", "tok0123 tok0456", k=1)
    add("match_or", "timeout retry", k=100)
    # more medium-frequency singles to pass 50
    for t in ["tok0015", "tok0031", "tok0063", "tok0127", "tok0255", "tok0511",
              "tok1023", "tok2047", "tok3000", "tok4000", "tok4999", "latedup",
              "tok0008", "tok0009"]:
        add("term", t)
    for q in qs:
        q.setdefault("k", 10)
        q.setdefault("operator", "and" if q["kind"] == "match_and" else "or")
        q.setdefault("minimum_should_match", 1)
        q.setdefault("filters", {})
    return qs
