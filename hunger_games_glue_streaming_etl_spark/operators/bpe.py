"""Real BPE tokenizer: merge-table-driven encode (VERDICT r5 #8 — the
upgrade path from the ``text_bpe_token_estimate`` heuristic).

Algorithm = canonical BPE encode (the GPT-2 ``bpe()`` loop, public spec):
start from single-character tokens, then repeatedly (a) find the
lowest-rank merge pair PRESENT in the token sequence, (b) merge ALL its
non-overlapping occurrences left-to-right, (c) rescan — until no table
pair is present.  The vocab is a PLANTED deterministic merge table
(``_MERGES``): the operator's value is the exact replayable semantics,
not lexicon quality; production swaps the table for a learned one.

Replayability across engines is the design constraint, and it fixes the
representation: the token sequence is a single string with DOUBLE-space
separators (``'  a  b  c  '``).  With 2-space separators a pair pattern
``' l  r '`` keeps 1-space margins, so adjacent occurrences of the same
pair never share characters and one non-overlapping left-to-right
``replace`` (same semantics in Python ``str.replace`` and DuckDB
``replace``) IS the canonical merge-all step.  Every merge pair has
``left != right``, which guarantees occurrences of a pair are disjoint
(overlap needs ``left == right``), so "merge all simultaneously" is
well-defined.  The iteration cap (64) is shared by both engines; tokens
only ever concatenate, so each pass strictly shrinks the sequence and the
cap never binds on <=48-char inputs.

At 100 TB: encode is a pure per-document projection — Arrow-batched
``mapInPandas``, no shuffle, the text column pruned away by downstream
consumers.  A learned-vocab variant distributes the same way (the merge
table is a driver-side broadcastable constant, like the ANN codebooks).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Planted merge table in rank order (rank = index).  Constraints the
# cross-engine replay relies on: left != right for every pair, and no two
# pairs concatenate to the same product (so no token is created twice).
_MERGES: list[tuple[str, str]] = [
    ("t", "h"),
    ("th", "e"),
    ("t", "a"),
    ("ta", "b"),
    ("tab", "l"),
    ("tabl", "e"),
    ("v", "a"),
    ("va", "l"),
    ("val", "u"),
    ("valu", "e"),
    ("f", "a"),
    ("fa", "s"),
    ("fas", "t"),
    ("d", "a"),
    ("da", "t"),
    ("dat", "a"),
    ("s", "c"),
    ("sc", "a"),
    ("sca", "n"),
    ("r", "o"),
    ("ro", "w"),
    ("p", "a"),
    ("pa", "r"),
    ("par", "t"),
    ("w", "i"),
    ("wi", "n"),
    ("win", "d"),
    ("wind", "o"),
    ("windo", "w"),
    ("j", "o"),
    ("jo", "i"),
    ("joi", "n"),
]

_MAX_ROUNDS = 64
_MAX_CHARS = 48
_NO_PAIR = 9999


def _check_merges() -> None:
    products = [l + r for l, r in _MERGES]
    assert all(l != r for l, r in _MERGES), "BPE replay needs left != right"
    assert len(set(products)) == len(products), "duplicate merge products"


_check_merges()


def clean_text(text: str) -> str:
    """Shared normalization: lowercase, [a-z ] only, collapsed/trimmed
    whitespace, spaces marked as '_' tokens, first _MAX_CHARS chars."""
    c = re.sub(r"[^a-z ]", "", (text or "").lower())
    c = re.sub(r" +", " ", c).strip().replace(" ", "_")
    return c[:_MAX_CHARS]


def encode(text: str) -> list[str]:
    """Canonical BPE encode against _MERGES; returns the token list."""
    s = "  " + "  ".join(clean_text(text)) + "  "
    for _ in range(_MAX_ROUNDS):
        best = None
        for rank, (left, right) in enumerate(_MERGES):
            if f" {left}  {right} " in s:
                best = rank
                break  # _MERGES is rank-ordered: first present == min rank
        if best is None:
            break
        left, right = _MERGES[best]
        s = s.replace(f" {left}  {right} ", f" {left}{right} ")
    stripped = s.strip()
    return stripped.split("  ") if stripped else []


def bpe_encode_frame(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text) -> (doc_id, n_tokens, token_str): Arrow-batched
    per-document BPE encode.  token_str is the single-space-joined token
    sequence (bounded at _MAX_CHARS source chars, so it never bloats a
    row); n_tokens is the real token count the budget/packing stages
    want from a tokenizer."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("token_str", T.StringType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            toks = [encode(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_tokens": pd.Series(
                        [max(len(t), 1) for t in toks], dtype="int64"
                    ),
                    "token_str": [" ".join(t) for t in toks],
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(run, schema)


def oracle_sql() -> str:
    """DuckDB replay of the SAME algorithm as a recursive CTE, generated
    from the SAME merge table so the two engines cannot diverge: each
    recursion step computes the min rank present (LEAST over per-pair
    containment) and applies that pair's merge-all replace."""
    best = "LEAST(" + ", ".join(
        f"CASE WHEN contains(s, ' {l}  {r} ') THEN {i} ELSE {_NO_PAIR} END"
        for i, (l, r) in enumerate(_MERGES)
    ) + ")"
    branches = " ".join(
        f"WHEN {i} THEN replace(s, ' {l}  {r} ', ' {l}{r} ')"
        for i, (l, r) in enumerate(_MERGES)
    )
    return f"""
    WITH RECURSIVE d0 AS (
        SELECT doc_id,
               '  ' || regexp_replace(
                   substr(replace(trim(regexp_replace(
                       regexp_replace(lower(text), '[^a-z ]', '', 'g'),
                       ' +', ' ', 'g')), ' ', '_'), 1, {_MAX_CHARS}),
                   '(.)', '\\1  ', 'g') AS s
        FROM documents
    ),
    step(doc_id, s, it) AS (
        SELECT doc_id, s, 0 FROM d0
        UNION ALL
        SELECT doc_id, CASE {best} {branches} ELSE s END AS s, it + 1
        FROM step
        WHERE {best} < {_NO_PAIR} AND it < {_MAX_ROUNDS}
    ),
    fin AS (SELECT doc_id, max_by(s, it) AS s FROM step GROUP BY doc_id)
    SELECT doc_id,
           CAST(GREATEST(len(string_split(trim(s), '  ')), 1) AS BIGINT)
               AS n_tokens,
           replace(trim(s), '  ', ' ') AS token_str
    FROM fin
    """
