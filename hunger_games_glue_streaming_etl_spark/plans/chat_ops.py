"""SFT / chat-transcript data preparation — the instruction-tuning face of
the training-data tier: conversations arrive as JSON arrays of
``{"role", "content"}`` turns, and the pipeline must validate format
(role alternation, no empty messages), account tokens by role (assistant
turns are the trainable tokens; user turns are loss-masked), and gate
out malformed transcripts before packing.

The fixtures carry no chat data, so conversations are CONSTRUCTED
deterministically from ``documents`` (16-token turn contents, alternating
roles, ≤ 6 turns) with two planted corruption classes — a role swap
(breaks alternation) and an empty message — using the same
planted-violation pattern as the PII and DQ entries: both engines build
byte-identical JSON payloads, then AUDIT them through their own JSON
machinery (Spark ``from_json`` + higher-order functions; DuckDB
``json_extract``), and the verdicts must value-hash equal.  The corpus
text is plain space-separated words (verified: no quotes/backslashes/
newlines at any sf), so the constructed payloads are valid JSON by
construction.

Scale posture: everything is per-row column expressions — construction,
parsing, and every check are JVM-side (no Python), no shuffle at all
until a downstream consumer aggregates.  Real chat corpora skip the
construction step and start at the parse."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..sources.batch import load_table
from .registry import register
from .text_ops import _TOKS

TURN_TOKENS = 16
MAX_TURNS = 6

_CHAT_SCHEMA = "array<struct<role:string,content:string>>"

# ---- identical payload construction in both engines -----------------------
# turn i content = tokens[i*16 : (i+1)*16] joined by ' '; role alternates
# user/assistant; plants: doc_id%13==4 swaps turn 1's role to 'user',
# doc_id%17==3 empties turn 1's content (both only when a turn 1 exists).

_N_TURNS_SQL = (
    f"LEAST(GREATEST(CAST(ceil(len(w)/{TURN_TOKENS}.0) AS BIGINT), 1), {MAX_TURNS})"
)

_TURN_CONTENT_SQL = (
    f"array_to_string(list_slice(w, i*{TURN_TOKENS}+1, "
    f"i*{TURN_TOKENS}+{TURN_TOKENS}), ' ')"
)

_PAYLOAD_SQL = f"""
    words AS (SELECT doc_id, {_TOKS} AS w FROM documents),
    turns AS (
        SELECT doc_id,
               CAST(i AS INT) AS i,
               CASE WHEN i = 1 AND doc_id % 13 = 4 THEN 'user'
                    WHEN i % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
               CASE WHEN i = 1 AND doc_id % 17 = 3 THEN ''
                    ELSE {_TURN_CONTENT_SQL} END AS content
        FROM words, unnest(range(0, {_N_TURNS_SQL})) t(i)
    ),
    convs AS (
        SELECT doc_id,
               '[' || string_agg(
                   '{{"role":"' || role || '","content":"' || content || '"}}',
                   ',' ORDER BY i) || ']' AS payload
        FROM turns GROUP BY doc_id
    )
"""

# unrolled per-index audit terms (MAX_TURNS is a fixed literal, so the
# DuckDB side needs no lambda/indexing machinery)
_ALT_TERMS = " AND ".join(
    f"COALESCE(json_extract_string(payload, '$[{i}].role') = "
    f"'{'user' if i % 2 == 0 else 'assistant'}', TRUE)"
    for i in range(MAX_TURNS)
)
_EMPTY_TERMS = " + ".join(
    f"CASE WHEN json_extract_string(payload, '$[{i}].content') = '' "
    "THEN 1 ELSE 0 END"
    for i in range(MAX_TURNS)
)


def _tok_term(i: int) -> str:
    c = f"json_extract_string(payload, '$[{i}].content')"
    return (
        f"CASE WHEN {c} IS NULL OR {c} = '' THEN 0 "
        f"ELSE len(string_split({c}, ' ')) END"
    )


_TOTAL_TOKENS = " + ".join(_tok_term(i) for i in range(MAX_TURNS))
_ASSIST_TOKENS = " + ".join(
    f"CASE WHEN json_extract_string(payload, '$[{i}].role') = 'assistant' "
    f"THEN {_tok_term(i)} ELSE 0 END"
    for i in range(MAX_TURNS)
)


@register(
    "chat_format_audit",
    oracle=f"""
    WITH {_PAYLOAD_SQL}
    SELECT doc_id,
           CAST(json_array_length(payload) AS BIGINT) AS n_turns,
           (json_extract_string(payload, '$[0].role') = 'user') AS first_role_ok,
           ({_ALT_TERMS}) AS alternation_ok,
           CAST({_EMPTY_TERMS} AS BIGINT) AS n_empty,
           CAST({_TOTAL_TOKENS} AS BIGINT) AS total_tokens,
           CAST({_ASSIST_TOKENS} AS BIGINT) AS trainable_tokens,
           ((json_extract_string(payload, '$[0].role') = 'user')
            AND ({_ALT_TERMS})
            AND {_EMPTY_TERMS} = 0) AS is_valid
    FROM convs
    """,
)
def chat_format_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-transcript format audit + loss-mask token accounting: per
    conversation, turn count, role-alternation and first-role checks,
    empty-message count, total tokens, and TRAINABLE tokens (assistant
    turns only — the count SFT loss masking actually optimizes on), plus
    the gate verdict.  Planted corruptions (role swap at doc_id%13==4,
    empty message at doc_id%17==3) guarantee both valid and invalid
    conversations at every sf, so neither branch of the gate is vacuous.

    Spark audits the JSON through ``from_json`` + higher-order functions
    (``zip_with`` against an index sequence for alternation,
    ``aggregate`` for token sums) — all codegen'd expressions; the oracle
    audits the same payloads with DuckDB's JSON functions, unrolled over
    the fixed MAX_TURNS."""
    docs = load_table(spark, sf_dir, "documents")
    w = tokens("text")
    n_turns = F.least(
        F.greatest(F.ceil(F.size(w) / TURN_TOKENS).cast("long"), F.lit(1)),
        F.lit(MAX_TURNS),
    )
    base = docs.select("doc_id", w.alias("w"), n_turns.alias("nt"))
    exploded = base.select(
        "doc_id",
        "w",
        F.explode(F.sequence(F.lit(0), (F.col("nt") - 1).cast("int"))).alias("i"),
    )
    content = F.concat_ws(
        " ", F.slice("w", F.col("i") * TURN_TOKENS + 1, TURN_TOKENS)
    )
    turn = exploded.select(
        "doc_id",
        "i",
        F.when(
            (F.col("i") == 1) & (F.col("doc_id") % 13 == 4), "user"
        )
        .when(F.col("i") % 2 == 0, "user")
        .otherwise("assistant")
        .alias("role"),
        F.when((F.col("i") == 1) & (F.col("doc_id") % 17 == 3), "")
        .otherwise(content)
        .alias("content"),
    )
    convs = turn.groupBy("doc_id").agg(
        F.concat(
            F.lit("["),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("i", "role", "content"))
                    ),
                    lambda t: F.concat(
                        F.lit('{"role":"'),
                        t["role"],
                        F.lit('","content":"'),
                        t["content"],
                        F.lit('"}'),
                    ),
                ),
                ",",
            ),
            F.lit("]"),
        ).alias("payload")
    )
    parsed = F.from_json(F.col("payload"), _CHAT_SCHEMA)
    idx = F.sequence(F.lit(0), F.size(parsed) - 1)
    alternation_ok = F.forall(
        F.zip_with(
            parsed,
            idx,
            lambda t, i: t["role"]
            == F.when(i % 2 == 0, "user").otherwise("assistant"),
        ),
        lambda x: x,
    )
    tok_count = lambda t: F.when(  # noqa: E731
        t["content"].isNull() | (t["content"] == ""), F.lit(0)
    ).otherwise(F.size(F.split(t["content"], " ")))
    n_empty = F.size(F.filter(parsed, lambda t: t["content"] == "")).cast("long")
    total_tokens = F.aggregate(
        parsed, F.lit(0).cast("long"), lambda acc, t: acc + tok_count(t)
    )
    trainable = F.aggregate(
        parsed,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.when(t["role"] == "assistant", tok_count(t)).otherwise(F.lit(0)),
    )
    first_ok = parsed[0]["role"] == "user"
    return convs.select(
        "doc_id",
        F.size(parsed).cast("long").alias("n_turns"),
        first_ok.alias("first_role_ok"),
        alternation_ok.alias("alternation_ok"),
        n_empty.alias("n_empty"),
        total_tokens.alias("total_tokens"),
        trainable.alias("trainable_tokens"),
        (first_ok & alternation_ok & (n_empty == 0)).alias("is_valid"),
    )


# the registered audit oracle is a complete WITH...SELECT; nest it as a
# CTE so the selection can never diverge from the gate (same pattern as
# the cluster oracles nesting the pairs SQL)
from .registry import ORACLE as _ORACLE_REG

_AUDIT_SQL = _ORACLE_REG["chat_format_audit"]


@register(
    "chat_sft_corpus_totals",
    oracle=f"""
    WITH audit AS (
        {_AUDIT_SQL}
    )
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_valid_convs,
           CAST(SUM(a.trainable_tokens) AS BIGINT) AS trainable_tokens,
           CAST(SUM(a.total_tokens) AS BIGINT) AS total_tokens
    FROM audit a JOIN documents d ON a.doc_id = d.doc_id
    WHERE a.is_valid
    GROUP BY d.lang
    """,
)
def chat_sft_corpus_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SFT corpus roll-up a training run budgets from: per language,
    how many conversations survive the format gate and how many trainable
    (assistant-turn) tokens they contribute vs total.  Composes the audit
    entry — its oracle SQL is nested verbatim as a CTE, so gate and
    roll-up are definitionally consistent; the Spark side re-invokes the
    same audit plan and joins language back by doc id (metadata-scale
    join, one aggregate shuffle over #languages groups)."""
    audit = chat_format_audit(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        audit.filter(F.col("is_valid"))
        .join(docs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_valid_convs"),
            F.sum("trainable_tokens").cast("long").alias("trainable_tokens"),
            F.sum("total_tokens").cast("long").alias("total_tokens"),
        )
    )
