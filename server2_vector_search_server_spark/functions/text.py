"""Text tokenization / hashing / shingling as native Spark expressions.

These power the LLM-data-pipeline operators (dedup, fingerprinting, text
analysis — the beyond-reference surface BASELINE.json's north star asks for).

Cross-engine determinism: the oracle comparisons need hash functions that
DuckDB can reproduce exactly. Spark's ``xxhash64``/``hash`` have no DuckDB
twin, so dedup/sketch operators use :func:`token_hash` — a 31-polynomial
rolling hash over character codes mod 2^31−1 — which both engines evaluate
with identical integer arithmetic (exact for int64: max intermediate
≈ 2^31·31 + 127 ≪ 2^63). ASCII-safe; for non-ASCII corpora swap in
``xxhash64`` (Spark-side only) — the operators take the hash expression as a
parameter.

Everything stays in whole-stage codegen: higher-order array functions, no
Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE31 = 2_147_483_647          # 2^31 − 1, the token-hash modulus


def tokens(text: Column) -> Column:
    """Whitespace tokenization, empty-safe (DuckDB twin:
    ``string_split_regex(text, '\\s+')``)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_hash(tok: Column) -> Column:
    """31-polynomial char-code hash mod 2^31−1 (portable across engines)."""
    chars = F.split(tok, "")
    return F.aggregate(
        chars, F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % MERSENNE31)


def sql_token_hash(tok_expr: str) -> str:
    """DuckDB twin of :func:`token_hash`."""
    return (f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(string_split({tok_expr}, ''), "
            f"c -> CAST(ascii(c) AS BIGINT))), "
            f"(acc, c) -> (acc * 31 + c) % {MERSENNE31})")


def token_windows(text: Column, n: int = 8) -> Column:
    """POSITIONAL word n-gram windows, one per start offset, in document
    order — unlike :func:`word_shingles` there is no ``array_distinct``:
    element *i* (1-based) is the window starting at token *i*, so
    ``posexplode`` recovers the start position. The unit of exact-substring
    deduplication (Lee et al. 2022, arXiv:2107.06499 — ExactSubstr)."""
    toks = tokens(text)
    k = F.size(toks) - (n - 1)
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)])))


def sql_token_windows(text_expr: str, n: int = 8) -> str:
    """DuckDB twin of :func:`token_windows` (1-based list indexing both);
    yields a list of ``{pos, win}`` structs so the caller can unnest with
    positions."""
    toks = f"string_split_regex(trim({text_expr}), '\\s+')"
    parts = " || ' ' || ".join(f"__tk[i + {j}]" for j in range(n))
    return (
        f"(CASE WHEN len({toks}) - {n - 1} <= 0 "
        f"THEN CAST([] AS STRUCT(pos BIGINT, win VARCHAR)[]) "
        f"ELSE (SELECT list_transform("
        f"range(1, len(__tk) - {n - 1} + 1), "
        f"i -> {{'pos': i, 'win': {parts}}}) FROM (SELECT {toks} AS __tk)) "
        f"END)"
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column."""
    toks = tokens(text)
    k = F.size(toks) - (n - 1)
    return F.when(k <= 0, F.array()).otherwise(F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]))))


def sql_word_shingles(text_expr: str, n: int = 3) -> str:
    """DuckDB twin of :func:`word_shingles` (1-based list indexing both)."""
    toks = f"string_split_regex(trim({text_expr}), '\\s+')"
    parts = " || ' ' || ".join(f"__tk[i + {j}]" for j in range(n))
    return (
        f"(CASE WHEN len({toks}) - {n - 1} <= 0 THEN [] "
        f"ELSE list_distinct((SELECT list_transform("
        f"range(1, len(__tk) - {n - 1} + 1), "
        f"i -> {parts}) FROM (SELECT {toks} AS __tk))) END)"
    )
