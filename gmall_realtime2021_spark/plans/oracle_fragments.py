"""DuckDB SQL fragments that mirror ``functions/text.py`` /
``functions/vectors.py`` bit-for-bit.

Single source of truth: constants (POLY_MOD/MULT, minhash coeffs, LSH
hyperplanes) are Python values inlined as literals into BOTH the
Spark column expressions and these SQL strings, so the two engines
cannot drift.
"""

from __future__ import annotations

from gmall_realtime2021_spark.functions.text import CJK_END, CJK_START, POLY_MOD, POLY_MULT, SHINGLE_MULT

__all__ = [
    "sql_tokens",
    "sql_poly_hash",
    "sql_token_hashes",
    "sql_shingles",
    "sql_shingle_hashes",
    "sql_dot",
]


def sql_tokens(col: str) -> str:
    """Twin of ``text.tokenize``: lowercase alnum runs whole, CJK runs
    as character bigrams (lone CJK char kept). Verified bit-identical
    to the Spark expression: same unit regex (alternatives over
    disjoint charsets ⇒ same scan order in RE2 and Java regex), same
    codepoint test (DuckDB ``ascii`` returns the Unicode codepoint),
    same character indexing (DuckDB ``s[i]`` is per-character)."""
    units = f"regexp_extract_all(lower({col}), '[a-z0-9]+|[\\x{{4e00}}-\\x{{9fff}}]+')"
    expand = (
        f"CASE WHEN ascii(u) < {CJK_START} OR ascii(u) > {CJK_END} THEN [u] "
        "WHEN length(u) = 1 THEN [u] "
        "ELSE list_transform(generate_series(1, length(u) - 1), i -> u[i] || u[i + 1]) END"
    )
    return f"flatten(list_transform({units}, u -> {expand}))"


def sql_poly_hash(col: str) -> str:
    """Twin of ``text.poly_hash`` — left fold over char codes.

    ``list_reduce`` seeds with the first element, equivalent to the
    Spark fold from 0 because ``(0*31 + c) % M = c`` for any char
    code; empty strings guarded to 0.
    """
    codes = f"list_transform(regexp_extract_all({col}, '(?s).'), c -> CAST(ascii(c) AS BIGINT))"
    return (
        f"CASE WHEN len({codes}) = 0 THEN 0 "
        f"ELSE list_reduce({codes}, (acc, c) -> (acc * {POLY_MULT} + c) % {POLY_MOD}) END"
    )


def sql_token_hashes(tokens: str) -> str:
    """poly_hash applied to every element of a token list."""
    return f"list_transform({tokens}, t ->" + (
        f" list_reduce(list_transform(regexp_extract_all(t, '(?s).'),"
        f" c -> CAST(ascii(c) AS BIGINT)), (acc, c) -> (acc * {POLY_MULT} + c) % {POLY_MOD}))"
    )


def sql_shingles(tokens: str, n: int = 3) -> str:
    """Twin of ``text.shingles`` — word n-grams joined by spaces."""
    return (
        f"CASE WHEN len({tokens}) < {n} THEN [] "
        f"ELSE list_transform(generate_series(1, len({tokens}) - {n - 1}), "
        f"i -> array_to_string(list_slice({tokens}, i, i + {n - 1}), ' ')) END"
    )


def sql_shingle_hashes(hh: str, n: int = 3) -> str:
    """Twin of ``text.shingle_hashes`` — combine n consecutive token
    hashes with the same fold: acc = (acc*SHINGLE_MULT + h) % POLY_MOD."""
    acc = f"{hh}[i]"
    for k in range(1, n):
        acc = f"(({acc}) * {SHINGLE_MULT} + {hh}[i + {k}]) % {POLY_MOD}"
    return (
        f"CASE WHEN len({hh}) < {n} THEN [] "
        f"ELSE list_transform(generate_series(1, len({hh}) - {n - 1}), i -> {acc}) END"
    )


def sql_dot(a: str, b: str) -> str:
    """Twin of ``vectors.dot`` — sequential left-fold double dot
    product (prepend 0.0 so the fold order matches Spark's
    ``aggregate`` with a 0.0 zero element)."""
    prods = f"list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))"
    return f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {prods}), (acc, x) -> acc + x)"
