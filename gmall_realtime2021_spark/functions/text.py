"""Text primitives: tokenizer (F1), shingles, engine-portable hashes.

The reference tokenizes with IKAnalyzer (``KeywordUtil.java:18-41``,
used via the ``ik_analyze`` UDTF, ``KeywordUDTF.java:16-28``), whose
native input domain is *Chinese* e-commerce search keywords. This
engine's tokenizer is deterministic and engine-portable (SURVEY.md
§4.2): Latin/digit runs become whole lowercase tokens; CJK runs become
overlapping character **bigrams** (the classical CJK IR fallback —
bigram indexing approximates dictionary segmentation recall without a
dictionary), a lone CJK character becomes itself. Token *sets* still
differ from IK's dictionary output — a documented deviation — but CJK
input now tokenizes meaningfully instead of vanishing, and the
tokenizer keeps an exact ANSI-SQL twin so every keyword query stays
oracle-checkable.

Hash design: MinHash/SimHash/fingerprint operators need a hash that
Spark and DuckDB compute identically. Built-ins differ
(Spark=Murmur3/xxhash64 with Spark-specific seeds; DuckDB has its own
64-bit hash), so we use an explicit polynomial-rolling hash over
character codes, evaluated with JVM-side higher-order array functions
(no Python in the hot path):

    h = fold(codes, 0, (acc, c) -> (acc*31 + c) mod 2147483647)

DuckDB twin (bit-identical; left fold, BIGINT arithmetic):

    list_reduce(list_transform(regexp_extract_all(s, '(?s).'),
                c -> CAST(ascii(c) AS BIGINT)),
                (acc, c) -> (acc*31 + c) % 2147483647)

Overflow-safe: acc < 2^31, so acc*31 + c < 2^37 << 2^63.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "CJK_END",
    "CJK_START",
    "POLY_MOD",
    "POLY_MULT",
    "TOKEN_UNIT_RE",
    "char_codes",
    "minhash_coeffs",
    "mode_count",
    "poly_hash",
    "py_tokenize",
    "shingles",
    "tokenize",
]

#: 2^31 - 1 (Mersenne prime) — keeps the fold in cheap int64 arithmetic.
POLY_MOD = 2_147_483_647
POLY_MULT = 31

#: CJK Unified Ideographs (BMP block) — the range the bigram fallback
#: applies to. Codepoint bounds shared by all three twins.
CJK_START = 0x4E00  # 一
CJK_END = 0x9FFF

#: Token units = maximal runs of lowercase alnum OR of CJK ideographs.
#: Alternatives match disjoint character sets, so left-to-right scan
#: order is identical in Java regex, RE2 (DuckDB) and Python ``re``.
TOKEN_UNIT_RE = "[a-z0-9]+|[一-鿿]+"


def _expand_unit(u: Column) -> Column:
    """One token unit → its token list (see :func:`tokenize`).

    Bigrams come from ``zip_with(chars, tail(chars))`` — NOT from
    ``element_at(chars, i)`` probes inside an index lambda, which
    would re-run the char extraction once per bigram (the interpreted
    HOF re-evaluation pitfall, see :func:`mode_count`) and make a
    long CJK run quadratic. ``zip_with`` pads the shorter side with
    null; ``concat`` propagates it and ``array_compact`` drops the
    trailing null pair.
    """
    chars = F.regexp_extract_all(u, F.lit("(?s)."), 0)
    bigrams = F.array_compact(
        F.zip_with(chars, F.slice(chars, 2, F.size(chars)), lambda a, b: F.concat(a, b))
    )
    is_cjk = (F.ascii(u) >= F.lit(CJK_START)) & (F.ascii(u) <= F.lit(CJK_END))
    return (
        F.when(~is_cjk, F.array(u))  # latin/digit run: whole token
        .when(F.size(chars) == F.lit(1), F.array(u))  # lone CJK char
        .otherwise(bigrams)  # CJK run: character bigrams
    )


def tokenize(col: Column) -> Column:
    """F1 tokenizer as ``array<string>``: lowercase alnum runs whole,
    CJK runs as character bigrams (lone CJK char kept as-is).

    ``tokenize("小米手机 iPhone12") = [小米, 米手, 手机, iphone12]``.
    DuckDB twin: ``plans.oracle_fragments.sql_tokens``; Python twin:
    :func:`py_tokenize` (shared by the Arrow UDF path and the
    SQL-registered ``ik_analyze``).
    """
    units = F.regexp_extract_all(F.lower(col), F.lit(TOKEN_UNIT_RE), 0)
    return F.flatten(F.transform(units, _expand_unit))


_TOKEN_UNIT_PAT = None


def py_tokenize(s: str) -> list[str]:
    """Pure-Python twin of :func:`tokenize` — same units, same CJK
    bigram expansion. Used by the Arrow UDF hot path
    (``functions.text_arrow``) and the SQL-registered UDF."""
    global _TOKEN_UNIT_PAT
    if _TOKEN_UNIT_PAT is None:
        import re

        _TOKEN_UNIT_PAT = re.compile(TOKEN_UNIT_RE)
    out: list[str] = []
    for u in _TOKEN_UNIT_PAT.findall(s.lower()):
        if not (CJK_START <= ord(u[0]) <= CJK_END) or len(u) == 1:
            out.append(u)
        else:
            out.extend(u[i : i + 2] for i in range(len(u) - 1))
    return out


def mode_count(tokens: Column) -> Column:
    """Count of the most frequent element of an array — LINEARITHMIC:
    sort, then one fold tracking (current run, best run). Replaces the
    ``array_max(transform(distinct, t -> size(filter(toks, = t))))``
    formulation, which is O(distinct × n) per row — harmless on
    100-token fixture docs, 10⁹+ comparisons on one megabyte document
    at corpus scale.

    Formulation constraint (this is load-bearing, learned the hard
    way): Spark evaluates higher-order-function lambdas interpreted,
    re-evaluating any non-trivial expression *inside* the lambda once
    per element — an ``element_at(array_sort(x), i)`` probe inside a
    lambda resorts the array per index and is O(n² log n). So the
    sorted array appears only as a direct argument of zip_with /
    aggregate (evaluated once), and the lambdas touch nothing but
    their element/accumulator bindings.

    Returns 0 for empty arrays (the oracle's quadratic form yields
    NULL there; callers filter empties or gate on token_ct first, so
    the two never diverge on an emitted row)."""
    s = F.array_sort(tokens)
    # boundary flag per element: s[i] != s[i+1], last element always a
    # boundary (zip_with pads the shorter side with null → coalesce)
    flags = F.zip_with(s, F.slice(s, 2, F.size(s)), lambda a, b: F.coalesce(a != b, F.lit(True)))
    zero = F.struct(F.lit(0).alias("run"), F.lit(0).alias("best"))
    return F.aggregate(
        flags,
        zero,
        lambda acc, is_end: F.struct(
            F.when(is_end, F.lit(0)).otherwise(acc["run"] + 1).alias("run"),
            F.when(is_end, F.greatest(acc["best"], acc["run"] + 1))
            .otherwise(acc["best"])
            .alias("best"),
        ),
        lambda acc: acc["best"],
    )


def char_codes(col: Column) -> Column:
    """Unicode code points of every character, as ``array<bigint>``."""
    # regexp_extract_all('(?s).') rather than split('') — Spark's split
    # appends a trailing empty string that DuckDB's char extraction lacks.
    chars = F.regexp_extract_all(col, F.lit("(?s)."), 0)
    return F.transform(chars, lambda c: F.ascii(c).cast("long"))


def poly_hash(col: Column, mult: int = POLY_MULT, mod: int = POLY_MOD) -> Column:
    """Portable string hash in [0, mod) (see module docstring)."""
    return F.aggregate(
        char_codes(col),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(mult) + c) % F.lit(mod),
    )


def shingles(tokens: Column, n: int = 3) -> Column:
    """Word n-gram shingles of a token array, as ``array<string>``.

    Docs shorter than ``n`` tokens yield an empty array (callers
    filter). DuckDB twin::

        list_transform(generate_series(1, len(toks) - n + 1),
                       i -> array_to_string(list_slice(toks, i, i + n - 1), ' '))

    Built by n−1 progressive ``zip_with`` steps against shifted
    copies of the array — NOT by ``slice(tokens, i, n)`` probes
    inside an index lambda, which would re-evaluate the ``tokens``
    expression once per shingle (the interpreted-HOF re-evaluation
    pitfall; see :func:`mode_count`). ``zip_with`` null-pads the
    short side, ``concat`` propagates the null through the tail
    windows, and ``array_compact`` drops them — leaving exactly the
    len−n+1 full windows.
    """
    acc = tokens
    for k in range(1, n):
        tail = F.slice(tokens, k + 1, F.greatest(F.size(tokens) - F.lit(k), F.lit(0)))
        acc = F.zip_with(acc, tail, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_compact(acc)


#: Multiplier for combining token hashes into a shingle hash.
SHINGLE_MULT = 8191


def token_hashes(col: Column) -> Column:
    """poly_hash of every token of a string, as ``array<bigint>``.

    Characters are hashed once per *token*; shingle hashes are then
    combined arithmetically (:func:`shingle_hashes`) instead of
    re-hashing every character of every (overlapping) shingle — a 3×
    hot-path saving for 3-gram shingling.
    """
    return F.transform(tokenize(col), lambda t: poly_hash(t))


def shingle_hashes(hh: Column, n: int = 3) -> Column:
    """n-gram shingle hashes from a token-hash array.

    shingle_i = fold of n consecutive token hashes with
    ``acc = (acc * SHINGLE_MULT + h) % POLY_MOD`` — the same portable
    fold discipline as poly_hash (acc < 2^31 ⇒ no int64 overflow).
    DuckDB twin in ``plans/oracle_fragments.sql_shingle_hashes``.

    Progressive ``zip_with`` against shifted copies (null-padded tail
    dropped by ``array_compact``), for the same reason as
    :func:`shingles` — ``element_at(hh, i + k)`` probes inside an
    index lambda re-evaluate the ``hh`` expression per shingle. The
    Arrow twin (``text_arrow.shingle_hash_set_arrow``) remains the
    hot path; this is the semantic spec both mirror.
    """
    acc = hh
    for k in range(1, n):
        tail = F.slice(hh, k + 1, F.greatest(F.size(hh) - F.lit(k), F.lit(0)))
        acc = F.zip_with(
            acc, tail, lambda a, b: (a * F.lit(SHINGLE_MULT) + b) % F.lit(POLY_MOD)
        )
    return F.array_compact(acc)


def minhash_coeffs(k: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for k minhash permutations
    ``(a*h + b) % POLY_MOD``. A plain LCG keeps the constants
    reproducible in both engines (they are inlined as literals into
    the Spark plan and the oracle SQL alike).
    """
    coeffs: list[tuple[int, int]] = []
    state = seed
    for _ in range(k):
        state = (state * 1103515245 + 12345) % (1 << 31)
        a = state % (POLY_MOD - 1) + 1
        state = (state * 1103515245 + 12345) % (1 << 31)
        b = state % POLY_MOD
        coeffs.append((a, b))
    return coeffs
