"""Distributed BPE tokenizer training and corpus encoding.

``plans/textops.bpe_merge_step`` is ONE step of byte-pair-encoding
training as an oracle-checked plan; this operator is the loop: merge
the best pair into the symbol sequences, recount, repeat — the same
driver-side iteration shape as ``dedup_clusters``,
``operators/graph.pagerank`` and ``train_pq_codebooks``.

Scale shape (the production property): the ONLY corpus-sized stage is
the word-frequency aggregate the caller feeds in (one partial-agg
shuffle over the corpus tokens). Every training iteration runs on the
DISTINCT word vocabulary — bounded and Zipf-capped, independent of
corpus bytes — with one pair-count shuffle on (left, right) symbol
keys and a one-ROW collect for the winning pair (a bounded scalar,
the same budget as PageRank's convergence delta). Merge application
is an Arrow kernel over the vocabulary (greedy left-to-right,
non-overlapping — the published BPE semantics), re-persisted per
round so lineage stays flat.

Correctness is pinned two independent ways: exact merge-sequence
equality against a pure-Python reference implementation on the same
word counts plus handcrafted overlap cases
(tests/test_algo_quality.py), and — since r07 — a full DuckDB oracle
on the ``bpe_encode_topk`` plan: the greedy non-overlapping apply is
a replace-last ``list_reduce`` fold and training unrolls into chained
CTEs (``plans/textops._bpe_encode_oracle``), so the lifecycle plan is
value-hash-checked like any other oracle plan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from gmall_realtime2021_spark.operators.dedup import register_cache

__all__ = [
    "train_bpe",
    "encode_bpe",
    "bpe_encode_words",
    "py_bpe_reference",
    "py_bpe_encode_reference",
]


def _merge_apply(left: str, right: str):
    """Arrow kernel: apply ONE merge to every symbol array — greedy
    left-to-right, non-overlapping (``aaa`` under merge (a,a) →
    ``[aa, a]``), the original BPE semantics. asNondeterministic per
    the kernel contract (functions/text_arrow.py)."""
    merged = left + right

    @F.pandas_udf(ArrayType(StringType()))
    def _f(arrs: pd.Series) -> pd.Series:
        def one(cs):
            out, i, n = [], 0, len(cs)
            while i < n:
                if i < n - 1 and cs[i] == left and cs[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(cs[i])
                    i += 1
            return out

        return arrs.map(one)

    return _f.asNondeterministic()


def _merge_apply_batch(batch: list[tuple[str, str]]):
    """Arrow kernel: apply a SEQUENCE of merges (training order, each
    greedy left-to-right non-overlapping) in one vocabulary pass —
    the fused form of chaining :func:`_merge_apply` once per merge.
    asNondeterministic per the kernel contract."""
    pairs = [(left, right, left + right) for left, right in batch]

    @F.pandas_udf(ArrayType(StringType()))
    def _f(arrs: pd.Series) -> pd.Series:
        def one(cs):
            syms = list(cs)
            for left, right, merged in pairs:
                if len(syms) == 1:
                    break
                out, i, n = [], 0, len(syms)
                while i < n:
                    if i < n - 1 and syms[i] == left and syms[i + 1] == right:
                        out.append(merged)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        return arrs.map(one)

    return _f.asNondeterministic()


def train_bpe(
    vocab: DataFrame,
    n_merges: int,
    word_col: str = "w",
    freq_col: str = "freq",
    min_count: int = 2,
    batch_m: int = 1,
) -> list[tuple[str, str, int]]:
    """Train ``n_merges`` BPE merges over a (word, freq) vocabulary;
    returns the ordered merge table ``[(left, right, pair_ct), ...]``
    — the artifact a tokenizer serializes. Ties break on the
    lexicographically smallest (left, right), so the sequence is
    deterministic; training stops early when the best pair's count
    falls below ``min_count`` (nothing left worth merging).

    Cost scheduling (``batch_m``, r08): with the default ``batch_m=1``
    each merge is one Spark job (a pair-count shuffle + a one-ROW
    collect) — the right shape for hundreds-to-thousands of merges
    over a Zipf-capped vocab. ``batch_m > 1`` is the standard batched
    variant that makes 50k-merge runs plausible: each job collects
    the top-B pair counts and the driver applies UP TO ``batch_m``
    merges from them before recounting, accepting a candidate only
    while the stale counts PROVABLY still rank it first — it shares
    no symbol with a merge already applied this batch, and no
    stale-or-newly-created pair can beat or tie it (every pair a
    batch merge creates or changes involves a touched symbol, and a
    created pair's count is bounded by a touched old pair's count —
    so certifying ``ct > max touched-pair ct`` and ``ct > collected
    floor`` suffices). The batch stops at the first uncertifiable
    candidate and recounts, so the MERGE SEQUENCE IS BIT-IDENTICAL to
    the sequential algorithm at every ``batch_m`` (pinned in
    tests/test_algo_quality.py)."""
    if batch_m < 1:
        raise ValueError(f"batch_m must be >= 1, got {batch_m}")
    syms = register_cache(
        vocab.select(
            F.col(freq_col).alias("freq"),
            F.regexp_extract_all(F.col(word_col), F.lit("(?s)."), 0).alias("cs"),
        )
    )
    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges:
        pair = F.zip_with(
            F.col("cs"),
            F.slice(F.col("cs"), 2, F.size("cs")),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        )
        budget = min(batch_m, n_merges - len(merges))
        b = 1 if budget == 1 else max(4 * budget, budget + 8)
        top = (
            syms.filter(F.size("cs") >= 2)
            .select("freq", F.explode(pair).alias("p"))
            .filter(F.col("p.r").isNotNull())
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("ct"))
            .orderBy(F.desc("ct"), F.asc("l"), F.asc("r"))
            .limit(b)
            .collect()
        )
        if not top or top[0].ct < min_count:
            break
        have_all = len(top) < b  # fewer rows than asked: the collect saw EVERY pair
        floor = 0 if have_all else top[-1].ct
        batch: list[tuple[str, str, int]] = []
        touched: set[str] = set()
        applied: set[tuple[str, str]] = set()
        for r in top:
            if len(batch) >= budget or r.ct < min_count:
                break
            if batch:
                if r.l in touched or r.r in touched:
                    break  # its count is stale — recount first
                if not have_all and r.ct <= floor:
                    break  # uncollected pairs could tie it
                if any(
                    (p.l, p.r) not in applied
                    and (p.l in touched or p.r in touched)
                    and p.ct >= r.ct
                    for p in top
                ):
                    break  # a stale or newly-created pair could beat/tie it
            batch.append((r.l, r.r, int(r.ct)))
            touched.update((r.l, r.r, r.l + r.r))
            applied.add((r.l, r.r))
        merges.extend(batch)
        prev = syms
        syms = register_cache(
            prev.select(
                "freq",
                _merge_apply_batch([(l, rgt) for l, rgt, _ in batch])(F.col("cs")).alias("cs"),
            )
        )
        prev.unpersist()
    return merges


def bpe_encode_words(merges: list[tuple[str, str, int]]):
    """Arrow kernel factory: apply the ENTIRE trained merge table to a
    column of words in one pass — merges in training order, each
    greedy left-to-right non-overlapping (the serialization-order
    apply semantics of Sennrich et al. 2016's learn/apply split).
    One UDF invocation for all K merges (vs K chained UDFs in the
    training loop, where each round must recount between merges) —
    encode has no recount, so the whole table fuses into one
    vocabulary-sized Arrow pass. asNondeterministic per the kernel
    contract (functions/text_arrow.py)."""
    pairs = [(left, right, left + right) for left, right, *_ in merges]

    @F.pandas_udf(ArrayType(StringType()))
    def _f(words: pd.Series) -> pd.Series:
        def one(w):
            syms: list[str] = list(w)
            for left, right, merged in pairs:
                if len(syms) == 1:
                    break
                out, i, n = [], 0, len(syms)
                while i < n:
                    if i < n - 1 and syms[i] == left and syms[i + 1] == right:
                        out.append(merged)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        return words.map(one)

    return _f.asNondeterministic()


def encode_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize every document with a trained BPE merge table:
    ``(id_col, tokens array<string>, n_tokens)``.

    Scale shape: the merge table is applied to the DISTINCT word
    vocabulary only (bounded, Zipf-capped — independent of corpus
    bytes); the corpus-sized stages are one posexplode of the
    pre-tokenizer output and one equi-join on the word back to
    (doc, position), which AQE broadcast-converts when the encoded
    vocabulary is small. Document token order is restored by sorting
    the collected (position, tokens) structs — no window, one
    hash-aggregate per document."""
    from gmall_realtime2021_spark.functions.text import tokenize

    tok = docs.select(
        F.col(id_col),
        F.posexplode(tokenize(F.col(text_col))).alias("__pos", "__w"),
    )
    vocab = tok.select(F.col("__w")).distinct()
    enc = vocab.select("__w", bpe_encode_words(merges)(F.col("__w")).alias("__toks"))
    agg = (
        tok.join(enc, "__w")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("__pos", "__toks"))),
                    lambda s: s["__toks"],
                )
            ).alias("tokens")
        )
    )
    # Left-join back to the full id set: documents whose text
    # pre-tokenizes to nothing (NULL/empty/punctuation-only) emit no
    # posexplode rows and would otherwise vanish — they must come
    # back as tokens=[], n_tokens=0 so doc-grain joins downstream
    # see every input row.
    return (
        docs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("tokens", F.array().cast("array<string>")).alias("tokens"),
        )
        .withColumn("n_tokens", F.size("tokens").cast("long"))
    )


def py_bpe_reference(
    word_freqs: dict[str, int], n_merges: int, min_count: int = 2
) -> list[tuple[str, str, int]]:
    """Independent single-node reference (Sennrich et al. 2016
    algorithm 1 shape) used only by the equality test — kept beside
    the operator so the tie-break and stop rules can't drift apart."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, f in word_freqs.items():
        key = tuple(w)
        vocab[key] = vocab.get(key, 0) + f
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (left, right), ct = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if ct < min_count:
            break
        merges.append((left, right, ct))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            out, i, n = [], 0, len(syms)
            while i < n:
                if i < n - 1 and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges


def py_bpe_encode_reference(
    word: str, merges: list[tuple[str, str, int]]
) -> list[str]:
    """Independent single-node encode twin (training-order apply, each
    merge greedy left-to-right non-overlapping) used only by the
    equality test for :func:`encode_bpe` / :func:`bpe_encode_words`."""
    syms = list(word)
    for left, right, *_ in merges:
        out, i, n = [], 0, len(syms)
        while i < n:
            if i < n - 1 and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms
