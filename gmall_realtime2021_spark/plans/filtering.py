"""Document-filtering rule sets from the published LLM-data-curation
recipes, expressed as zero/low-shuffle DataFrame plans over
``documents``:

- gopher_quality   — the Gopher repetition/shape rule set (Rae et al.
                     2021, appendix A1.1) as integer cross-multiplied
                     gates
- c4_line_filter   — C4's line-level cleaning (Raffel et al. 2020
                     §2.2): terminal punctuation + min-words per line,
                     min-surviving-lines per page
- vocab_coverage   — top-V vocabulary coverage / OOV rate per source
                     (the tokenizer-fit signal a BPE retrain decision
                     reads)

These extend the reference's text layer (``KeywordStatsApp.java``
tokenize→aggregate shape) to the corpus-filtering operators a
training-data pipeline needs; the rule *structure* follows the public
papers, thresholds are tuned to the synthetic corpus.

Parity conventions (see ``plans/registry.py``): every gate is pure
integer arithmetic (cross-multiplication instead of float division),
ratios in the output are a single ``round(int/int, 6)`` division, and
the tokenizer/line-splitter twins (``functions/text.tokenize`` ↔
``oracle_fragments.sql_tokens``; ``split('\\n')`` ↔
``string_split(chr(10))``, both keeping empty segments) are
bit-identical. NULL text coalesces to ``''`` so every document gets a
verdict row — a NULL doc must be *rejected*, not silently skipped
(same census contract as ``pii_scan``). The synthetic corpus has no
newlines/punctuation, so the line-grain rules only bind on the
adversarial corpus (``tests/test_adversarial.py``), which carries
bullet/ellipsis/multi-line specimens for exactly this reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_realtime2021_spark.functions.text import tokenize
from gmall_realtime2021_spark.plans.oracle_fragments import (
    sql_shingle_hashes,
    sql_token_hashes,
    sql_tokens,
)
from gmall_realtime2021_spark.plans.registry import register
from gmall_realtime2021_spark.plans.textops import STOPWORDS, _sql_in_list
from gmall_realtime2021_spark.tables import fan_out, load

# Gopher-rule bounds (integer-gate form: the mean-word-length bound
# `2 <= chars/words <= 12` is checked as `2*words <= chars <= 12*words`
# so no float ever enters a filter predicate).
G_MIN_WORDS, G_MAX_WORDS = 10, 100_000
G_MIN_MWL, G_MAX_MWL = 2, 12  # mean word length bounds
G_SYM_PER10 = 1  # '#'/'...' symbols allowed per 10 words
G_BULLET_PER10 = 9  # bullet-led lines allowed per 10 lines
G_ELLIPSIS_PER10 = 3  # ellipsis-ended lines allowed per 10 lines
G_ALPHA_NUM, G_ALPHA_DEN = 4, 5  # >= 4/5 of words must contain [a-z]
G_MIN_STOPWORDS = 2

C4_MIN_LINE_WORDS = 5
C4_MIN_KEPT_LINES = 3

VOCAB_V = 500


_TOKS_SQL = sql_tokens("coalesce(text, '')")
_LINES_SQL = "string_split(coalesce(text, ''), chr(10))"


@register(
    "gopher_quality",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, source,
               CAST(len({_TOKS_SQL}) AS BIGINT) AS token_ct,
               CAST(coalesce(list_sum(list_transform({_TOKS_SQL}, t -> length(t))), 0) AS BIGINT) AS word_chars,
               CAST(len(regexp_extract_all(coalesce(text, ''), '#|\\.\\.\\.')) AS BIGINT) AS sym_ct,
               CAST(len({_LINES_SQL}) AS BIGINT) AS line_ct,
               CAST(len(list_filter({_LINES_SQL}, l -> regexp_matches(l, '^[ \t]*[-*•]'))) AS BIGINT) AS bullet_lines,
               CAST(len(list_filter({_LINES_SQL}, l -> regexp_matches(rtrim(l), '\\.\\.\\.$'))) AS BIGINT) AS ellipsis_lines,
               CAST(len(list_filter({_TOKS_SQL}, t -> regexp_matches(t, '[a-z]'))) AS BIGINT) AS alpha_words,
               CAST(len(list_filter({_TOKS_SQL}, t -> t IN {_sql_in_list(STOPWORDS)})) AS BIGINT) AS stop_ct
        FROM documents
    )
    SELECT *,
           CASE WHEN token_ct BETWEEN {G_MIN_WORDS} AND {G_MAX_WORDS}
                 AND {G_MIN_MWL} * token_ct <= word_chars
                 AND word_chars <= {G_MAX_MWL} * token_ct
                 AND 10 * sym_ct <= {G_SYM_PER10} * token_ct
                 AND 10 * bullet_lines <= {G_BULLET_PER10} * line_ct
                 AND 10 * ellipsis_lines <= {G_ELLIPSIS_PER10} * line_ct
                 AND {G_ALPHA_DEN} * alpha_words >= {G_ALPHA_NUM} * token_ct
                 AND stop_ct >= {G_MIN_STOPWORDS}
                THEN 1 ELSE 0 END AS keep
    FROM base
    """,
    covers=("P5", "P8"),
    doc="Gopher quality-rule gate: 8 integer-arithmetic shape rules per doc",
)
def gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher rule set (word-count bounds, mean-word-length bounds,
    symbol-to-word ratio, bullet/ellipsis line fractions, alpha-word
    fraction, stopword floor) as one narrow projection.

    Every gate is integer cross-multiplication — ``10*sym_ct <=
    token_ct`` instead of ``sym_ct/token_ct <= 0.1`` — so the verdict
    is exact in both engines and NULL-safe by construction (NULL text
    → '' → token_ct 0 → reject). Scale: zero shuffles — per-document
    higher-order-function math inside one whole-stage-codegen map over
    the pruned (doc_id, source, text) scan; the 100 TB plan is
    scan-bound.
    """
    docs = fan_out(load(spark, sf_dir, "documents"))
    txt = F.coalesce(F.col("text"), F.lit(""))
    toks = tokenize(txt)
    lines = F.split(txt, "\n")
    base = docs.select(
        "doc_id",
        "source",
        F.size(toks).cast("long").alias("token_ct"),
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)).alias(
            "word_chars"
        ),
        F.size(F.regexp_extract_all(txt, F.lit(r"#|\.\.\."), 0)).cast("long").alias("sym_ct"),
        F.size(lines).cast("long").alias("line_ct"),
        F.size(F.filter(lines, lambda l: l.rlike("^[ \t]*[-*•]"))).cast("long").alias(
            "bullet_lines"
        ),
        # \z (not $): Java's non-MULTILINE $ also matches before a
        # final \r, RE2's does not — \z is end-of-input in both
        F.size(F.filter(lines, lambda l: F.rtrim(l).rlike(r"\.\.\.\z"))).cast("long").alias(
            "ellipsis_lines"
        ),
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("long").alias("alpha_words"),
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("long").alias("stop_ct"),
    )
    keep = (
        F.col("token_ct").between(G_MIN_WORDS, G_MAX_WORDS)
        & (G_MIN_MWL * F.col("token_ct") <= F.col("word_chars"))
        & (F.col("word_chars") <= G_MAX_MWL * F.col("token_ct"))
        & (10 * F.col("sym_ct") <= G_SYM_PER10 * F.col("token_ct"))
        & (10 * F.col("bullet_lines") <= G_BULLET_PER10 * F.col("line_ct"))
        & (10 * F.col("ellipsis_lines") <= G_ELLIPSIS_PER10 * F.col("line_ct"))
        & (G_ALPHA_DEN * F.col("alpha_words") >= G_ALPHA_NUM * F.col("token_ct"))
        & (F.col("stop_ct") >= G_MIN_STOPWORDS)
    )
    return base.select("*", F.when(keep, 1).otherwise(0).alias("keep"))


_C4_KEPT_SQL = (
    f"list_filter({_LINES_SQL}, l -> len(regexp_extract_all(l, '\\S+')) >= {C4_MIN_LINE_WORDS}"
    " AND regexp_matches(rtrim(l), '[.!?\"]$'))"
)


@register(
    "c4_line_filter",
    oracle=f"""
    SELECT doc_id, source,
           CAST(len({_LINES_SQL}) AS BIGINT) AS line_ct,
           CAST(len({_C4_KEPT_SQL}) AS BIGINT) AS kept_lines,
           CAST(coalesce(length(array_to_string({_C4_KEPT_SQL}, chr(10))), 0) AS BIGINT) AS cleaned_chars,
           CASE WHEN len({_C4_KEPT_SQL}) >= {C4_MIN_KEPT_LINES} THEN 1 ELSE 0 END AS keep
    FROM documents
    """,
    covers=("P3", "P5"),
    doc="C4 line-level cleaning: terminal punctuation + 5-word lines, 3-line pages",
)
def c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4's line-level cleaning: a line survives iff it has >= 5
    whitespace-separated words AND ends (after rtrim) in terminal
    punctuation ``. ! ? "``; a page survives iff >= 3 lines survive.
    Reports the per-document line census and the cleaned character
    count (survivor lines re-joined with newlines).

    Scale: zero shuffles — the line split, filter, and re-join are
    higher-order functions inside one codegen'd projection, so the
    explode-style row blowup never exists and nothing hits the
    shuffle system; the 100 TB plan is scan-bound. Both engines keep
    empty split segments, so ``line_ct`` twins exactly; ``\\S`` is
    whitespace-complement in both Java regex and RE2 (the corpus
    contains no ``\\x0b``, the one code point where they differ —
    asserted by the adversarial suite's specimens, which avoid it).
    """
    docs = fan_out(load(spark, sf_dir, "documents"))
    txt = F.coalesce(F.col("text"), F.lit(""))
    lines = F.split(txt, "\n")
    kept = F.filter(
        lines,
        # \z, not $: see gopher_quality — Java $ matches before a final \r
        lambda l: (F.size(F.regexp_extract_all(l, F.lit(r"\S+"), 0)) >= C4_MIN_LINE_WORDS)
        & F.rtrim(l).rlike('[.!?"]\\z'),
    )
    return docs.select(
        "doc_id",
        "source",
        F.size(lines).cast("long").alias("line_ct"),
        F.size(kept).cast("long").alias("kept_lines"),
        F.length(F.array_join(kept, "\n")).cast("long").alias("cleaned_chars"),
        F.when(F.size(kept) >= C4_MIN_KEPT_LINES, 1).otherwise(0).alias("keep"),
    )


@register(
    "vocab_coverage",
    oracle=f"""
    WITH tok AS (
        SELECT source, unnest({_TOKS_SQL}) AS term FROM documents
    ),
    st AS (
        SELECT source, term, count(*) AS ct FROM tok GROUP BY source, term
    ),
    vocab AS (
        SELECT term FROM (
            SELECT term, sum(ct) AS tot FROM st GROUP BY term
            ORDER BY tot DESC, term LIMIT {VOCAB_V}
        )
    ),
    flagged AS (
        SELECT st.source, st.ct,
               CASE WHEN v.term IS NULL THEN 0 ELSE 1 END AS iv
        FROM st LEFT JOIN vocab v ON st.term = v.term
    )
    SELECT source,
           CAST(sum(ct) AS BIGINT) AS total_tokens,
           CAST(sum(ct * iv) AS BIGINT) AS invocab_tokens,
           CAST(sum(ct * (1 - iv)) AS BIGINT) AS oov_tokens,
           round(CAST(sum(ct * (1 - iv)) AS DOUBLE) / sum(ct), 6) AS oov_rate
    FROM flagged GROUP BY source
    """,
    covers=("A3", "J3"),
    doc="top-V vocabulary coverage / OOV rate per source (tokenizer-fit signal)",
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage audit: build the corpus top-V vocabulary
    (V=500, ties broken on the term), then report per source how many
    token occurrences fall outside it — the out-of-vocabulary rate a
    tokenizer-retrain decision reads.

    Scale: tokens are pre-aggregated to (source, term) grain before
    anything global happens; the top-V pick is
    ``TakeOrderedAndProject`` (per-partition heaps + a driver merge of
    V rows, never a global sort), and vocabulary membership is a
    broadcast join of V ids. One term-keyed shuffle total.
    """
    docs = fan_out(load(spark, sf_dir, "documents"))
    txt = F.coalesce(F.col("text"), F.lit(""))
    tok = docs.select("source", F.explode(tokenize(txt)).alias("term"))
    st = tok.groupBy("source", "term").agg(F.count("*").alias("ct"))
    vocab = (
        st.groupBy("term")
        .agg(F.sum("ct").alias("tot"))
        .orderBy(F.desc("tot"), F.asc("term"))
        .limit(VOCAB_V)
        .select("term", F.lit(1).alias("iv"))
    )
    flagged = st.join(F.broadcast(vocab), "term", "left").withColumn(
        "iv", F.coalesce(F.col("iv"), F.lit(0))
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.sum("ct").cast("long").alias("total_tokens"),
            F.sum(F.col("ct") * F.col("iv")).cast("long").alias("invocab_tokens"),
            F.sum(F.col("ct") * (1 - F.col("iv"))).cast("long").alias("oov_tokens"),
        )
        .select(
            "source",
            "total_tokens",
            "invocab_tokens",
            "oov_tokens",
            F.round(F.col("oov_tokens").cast("double") / F.col("total_tokens"), 6).alias(
                "oov_rate"
            ),
        )
    )


@register(
    "lm_bigram_score",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {sql_tokens('text')} AS tk FROM documents
    ),
    hashed AS (
        SELECT doc_id, {sql_token_hashes('tk')} AS hh FROM toks
    ),
    base AS (
        SELECT doc_id, hh, {sql_shingle_hashes('hh', 2)} AS bg
        FROM hashed WHERE len(hh) >= 2
    ),
    posrows AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(bg)),
                      i -> {{'pos': i, 'w': hh[i], 'b': bg[i]}})) AS e
        FROM base
    ),
    flat AS (SELECT doc_id, e.pos AS pos, e.w AS w, e.b AS b FROM posrows),
    c1 AS (SELECT w, count(*) AS c1 FROM flat GROUP BY w),
    c2 AS (SELECT b, count(*) AS c2 FROM flat GROUP BY b),
    v AS (SELECT count(DISTINCT w) AS vsz FROM flat),
    inv AS (
        SELECT f.doc_id, f.pos,
               CAST(c1.c1 + v.vsz AS DOUBLE) / (c2.c2 + 1) AS inv_p
        FROM flat f JOIN c1 USING (w) JOIN c2 USING (b) CROSS JOIN v
    ),
    folded AS (
        SELECT doc_id, list(inv_p ORDER BY pos) AS l FROM inv GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(len(l) AS BIGINT) AS n_bigrams,
           round(list_reduce(list_prepend(CAST(0 AS DOUBLE), l),
                 (acc, x) -> acc + x) / len(l), 6) AS lm_score
    FROM folded
    """,
    covers=(),
    doc="corpus-trained bigram-LM fluency score per doc (CCNet/Gopher perplexity-filter shape)",
)
def lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model fluency scoring — the CCNet/Gopher
    perplexity-filter stage: train a bigram model ON the corpus
    itself, score every document by how surprising its token
    transitions are under that model, and let the curation gate drop
    the tail. The score here is the mean add-one-smoothed INVERSE
    bigram probability, mean_i (c(w_i)+V)/(c(w_i,w_{{i+1}})+1) — a
    branching-factor estimate that orders documents like perplexity
    does (both are means of 1/p terms; perplexity is the geometric
    mean) while staying an exact integer ratio per term.
    log()/exp() never enter the plan: libm implementations differ
    by ulps ACROSS ENGINES, which the oracle-parity gate cannot
    tolerate, whereas IEEE division of identical integers is
    bit-identical everywhere. Context counts c(w) are prefix counts
    (Σ_w' c(w,w')), so each conditional normalizes exactly.

    Scale shape: ONE Arrow hashing pass over the corpus (persisted
    via ``register_cache`` — the model-count branches and the scoring
    branch all read it), bigram/unigram counts are two map-side-
    combined hash aggregates on 8-byte keys, scoring joins the
    positional rows to the count tables on those keys, and the
    per-doc fold is a sort_array over the doc's own bigrams — the
    only driver-side value is nothing at all; V travels as a
    broadcast one-row frame. Fold order is PINNED (position-sorted
    array fold, not SUM) so the mean is bit-identical across
    engines and across partitionings.
    """
    from gmall_realtime2021_spark.operators.dedup import register_cache
    from gmall_realtime2021_spark.operators.lm import lm_posrows, lm_score_docs

    docs = fan_out(load(spark, sf_dir, "documents").select("doc_id", "text"))
    # shared pieces live in operators/lm.py so the incremental twin
    # (streaming/sinks.lm_counts_sink) scores through the SAME code;
    # the positional-row frame is persisted because the two model
    # count branches and the scoring branch all read it.
    posrows = register_cache(lm_posrows(docs))
    c1 = posrows.groupBy("w").agg(F.count("*").alias("c1"))
    c2 = posrows.groupBy("b").agg(F.count("*").alias("c2"))
    vrow = posrows.agg(F.countDistinct("w").alias("vsz"))
    return lm_score_docs(posrows, c1, c2, vrow)
