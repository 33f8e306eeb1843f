"""Corpus-preparation operators a training-data pipeline needs beyond
dedup/ANN (SURVEY.md §7 M5 extension family):

- doc_chunks         — sliding token-window chunking (context-window prep)
- repetition_stats   — Gopher-style repetition quality signals
- stratified_sample  — config-driven deterministic per-source sampling
- ngram_topk         — grouped top-k bigram frequencies

All four are pure DataFrame plans: tokenization/hashing stay JVM-side
(higher-order array functions), every aggregate shuffles on a bounded
key space, and each has an exact DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmall_realtime2021_spark.functions.text import (
    mode_count,
    poly_hash,
    shingles,
    tokenize,
)
from gmall_realtime2021_spark.plans.oracle_fragments import (
    sql_poly_hash,
    sql_shingle_hashes,
    sql_token_hashes,
    sql_tokens,
)
from gmall_realtime2021_spark.plans.registry import register
from gmall_realtime2021_spark.tables import fan_out, load

#: Chunk geometry: window of CHUNK_W tokens advancing by CHUNK_S
#: (50% overlap) — the standard context-window packing shape.
CHUNK_W = 32
CHUNK_S = 16

#: Deterministic per-source sampling rates, permille. Stands in for
#: the config table a real pipeline would read (same role as the
#: reference's MySQL ``table_process`` config, ``TableProcess.java``).
SAMPLE_PERMILLE = {f"src{i}": 50 + 45 * i for i in range(20)}

#: Repetition gates (tuned to split the synthetic corpus non-trivially;
#: real deployments tune per-corpus, like Gopher's table A1).
MIN_DISTINCT_RATIO = 0.45
MAX_TOP_TOKEN_RATIO = 0.11


@register(
    "doc_chunks",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
    ),
    chunked AS (
        SELECT doc_id, toks, o AS off, o // {CHUNK_S} AS chunk_idx
        FROM base, unnest(generate_series(0, len(toks) - 1, {CHUNK_S})) AS t(o)
        WHERE len(toks) > 0
    )
    SELECT doc_id, chunk_idx,
           least({CHUNK_W}, len(toks) - off) AS chunk_len,
           {sql_poly_hash(f"array_to_string(list_slice(toks, off + 1, off + {CHUNK_W}), ' ')")} AS chunk_hash
    FROM chunked
    """,
    covers=(),
    doc="sliding token-window chunking (W=32, stride 16)",
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk every document into overlapping token windows and emit
    (doc_id, chunk_idx, chunk_len, chunk_hash) — the prep step that
    turns a raw corpus into fixed-context training rows.

    Scale: `sequence` + `posexplode` is a narrow per-row expansion —
    no shuffle at all; output partitioning inherits the scan. The
    fan-out factor is len/stride ≈ 2-7 here, bounded by doc length.
    """
    docs = fan_out(load(spark, sf_dir, "documents"))
    base = docs.select("doc_id", tokenize(F.col("text")).alias("toks")).filter(F.size("toks") > 0)
    offsets = F.sequence(F.lit(0), F.size("toks") - 1, F.lit(CHUNK_S))
    chunked = base.select("doc_id", "toks", F.posexplode(offsets).alias("chunk_idx", "off"))
    chunk_str = F.concat_ws(" ", F.slice(F.col("toks"), F.col("off") + 1, CHUNK_W))
    return chunked.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.least(F.lit(CHUNK_W), F.size("toks") - F.col("off")).cast("long").alias("chunk_len"),
        poly_hash(chunk_str).alias("chunk_hash"),
    )


@register(
    "repetition_stats",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, source, {sql_tokens('text')} AS toks FROM documents
    ),
    scored AS (
        SELECT doc_id, source,
               len(toks) AS token_ct,
               len(list_distinct(toks)) AS distinct_ct,
               list_max(list_transform(list_distinct(toks),
                        t -> len(list_filter(toks, x -> x = t)))) AS top_token_ct
        FROM base WHERE len(toks) > 0
    )
    SELECT doc_id, source, token_ct, distinct_ct, top_token_ct,
           round(CAST(distinct_ct AS DOUBLE) / token_ct, 6) AS distinct_ratio,
           round(CAST(top_token_ct AS DOUBLE) / token_ct, 6) AS top_token_ratio,
           CASE WHEN CAST(distinct_ct AS DOUBLE) / token_ct < {MIN_DISTINCT_RATIO}
                  OR CAST(top_token_ct AS DOUBLE) / token_ct > {MAX_TOP_TOKEN_RATIO}
                THEN 1 ELSE 0 END AS repetitive
    FROM scored
    """,
    covers=(),
    doc="Gopher-style repetition quality signals per document",
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition signals (distinct-token ratio, most-frequent-token
    share) and the boolean gate built on them — the Gopher/C4
    repetition-filter shape.

    The per-doc mode count is computed *inside* the token array with
    higher-order functions (``mode_count``: sort + run-length max,
    O(n log n) — linear-ish even on megabyte documents) — no explode,
    no per-token shuffle; the whole plan is a single narrow map over
    the scan.
    """
    docs = fan_out(load(spark, sf_dir, "documents"))
    base = docs.select("doc_id", "source", tokenize(F.col("text")).alias("toks")).filter(F.size("toks") > 0)
    scored = base.select(
        "doc_id",
        "source",
        F.size("toks").cast("long").alias("token_ct"),
        F.size(F.array_distinct(F.col("toks"))).cast("long").alias("distinct_ct"),
        mode_count(F.col("toks")).cast("long").alias("top_token_ct"),
    )
    distinct_ratio = F.col("distinct_ct").cast("double") / F.col("token_ct")
    top_ratio = F.col("top_token_ct").cast("double") / F.col("token_ct")
    return scored.select(
        "*",
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(top_ratio, 6).alias("top_token_ratio"),
        F.when((distinct_ratio < MIN_DISTINCT_RATIO) | (top_ratio > MAX_TOP_TOKEN_RATIO), 1)
        .otherwise(0)
        .alias("repetitive"),
    )


def _rates_values_sql() -> str:
    return ", ".join(f"('{s}', {p})" for s, p in sorted(SAMPLE_PERMILLE.items()))


@register(
    "stratified_sample",
    oracle=f"""
    SELECT d.doc_id, d.source, {sql_poly_hash("concat('sample:', CAST(d.doc_id AS VARCHAR))")} % 1000 AS bucket
    FROM documents d
    JOIN (VALUES {_rates_values_sql()}) AS rates(source, permille)
      ON d.source = rates.source
    WHERE {sql_poly_hash("concat('sample:', CAST(d.doc_id AS VARCHAR))")} % 1000 < rates.permille
    """,
    covers=("S7",),
    doc="deterministic config-driven stratified sampling per source",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum sampling driven by a small rates table: keep a doc
    iff a salted content-independent hash of its id lands under the
    stratum's permille. Reproducible (no RNG), incremental-safe, and
    the rates table is a *broadcast* join — the same role the
    reference's polled MySQL config table plays for routing
    (``TableProcessFunction.java:54-60``).

    Scale: hash is a map-side expression; the only join is broadcast
    (20 rows), so the plan is shuffle-free end to end.
    """
    docs = fan_out(load(spark, sf_dir, "documents"))
    rates = spark.createDataFrame(
        sorted(SAMPLE_PERMILLE.items()), schema="source string, permille int"
    )
    bucket = poly_hash(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))) % 1000
    return (
        docs.withColumn("bucket", bucket)
        .join(F.broadcast(rates), "source")
        .filter(F.col("bucket") < F.col("permille"))
        .select("doc_id", "source", "bucket")
    )


@register(
    "tfidf_topterms",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({sql_tokens('text')}) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf_ct FROM tok GROUP BY doc_id, term
    ),
    dl AS (
        SELECT doc_id, sum(tf_ct) AS token_ct FROM tf GROUP BY doc_id
    ),
    idf AS (
        SELECT term, count(*) AS df_ct FROM tf GROUP BY term
    ),
    n AS (
        SELECT count(*) AS n_docs FROM documents
    ),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf_ct,
               (CAST(tf.tf_ct AS DOUBLE) / dl.token_ct)
               * sqrt(CAST(n.n_docs AS DOUBLE) / idf.df_ct) AS s
        FROM tf JOIN dl USING (doc_id) JOIN idf USING (term) CROSS JOIN n
    ),
    ranked AS (
        SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, term) AS BIGINT) AS rank
        FROM scored
    )
    SELECT doc_id, term, tf_ct, round(s, 6) AS tfidf, rank
    FROM ranked WHERE rank <= 3
    """,
    covers=("A6",),
    doc="top-3 characteristic terms per doc (TF-IDF, sqrt idf)",
)
def tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Characteristic-term extraction: TF-IDF with a **sqrt** inverse
    document frequency — ``tf/len · sqrt(N/df)`` — instead of the
    textbook ``log``: IEEE-754 requires sqrt (and /,·) to be
    correctly rounded, so both engines produce bit-identical scores,
    which ``ln`` (libm- vs JVM-implemented) does not guarantee.
    Monotone in df either way, so the ranking is the same shape.

    Scale: ONE hash aggregate (doc-term) then three window passes —
    df over term, doc-length over doc, rank over doc. The last two
    share the doc_id partitioning, so the physical plan is 3
    shuffles total (agg, term window, doc windows); the equivalent
    join formulation costs 6. df for stop-like terms is huge but
    that's the *aggregated* side — no corpus-sized skew joins. The
    1-row corpus count joins as a broadcast.
    """
    docs = fan_out(load(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf_ct"))
    n = docs.agg(F.count("*").alias("n_docs"))
    w_term = Window.partitionBy("term")
    w_doc = Window.partitionBy("doc_id")
    scored = (
        tf.crossJoin(F.broadcast(n))
        .withColumn("df_ct", F.count(F.lit(1)).over(w_term))
        .withColumn("token_ct", F.sum("tf_ct").over(w_doc))
        .withColumn(
            "s",
            (F.col("tf_ct").cast("double") / F.col("token_ct"))
            * F.sqrt(F.col("n_docs").cast("double") / F.col("df_ct")),
        )
    )
    w_rank = Window.partitionBy("doc_id").orderBy(F.desc("s"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf_ct", F.round("s", 6).alias("tfidf"), "rank")
    )


@register(
    "ngram_topk",
    oracle=f"""
    WITH toks AS (
        SELECT source, {sql_tokens('text')} AS t FROM documents
    ),
    grams AS (
        SELECT source,
               array_to_string(list_slice(t, i, i + 1), ' ') AS bigram
        FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
        WHERE len(t) >= 2
    ),
    counted AS (
        SELECT source, bigram, count(*) AS ct FROM grams GROUP BY 1, 2
    ),
    ranked AS (
        SELECT *, CAST(row_number() OVER (PARTITION BY source ORDER BY ct DESC, bigram) AS BIGINT) AS rank
        FROM counted
    )
    SELECT source, bigram, ct, rank FROM ranked WHERE rank <= 5
    """,
    covers=("A6",),
    doc="top-5 bigrams per source (grouped top-k)",
)
def ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k: bigram frequencies per source, keep the 5 most
    frequent (ties broken lexicographically → fully deterministic).

    Scale: explode → partial-agg combine map-side → one shuffle on
    (source, bigram) → rank over the *aggregated* frame, whose size
    is vocabulary², not corpus size. The window partitions on
    ``source`` only after aggregation has collapsed the volume.
    """
    docs = fan_out(load(spark, sf_dir, "documents"))
    grams = docs.select(
        "source", F.explode(shingles(tokenize(F.col("text")), 2)).alias("bigram")
    )
    counted = grams.groupBy("source", "bigram").agg(F.count("*").alias("ct"))
    w = Window.partitionBy("source").orderBy(F.desc("ct"), F.asc("bigram"))
    return (
        counted.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
    )


def _gate_oracle() -> str:
    from gmall_realtime2021_spark.plans.textops import LANG_MARKERS, STOPWORDS

    def in_list(words: tuple[str, ...]) -> str:
        return "(" + ", ".join(f"'{w}'" for w in words) + ")"

    t = sql_tokens("text")
    return f"""
    WITH sig AS (
        SELECT doc_id, source,
               len(text) AS char_ct,
               len({t}) AS token_ct,
               len(list_filter({t}, x -> x IN {in_list(STOPWORDS)})) AS stop_ct,
               len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS punct_ct,
               len(list_distinct({t})) AS distinct_ct,
               list_max(list_transform(list_distinct({t}),
                        x -> len(list_filter({t}, y -> y = x)))) AS top_ct,
               len(list_filter({t}, x -> x IN {in_list(LANG_MARKERS['en'])})) AS en_ct,
               len(list_filter({t}, x -> x IN {in_list(LANG_MARKERS['de'])})) AS de_ct,
               len(list_filter({t}, x -> x IN {in_list(LANG_MARKERS['es'])})) AS es_ct
        FROM documents
    )
    SELECT doc_id, source FROM sig
    WHERE token_ct >= 10
      AND CAST(stop_ct AS DOUBLE) / token_ct BETWEEN 0.01 AND 0.6
      AND CAST(punct_ct AS DOUBLE) / char_ct < 0.2
      AND NOT (CAST(distinct_ct AS DOUBLE) / token_ct < {MIN_DISTINCT_RATIO}
               OR CAST(top_ct AS DOUBLE) / token_ct > {MAX_TOP_TOKEN_RATIO})
      AND en_ct >= de_ct AND en_ct >= es_ct AND en_ct > 0
    """


@register(
    "corpus_quality_gate",
    oracle=_gate_oracle(),
    covers=(),
    doc="composed C4-style gate: quality AND non-repetitive AND lang=en",
)
def corpus_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pre-training filter chain — length/stopword/punct
    quality, repetition, language — composed into ONE narrow pass:
    the token array is computed once and every signal reads it, so
    the physical plan is a single scan + project + filter with no
    shuffle at all. Running the three filter plans separately would
    scan (and tokenize) the corpus three times; composition is the
    difference at 100 TB.

    Semantics = conjunction of `text_quality.quality_ok`,
    NOT `repetition_stats.repetitive`, `language_id = 'en'`.

    Hot path: all seven token-derived signals come from ONE Arrow
    kernel pass (``functions.text_arrow.gate_signals_arrow`` — a
    Counter per doc), not seven interpreted-HOF expressions over a
    materialized token array. Same values (equality pinned in tests);
    ~2× faster at sf0.1 and the gap widens with document length since
    the HOF path re-walks the array per signal.
    """
    from gmall_realtime2021_spark.functions.text_arrow import gate_signals_arrow
    from gmall_realtime2021_spark.plans.textops import LANG_MARKERS, STOPWORDS

    docs = fan_out(load(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        "source",
        F.length("text").cast("long").alias("char_ct"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[^a-zA-Z0-9\\s]"), 0)).alias("punct_ct"),
        gate_signals_arrow(
            F.col("text"),
            {
                "stop_ct": STOPWORDS,
                "en_ct": LANG_MARKERS["en"],
                "de_ct": LANG_MARKERS["de"],
                "es_ct": LANG_MARKERS["es"],
            },
        ).alias("g"),
    )
    sig = base.select(
        "doc_id",
        "source",
        "char_ct",
        "punct_ct",
        F.col("g.token_ct").alias("token_ct"),
        F.col("g.stop_ct").alias("stop_ct"),
        F.col("g.distinct_ct").alias("distinct_ct"),
        F.col("g.top_ct").alias("top_ct"),
        F.col("g.en_ct").alias("en_ct"),
        F.col("g.de_ct").alias("de_ct"),
        F.col("g.es_ct").alias("es_ct"),
    )
    stop_ratio = F.col("stop_ct").cast("double") / F.col("token_ct")
    punct_ratio = F.col("punct_ct").cast("double") / F.col("char_ct")
    distinct_ratio = F.col("distinct_ct").cast("double") / F.col("token_ct")
    top_ratio = F.col("top_ct").cast("double") / F.col("token_ct")
    return sig.filter(
        (F.col("token_ct") >= 10)
        & stop_ratio.between(0.01, 0.6)
        & (punct_ratio < 0.2)
        & ~((distinct_ratio < MIN_DISTINCT_RATIO) | (top_ratio > MAX_TOP_TOKEN_RATIO))
        & (F.col("en_ct") >= F.col("de_ct"))
        & (F.col("en_ct") >= F.col("es_ct"))
        & (F.col("en_ct") > 0)
    ).select("doc_id", "source")


#: Target context length for sequence packing, in tokens.
PACK_CONTEXT = 256


@register(
    "chunk_packing",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, source, {sql_tokens('text')} AS toks FROM documents
    ),
    chunked AS (
        SELECT doc_id, source, o // {CHUNK_S} AS chunk_idx,
               least({CHUNK_W}, len(toks) - o) AS chunk_len
        FROM base, unnest(generate_series(0, len(toks) - 1, {CHUNK_S})) AS t(o)
        WHERE len(toks) > 0
    )
    SELECT doc_id, chunk_idx, source, chunk_len,
           CAST(coalesce(sum(chunk_len) OVER (
               PARTITION BY source ORDER BY doc_id, chunk_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before,
           CAST(coalesce(sum(chunk_len) OVER (
               PARTITION BY source ORDER BY doc_id, chunk_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // {PACK_CONTEXT} AS BIGINT) AS pack_id
    FROM chunked
    """,
    covers=(),
    doc="sequence packing: prefix-sum assignment of chunks to fixed windows",
)
def chunk_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack the sliding-window chunks into fixed {PACK_CONTEXT}-token
    training sequences by *prefix-sum* assignment: a chunk's pack is
    ``floor(tokens_before / context)`` in a deterministic per-source
    order. Linear packing (chunks may straddle a boundary — the
    concat-then-split regime most pretraining data loaders use), not
    best-fit bin packing, which is order-sensitive and unstable
    under re-runs.

    Scale: packing is per-source — one shuffle on source, then an
    ordered linear scan (running-frame window, O(1) state/row).
    A single global stream would serialize the corpus through one
    partition; per-stratum streams are the parallel form.
    """
    docs = fan_out(load(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id", "source", tokenize(F.col("text")).alias("toks")
    ).filter(F.size("toks") > 0)
    offsets = F.sequence(F.lit(0), F.size("toks") - 1, F.lit(CHUNK_S))
    chunked = base.select(
        "doc_id", "source", "toks", F.posexplode(offsets).alias("chunk_idx", "off")
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "source",
        F.least(F.lit(CHUNK_W), F.size("toks") - F.col("off")).cast("long").alias("chunk_len"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("chunk_len").over(w), F.lit(0))
    return chunked.select(
        "doc_id",
        "chunk_idx",
        "source",
        "chunk_len",
        before.alias("tokens_before"),
        F.floor(before / PACK_CONTEXT).alias("pack_id"),
    )


@register(
    "decontamination",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {sql_tokens('text')} AS tk FROM documents
    ),
    hashed AS (
        SELECT doc_id, {sql_token_hashes('tk')} AS hh FROM toks
    ),
    sh AS (
        SELECT doc_id, {sql_shingle_hashes('hh', 8)} AS sh FROM hashed
    ),
    inv AS (
        SELECT doc_id, unnest(sh) AS h FROM sh WHERE len(sh) > 0
    ),
    eval_inv  AS (SELECT DISTINCT doc_id, h FROM inv WHERE doc_id % 19 = 0),
    train_inv AS (SELECT DISTINCT doc_id, h FROM inv WHERE doc_id % 19 <> 0)
    SELECT t.doc_id,
           count(DISTINCT t.h) AS shared_shingles,
           count(DISTINCT e.doc_id) AS eval_matches
    FROM train_inv t JOIN eval_inv e ON t.h = e.h
    GROUP BY t.doc_id
    """,
    covers=("R2",),
    doc="benchmark decontamination: train docs sharing an 8-gram with the eval slice",
)
def decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training documents that share any 8-token shingle with the
    held-out eval slice (here the deterministic ``doc_id % 19 = 0``
    subset standing in for a benchmark suite).

    The standard pre-training decontamination shape (GPT-3 appendix C
    / Gopher A.2 use 13-gram overlap; 8 fits this corpus's ~128-token
    docs): build an inverted index of shingle hashes on both sides,
    inner-join on the hash, aggregate per train doc. In production the
    eval side is benchmark-sized — thousands of documents, independent
    of corpus size — and AQE broadcasts its distinct-shingle index so
    the train side never shuffles raw text, only the matched
    (doc_id, hash) pairs into the final aggregate. We deliberately do
    NOT force ``F.broadcast``: this fixture's eval slice is a fixed
    fraction of the corpus (``doc_id % 19``), so a hard hint would
    OOM at scale, while AQE picks broadcast exactly when the index is
    actually small. Portable polynomial hashes (see functions/text.py)
    keep the DuckDB twin bit-identical.

    Hashing runs through the Arrow twin
    (``shingle_hash_set_arrow`` — one O(chars) pass per doc): the
    expression composition ``shingle_hashes(token_hashes(text))``
    re-evaluates the token-hash subtree per ``element_at`` inside the
    shingle lambda, which is O(shingles × doc_chars) per document —
    it ran minutes-not-seconds at sf0.1 once CJK bigrams doubled
    token counts. Values are identical (same constants, same folds —
    the text_arrow module contract).
    """
    from gmall_realtime2021_spark.functions.text_arrow import shingle_hash_set_arrow

    from gmall_realtime2021_spark.operators.dedup import register_cache

    docs = fan_out(load(spark, sf_dir, "documents").select("doc_id", "text"))
    sh = docs.select(
        "doc_id",
        shingle_hash_set_arrow(F.col("text"), 8).alias("sh"),
    ).filter(F.size("sh") > 0)
    # cached: the eval and train branches both read inv, and without
    # the cache each branch re-runs the Arrow hashing + the distinct
    inv = register_cache(sh.select("doc_id", F.explode("sh").alias("h")).distinct())
    eval_inv = inv.filter(F.col("doc_id") % 19 == 0).select(F.col("doc_id").alias("eval_id"), "h")
    train_inv = inv.filter(F.col("doc_id") % 19 != 0)
    return (
        train_inv.join(eval_inv, "h")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("h").alias("shared_shingles"),
            F.countDistinct("eval_id").alias("eval_matches"),
        )
    )



#: DuckDB twin of ``operators.sketches.bloom_positions_int`` on the
#: shingle-hash column ``h`` — generated from the same constants.
from gmall_realtime2021_spark.functions.text import POLY_MOD as _POLY_MOD  # noqa: E402
from gmall_realtime2021_spark.operators.sketches import (  # noqa: E402
    BF_INT_COEFFS as _BF_INT_COEFFS,
    BF_M as _BF_M,
)

_BF_INT_POS_LIST = (
    "["
    + ", ".join(f"((h * {a} + {b}) % {_POLY_MOD}) % {_BF_M}" for a, b in _BF_INT_COEFFS)
    + "]"
)


@register(
    "decontamination_bloom",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {sql_tokens('text')} AS tk FROM documents
    ),
    hashed AS (
        SELECT doc_id, {sql_token_hashes('tk')} AS hh FROM toks
    ),
    sh AS (
        SELECT doc_id, {sql_shingle_hashes('hh', 8)} AS sh FROM hashed
    ),
    inv AS (
        SELECT DISTINCT doc_id, unnest(sh) AS h FROM sh WHERE len(sh) > 0
    ),
    eval_h AS (SELECT DISTINCT h FROM inv WHERE doc_id % 19 = 0),
    train_inv AS (SELECT doc_id, h FROM inv WHERE doc_id % 19 <> 0),
    bloom AS (
        SELECT DISTINCT unnest({_BF_INT_POS_LIST}) AS pos FROM eval_h
    ),
    probe AS (
        SELECT doc_id, h, unnest({_BF_INT_POS_LIST}) AS pos FROM train_inv
    ),
    verdict AS (
        SELECT p.doc_id, p.h,
               CASE WHEN count(b.pos) = 3 THEN 1 ELSE 0 END AS cand
        FROM probe p LEFT JOIN bloom b ON p.pos = b.pos
        GROUP BY p.doc_id, p.h
    ),
    exacted AS (
        SELECT v.doc_id, v.h, v.cand,
               CASE WHEN v.cand = 1 AND e.h IS NOT NULL THEN 1 ELSE 0 END AS hit
        FROM verdict v LEFT JOIN eval_h e ON v.cand = 1 AND v.h = e.h
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(cand) AS BIGINT) AS bloom_candidates,
           CAST(sum(hit) AS BIGINT) AS exact_matches,
           CAST(sum(cand) - sum(hit) AS BIGINT) AS bloom_false_positives
    FROM exacted
    GROUP BY doc_id
    """,
    covers=("J3", "J6"),
    doc="decontamination via broadcast Bloom prefilter of eval shingles, exact-verified candidates only",
)
def decontamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decontamination shape that stays broadcastable at ANY corpus
    scale: compress the eval suite's shingle set into a Bloom filter
    (k=3 portable hashes into m=4096 positions — the exact family
    ``bloom_membership`` builds), broadcast the POSITIONS (<= m rows,
    bounded by construction, unlike ``decontamination``'s raw shingle
    index whose broadcastability depends on eval-set size), and probe
    every training shingle map-side. Only Bloom-passing candidates
    enter the exact verification join, so the 100 TB train side
    shuffles candidate rows, not its whole shingle inventory. The
    census keeps the filter honest per doc: candidates vs exact
    matches vs false positives (no false negatives is structural —
    ``exact_matches`` here equals ``decontamination``'s
    ``shared_shingles``, pinned in tests/test_algo_quality.py).

    Same 8-gram universe and ``doc_id % 19`` eval slice as
    ``decontamination``; Arrow-batched hashing, ids-and-hashes-only
    shuffles throughout.

    r09: the position family moved from string-salted poly hashes
    (``bloom_positions`` — an interpreted O(chars) fold over
    ``'bf{j}:' || h`` per probe) to salted affine maps on the int64
    shingle hash itself (``bloom_positions_int`` — three
    multiply-mod expressions inside codegen; the oracle mirrors the
    same constants). The physical shape deliberately stays
    explode → broadcast-join → count: probe rows for one
    (doc, shingle) are emitted adjacently by the explode, so the
    partial aggregate collapses them map-side and the exchange ships
    ~one row per (doc, shingle), not k — measured no cheaper as a
    packed-bitmap map-side expression (the 64-long bitmap build and
    the forall probe are interpreted HOFs that cost more than the
    broadcast hash join they replace).
    """
    from gmall_realtime2021_spark.functions.text_arrow import shingle_hash_set_arrow
    from gmall_realtime2021_spark.operators.sketches import BF_K, bloom_positions_int

    from gmall_realtime2021_spark.operators.dedup import register_cache

    docs = fan_out(load(spark, sf_dir, "documents").select("doc_id", "text"))
    sh = docs.select(
        "doc_id",
        shingle_hash_set_arrow(F.col("text"), 8).alias("sh"),
    ).filter(F.size("sh") > 0)
    # cached: three branches read inv (bloom build, probe, exact
    # verify) — one Arrow hashing pass + one distinct, not three
    inv = register_cache(sh.select("doc_id", F.explode("sh").alias("h")).distinct())
    eval_h = inv.filter(F.col("doc_id") % 19 == 0).select("h").distinct()
    train_inv = inv.filter(F.col("doc_id") % 19 != 0)
    bloom = eval_h.select(F.explode(bloom_positions_int(F.col("h"))).alias("pos")).distinct()
    probe = train_inv.select(
        "doc_id", "h", F.explode(bloom_positions_int(F.col("h"))).alias("pos")
    )
    verdict = (
        probe.join(F.broadcast(bloom.withColumn("bhit", F.lit(1))), "pos", "left")
        .groupBy("doc_id", "h")
        .agg(F.sum(F.coalesce(F.col("bhit"), F.lit(0))).alias("hits"))
        .select(
            "doc_id",
            "h",
            F.when(F.col("hits") == BF_K, 1).otherwise(0).alias("cand"),
        )
    )
    # split BEFORE the exact-verify join so only Bloom-passing
    # candidates flow through the join operator at all (r06 note:
    # keeping cand==1 in the ON clause passed non-candidates through
    # the join un-matched — correct, but the join stream was
    # corpus-shingle-sized instead of candidate-sized); non-candidates
    # rejoin as hit=0 rows map-side.
    cands = verdict.filter(F.col("cand") == 1)
    noncands = verdict.filter(F.col("cand") == 0).select(
        "doc_id", "cand", F.lit(0).alias("hit")
    )
    exacted = cands.join(eval_h.withColumn("real", F.lit(1)), "h", "left").select(
        "doc_id",
        "cand",
        F.when(F.col("real").isNotNull(), 1).otherwise(0).alias("hit"),
    ).unionByName(noncands)
    return exacted.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_shingles"),
        F.sum("cand").cast("long").alias("bloom_candidates"),
        F.sum("hit").cast("long").alias("exact_matches"),
        (F.sum("cand") - F.sum("hit")).cast("long").alias("bloom_false_positives"),
    )


@register(
    "training_shuffle",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id,
               {sql_poly_hash("CAST(doc_id AS VARCHAR) || '#seed42'")} AS skey
        FROM documents
    )
    SELECT doc_id,
           skey % 8 AS shard,
           CAST(row_number() OVER (PARTITION BY skey % 8 ORDER BY skey, doc_id) AS BIGINT)
               AS pos
    FROM keyed
    """,
    covers=(),
    doc="deterministic global training-order shuffle: hash key → shard + position",
)
def training_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document a reproducible (shard, position) for
    training-order randomization — the epoch-shuffle a data loader
    needs, computed once in the engine instead of at read time.

    The shuffle key is a portable hash of (doc_id, seed): changing the
    seed literal re-permutes the corpus, and both engines agree on
    every position because the hash and the (key, doc_id) tie-break
    are deterministic. One exchange on the shard id; within a shard
    the sort ranks by hash. Scale path: raise the shard count so each
    shard's sort fits one task (1024 shards ≈ 100 GB each at 100 TB —
    Spark sorts that within a task spill-free at normal executor
    sizing; positions stay globally reproducible because shard
    membership and in-shard order depend only on the hash).
    """
    docs = load(spark, sf_dir, "documents").select("doc_id")
    skey = poly_hash(F.concat(F.col("doc_id").cast("string"), F.lit("#seed42")))
    keyed = docs.select("doc_id", skey.alias("skey"))
    w = Window.partitionBy(F.col("skey") % 8).orderBy("skey", "doc_id")
    return keyed.select(
        "doc_id",
        (F.col("skey") % 8).alias("shard"),
        F.row_number().over(w).cast("long").alias("pos"),
    )


@register(
    "data_mix_weights",
    oracle=f"""
    WITH per_src AS (
        SELECT source,
               count(*) AS doc_ct,
               CAST(sum(len({sql_tokens('text')})) AS BIGINT) AS token_ct
        FROM documents WHERE text IS NOT NULL GROUP BY source
    ),
    tot AS (
        SELECT CAST(sum(token_ct) AS BIGINT) AS total, count(*) AS nsrc FROM per_src
    )
    SELECT source, doc_ct, token_ct,
           round(CAST(token_ct AS DOUBLE) / total, 6) AS token_share,
           round((CAST(total AS DOUBLE) / nsrc) / token_ct, 6) AS mix_weight
    FROM per_src CROSS JOIN tot
    """,
    covers=(),
    doc="per-source token budget + uniform-target sampling weights",
)
def data_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-mixture step of a pretraining pipeline: per-source
    token budgets and the sampling weight that rebalances the mix to
    a uniform per-source token target (weight > 1 = upsample, < 1 =
    downsample — swap the uniform target for a configured share table
    the same way ``stratified_sample`` consumes its rates).

    Scale: one narrow tokenize+count pass, one partial-agg shuffle on
    ``source`` (bounded key space), and a broadcast of the 1-row
    total — no corpus-sized join anywhere.
    """
    # NULL-text docs excluded (oracle twin filters identically)
    docs = fan_out(load(spark, sf_dir, "documents")).filter(F.col("text").isNotNull())
    tok = docs.select("source", F.size(tokenize(F.col("text"))).cast("long").alias("tc"))
    per_src = tok.groupBy("source").agg(
        F.count("*").alias("doc_ct"), F.sum("tc").alias("token_ct")
    )
    tot = per_src.agg(
        F.sum("token_ct").alias("total"), F.count("*").alias("nsrc")
    )
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "doc_ct",
        "token_ct",
        F.round(F.col("token_ct").cast("double") / F.col("total"), 6).alias("token_share"),
        F.round(
            (F.col("total").cast("double") / F.col("nsrc")) / F.col("token_ct"), 6
        ).alias("mix_weight"),
    )


@register(
    "data_mix_temperature",
    oracle=f"""
    WITH per_src AS (
        SELECT source, CAST(sum(len({sql_tokens('text')})) AS BIGINT) AS token_ct
        FROM documents WHERE text IS NOT NULL GROUP BY source
    ),
    tot AS (SELECT CAST(sum(token_ct) AS BIGINT) AS total FROM per_src),
    micro AS (
        SELECT source, token_ct,
               CAST(token_ct AS DOUBLE) / total AS share,
               CAST(floor(sqrt(CAST(token_ct AS DOUBLE) / total) * 1000000000 + 0.5)
                    AS BIGINT) AS tmicro
        FROM per_src CROSS JOIN tot
    ),
    denom AS (SELECT CAST(sum(tmicro) AS BIGINT) AS tsum FROM micro)
    SELECT source, token_ct,
           round(share, 6) AS token_share,
           round(CAST(tmicro AS DOUBLE) / tsum, 6) AS temp_share,
           round((CAST(tmicro AS DOUBLE) / tsum) / share, 6) AS boost
    FROM micro CROSS JOIN denom
    """,
    covers=(),
    doc="temperature-sampled mixture weights (T = 2): sqrt-flattened source shares",
)
def data_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature sampling for the pretraining mixture — the standard
    compromise between natural proportions (T = 1, big sources
    dominate) and the uniform target of ``data_mix_weights`` (low-
    resource sources overfit): sample source *i* with probability
    ∝ share_i^(1/T). T is fixed at 2, i.e. sqrt-flattening — chosen
    deliberately because sqrt is the ONE fractional power that is
    IEEE correctly-rounded in every engine (arbitrary ``pow`` is
    ulp-engine-dependent and would break oracle bit-parity — the same
    trade the sqrt-idf BM25 variant makes). The sqrt'd shares are
    normalized through fixed-point nano-units so the denominator is
    an exact integer sum (order-independent across partitions);
    ``boost`` = temp_share / share is the effective up/down-sampling
    factor a sampler applies per source.

    Scale: identical economics to ``data_mix_weights`` — one tokenize
    + count pass, one partial-agg shuffle on ``source``, two 1-row
    broadcast scalars. Nothing corpus-sized moves twice.
    """
    # NULL-text docs excluded (oracle twin filters identically)
    docs = fan_out(load(spark, sf_dir, "documents")).filter(F.col("text").isNotNull())
    tok = docs.select("source", F.size(tokenize(F.col("text"))).cast("long").alias("tc"))
    per_src = tok.groupBy("source").agg(F.sum("tc").alias("token_ct"))
    tot = per_src.agg(F.sum("token_ct").alias("total"))
    share = F.col("token_ct").cast("double") / F.col("total")
    micro = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "token_ct",
        share.alias("share"),
        F.floor(F.sqrt(share) * F.lit(1000000000) + F.lit(0.5)).cast("long").alias("tmicro"),
    )
    denom = micro.agg(F.sum("tmicro").alias("tsum"))
    temp_share = F.col("tmicro").cast("double") / F.col("tsum")
    return micro.crossJoin(F.broadcast(denom)).select(
        "source",
        "token_ct",
        F.round("share", 6).alias("token_share"),
        F.round(temp_share, 6).alias("temp_share"),
        F.round(temp_share / F.col("share"), 6).alias("boost"),
    )


@register(
    "length_histogram",
    oracle=f"""
    WITH tc AS (
        SELECT source, len({sql_tokens('text')}) AS token_ct FROM documents
    )
    SELECT source,
           CAST(length(bin(token_ct)) - 1 AS BIGINT) AS bucket,
           count(*) AS doc_ct,
           CAST(min(token_ct) AS BIGINT) AS min_tokens,
           CAST(max(token_ct) AS BIGINT) AS max_tokens
    FROM tc WHERE token_ct > 0
    GROUP BY source, bucket
    """,
    covers=(),
    doc="per-source power-of-two token-length histogram",
)
def length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length distribution per source in power-of-two buckets
    (bucket = floor(log2(tokens))) — the telemetry that drives chunk
    geometry and packing-efficiency decisions upstream of training.

    The bucket is computed by *integer* binary-digit length (Spark
    ``conv(_, 10, 2)``, DuckDB ``bin``), never floating ``log2`` —
    libm rounding at exact powers of two differs across engines;
    string length of the binary representation cannot.

    Scale: narrow map + one bounded-key shuffle; empty docs are
    excluded (log of zero tokens is undefined in any base).
    """
    docs = fan_out(load(spark, sf_dir, "documents"))
    tc = docs.select(
        "source", F.size(tokenize(F.col("text"))).cast("long").alias("token_ct")
    ).filter(F.col("token_ct") > 0)
    bucket = (F.length(F.conv(F.col("token_ct").cast("string"), 10, 2)) - 1).cast("long")
    return (
        tc.groupBy("source", bucket.alias("bucket"))
        .agg(
            F.count("*").alias("doc_ct"),
            F.min("token_ct").alias("min_tokens"),
            F.max("token_ct").alias("max_tokens"),
        )
    )


@register(
    "token_cooccurrence_topk",
    oracle=f"""
    WITH tok AS (
        SELECT DISTINCT doc_id, t FROM (
            SELECT doc_id, unnest({sql_tokens('text')}) AS t FROM documents
        )
    )
    SELECT a.t AS t1, b.t AS t2, count(*) AS doc_ct
    FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.t < b.t
    GROUP BY 1, 2
    ORDER BY doc_ct DESC, t1, t2
    LIMIT 100
    """,
    covers=("R2",),
    doc="top-100 token collocations by document co-occurrence count",
)
def token_cooccurrence_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: pairs of tokens appearing in the same
    document, ranked by the number of co-occurring docs (the exact
    integer counts a PMI/collocation stage consumes — counts stay
    integers so the oracle hash is exact; the log-ratio scoring that
    would introduce libm drift is left to the consumer).

    Scale shape: per-doc DISTINCT tokens first (bounds the pair
    fan-out at vocab-per-doc², not tokens²), self-join keyed on
    doc_id — the shuffle key is the doc, so pair generation is local
    to each doc's rows — then one hash aggregate on the pair. Top-k
    is TakeOrderedAndProject. At web scale you additionally drop
    stop-tokens before pairing (the classic Σdf² mitigation); on
    this vocabulary the pair space is tiny.
    """
    docs = fan_out(load(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(tokenize(F.col("text")))).alias("t")
    )
    a = tok.select("doc_id", F.col("t").alias("t1"))
    b = tok.select("doc_id", F.col("t").alias("t2"))
    return (
        a.join(b, "doc_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count("*").alias("doc_ct"))
        .orderBy(F.desc("doc_ct"), F.asc("t1"), F.asc("t2"))
        .limit(100)
    )


@register(
    "quality_deciles",
    oracle=f"""
    WITH sc AS (
        SELECT doc_id,
               round(CAST(len(list_distinct({sql_tokens('text')})) AS DOUBLE)
                     / len({sql_tokens('text')}), 6) AS score
        FROM documents
        WHERE len({sql_tokens('text')}) > 0
    ),
    ranked AS (
        SELECT doc_id, score,
               row_number() OVER (ORDER BY score DESC, doc_id) AS rn,
               count(*) OVER () AS n
        FROM sc
    )
    SELECT doc_id, score,
           CAST(CASE WHEN rn <= (n % 10) * (n // 10 + 1)
                     THEN ceil(CAST(rn AS DOUBLE) / (n // 10 + 1))
                     ELSE (n % 10) + ceil(CAST(rn - (n % 10) * (n // 10 + 1) AS DOUBLE)
                                          / (n // 10)) END AS BIGINT) AS decile
    FROM ranked
    """,
    covers=(),
    doc="FineWeb-style quality deciles over per-document scores (distributed ntile)",
)
def quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile binning of the corpus by a quality score (here the
    distinct-token ratio — higher = less repetitive), the shape behind
    keep-top-N-deciles curation (FineWeb and friends rank-filter the
    corpus exactly like this).

    Scale: this is the *document-grain* ntile — millions to billions
    of rows, so a global ``ntile OVER (ORDER BY)`` window (one task
    sorting the whole corpus) is precisely what can't ship. The rank
    comes from ``operators/prefix.range_prefix_sums`` (range exchange
    + per-partition window + broadcast offsets — zero single-partition
    exchanges) and the decile from SQL ntile's exact arithmetic on
    (rank, n), so the assignment is bit-identical to the oracle's
    global window at any scale. The oracle keeps the window form —
    DuckDB runs single-node anyway; the SQL above spells out the same
    tile arithmetic so both engines share the tie-break (score DESC,
    doc_id).
    """
    from gmall_realtime2021_spark.operators.prefix import (
        ntile_from_rank,
        range_prefix_sums,
    )

    docs = fan_out(load(spark, sf_dir, "documents"))
    toks = tokenize(F.col("text"))
    sc = docs.select(
        "doc_id",
        F.round(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6
        ).alias("score"),
    ).filter(F.size(toks) > 0)
    ranked = range_prefix_sums(sc, [F.desc("score"), F.asc("doc_id")], {"one": F.lit(1)})
    tile = ntile_from_rank(F.col("cum_one"), F.col("total_one"), F.lit(10))
    return ranked.select("doc_id", "score", tile.cast("long").alias("decile"))


PPS_K = 37  # systematic-sample tick count


@register(
    "weighted_sample",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, source,
               CAST(coalesce(n_chars, 0) AS BIGINT) AS w,
               {sql_poly_hash("'pps:' || CAST(doc_id AS VARCHAR)")} AS h
        FROM documents
    ),
    cum AS (
        SELECT *,
               sum(w) OVER (ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w,
               sum(w) OVER () AS total_w
        FROM base
    )
    SELECT doc_id, source, w AS weight,
           CAST((cum_w * {PPS_K}) // total_w - ((cum_w - w) * {PPS_K}) // total_w AS BIGINT) AS n_picks,
           CAST(((cum_w - w) * {PPS_K}) // total_w + 1 AS BIGINT) AS first_tick
    FROM cum
    WHERE (cum_w * {PPS_K}) // total_w > ((cum_w - w) * {PPS_K}) // total_w
    """,
    covers=("A1", "J6"),
    doc="systematic PPS sampling: k ticks over the hash-ordered cumulative weight line",
)
def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, probability proportional
    to size (document length), via SYSTEMATIC sampling: lay the docs
    on a line in salted-hash order, each occupying a segment of width
    ``n_chars``; drop k equally-spaced ticks on the line; a doc is
    sampled iff a tick lands inside its segment. All integer
    arithmetic — tick index is ``cum*k div total`` — so the sample is
    bit-exact and reproducible: no RNG, and no transcendental key
    function (contrast the exponential-key A-ES trick, whose ``ln``
    is not identically rounded across engines; ``tfidf_topterms``
    documents the same avoidance for ``log``).

    Scale: the cumulative weight comes from
    ``operators/prefix.range_prefix_sums`` (range-partitioned local
    windows + a broadcast offset join) — no single-partition window at
    any size; everything else is map-side. Zero-weight docs are kept
    in the line but can never straddle a tick, so they drop out
    exactly as the oracle's integer filter does.
    """
    from gmall_realtime2021_spark.operators.prefix import range_prefix_sums

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.coalesce(F.col("n_chars"), F.lit(0)).cast("long").alias("w"),
        poly_hash(F.concat(F.lit("pps:"), F.col("doc_id").cast("string"))).alias("h"),
    )
    cum = range_prefix_sums(docs, [F.asc("h"), F.asc("doc_id")], {"w": F.col("w")})
    idx_after = F.expr(f"(cum_w * {PPS_K}) div total_w")
    idx_before = F.expr(f"((cum_w - w) * {PPS_K}) div total_w")
    return cum.filter(idx_after > idx_before).select(
        "doc_id",
        "source",
        F.col("w").alias("weight"),
        (idx_after - idx_before).cast("long").alias("n_picks"),
        (idx_before + 1).cast("long").alias("first_tick"),
    )
