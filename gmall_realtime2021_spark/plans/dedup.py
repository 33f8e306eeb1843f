"""Dedup plans over ``documents`` with oracle twins.

The oracle SQL is *generated from the same constants* as the Spark
operators (operators/dedup.py) — MinHash coefficients, the portable
polynomial hash, shingle-combining multiplier, band layout — so both
engines execute the same algorithm and the strict value-hash
comparison holds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gmall_realtime2021_spark.functions.text import POLY_MOD
from gmall_realtime2021_spark.operators.dedup import (
    MINHASH_BANDS,
    MINHASH_COEFFS,
    MINHASH_K,
    SPAN_N,
    duplicate_clusters,
    duplicate_span_stats,
    hamming_fp_edges,
    duplicate_span_topk,
    incremental_near_dup,
    span_scrub_stats,
    exact_dedup_summary,
    minhash_lsh_pairs,
    minhash_star_edges,
    ngram_containment_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_dup_pairs,
)
from gmall_realtime2021_spark.plans.oracle_fragments import (
    sql_poly_hash,
    sql_shingle_hashes,
    sql_token_hashes,
    sql_tokens,
)
from gmall_realtime2021_spark.plans.registry import PLANS, register
from gmall_realtime2021_spark.plans.textops import STOPWORDS as _QUALITY_STOPWORDS
from gmall_realtime2021_spark.tables import fan_out, load

#: Distinct shingle-hash set per doc (the shared CTE of all near-dup
#: oracles) — hashes of word-3-grams built from per-token hashes.
_SETS_CTE = f"""
    tok AS (
        SELECT doc_id AS id, {sql_token_hashes(sql_tokens('text'))} AS hh FROM documents
    ),
    sets AS (
        SELECT id, list_distinct({sql_shingle_hashes('hh', 3)}) AS sh FROM tok
    ),
    nonempty AS (SELECT id, sh FROM sets WHERE len(sh) > 0)
"""

#: Single source of truth — imported so the oracle CTE below can
#: never drift from the Spark-side guard in ``_shingle_pair_counts``.
from gmall_realtime2021_spark.operators.dedup import SHINGLE_DF_CAP  # noqa: E402

#: Shared inverted-index pair CTE (appended after ``_SETS_CTE``) with
#: the stop-shingle guard: shingles in more than SHINGLE_DF_CAP docs
#: are dropped before the self-join, and per-doc sizes (na/nb) are
#: recomputed over the kept universe — the exact semantics of
#: ``operators.dedup._shingle_pair_counts``.
_PAIRS_CTE = f"""
    inv0 AS (SELECT id, unnest(sh) AS shingle FROM nonempty),
    hot AS (
        SELECT shingle FROM (SELECT shingle, count(*) AS ct FROM inv0 GROUP BY 1)
        WHERE ct > {SHINGLE_DF_CAP}
    ),
    inv1 AS (SELECT id, shingle FROM inv0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
    sizes AS (SELECT id, count(*) AS n_sh FROM inv1 GROUP BY 1),
    pairs AS (
        SELECT a.id AS a, b.id AS b, sa.n_sh AS na, sb.n_sh AS nb,
               count(*) AS inter
        FROM inv1 a JOIN inv1 b USING (shingle)
        JOIN sizes sa ON sa.id = a.id
        JOIN sizes sb ON sb.id = b.id
        WHERE a.id < b.id
        GROUP BY 1, 2, 3, 4
    )
"""


def _minhash_exprs() -> str:
    return ",\n           ".join(
        f"list_min(list_transform(sh, h -> ({a} * h + {b}) % {POLY_MOD})) AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    )


def _band_key_list() -> str:
    rows = MINHASH_K // MINHASH_BANDS
    keys = [
        "concat_ws(',', '" + str(b) + "', " + ", ".join(f"mh{b * rows + r}" for r in range(rows)) + ")"
        for b in range(MINHASH_BANDS)
    ]
    return "[" + ", ".join(keys) + "]"


@register(
    "dedup_exact",
    oracle="""
    SELECT count(*) AS total_docs,
           count(DISTINCT text) AS distinct_texts,
           count(text) - count(DISTINCT text) AS dup_docs
    FROM documents
    """,
    covers=(),
    doc="exact dedup accounting (hash-groupBy on payload)",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_summary(load(spark, sf_dir, "documents"))


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SETS_CTE},
    {_PAIRS_CTE}
    SELECT a, b, jaccard FROM (
        SELECT a, b, round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard
        FROM pairs
    ) WHERE jaccard >= 0.5
    """,
    covers=("R2",),
    doc="n-gram Jaccard near-dup pairs via inverted-index self-join",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(load(spark, sf_dir, "documents"))


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_SETS_CTE},
    sig AS (
        SELECT id, sh,
           {_minhash_exprs()}
        FROM nonempty
    ),
    buckets AS (
        SELECT id, sh, unnest({_band_key_list()}) AS band_key FROM sig
    ),
    cand AS (
        SELECT DISTINCT l.id AS a, r.id AS b
        FROM buckets l JOIN buckets r USING (band_key)
        WHERE l.id < r.id
    ),
    verified AS (
        SELECT a, b,
               round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
                     (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 6) AS jaccard
        FROM cand
        JOIN nonempty sa ON sa.id = a
        JOIN nonempty sb ON sb.id = b
    )
    SELECT a, b, jaccard FROM verified WHERE jaccard >= 0.5
    """,
    covers=(),
    doc="MinHash+LSH banded near-dup candidates, exact-verified",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(load(spark, sf_dir, "documents"))


def _simhash_sql(bits: int = 32) -> str:
    def bit_sum(j: int) -> str:
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(hh, h -> ((h >> {j}) & 1) * 2 - 1)), (acc, x) -> acc + x)"
        )

    terms = " + ".join(
        f"(CASE WHEN {bit_sum(j)} > 0 THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(bits)
    )
    return f"""
    WITH hashed AS (
        SELECT doc_id, {sql_token_hashes(sql_tokens('text'))} AS hh FROM documents
    )
    SELECT doc_id, {terms} AS simhash
    FROM hashed WHERE len(hh) > 0
    """


@register(
    "dedup_simhash_narrow",
    oracle=_simhash_sql(),
    covers=(),
    doc="narrow 32-bit SimHash fingerprints (fixture-compat / banding-saturation probe variant)",
)
def dedup_simhash_narrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprints — the NARROW fixture-compat
    configuration kept for the banding-saturation scale probe
    (SCALEPROBE_DEDUP: at 31 effective bits the pairing candidate
    stage is measured superlinear, alpha 1.52, on content-unique
    corpora). The default-named ``dedup_simhash`` is the 62-bit wide
    family; reach for this one only to reproduce the saturation
    measurement or to match pre-r9 fixtures."""
    return simhash_fingerprints(load(spark, sf_dir, "documents"), bits=32)


@register(
    "dedup_simhash_narrow_pairs",
    oracle=f"""
    WITH fp AS (
        {_simhash_sql()}
    ),
    buck AS (
        SELECT doc_id, simhash,
               CAST(j AS VARCHAR) || ':' || CAST((simhash >> (8 * j)) & 255 AS VARCHAR) AS band
        FROM fp, unnest([0, 1, 2, 3]) AS u(j)
    ),
    cand AS (
        SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
               x.simhash AS fa, y.simhash AS fb
        FROM buck x JOIN buck y USING (band)
        WHERE x.doc_id < y.doc_id
    )
    SELECT a, b, CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(fa, fb)) <= 3
    """,
    covers=(),
    doc="narrow-SimHash hamming<=3 pairs (32-bit fixture-compat variant; candidate stage measured superlinear at content scale)",
)
def dedup_simhash_narrow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-banded pairing over the NARROW 32-bit fingerprints.
    Recall is still exact (pigeonhole: 3 errors damage <= 3 of the
    bands), but precision and candidate cost are the scale problem:
    32-bit fingerprint space saturates on content-unique corpora, so
    unrelated docs collide (12,391 emitted pairs vs the wide family's
    235 on the sf0.01 fixture at identical true-dup recall) and the
    candidate stage is measured at alpha 1.52 (SCALEPROBE_DEDUP_r08).
    Kept ONLY as the saturation-probe / pre-r9 fixture-compat variant;
    the default ``dedup_simhash_pairs`` is 62-bit."""
    docs = load(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(docs, max_hamming=3, bits=32)


def _simhash_wide_sql(bits: int = 62) -> str:
    """DuckDB twin of ``text_arrow.simhash_wide_arrow``: per token,
    h = poly(t) + (poly('w2:' + t) << 31) — two salted 31-bit poly
    hashes concatenated below the sign bit — then per-bit majority
    over the 62-bit values. Weights 1<<j stay positive for j <= 61,
    so no two's-complement folding is needed."""
    from gmall_realtime2021_spark.functions.text import POLY_MULT
    from gmall_realtime2021_spark.functions.text_arrow import SIMHASH_WIDE_SALT

    def poly(expr: str) -> str:
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(regexp_extract_all({expr}, '(?s).'), "
            f"c -> CAST(ascii(c) AS BIGINT))), "
            f"(acc, c) -> (acc * {POLY_MULT} + c) % {POLY_MOD})"
        )

    wide = f"({poly('t')}) + (({poly(repr(SIMHASH_WIDE_SALT) + ' || t')}) * 2147483648)"

    def bit_sum(j: int) -> str:
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(hh, h -> ((h >> {j}) & 1) * 2 - 1)), (acc, x) -> acc + x)"
        )

    terms = " + ".join(
        f"(CASE WHEN {bit_sum(j)} > 0 THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(bits)
    )
    return f"""
    WITH hashed AS (
        SELECT doc_id, list_transform({sql_tokens('text')}, t -> {wide}) AS hh
        FROM documents
    )
    SELECT doc_id, {terms} AS simhash
    FROM hashed WHERE len(hh) > 0
    """


@register(
    "dedup_simhash",
    oracle=_simhash_wide_sql(),
    covers=(),
    doc="SimHash fingerprints (62-bit wide default: two salted poly hashes, content-scale configuration)",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """62-bit SimHash fingerprints — the content-scale configuration
    (Manku et al., WWW'07 use 64-bit simhash for web-scale near-dup)
    and the DEFAULT since r9: at 31 effective bits the block-pair
    band keys carry ~13 bits and the pairing candidate stage goes
    quadratic in distinct fingerprints (measured,
    SCALEPROBE_DEDUP_r08); at 62 bits the same k=3 budget yields
    ~25-bit composite keys and candidates stay pair-output-sized.
    One Arrow pass, shuffle-free. The 32-bit configuration survives
    as ``dedup_simhash_narrow``."""
    return simhash_fingerprints(load(spark, sf_dir, "documents"), bits=62)


@register(
    "dedup_simhash_pairs",
    # oracle candidates brute-force the DISTINCT-fingerprint grid —
    # banding is a Spark-side cost optimization with exact recall, so
    # the verified pair set is banding-independent
    oracle=f"""
    WITH fp AS (
        {_simhash_wide_sql()}
    ),
    uf AS (SELECT DISTINCT simhash AS f FROM fp),
    fpp AS (
        SELECT x.f AS fa, y.f AS fb,
               CAST(bit_count(xor(x.f, y.f)) AS BIGINT) AS hamming
        FROM uf x JOIN uf y ON x.f < y.f
        WHERE bit_count(xor(x.f, y.f)) <= 3
    ),
    intra AS (
        SELECT x.doc_id AS a, y.doc_id AS b, CAST(0 AS BIGINT) AS hamming
        FROM fp x JOIN fp y ON x.simhash = y.simhash AND x.doc_id < y.doc_id
    ),
    crossfp AS (
        SELECT least(ia.doc_id, ib.doc_id) AS a,
               greatest(ia.doc_id, ib.doc_id) AS b,
               fpp.hamming
        FROM fpp
        JOIN fp ia ON ia.simhash = fpp.fa
        JOIN fp ib ON ib.simhash = fpp.fb
    )
    SELECT a, b, hamming FROM intra
    UNION ALL
    SELECT a, b, hamming FROM crossfp
    """,
    covers=(),
    doc="SimHash hamming<=3 near-dup pairs (62-bit wide default through the block-pair band join)",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs at hamming <= 3 over the 62-bit wide SimHash —
    the DEFAULT configuration since r9, because its candidate stage
    survives content growth: 5 blocks of ~12 bits, C(5,2)=10
    composite keys of ~25 bits each, so unrelated fingerprints
    collide at ~2^-25 per key and the band join stays output-sized
    where the 31-bit family's ~13-bit keys went quadratic
    (SCALEPROBE_DEDUP_r08 stage decomposition: candidate alpha 0.61
    wide vs 1.52 narrow). Same distinct-fingerprint-grain economics
    as the narrow variant, which survives as
    ``dedup_simhash_narrow_pairs``.
    """
    docs = load(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(docs, max_hamming=3, bits=62)


_CLUSTERS_ORACLE = """
WITH RECURSIVE pairs AS (
    {minhash_pairs}
),
edges AS (
    SELECT a AS u, b AS v FROM pairs
    UNION ALL
    SELECT b AS u, a AS v FROM pairs
),
reach(u, v) AS (
    SELECT u, v FROM edges
    UNION
    SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
comp AS (
    SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u
)
SELECT d.doc_id, CAST(coalesce(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
"""


@register(
    "dedup_clusters",
    # reuse the minhash oracle verbatim as the pair source: both
    # engines cluster exactly the pairs they agreed on above
    oracle=_CLUSTERS_ORACLE.format(minhash_pairs=PLANS["dedup_minhash_lsh"].oracle),
    covers=(),
    doc="near-dup clusters: connected components over MinHash-LSH pairs",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clustering: connected components (iterative min-label
    propagation, ``operators/dedup.duplicate_clusters``) over the
    MinHash-LSH near-dup pairs; keep-one-per-cluster is then
    ``doc_id == cluster_id``. Oracle: recursive-CTE transitive
    closure — the same min-reachable-id semantics.
    """
    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs)
    return duplicate_clusters(docs, pairs)


#: Star-edge clusters oracle: the same banded-LSH buckets as the
#: minhash-pair oracle, but each bucket contributes only (rep=min id,
#: member) edges — K−1 per K-doc bucket, never K² — verified against
#: the rep, then the shared recursive-CTE transitive closure.
_STAR_SUMMARY_ORACLE = f"""
    WITH RECURSIVE {_SETS_CTE},
    sig AS (
        SELECT id, sh,
           {_minhash_exprs()}
        FROM nonempty
    ),
    buckets AS (
        SELECT id, unnest({_band_key_list()}) AS band_key FROM sig
    ),
    reps AS (SELECT band_key, min(id) AS rep FROM buckets GROUP BY 1),
    star AS (
        SELECT DISTINCT r.rep AS a, b.id AS b
        FROM buckets b JOIN reps r USING (band_key)
        WHERE b.id <> r.rep
    ),
    verified AS (
        SELECT a, b FROM star
        JOIN nonempty sa ON sa.id = a
        JOIN nonempty sb ON sb.id = b
        WHERE round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
              (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 6) >= 0.5
    ),
    edges AS (
        SELECT a AS u, b AS v FROM verified
        UNION ALL
        SELECT b AS u, a AS v FROM verified
    ),
    reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    comp AS (
        SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u
    ),
    labeled AS (
        SELECT d.doc_id,
               CAST(coalesce(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id,
               length(d.text) AS n_chars
        FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    )
    SELECT cluster_id,
           count(*) AS member_ct,
           CAST(sum(n_chars) AS BIGINT) AS chars_total
    FROM labeled
    GROUP BY 1
    HAVING count(*) >= 2
"""


@register(
    "dedup_cluster_summary",
    oracle=_STAR_SUMMARY_ORACLE,
    covers=(),
    doc="bounded-output dedup accounting: per-cluster size summary via verified star edges, never K^2 pairs",
)
def dedup_cluster_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate accounting with a BOUNDED output AND intermediate
    contract (VERDICT r11 item #7): per-cluster member count and
    character mass, computed over STAR edges (each LSH band bucket
    contributes (min-id rep → member) edges, exact-verified against
    the rep only) instead of the all-pairs expansion. On a copy-heavy
    corpus — K replicas per document — every stage is linear in K
    where the pair plans' qualifying OUTPUT alone grows K²; the scale
    probe pins the output-grain α on the copy fixture
    (``tools/scale_probe.py --dedup``, stage ``star_summary``).

    The star trade is documented on the operator
    (:func:`operators.dedup.minhash_star_edges`): connectivity is
    tested through the bucket representative, which on replica
    buckets (Jaccard 1 against the rep) reproduces the pair graph's
    components exactly. Only clusters that actually absorbed a
    duplicate are emitted (``member_ct >= 2``) — the singleton tail
    adds nothing to duplicate accounting and would make the output
    corpus-sized.
    """
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    clusters = duplicate_clusters(docs, minhash_star_edges(docs))
    chars = docs.select("doc_id", F.length("text").alias("n_chars"))
    return (
        clusters.join(chars, "doc_id")
        .groupBy("cluster_id")
        .agg(F.count("*").alias("member_ct"), F.sum("n_chars").alias("chars_total"))
        .filter(F.col("member_ct") >= 2)
    )


_SIMHASH_SUMMARY_ORACLE_TEMPLATE = """
    WITH RECURSIVE fp AS (
        {simhash_sql}
    ),
    uf AS (SELECT DISTINCT simhash AS f FROM fp),
    fpp AS (
        SELECT x.f AS fa, y.f AS fb
        FROM uf x JOIN uf y ON x.f < y.f
        WHERE bit_count(xor(x.f, y.f)) <= 3
    ),
    edges AS (
        SELECT fa AS u, fb AS v FROM fpp
        UNION ALL
        SELECT fb AS u, fa AS v FROM fpp
    ),
    reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    comp AS (
        SELECT u AS f, least(u, min(v)) AS cf FROM reach GROUP BY u
    ),
    labeled AS (
        SELECT p.doc_id, coalesce(c.cf, p.simhash) AS cf, length(d.text) AS n_chars
        FROM fp p
        JOIN documents d USING (doc_id)
        LEFT JOIN comp c ON c.f = p.simhash
    )
    SELECT CAST(min(doc_id) AS BIGINT) AS cluster_id,
           count(*) AS member_ct,
           CAST(sum(n_chars) AS BIGINT) AS chars_total
    FROM labeled
    GROUP BY cf
    HAVING count(*) >= 2
"""


@register(
    "simhash_cluster_summary",
    oracle=_SIMHASH_SUMMARY_ORACLE_TEMPLATE.format(simhash_sql=_simhash_wide_sql()),
    covers=(),
    doc="bounded simhash dedup accounting: components at FINGERPRINT grain, one linear doc-grain aggregate, never K^2 pairs",
)
def simhash_cluster_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded duplicate accounting for the SIMHASH family (VERDICT
    r12 item #5): per-cluster member count and character mass without
    ever materializing doc pairs. The copy-fixture probe shows
    ``dedup_simhash_pairs``'s OUTPUT alone growing K² (1.76 M pairs
    at x8, rows_alpha 2.13) — that is the pair CONTRACT, not an index
    defect — so accounting needs a form whose every stage stays
    bounded.

    The simhash insight (stronger than the minhash star form): doc
    connectivity is a pure function of FINGERPRINTS — two docs are
    near-dups iff their fingerprints' hamming distance clears the
    budget, and docs sharing a fingerprint are hamming-0 connected —
    so connected components over the DISTINCT-FINGERPRINT edge graph
    (:func:`operators.dedup.hamming_fp_edges`, bounded by fp
    cardinality at every stage) expand to EXACTLY the doc-pair
    graph's components. No star approximation, no through-the-rep
    connectivity trade: ``tests/test_properties.py`` pins summary ≡
    pair-graph components on arbitrary corpora. K replicas collapse
    onto one fingerprint, so copy growth adds ZERO fp-grain work; the
    only doc-grain stages are one equi-join to the component labels
    and one aggregate — both linear. Oracle: the identical algorithm
    (brute-force fp grid + recursive closure at fp grain, then the
    doc-grain rollup)."""
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    fp = simhash_fingerprints(docs, bits=62)
    nodes = fp.select(F.col("simhash").alias("f")).distinct()
    edges = hamming_fp_edges(fp, max_hamming=3, bits=62).selectExpr("fa AS a", "fb AS b")
    comp = duplicate_clusters(nodes, edges, id_col="f")  # (f, cluster_id) at fp grain
    chars = docs.select("doc_id", F.length("text").alias("n_chars"))
    return (
        fp.join(comp, fp.simhash == comp.f)
        .join(chars, "doc_id")
        .groupBy(F.col("cluster_id").alias("cf"))
        .agg(
            F.min("doc_id").alias("cluster_id"),
            F.count("*").alias("member_ct"),
            F.sum("n_chars").cast("long").alias("chars_total"),
        )
        .select("cluster_id", "member_ct", "chars_total")
        .filter(F.col("member_ct") >= 2)
    )


@register(
    "dedup_canonical",
    # wraps the clusters oracle (itself built on the minhash-pair
    # oracle) — both engines dedup exactly the clusters they agreed on
    oracle="""
    WITH clusters AS (
        {clusters}
    ),
    sizes AS (
        SELECT cluster_id, count(*) AS dup_ct FROM clusters GROUP BY cluster_id
    )
    SELECT s.cluster_id AS doc_id, d.source, s.dup_ct
    FROM sizes s JOIN documents d ON d.doc_id = s.cluster_id
    """.format(clusters=PLANS["dedup_clusters"].oracle),
    covers=(),
    doc="deduplicated corpus: one canonical doc per near-dup cluster",
)
def dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end product of the dedup pipeline: the corpus with each
    near-dup cluster collapsed to its canonical member (minimum
    doc_id = the cluster label), annotated with how many duplicates
    it absorbed. ``dup_ct = 1`` rows are the untouched long tail.

    Scale: adds one bounded aggregate (cluster-count) and one
    key-equi join on top of ``dedup_clusters``; the join output is
    corpus-sized minus duplicates — the whole point.
    """
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs)
    clusters = duplicate_clusters(docs, pairs)
    sizes = clusters.groupBy("cluster_id").agg(F.count("*").alias("dup_ct"))
    return sizes.join(docs, sizes.cluster_id == docs.doc_id).select(
        F.col("cluster_id").alias("doc_id"), "source", "dup_ct"
    )


@register(
    "dedup_containment",
    oracle=f"""
    WITH {_SETS_CTE},
    {_PAIRS_CTE}
    SELECT a, b, containment FROM (
        SELECT a, b, round(CAST(inter AS DOUBLE) / least(na, nb), 6) AS containment
        FROM pairs
    ) WHERE containment >= 0.8
    """,
    covers=(),
    doc="asymmetric n-gram containment pairs (quote/partial-copy detection)",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """|A∩B| / min(|A|,|B|) ≥ 0.8 — catches a short document embedded
    in a long one, which Jaccard misses (union dominated by the long
    doc). See ``operators/dedup.ngram_containment_pairs``.
    """
    return ngram_containment_pairs(load(spark, sf_dir, "documents"))


@register(
    "cross_split_leakage",
    oracle=f"""
    WITH {_SETS_CTE},
    {_PAIRS_CTE},
    near AS (
        -- round-then-filter, matching the Spark side and the
        -- dedup_ngram_jaccard oracle: a raw jaccard in
        -- [0.4999995, 0.5) rounds up to 0.5 and must be KEPT
        SELECT a, b, jaccard FROM (
            SELECT a, b, round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard
            FROM pairs
        ) WHERE jaccard >= 0.5
    ),
    splits AS (
        SELECT doc_id, CASE WHEN bucket < 80 THEN 'train'
                            WHEN bucket < 90 THEN 'val'
                            ELSE 'test' END AS split
        FROM (SELECT doc_id, {sql_poly_hash('lower(text)')} % 100 AS bucket FROM documents)
    )
    SELECT near.a, near.b, sa.split AS split_a, sb.split AS split_b, near.jaccard
    FROM near
    JOIN splits sa ON near.a = sa.doc_id
    JOIN splits sb ON near.b = sb.doc_id
    WHERE sa.split <> sb.split
    """,
    covers=(),
    doc="near-dup pairs straddling train/val/test splits (split-leakage audit)",
)
def cross_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'is my split clean' audit: near-duplicate pairs whose two
    documents landed in DIFFERENT corpus splits — exactly the leakage
    that inflates eval scores. Composes the content-hash split
    assignment (``corpus_split``) with the n-gram Jaccard pair list;
    a clean pipeline dedups (or re-splits by cluster) until this
    plan returns zero rows.

    Scale: pairs come from the inverted-index join (bounded by shared
    shingles); the split label is a map-side hash — the label join
    touches only near-dup pair ids, and Catalyst broadcasts them.
    """
    from gmall_realtime2021_spark.functions.text import poly_hash
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs)
    bucket = poly_hash(F.lower(F.col("text"))) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    labels = docs.select("doc_id", split.alias("split"))
    la = labels.select(F.col("doc_id").alias("a"), F.col("split").alias("split_a"))
    lb = labels.select(F.col("doc_id").alias("b"), F.col("split").alias("split_b"))
    return (
        pairs.join(la, "a")
        .join(lb, "b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("a", "b", "split_a", "split_b", "jaccard")
    )


@register(
    "leakage_free_split",
    # wraps the JACCARD pair oracle (the same generator the leakage
    # audit uses) in the recursive connected-components CTE, then
    # hashes the CLUSTER id to a split — every near-dup pair shares a
    # cluster, so no pair can straddle splits, by construction.
    oracle="""
    WITH RECURSIVE pairs AS (
        {pairs}
    ),
    edges AS (
        SELECT a AS u, b AS v FROM pairs
        UNION ALL
        SELECT b AS u, a AS v FROM pairs
    ),
    reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    comp AS (
        SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u
    ),
    clustered AS (
        SELECT d.doc_id, CAST(coalesce(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
        FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    )
    SELECT doc_id, cluster_id,
           CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
    FROM (SELECT doc_id, cluster_id,
                 {bucket} % 100 AS b
          FROM clustered)
    """.format(
        pairs=PLANS["dedup_ngram_jaccard"].oracle,
        bucket=sql_poly_hash("'split:' || CAST(cluster_id AS VARCHAR)"),
    ),
    covers=(),
    doc="cluster-aware train/val/test split: near-dup clusters never straddle splits",
)
def leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMEDY for ``cross_split_leakage``: assign splits by the
    near-dup CLUSTER's hash instead of the document's own content
    hash, so every near-duplicate pair lands in one split by
    construction (pairs are edges of the cluster graph; same cluster
    ⇒ same split). The audit plan over this assignment returns zero
    rows — pinned in ``tests/test_algo_quality.py``.

    Scale: `dedup_clusters`' propagation cost plus one map-side hash;
    the split is still content-deterministic (cluster id = min doc id,
    hash of it), so re-runs and incremental additions stay stable
    unless the cluster itself changes.
    """
    from pyspark.sql import functions as F

    from gmall_realtime2021_spark.functions.text import poly_hash

    docs = load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs)
    clusters = duplicate_clusters(docs, pairs)
    bucket = poly_hash(F.concat(F.lit("split:"), F.col("cluster_id").cast("string"))) % 100
    split = F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    return clusters.select("doc_id", "cluster_id", split.alias("split"))


#: Multiplicity-preserving span rows — the shared CTE of the
#: substring-dedup oracles (cf. _SETS_CTE, which is distinct-set).
_SPANS_CTE = f"""
    tok AS (
        SELECT doc_id AS id, {sql_token_hashes(sql_tokens('text'))} AS hh FROM documents
    ),
    spans AS (
        SELECT id, unnest({sql_shingle_hashes('hh', SPAN_N)}) AS sh FROM tok
    )
"""


@register(
    "duplicate_spans",
    oracle=f"""
    WITH {_SPANS_CTE},
    cnt AS (SELECT sh, count(DISTINCT id) AS ndocs FROM spans GROUP BY sh)
    SELECT id AS doc_id,
           count(*) AS n_spans,
           count(CASE WHEN ndocs > 1 THEN 1 END) AS dup_spans,
           round(CAST(count(CASE WHEN ndocs > 1 THEN 1 END) AS DOUBLE) / count(*), 6) AS dup_frac
    FROM spans JOIN cnt USING (sh)
    GROUP BY id
    """,
    covers=(),
    doc="per-doc repeated-span stats (substring-level exact dedup, Lee et al. 2022)",
)
def duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return duplicate_span_stats(load(spark, sf_dir, "documents"))


@register(
    "duplicate_span_topk",
    oracle=f"""
    WITH {_SPANS_CTE},
    agg AS (
        SELECT sh, count(DISTINCT id) AS ndocs, count(*) AS occurrences
        FROM spans GROUP BY sh
    )
    SELECT sh AS span_hash, ndocs, occurrences
    FROM agg WHERE ndocs > 1
    ORDER BY ndocs DESC, occurrences DESC, span_hash
    LIMIT 50
    """,
    covers=(),
    doc="k most-duplicated spans corpus-wide (boilerplate/template detector)",
)
def duplicate_span_topk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return duplicate_span_topk(load(spark, sf_dir, "documents"))


@register(
    "dedup_survivor_by_quality",
    # composes the clusters oracle with the text_quality base metrics:
    # both engines pick survivors from exactly the clusters they
    # agreed on, under the same deterministic policy.
    oracle="""
    WITH clusters AS (
        {clusters}
    ),
    q AS (
        SELECT doc_id,
               len({toks}) AS token_ct,
               CASE WHEN len({toks}) >= 10
                     AND CAST(len(list_filter({toks}, t -> t IN {stoplist})) AS DOUBLE)
                         / len({toks}) BETWEEN 0.01 AND 0.6
                     AND CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE)
                         / len(text) < 0.2
                    THEN 1 ELSE 0 END AS quality_ok
        FROM documents
    ),
    sized AS (
        SELECT cluster_id, count(*) AS dup_ct FROM clusters GROUP BY cluster_id
    ),
    ranked AS (
        SELECT c.cluster_id, c.doc_id,
               coalesce(q.quality_ok, 0) AS quality_ok,
               coalesce(q.token_ct, 0) AS token_ct,
               row_number() OVER (
                   PARTITION BY c.cluster_id
                   ORDER BY coalesce(q.quality_ok, 0) DESC,
                            coalesce(q.token_ct, 0) DESC,
                            c.doc_id
               ) AS rn
        FROM clusters c LEFT JOIN q ON q.doc_id = c.doc_id
    )
    SELECT r.cluster_id, r.doc_id AS survivor_id, r.quality_ok, r.token_ct, s.dup_ct
    FROM ranked r JOIN sized s USING (cluster_id)
    WHERE r.rn = 1 AND s.dup_ct > 1
    """.format(
        clusters=PLANS["dedup_clusters"].oracle,
        toks=sql_tokens("text"),
        stoplist="(" + ", ".join("'" + w + "'" for w in _QUALITY_STOPWORDS) + ")",
    ),
    covers=(),
    doc="quality-weighted survivorship: best doc per near-dup cluster, not min-id",
)
def dedup_survivor_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship POLICY on top of near-dup clustering: instead of
    the arbitrary min-id canonical (``dedup_canonical``), each
    multi-document cluster keeps its best member under the curation
    rule (C4/Gopher-gate pass first, then longest, then min id) —
    what a real pipeline does so dedup never deletes the best copy.

    Scale: everything rides on ``dedup_clusters``' cost; the policy
    adds one broadcast-sized metric join and a per-cluster window
    (partitioned by cluster_id — the same key the cluster table
    already shuffles on) plus a bounded cluster-size aggregate.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gmall_realtime2021_spark.functions.text import tokenize
    from gmall_realtime2021_spark.plans.textops import STOPWORDS

    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs)
    clusters = duplicate_clusters(docs, pairs)

    toks = tokenize(F.col("text"))
    punct = F.size(F.regexp_extract_all(F.col("text"), F.lit("[^a-zA-Z0-9\\s]"), 0))
    token_ct = F.size(toks).cast("long")
    stop_ratio = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double") / F.size(toks)
    punct_ratio = punct.cast("double") / F.length("text")
    q = fan_out(docs).select(
        "doc_id",
        token_ct.alias("token_ct"),
        F.when(
            (token_ct >= 10) & stop_ratio.between(0.01, 0.6) & (punct_ratio < 0.2), 1
        ).otherwise(0).alias("quality_ok"),
    )
    sized = clusters.groupBy("cluster_id").agg(F.count("*").alias("dup_ct"))
    joined = (
        clusters.join(q, "doc_id", "left")
        .select(
            "cluster_id",
            "doc_id",
            F.coalesce("quality_ok", F.lit(0)).alias("quality_ok"),
            F.coalesce("token_ct", F.lit(0)).alias("token_ct"),
        )
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality_ok"), F.desc("token_ct"), F.asc("doc_id")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(sized.filter(F.col("dup_ct") > 1), "cluster_id")
        .select("cluster_id", F.col("doc_id").alias("survivor_id"), "quality_ok", "token_ct", "dup_ct")
    )


@register(
    "dedup_incremental",
    oracle=f"""
    WITH {_SETS_CTE},
    sige AS (
        SELECT id, sh, {_minhash_exprs()}
        FROM nonempty WHERE id % 10 < 8
    ),
    sigi AS (
        SELECT id, sh, {_minhash_exprs()}
        FROM nonempty WHERE id % 10 >= 8
    ),
    bucketse AS (SELECT id AS ex, unnest({_band_key_list()}) AS band_key FROM sige),
    bucketsi AS (SELECT id AS inc, unnest({_band_key_list()}) AS band_key FROM sigi),
    cand AS (
        SELECT DISTINCT i.inc, e.ex
        FROM bucketsi i JOIN bucketse e USING (band_key)
    ),
    matched AS (
        SELECT inc, ex, jaccard FROM (
            SELECT c.inc, c.ex,
                   round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
                         (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 6) AS jaccard
            FROM cand c
            JOIN nonempty sa ON sa.id = c.inc
            JOIN nonempty sb ON sb.id = c.ex
        ) WHERE jaccard >= 0.5
    ),
    ranked AS (
        SELECT inc, ex, jaccard,
               row_number() OVER (PARTITION BY inc ORDER BY jaccard DESC, ex) AS rn,
               count(*) OVER (PARTITION BY inc) AS match_ct
        FROM matched
    ),
    best AS (
        SELECT inc, match_ct, ex AS best_match_id, jaccard AS best_jaccard
        FROM ranked WHERE rn = 1
    )
    SELECT d.doc_id,
           CASE WHEN b.inc IS NULL THEN 0 ELSE 1 END AS is_dup,
           coalesce(b.match_ct, 0) AS match_ct,
           coalesce(b.best_match_id, -1) AS best_match_id,
           coalesce(b.best_jaccard, 0.0) AS best_jaccard
    FROM (SELECT doc_id FROM documents WHERE doc_id % 10 >= 8) d
    LEFT JOIN best b ON b.inc = d.doc_id
    """,
    covers=(),
    doc="incremental-ingest dedup: incoming batch probed against the existing corpus index",
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-delivery dedup (``operators/dedup.incremental_near_dup``):
    docs with ``doc_id % 10 >= 8`` play the incoming batch, the rest
    the indexed corpus; each incoming doc reports whether (and which)
    existing doc it near-duplicates at Jaccard ≥ 0.5. The split is
    deterministic so the oracle runs the identical experiment.
    """
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    return incremental_near_dup(
        docs.filter(F.col("doc_id") % 10 < 8),
        docs.filter(F.col("doc_id") % 10 >= 8),
    )


@register(
    "curation_decisions",
    # composes three already-agreed-on oracles (quality gate, cluster
    # canonical, span stats) — the engines dispute nothing new here,
    # only the decision CASE.
    oracle="""
    WITH clusters AS (
        {clusters}
    ),
    q AS (
        SELECT doc_id,
               CASE WHEN len({toks}) >= 10
                     AND CAST(len(list_filter({toks}, t -> t IN {stoplist})) AS DOUBLE)
                         / len({toks}) BETWEEN 0.01 AND 0.6
                     AND CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE)
                         / len(text) < 0.2
                    THEN 1 ELSE 0 END AS quality_ok
        FROM documents WHERE len({toks}) > 0
    ),
    spanstats AS (
        {spans}
    ),
    merged AS (
        SELECT d.doc_id,
               coalesce(q.quality_ok, 0) AS quality_ok,
               c.cluster_id,
               coalesce(s.dup_frac, 0.0) AS span_dup_frac
        FROM documents d
        LEFT JOIN q ON q.doc_id = d.doc_id
        JOIN clusters c ON c.doc_id = d.doc_id
        LEFT JOIN spanstats s ON s.doc_id = d.doc_id
    )
    SELECT doc_id, cluster_id, quality_ok, span_dup_frac,
           CASE WHEN quality_ok = 0 THEN 'low_quality'
                WHEN cluster_id <> doc_id THEN 'near_dup'
                ELSE 'keep' END AS reason,
           CASE WHEN quality_ok = 1 AND cluster_id = doc_id THEN 1 ELSE 0 END AS keep
    FROM merged
    """.format(
        clusters=PLANS["dedup_clusters"].oracle,
        toks=sql_tokens("text"),
        stoplist="(" + ", ".join("'" + w + "'" for w in _QUALITY_STOPWORDS) + ")",
        spans=PLANS["duplicate_spans"].oracle,
    ),
    covers=(),
    doc="end-to-end curation verdict per doc: quality gate -> near-dup canonical -> keep/drop + reason",
)
def curation_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline's final per-document verdict — what actually ships
    to training: drop low-quality docs first (C4/Gopher gate), then
    drop near-dup cluster losers (min-id canonical survives), and
    report the substring-duplication fraction alongside for audit.
    One row per doc with ``keep`` and a ``reason`` code — the
    artifact a curation run materializes and every downstream split
    consumes.

    Scale: strictly the union of its parts' costs (quality is
    map-side, clusters is the LSH+CC pipeline, span stats is linear);
    the final assembly is three left joins on doc_id — co-partitioned
    after the first shuffle, no new quadratic term.
    """
    from pyspark.sql import functions as F

    from gmall_realtime2021_spark.functions.text import tokenize
    from gmall_realtime2021_spark.plans.textops import STOPWORDS

    docs = load(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    token_ct = F.size(toks)
    stop_ratio = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double") / token_ct
    punct_ratio = (
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[^a-zA-Z0-9\\s]"), 0)).cast("double")
        / F.length("text")
    )
    q = (
        fan_out(docs)
        .filter(token_ct > 0)
        .select(
            "doc_id",
            F.when(
                (token_ct >= 10) & stop_ratio.between(0.01, 0.6) & (punct_ratio < 0.2), 1
            ).otherwise(0).alias("quality_ok"),
        )
    )
    clusters = duplicate_clusters(docs, minhash_lsh_pairs(docs))
    spans = duplicate_span_stats(docs).select("doc_id", "dup_frac")
    merged = (
        docs.select("doc_id")
        .join(q, "doc_id", "left")
        .join(clusters, "doc_id")
        .join(spans, "doc_id", "left")
        .select(
            "doc_id",
            "cluster_id",
            F.coalesce("quality_ok", F.lit(0)).alias("quality_ok"),
            F.coalesce("dup_frac", F.lit(0.0)).alias("span_dup_frac"),
        )
    )
    reason = (
        F.when(F.col("quality_ok") == 0, "low_quality")
        .when(F.col("cluster_id") != F.col("doc_id"), "near_dup")
        .otherwise("keep")
    )
    keep = F.when((F.col("quality_ok") == 1) & (F.col("cluster_id") == F.col("doc_id")), 1).otherwise(0)
    return merged.select(
        "doc_id", "cluster_id", "quality_ok", "span_dup_frac",
        reason.alias("reason"), keep.alias("keep"),
    )


@register(
    "span_scrub",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id AS id, {sql_token_hashes(sql_tokens('text'))} AS hh FROM documents
    ),
    arrays AS (
        SELECT id, {sql_shingle_hashes('hh', SPAN_N)} AS shs FROM tok
    ),
    spans_pos AS (
        SELECT id, i - 1 AS pos, shs[i] AS sh
        FROM arrays, unnest(generate_series(1, len(shs))) AS u(i)
    ),
    dup AS (
        SELECT sh FROM spans_pos GROUP BY sh HAVING count(DISTINCT id) > 1
    ),
    covered AS (
        SELECT id, count(DISTINCT pos + off) AS covered_ct
        FROM spans_pos JOIN dup USING (sh)
        CROSS JOIN unnest(generate_series(0, {SPAN_N - 1})) AS o(off)
        GROUP BY id
    ),
    base AS (
        SELECT id, len(shs) + {SPAN_N - 1} AS token_ct FROM arrays WHERE len(shs) > 0
    )
    SELECT base.id AS doc_id, token_ct,
           coalesce(covered_ct, 0) AS covered_ct,
           token_ct - coalesce(covered_ct, 0) AS clean_ct,
           round(CAST(coalesce(covered_ct, 0) AS DOUBLE) / token_ct, 6) AS covered_frac
    FROM base LEFT JOIN covered ON covered.id = base.id
    """,
    covers=(),
    doc="substring-scrub accounting: tokens covered by duplicated spans vs clean tokens",
)
def span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return span_scrub_stats(load(spark, sf_dir, "documents"))


@register(
    "dedup_edit_distance",
    # candidate source: the simhash-pair oracle verbatim — both
    # engines verify exactly the candidate set they agreed on
    oracle="""
    WITH cand AS (
        {simhash_pairs}
    )
    SELECT a, b, hamming,
           CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_distance
    FROM cand
    JOIN documents da ON da.doc_id = a
    JOIN documents db ON db.doc_id = b
    WHERE abs(da.n_chars - db.n_chars) <= 64
      AND levenshtein(da.text, db.text) <= 64
    """.format(simhash_pairs=PLANS["dedup_simhash_pairs"].oracle),
    covers=(),
    doc="edit-distance verification of SimHash candidates (banded LSH -> exact Levenshtein)",
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact-verify stage of a fingerprint dedup pipeline, with
    character-level edit distance as the verifier (the right metric
    for OCR noise / minor edits, where token Jaccard is too coarse):
    SimHash hamming<=3 band candidates, a cheap length gate (a pair
    whose lengths differ by more than k cannot have distance <= k),
    then bounded Levenshtein.

    Scale discipline: Levenshtein is O(len * k) per pair WITH the
    threshold (Spark's 3-arg ``levenshtein`` early-exits; returns -1
    above k) — it only ever runs on the banded candidate pairs, never
    all-pairs, and the length gate prunes map-side before the text
    join. The two doc-text joins ship only candidate ids, mirroring
    the ids-only band-join discipline of ``minhash_lsh_pairs``.
    """
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    cand = simhash_near_dup_pairs(docs, max_hamming=3)
    # length gate FIRST, on id+length only (the gate drops ~70% of
    # candidates on this corpus) — document text joins in only for
    # the survivors, so the wide payload never ships for pruned pairs
    la = docs.select(F.col("doc_id").alias("a"), F.col("n_chars").alias("la"))
    lb = docs.select(F.col("doc_id").alias("b"), F.col("n_chars").alias("lb"))
    gated = (
        cand.join(la, "a")
        .join(lb, "b")
        .filter(F.abs(F.col("la") - F.col("lb")) <= 64)
        .select("a", "b", "hamming")
        # rebalance BEFORE the per-pair Levenshtein: the dim joins
        # broadcast, so without this the O(len·k) verify inherits the
        # band-join layout (skewed toward big fingerprint clusters)
        # and a handful of tasks do all the work. Explicit partition
        # count: AQE coalesces by BYTES, and these rows are tiny but
        # CPU-heavy — byte-sized coalescing would serialize the verify.
        .repartition(spark.sparkContext.defaultParallelism, "a", "b")
    )
    ta = docs.select(F.col("doc_id").alias("a"), F.col("text").alias("ta"))
    tb = docs.select(F.col("doc_id").alias("b"), F.col("text").alias("tb"))
    return (
        gated.join(ta, "a")
        .join(tb, "b")
        .select(
            "a",
            "b",
            "hamming",
            F.levenshtein("ta", "tb", 64).cast("long").alias("edit_distance"),
        )
        .filter(F.col("edit_distance") >= 0)
    )
