"""Adversarial-corpus parity: every documents-driven plan must stay
ORACLE-EXACT (not merely not-crash) on edge-case documents the
synthetic fixtures never produce — empty text, symbol-only text,
sub-shingle token counts, multibyte unicode, huge repetition.

This is the suite that caught the descending-sequence shingles bug;
it generalizes that lesson to every text plan at once.
"""

from __future__ import annotations

import os

import pytest

from gmall_realtime2021_spark.plans import get_plans
from gmall_realtime2021_spark.tables import TABLES
from tests.oracle_compare import compare

SF = "/root/testdata/sf0.001"

EDGE_DOCS = [
    # (doc_id, text, lang, source)
    (0, "", "en", "src0"),
    (1, "???!!! ...", "en", "src0"),          # zero tokens after split
    (2, "a", "en", "src1"),                    # 1 token (< shingle n)
    (3, "a b", "en", "src1"),                  # 2 tokens
    (4, "the the the the the the the the the the the the", "en", "src2"),  # pure repetition
    (5, "ناقلة نص عربي مع كلمات the and of", "ar", "src2"),  # multibyte + markers
    (6, "der die das und ist ein mixed with the a of", "de", "src3"),      # bilingual markers
    (7, "x9 42 7z " * 40, "en", "src3"),       # digit-heavy, 120 tokens
    (8, "one two three four five six seven eight nine ten eleven twelve", "en", "src4"),
    # CJK rows — the tokenizer's native domain (reference is a Chinese
    # e-commerce pipeline): mixed CJK/latin, pure CJK run (bigrams),
    # lone CJK char, CJK with punctuation/fullwidth separators.
    (9, "小米手机 iPhone12 优惠券", "zh", "src4"),
    (10, "苹果手机苹果平板电脑", "zh", "src0"),
    (11, "米", "zh", "src1"),
    (12, "华为：智能手机，平板。Apple 手表 watch2", "zh", "src2"),
    # long-run documents: an 800-char unbroken CJK run and an
    # 800-token latin doc. These exist to keep the tokenizer/shingle
    # kernels LINEAR — the interpreted-HOF re-evaluation bug class
    # (quadratic per doc) turns these rows into a visible hang, where
    # short fixtures kept it invisible for two rounds.
    (13, "".join(chr(0x4E00 + (i * 7) % 3000) for i in range(800)), "zh", "src3"),
    (14, " ".join(f"w{i % 97}x{i % 13}" for i in range(800)), "en", "src4"),
    # PII-bearing docs — the synthetic corpus contains no PII, so
    # pii_scan's regex parity (Java vs RE2) is only ever exercised
    # here: email, international phone, IPv4, boundary-adjacent
    # non-matches (trailing word char kills \b, 'x@y' has no TLD).
    (15, "contact Bob.Smith+spam@Example-Mail.com or +14155551234 now", "en", "src0"),
    (16, "host 10.0.0.1 and 255.12.3.45x plus x@y and a@b.co done", "en", "src1"),
    # NULL text — nullable parquet column; every kernel must propagate
    # NULL exactly like the expression/oracle twins (r05 fixed the
    # Arrow kernels crashing here)
    (17, None, "en", "src2"),
    # Line-structured docs — the synthetic corpus has no newlines or
    # punctuation, so the line-grain rules (gopher bullet/ellipsis,
    # C4 terminal-punct) only ever BIND here.
    (
        18,
        "The first line is a full sentence with plenty of words.\n"
        "short line\n"
        "- bullet item one\n"
        "  - indented bullet two\n"
        "* starred bullet three\n"
        "This thought just trails off into nothing at all...\n"
        'He said "this line ends with a quote after five words"\n'
        "Does this line end with a question mark after enough words?\n"
        "Yes and this one ends with an exclamation of joy!\n",
        "en",
        "src3",
    ),
    # CRLF line endings: Java's non-MULTILINE `$` matches before a
    # final \r, RE2's does not — the plans anchor with \z so both
    # engines agree these lines do NOT end in terminal punctuation.
    (19, "A windows sentence with five words.\r\nAnother carriage return line here too.\r\n", "en", "src4"),
    # whitespace-only lines, tab-led bullet, ellipsis with trailing
    # spaces (rtrim must strip them identically), lines of exactly
    # 4 vs 5 words around the C4 cutoff
    (
        20,
        "   \n\t- tab bullet\nfour words not enough.\nexactly five words right here.\nending with spaces after dots...   \n",
        "en",
        "src0",
    ),
    # '#' symbols and '....' (the 4-dot run counts ONE '...' match in
    # both engines' non-overlapping leftmost scan)
    (21, "## markdown #heading with #tags....\nplain words follow the heading here.", "en", "src1"),
]

DOC_PLANS = [
    "keyword_stats",
    "keyword_stats_sql",
    "language_id",
    "text_quality",
    "token_count",
    "doc_fingerprint",
    "corpus_split",
    "corpus_quality_gate",
    "doc_chunks",
    "chunk_packing",
    "repetition_stats",
    "stratified_sample",
    "ngram_topk",
    "tfidf_topterms",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_simhash_narrow",
    "dedup_simhash_narrow_pairs",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_canonical",
    "data_mix_weights",
    "length_histogram",
    "bpe_merge_step",
    "dedup_containment",
    "cross_split_leakage",
    "leakage_free_split",
    "pii_scan",
    "pii_redact",
    "quality_deciles",
    "duplicate_spans",
    "duplicate_span_topk",
    "dedup_survivor_by_quality",
    "dedup_incremental",
    "curation_decisions",
    "span_scrub",
    "token_cooccurrence_topk",
    "bm25_topk",
    "hybrid_retrieval",
    "rrf_fusion",
    "gopher_quality",
    "c4_line_filter",
    "vocab_coverage",
    "countmin_heavyhitters",
    "weighted_sample",
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("edge"))
    rows = [(i, t, lang, src, len(t) if t is not None else None) for i, t, lang, src in EDGE_DOCS]
    dst_doc = os.path.join(tmp, "documents.parquet")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(dst_doc + ".dir")
    part = [f for f in os.listdir(dst_doc + ".dir") if f.endswith(".parquet")][0]
    os.replace(os.path.join(dst_doc + ".dir", part), dst_doc)
    # other tables: borrow the smoke fixtures so view registration works
    for t in TABLES:
        dst = os.path.join(tmp, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SF, f"{t}.parquet"), dst)
    return tmp


@pytest.mark.parametrize("name", DOC_PLANS)
def test_plan_oracle_exact_on_edge_corpus(spark, edge_dir, name):
    plan = get_plans()[name]
    compare(plan.build(spark, edge_dir), plan.oracle, edge_dir)
