"""Structural invariants of the r05 additions that oracle equality
alone doesn't pin: sketch error bounds (Count-Min one-sided error,
Bloom no-false-negatives), systematic-sample tick conservation, and
SCD2 interval algebra."""

from __future__ import annotations

from gmall_realtime2021_spark.plans import get_plans
from gmall_realtime2021_spark.plans.corpus import PPS_K


def _rows(spark, sf_dir, name):
    return get_plans()[name].build(spark, sf_dir).collect()


def test_countmin_never_underestimates(spark, sf_dir):
    rows = _rows(spark, sf_dir, "countmin_heavyhitters")
    assert rows, "top-k candidates expected"
    for r in rows:
        assert r.cm_est >= r.exact_ct, r
        assert r.overestimate == r.cm_est - r.exact_ct


def test_bloom_admits_every_true_member(spark, sf_dir):
    rows = _rows(spark, sf_dir, "bloom_membership")
    assert rows
    for r in rows:
        # no false negatives: every true member is admitted, so the
        # bloom count is the truth plus exactly the false positives
        assert r.bloom_members == r.true_members + r.false_positives, r
        assert r.bloom_members <= r.customer_ct


def test_weighted_sample_conserves_ticks(spark, sf_dir):
    rows = _rows(spark, sf_dir, "weighted_sample")
    # every tick lands in exactly one segment, so picks sum to k
    assert sum(r.n_picks for r in rows) == PPS_K
    # without-replacement at doc grain: each doc appears once
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))
    # longer docs can absorb multiple ticks but never more than k
    assert all(1 <= r.n_picks <= PPS_K for r in rows)
    # first_tick indices are strictly increasing along the weight line
    ticks = sorted(r.first_tick for r in rows)
    assert ticks == sorted(set(ticks)) and ticks[0] >= 1 and ticks[-1] <= PPS_K


def test_scd2_intervals_partition_each_user(spark, sf_dir):
    rows = _rows(spark, sf_dir, "scd2_dim_build")
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for recs in by_user.values():
        recs.sort(key=lambda r: r.version)
        # versions are 1..n with exactly one open (current) row
        assert [r.version for r in recs] == list(range(1, len(recs) + 1))
        assert sum(r.is_current for r in recs) == 1
        assert recs[-1].is_current == 1
        for a, b in zip(recs, recs[1:]):
            # half-open intervals chain with no gap or overlap
            assert a.valid_to == b.valid_from
            assert a.valid_from < a.valid_to
        # no two adjacent versions carry the same attribute value
        # (change capture collapsed runs)
        for a, b in zip(recs, recs[1:]):
            assert a.event_type != b.event_type


def test_gopher_gate_fires_on_shaped_text(spark, tmp_path):
    """The line-grain Gopher rules and the C4 line filter must actually
    fire on shaped text (the parquet fixtures contain none)."""
    import os

    from gmall_realtime2021_spark.tables import TABLES

    good = (
        "the quick brown fox jumps over a lazy dog and the rest of this line is fine\n"
        "a second sentence keeps the word count of the document healthy and the gate open"
    )
    bullets = "\n".join(["- item the a of and is to in"] * 10)
    ellipsis = "\n".join(["the a of and is to in trailing off..."] * 10)
    symbols = "the a of " + "# " * 20
    rows = [
        (0, good, "en", "src0"),
        (1, bullets, "en", "src0"),
        (2, ellipsis, "en", "src0"),
        (3, symbols, "en", "src0"),
    ]
    tmp = str(tmp_path)
    dst = os.path.join(tmp, "documents.parquet")
    spark.createDataFrame(
        [(i, t, lang, s, len(t)) for i, t, lang, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(dst + ".dir")
    part = [f for f in os.listdir(dst + ".dir") if f.endswith(".parquet")][0]
    os.replace(os.path.join(dst + ".dir", part), dst)
    for t in TABLES:
        p = os.path.join(tmp, f"{t}.parquet")
        if not os.path.exists(p):
            os.symlink(f"/root/testdata/sf0.001/{t}.parquet", p)

    verdict = {
        r.doc_id: r.keep for r in get_plans()["gopher_quality"].build(spark, tmp).collect()
    }
    assert verdict == {0: 1, 1: 0, 2: 0, 3: 0}

    c4 = {r.doc_id: r for r in get_plans()["c4_line_filter"].build(spark, tmp).collect()}
    # ellipsis lines end in '.', and there are >= 3 of them with >= 5
    # words: C4 keeps that page while Gopher rejects it — the two
    # filters are intentionally not redundant
    assert c4[2].keep == 1
    assert c4[0].kept_lines == 0  # no terminal punctuation in doc 0
