"""Multimodal plumbing tests (SURVEY.md §7 M5): schema, batch shape,
determinism, explode semantics, ANN hand-off. The decode codecs are
stubbed (deterministic fake) — these tests pin the Spark-side
contract that a real codec drop-in must keep.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall_realtime2021_spark.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    frame_sample,
    resize_images,
    synthesize_media,
)
from gmall_realtime2021_spark.operators.similarity import cosine_topk
from gmall_realtime2021_spark.tables import load

SF = "/root/testdata/sf0.001"


def _media(spark):
    return synthesize_media(load(spark, SF, "documents"))


def test_media_schema_and_kinds(spark):
    media = _media(spark)
    # simpleString ignores nullability (literal-derived fields are non-null)
    assert media.schema.simpleString() == MEDIA_SCHEMA.simpleString()
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_metadata_filter_never_reads_payload(spark):
    plan = (
        _media(spark)
        .filter(F.col("meta.width") > 100)
        .select("media_id", "kind", "meta.width")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "payload" not in plan  # column pruning: binary column absent from the scan


def test_decode_deterministic_and_complete(spark):
    media = _media(spark)
    out = decode_media(media)
    assert out.count() == media.count()
    row = out.filter(F.col("media_id") == out.agg(F.min("media_id")).collect()[0][0]).collect()[0]
    again = decode_media(media).filter(F.col("media_id") == row.media_id).collect()[0]
    assert (row.byte_ct, row.mean_byte, row.decoder) == (again.byte_ct, again.mean_byte, again.decoder)
    assert row.decoder == "fake"  # no codec libs in this container
    assert row.byte_ct > 0


def test_resize_contract(spark):
    out = resize_images(_media(spark), width=8, height=4).collect()
    assert out and all(len(r.payload) == 32 for r in out)


def test_frame_sample_explode_counts(spark):
    media = _media(spark)
    frames = frame_sample(media, every_ms=1000)
    per_media = {r.media_id: r.ct for r in frames.groupBy("media_id").agg(F.count("*").alias("ct")).collect()}
    expected = {
        r.media_id: max(1, r.meta.duration_ms // 1000)
        for r in media.filter(F.col("kind") == "video").collect()
    }
    assert per_media == expected


def test_features_feed_ann(spark):
    media = _media(spark).limit(50)
    feats = extract_features(media, dim=16).withColumnRenamed("media_id", "vec_id")
    queries = feats.limit(3)
    topk = cosine_topk(queries, feats, k=2, vec_col="embedding")
    got = topk.collect()
    assert len(got) == 6  # 3 queries × k=2
    # self-similarity must rank first with cosine ≈ 1
    best = {r.asDict()["query_id"]: r for r in got if r.asDict()["rank"] == 1}
    for qid, r in best.items():
        d = r.asDict()
        assert d["neighbor_id"] == qid and abs(d["cos"] - 1.0) < 1e-5
