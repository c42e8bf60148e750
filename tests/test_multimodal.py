"""Multimodal column plumbing: Arrow-batched mapInPandas pipelines over
binary payload columns with typed metadata. The codec is a deterministic
stub (no media libs in this environment); the schemas, batch shapes, and
data paths under test are the real ones."""

from __future__ import annotations

import pytest

from glamira_end_to_end_data_pipeline_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    df = mm.synthetic_media(spark, 64)
    df.persist()
    yield df
    df.unpersist()


def _names_types(schema):
    return [(f.name, f.dataType) for f in schema.fields]


def test_synthetic_media_schema(media):
    assert _names_types(media.schema) == _names_types(mm.MEDIA_SCHEMA)
    assert media.count() == 64
    mods = {r.modality for r in media.select("modality").distinct().collect()}
    assert mods == {"image", "audio", "video"}


def test_extract_features_shape_and_determinism(media):
    out = mm.extract_features(media)
    assert out.schema == mm.FEATURES_SCHEMA
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 64
    for r in rows.values():
        assert len(r.features) == mm.FEATURE_DIM
        assert abs(sum(r.features) - 1.0) < 1e-3  # normalized histogram
        assert r.n_bytes == 64  # 16-byte md5 × 4
    # deterministic across executions
    rows2 = {r.media_id: r for r in mm.extract_features(media).collect()}
    assert all(rows[k].features == rows2[k].features for k in rows)


def test_resize_images_metadata_scaling(media):
    out = {r.media_id: r for r in mm.resize_images(media, max_side=256).collect()}
    src = {r.media_id: r for r in media.filter("modality = 'image'").collect()}
    assert set(out) == set(src)
    for mid, r in out.items():
        w, h = src[mid].width, src[mid].height
        if max(w, h) <= 256:
            assert (r.width, r.height) == (w, h)
        else:
            scale = 256 / max(w, h)
            assert r.width == int(w * scale) and r.height == int(h * scale)
            assert max(r.width, r.height) == 256
            assert len(r.payload) <= len(src[mid].payload)


def test_sample_video_frames_offsets(media):
    out = mm.sample_video_frames(media, every_ms=1000)
    rows = out.collect()
    durs = {
        r.media_id: r.duration_ms
        for r in media.filter("modality = 'video'").collect()
    }
    by_id: dict[int, list[int]] = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r.frame_ms)
    assert set(by_id) == set(durs)
    for mid, offs in by_id.items():
        expect = list(range(0, max(int(durs[mid]), 1), 1000))
        assert sorted(offs) == expect
    assert all(r.frame_payload is not None for r in rows)


def test_decoder_registry_is_swappable(spark):
    """Registering a real decoder is a dict assignment — the plan and
    schemas are unchanged."""
    orig = mm.DECODERS["image"]
    try:
        mm.DECODERS["image"] = lambda p: [float(len(p or b""))] * mm.FEATURE_DIM
        out = mm.extract_features(mm.synthetic_media(spark, 6))
        img = [r for r in out.collect() if r.modality == "image"]
        assert all(r.features == [64.0] * mm.FEATURE_DIM for r in img)
    finally:
        mm.DECODERS["image"] = orig


def test_decoder_swap_changes_zero_plans(spark):
    """Contract (VERDICT r4 #6): the physical plan is IDENTICAL whether
    the stub or a real codec is registered — the decoder runs inside
    the Arrow batch iterator, invisible to Catalyst, so swapping in
    Pillow/ffmpeg later cannot alter partitioning, pruning, or the
    exchange structure this suite has pinned."""
    import re

    from tests.test_plans import plan_of

    def normalized(df):
        # strip auto-incremented expression ids (#123) — they differ
        # per plan instance, not per plan shape
        return re.sub(r"#\d+", "#", plan_of(df))

    media = mm.synthetic_media(spark, 6)
    before = normalized(mm.extract_features(media))
    orig = mm.DECODERS["image"]
    try:
        mm.DECODERS["image"] = lambda p: [0.0] * mm.FEATURE_DIM
        after = normalized(mm.extract_features(media))
    finally:
        mm.DECODERS["image"] = orig
    assert before == after


def test_pack_shards_deterministic_and_budget_bounded(spark):
    from pyspark.sql import functions as F

    from glamira_end_to_end_data_pipeline_spark.operators.multimodal import (
        pack_shards,
        synthetic_media,
    )

    media = synthetic_media(spark, 200).select(
        "media_id",
        "modality",
        (F.col("media_id") / 64).cast("int").alias("batch"),
        ((F.col("media_id") % 97) * 64 + F.length("payload"))
        .cast("long")
        .alias("size_bytes"),
    )
    a = pack_shards(media, "size_bytes", 4096, ["modality", "batch"], "media_id")
    b = pack_shards(
        media.repartition(13), "size_bytes", 4096, ["modality", "batch"], "media_id"
    )
    rows_a = {r["media_id"]: r["shard_id"] for r in a.collect()}
    rows_b = {r["media_id"]: r["shard_id"] for r in b.collect()}
    assert rows_a == rows_b, "shard membership must not depend on partitioning"
    # shard ids are monotone in media_id within a group, and a shard's
    # PRE-item cumulative size never exceeds its budget slot
    import collections

    per_group = collections.defaultdict(list)
    for r in a.orderBy("modality", "batch", "media_id").collect():
        per_group[(r["modality"], r["batch"])].append((r["media_id"], r["shard_id"], r["size_bytes"]))
    for g, items in per_group.items():
        cum = 0
        for _, shard, size in items:
            assert shard == cum // 4096, (g, items)
            cum += size


def test_pack_shards_tiebreak_totalizes_duplicate_order_keys(spark):
    """With a repeating order key (same ingest second), tiebreak_cols
    must make shard membership a pure function of the data — identical
    across partitioning layouts."""
    from pyspark.sql import functions as F

    from glamira_end_to_end_data_pipeline_spark.operators.multimodal import (
        pack_shards,
    )

    rows = [(i, "img", 0, i % 3, 900) for i in range(30)]  # ts has dups
    df = spark.createDataFrame(
        rows, "media_id long, modality string, batch int, ts int, size_bytes long"
    )
    out1 = pack_shards(
        df.repartition(1), "size_bytes", 2048, ["modality", "batch"], "ts",
        tiebreak_cols=["media_id"],
    )
    out2 = pack_shards(
        df.repartition(13, "media_id"), "size_bytes", 2048,
        ["modality", "batch"], "ts", tiebreak_cols=["media_id"],
    )
    m1 = {r.media_id: r.shard_id for r in out1.collect()}
    m2 = {r.media_id: r.shard_id for r in out2.collect()}
    assert m1 == m2
    # tiebroken order == ordering by the unique key alone here
    ref = pack_shards(df, "size_bytes", 2048, ["modality", "batch"], "media_id")
    # not identical orders (ts groups reorder), but membership is still
    # budget-bounded and total
    sizes = (
        out1.groupBy("modality", "batch", "shard_id")
        .agg(F.sum("size_bytes").alias("b"))
        .collect()
    )
    assert all(r.b <= 2048 + 900 for r in sizes)
    assert ref.count() == out1.count()


def test_audio_energy_windows_matches_hand_computation(media):
    import hashlib

    rows = mm.audio_energy_windows(
        media.filter("modality = 'audio'"), window_bytes=16
    ).collect()
    by_key = {(r.media_id, r.window_idx): r for r in rows}
    # payload = unhex(md5(id) * 4) = 64 bytes -> 4 windows of 16
    mid = 1  # id % 3 == 1 -> audio
    payload = bytes.fromhex(hashlib.md5(b"1").hexdigest() * 4)
    assert len(payload) == 64
    for w in range(4):
        seg = payload[w * 16 : (w + 1) * 16]
        r = by_key[(mid, w)]
        assert r.energy == sum(seg)
        assert r.start_byte == w * 16
        assert r.mean_level == round(sum(seg) / 16.0, 4)
        assert r.is_silence == (sum(seg) < 1900)
    n_audio = media.filter("modality = 'audio'").count()
    assert len(rows) == n_audio * 4


def test_audio_energy_windows_is_pure_codegen(media):
    """No Python evaluation node anywhere — binary -> scalars stays
    JVM-side (the entry's whole point)."""
    df = mm.audio_energy_windows(media.filter("modality = 'audio'"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan


def test_audio_energy_windows_short_and_ragged_payloads(spark):
    """Payloads shorter than one window yield ZERO rows (not the
    descending-sequence garbage Spark's sequence(0, -1) would emit),
    and a trailing partial window is dropped."""
    df = spark.createDataFrame(
        [(1, bytes(range(8))), (2, bytes(range(40))), (3, b"")],
        "media_id long, payload binary",
    )
    rows = mm.audio_energy_windows(df, window_bytes=16).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    assert 1 not in by_id  # 8 bytes < one window
    assert 3 not in by_id  # empty payload
    assert [r.window_idx for r in sorted(by_id[2], key=lambda r: r.window_idx)] == [0, 1]
    assert all(r.window_idx >= 0 for r in rows)
    assert by_id[2][0].energy == sum(range(16))
