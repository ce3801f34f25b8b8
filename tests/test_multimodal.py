"""Multimodal plumbing: schemas, batch shapes, determinism, column pruning."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from deep_ner_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def images(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("media") / "images.parquet")
    mm.gen_fake_media(spark, n=32, seed=9, kind="image").write.parquet(path)
    return spark.read.parquet(path)


@pytest.fixture(scope="module")
def audio(spark):
    return mm.gen_fake_media(spark, n=16, seed=9, kind="audio")


def test_image_features_shape_and_determinism(images, spark):
    out = mm.image_features(images, grid=4)
    rows = {r["media_id"]: r["features"] for r in out.collect()}
    assert len(rows) == 32
    assert all(len(v) == 4 * 4 * 3 for v in rows.values())
    rows2 = {r["media_id"]: r["features"] for r in mm.image_features(images, grid=4).collect()}
    for k in rows:
        assert np.allclose(rows[k], rows2[k])


def test_resize_plan_prunes_binary(images, spark):
    plan_df = mm.image_resize_plan(images, target=224)
    rows = plan_df.collect()
    for r in rows:
        assert r["out_width"] <= 224 and r["out_height"] <= 224
        assert max(r["out_width"], r["out_height"]) >= 50
    explained = plan_df._jdf.queryExecution().executedPlan().toString()
    # metadata-only query must not read the blob column from parquet
    assert "content" not in explained.split("ReadSchema")[-1][:400]


def test_audio_frames(audio, spark):
    out = mm.audio_frame_sample(audio, frame_len=400, hop=160, max_frames=5)
    rows = out.collect()
    assert len(rows) > 0
    per_media = {}
    for r in rows:
        per_media.setdefault(r["media_id"], []).append(r["frame_idx"])
        assert r["energy"] >= 0.0
    for idxs in per_media.values():
        assert sorted(idxs) == list(range(len(idxs)))  # dense frame indices


def test_media_dedup_hash(images, spark):
    out = mm.media_dedup_hashes(images)
    rows = out.collect()
    assert len({r["content_hash"] for r in rows}) == len(rows)  # all distinct
    assert all(len(r["content_hash"]) == 32 for r in rows)


def test_codec_seam_raises_without_fake(monkeypatch):
    monkeypatch.setattr(mm, "DETERMINISTIC_FAKE", False)
    with pytest.raises(NotImplementedError):
        mm._decode_image(b"xx", 4, 4)
    with pytest.raises(NotImplementedError):
        mm._decode_audio(b"xx", 100)


def test_video_frame_sample(spark):
    import numpy as np

    from deep_ner_spark.operators import multimodal as mm

    vids = mm.gen_fake_video(spark, n=6, seed=5)
    out = mm.video_frame_sample(vids, n_out=4)
    rows = out.collect()
    assert len(rows) == 6 * 4
    # uniform sampling: frame_idx = (k * n_frames) // 4, strictly within range
    meta = {r["media_id"]: r["meta"] for r in vids.collect()}
    for r in rows:
        nf = meta[r["media_id"]]["n_frames"]
        assert r["frame_idx"] == (r["sample_idx"] * nf) // 4
        assert 0 <= r["frame_idx"] < nf
    # bit-exact against a hand computation through the decode seam
    v0 = vids.where("media_id = 0").collect()[0]
    w, h = v0["meta"]["width"], v0["meta"]["height"]
    frame = mm._decode_video_frame(bytes(v0["content"]), 0, w, h)
    want = np.float32(int(frame.astype(np.int64).sum()) / (w * h))
    got = [r for r in rows if r["media_id"] == 0 and r["sample_idx"] == 0][0]
    assert got["mean_intensity"] == want
    # determinism across runs
    again = {(r["media_id"], r["sample_idx"]): r["mean_intensity"]
             for r in mm.video_frame_sample(vids, n_out=4).collect()}
    assert all(again[(r["media_id"], r["sample_idx"])] == r["mean_intensity"]
               for r in rows)
