"""Multimodal binary columns: schema, stubbed decode, batch shapes."""

import numpy as np
import pytest

from geobuf_cpp_spark.operators.multimodal import (
    decode_stub,
    extract_media_features,
    frame_sample,
    media_dataframe,
    media_stats,
    synth_media_batch,
)


@pytest.fixture(scope="module")
def media(spark):
    df = media_dataframe(spark, 120, partitions=4)
    df.persist()
    yield df
    df.unpersist()


def test_media_generation_deterministic():
    a = synth_media_batch(np.arange(10))
    b = synth_media_batch(np.arange(10))
    assert all(x == y for x, y in zip(a["payload"], b["payload"]))
    assert set(a["kind"]) == {"image", "audio"}


def test_decode_stub_roundtrip():
    row = synth_media_batch(np.array([5])).iloc[0]
    w, h, body = decode_stub(row["payload"])
    assert (w, h) == (row["meta"]["width"], row["meta"]["height"])
    assert body.size == len(row["payload"]) - 12


def test_real_codec_raises_not_implemented():
    row = synth_media_batch(np.array([1])).iloc[0]
    with pytest.raises(NotImplementedError, match="jpeg"):
        decode_stub(row["payload"], codec="jpeg")


def test_feature_extraction_shapes(spark, media):
    feats = extract_media_features(media).toPandas()
    assert len(feats) == 120
    assert all(len(f) == 8 for f in feats["feature"])
    # histogram features are normalized
    assert np.allclose([sum(f) for f in feats["feature"]], 1.0, atol=1e-5)
    assert (feats["mean_byte"] > 0).all()


def test_frame_sampling_explodes(spark, media):
    frames = frame_sample(media, every_n=4).toPandas()
    assert len(frames) > 120  # explode: multiple frames per media row
    assert (frames.groupby("media_id").size() >= 1).all()


def test_media_stats_prunes_payload(spark, media, tmp_path):
    # pruning is a property of the columnar scan: persist to parquet first
    path = str(tmp_path / "media")
    media.write.parquet(path)
    stored = spark.read.parquet(path)
    stats = media_stats(stored)
    out = stats.toPandas()
    assert out["n"].sum() == 120
    plan = stats._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in plan.splitlines() if "FileScan" in l or "ReadSchema" in l]
    assert scan and all("payload" not in l for l in scan), plan

def test_resize_media_nearest_neighbor(spark):
    """The resize output must equal a local numpy nearest-neighbor gather
    on the decoded grid — shape AND bytes."""
    import numpy as np

    from geobuf_cpp_spark.operators.multimodal import (
        decode_stub,
        media_dataframe,
        resize_media,
        synth_media_batch,
    )

    out = {
        r["media_id"]: r
        for r in resize_media(media_dataframe(spark, 30), out_w=8, out_h=8).collect()
    }
    assert len(out) == 30
    local = synth_media_batch(np.arange(30))
    for _, row in local.iterrows():
        got = out[row["media_id"]]
        w, h, body = decode_stub(bytes(row["payload"]))
        if row["kind"] == "image":
            img = body[: w * h].reshape(h, w)
            yi = (np.arange(8) * h) // 8
            xi = (np.arange(8) * w) // 8
            expect = img[yi[:, None], xi].tobytes()
        else:
            n = 64
            idx = (np.arange(n) * body.size) // n
            expect = body[np.minimum(idx, body.size - 1)].tobytes()
        assert bytes(got["pixels"]) == expect
        assert (got["out_w"], got["out_h"]) == (8, 8)
