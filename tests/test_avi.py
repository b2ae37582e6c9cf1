"""AVI codec + video frame-sampling units."""

from __future__ import annotations

from pos_api_pipeline_spark.llm.avi import (
    decode_avi,
    encode_avi,
    is_avi,
    sample_frames,
)
from pos_api_pipeline_spark.llm.png import Image


def _frame(w, h, rgb):
    return Image(w, h, 3, bytearray(bytes(rgb) * (w * h)))


def test_avi_roundtrip_pixels_and_fps():
    frames = [_frame(5, 3, (255, 0, 0)), _frame(5, 3, (0, 128, 255))]
    payload = encode_avi(frames, fps=4)
    assert is_avi(payload)
    fps, got = decode_avi(payload)
    assert fps == 4 and len(got) == 2
    for orig, dec in zip(frames, got):
        assert (dec.width, dec.height, dec.channels) == (5, 3, 3)
        assert bytes(dec.pixels) == bytes(orig.pixels)  # exact roundtrip


def test_avi_odd_width_row_padding():
    # width 3 → 9-byte rows padded to 12; must still roundtrip exactly
    frames = [_frame(3, 2, (1, 2, 3))]
    fps, got = decode_avi(encode_avi(frames))
    assert bytes(got[0].pixels) == bytes(frames[0].pixels)


def test_sample_frames_interval_semantics():
    frames = [_frame(2, 2, (i, i, i)) for i in range(10)]
    payload = encode_avi(frames, fps=10)  # 1000 ms clip, 100 ms/frame
    got = sample_frames(payload, every_ms=250)
    assert [t for t, _ in got] == [0, 250, 500, 750]
    assert [f.pixels[0] for _, f in got] == [0, 2, 5, 7]
    # sampling finer than the frame rate dedups to the 10 frames
    dense = sample_frames(payload, every_ms=10)
    assert len(dense) == 10


def test_non_avi_rejected():
    import pytest

    assert not is_avi(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError):
        decode_avi(b"not a movie")


def test_spark_sample_frames_rows_and_png(spark):
    from pos_api_pipeline_spark.llm.multimodal import (
        sample_frames as spark_sample,
        synthetic_avi_assets,
    )
    from pos_api_pipeline_spark.llm.png import decode_png

    assets = synthetic_avi_assets(spark, n=3, n_frames=6, fps=10)
    rows = spark_sample(assets, every_ms=200).collect()
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, []).append(r)
    assert set(by_asset) == {0, 1, 2}
    for aid, rs in by_asset.items():
        # 600 ms clip sampled every 200 ms → ticks 0,200,400 → 3 frames
        assert [r.t_ms for r in sorted(rs, key=lambda r: r.t_ms)] == [
            0, 200, 400,
        ]
        for r in rs:
            img = decode_png(bytes(r.frame_png))
            assert (img.width, img.height) == (r.width, r.height)
            # solid-color frame: red channel encodes the asset id
            assert img.pixels[0] == (aid * 20) % 256
