"""Pure-numpy GIF decoder (operators/gif.py): LZW round-trips against
the literal-code synth encoder, interlace, animation walking, and the
hostile-input caps.  No Spark session needed — pure codec tests."""

import numpy as np
import pytest

from go_parsesyslog_spark.operators.gif import (
    GIF_MAX_FRAMES,
    decode_gif,
    synth_gif,
)


def _expected_idx(width, height, ncol=16, f=0):
    return ((np.add.outer(np.arange(height), np.arange(width)) + f)
            % ncol).astype(np.uint8)


def test_roundtrip_single_frame():
    payload = synth_gif(16, 12, seed=3)
    img, meta = decode_gif(payload)
    assert img.shape == (12, 16, 3)
    assert meta["n_frames"] == 1
    assert meta["gct_size"] == 16
    assert not meta["interlaced"]
    # pixel-exact: palette[diagonal gradient]
    rng = np.random.default_rng(3)
    palette = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    assert np.array_equal(img, palette[_expected_idx(16, 12)])


def test_roundtrip_interlaced():
    plain, _ = decode_gif(synth_gif(16, 13, seed=1))
    inter, meta = decode_gif(synth_gif(16, 13, seed=1, interlace=True))
    assert meta["interlaced"]
    assert np.array_equal(plain, inter)


def test_lzw_clear_handling_on_larger_image():
    """>14 pixels forces the encoder's mid-stream CLEAR codes — the
    decoder's table reset path is exercised for real."""
    img, _ = decode_gif(synth_gif(64, 48, seed=7))
    assert img.shape == (48, 64, 3)


def test_animation_walked_not_decoded():
    payload = synth_gif(8, 8, seed=0, n_frames=5, delay_cs=10)
    img, meta = decode_gif(payload)
    assert meta["n_frames"] == 5
    assert meta["total_delay_cs"] == 50
    # first frame composited; later frames only counted
    rng = np.random.default_rng(0)
    palette = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    assert np.array_equal(img, palette[_expected_idx(8, 8)])


def test_hostile_inputs_raise_not_crash():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTGIF" + bytes(20))
    with pytest.raises(ValueError, match="out of bounds"):
        # 65535 x 65535 screen blows the pixel cap before allocation
        decode_gif(b"GIF89a" + b"\xff\xff\xff\xff" + bytes(3))
    with pytest.raises(ValueError):
        decode_gif(synth_gif(8, 8)[:-10])  # truncated stream
    # LZW data claiming more pixels than the frame: capped, not OOM
    good = bytearray(synth_gif(8, 8, seed=2))
    with pytest.raises(ValueError):
        decode_gif(bytes(good[:-1]) * 2)


def test_frame_cap():
    payload = synth_gif(2, 2, n_frames=GIF_MAX_FRAMES + 1)
    with pytest.raises(ValueError, match="frames"):
        decode_gif(payload)


def test_image_features_dispatches_gif():
    from go_parsesyslog_spark.operators.multimodal import image_features

    feat = image_features(synth_gif(16, 12, seed=5))
    assert len(feat) == 16
    assert feat[0] == 16.0 and feat[1] == 12.0
