import numpy as np
import pytest

from tclight_tpu.utils.video_io import (
    count_frames,
    get_frame_ids,
    load_video,
    resize_center_crop,
    save_frames,
    save_video,
)


def test_get_frame_ids():
    assert get_frame_ids([0, 30, 1])[:3] == [0, 1, 2]
    assert len(get_frame_ids([0, 30, 1])) == 30
    assert get_frame_ids([0, 10, 2]) == [0, 2, 4, 6, 8]
    assert get_frame_ids(None, frame_ids=[3, 5]) == [3, 5]
    assert get_frame_ids([0, 100, 1], n_total=8) == list(range(8))
    assert get_frame_ids(None, n_total=4) == [0, 1, 2, 3]


def test_resize_center_crop_rounds_to_base(rng):
    img = (rng.uniform(size=(37, 53, 3)) * 255).astype(np.uint8)
    out = resize_center_crop(img, None, None, base=8)
    assert out.shape == (32, 48, 3)
    out2 = resize_center_crop(img, 20, 20, base=8)
    assert out2.shape == (16, 16, 3)


def test_frame_dir_roundtrip(tmp_path, rng):
    frames = rng.uniform(size=(4, 24, 32, 3)).astype(np.float32)
    save_frames(frames, tmp_path / "frames")
    assert count_frames(tmp_path / "frames") == 4
    loaded = load_video(tmp_path / "frames")
    assert loaded.shape == (4, 24, 32, 3)
    assert np.abs(loaded - frames).max() < 2 / 255

    subset = load_video(tmp_path / "frames", frame_ids=[1, 3])
    np.testing.assert_allclose(subset, loaded[[1, 3]])


def test_video_roundtrip_mp4(tmp_path, rng):
    # smooth gradient content (binary noise is pathological for lossy codecs)
    y = np.linspace(0, 1, 32)[None, :, None, None]
    x = np.linspace(0, 1, 48)[None, None, :, None]
    t = np.linspace(0, 1, 6)[:, None, None, None]
    frames = np.broadcast_to((y * x + t) / 2.0, (6, 32, 48, 3)).astype(np.float32)
    path = tmp_path / "v.mp4"
    save_video(frames, path, fps=8)
    n = count_frames(path)
    assert n == 6
    loaded = load_video(path)
    assert loaded.shape == (6, 32, 48, 3)
    # lossy codec: loose tolerance
    assert np.abs(loaded - frames).mean() < 0.1


def test_video_resize_on_load(tmp_path, rng):
    frames = rng.uniform(size=(2, 40, 56, 3)).astype(np.float32)
    save_frames(frames, tmp_path / "f")
    loaded = load_video(tmp_path / "f", height=24, width=32)
    assert loaded.shape == (2, 24, 32, 3)


def test_save_video_stream_matches_save_video(tmp_path):
    from tclight_tpu.utils.video_io import save_video_stream

    y = np.linspace(0, 1, 32)[None, :, None, None]
    x = np.linspace(0, 1, 48)[None, None, :, None]
    t = np.linspace(0, 1, 7)[:, None, None, None]
    frames = np.broadcast_to((y * x + t) / 2.0, (7, 32, 48, 3)).astype(np.float32)
    u8 = (frames * 255 + 0.5).astype(np.uint8)

    save_video(u8, tmp_path / "whole.mp4", fps=8)
    # uneven chunk split, mixed dtypes
    save_video_stream(
        iter([u8[:3], frames[3:5], u8[5:]]), tmp_path / "stream.mp4", fps=8)
    assert count_frames(tmp_path / "stream.mp4") == 7
    a = load_video(tmp_path / "whole.mp4")
    b = load_video(tmp_path / "stream.mp4")
    np.testing.assert_allclose(a, b, atol=0.05)


def test_save_video_stream_propagates_producer_error(tmp_path):
    from tclight_tpu.utils.video_io import save_video_stream

    def bad():
        yield np.zeros((2, 16, 16, 3), np.uint8)
        raise RuntimeError("boom")

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="boom"):
        save_video_stream(bad(), tmp_path / "x.mp4", fps=8)
