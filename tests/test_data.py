"""Data layer: format IO round-trips, synthetic parsers over generated
dataset trees, VideoDataParser flow caching."""

import numpy as np
import pytest

from tclight_tpu.config import ConfigDict
from tclight_tpu.data.dataparsers import VideoDataParser
from tclight_tpu.data.formats import (
    read_flo,
    read_pfm,
    write_flo,
    write_pfm,
)
from tclight_tpu.data.synthetic import (
    CarlaDataParser,
    SceneFlowDataParser,
    parse_visim_trajectory,
    read_sceneflow_camdata,
    rgbd_to_world,
)
from tclight_tpu.utils.video_io import save_frames


def test_pfm_roundtrip(tmp_path, rng):
    for shape in [(6, 8), (6, 8, 3)]:
        arr = rng.standard_normal(shape).astype(np.float32)
        write_pfm(tmp_path / "x.pfm", arr)
        back, scale = read_pfm(tmp_path / "x.pfm")
        np.testing.assert_allclose(back, arr, atol=1e-6)


def test_flo_roundtrip(tmp_path, rng):
    flow = rng.standard_normal((5, 7, 2)).astype(np.float32)
    write_flo(tmp_path / "f.flo", flow)
    np.testing.assert_allclose(read_flo(tmp_path / "f.flo"), flow, atol=1e-7)


def test_rgbd_to_world_identity_pose():
    depths = np.full((1, 4, 4), 2.0, np.float32)
    intr = np.array([[2.0, 0, 1.5], [0, 2.0, 1.5], [0, 0, 1]])
    c2w = np.eye(4)[None]
    pts = rgbd_to_world(depths, intr, c2w)
    assert pts.shape == (1, 4, 4, 3)
    # blender convention: z = -depth
    np.testing.assert_allclose(pts[0, :, :, 2], -2.0, atol=1e-6)
    # center pixel x: (1.5-1.5)*2/2 = 0
    np.testing.assert_allclose(pts[0, 1, 1, 0], (1 - 1.5) * 2 / 2, atol=1e-5)


def test_sceneflow_camdata_parse(tmp_path):
    (tmp_path / "cam.txt").write_text(
        "Frame 0\n"
        "L " + " ".join(["1", "0", "0", "5", "0", "1", "0", "6", "0", "0", "1", "7"]) + "\n"
        "R " + " ".join(["1", "0", "0", "8", "0", "1", "0", "6", "0", "0", "1", "7"]) + "\n"
        "\nFrame 1\n"
        "L " + " ".join(["1", "0", "0", "9", "0", "1", "0", "6", "0", "0", "1", "7"]) + "\n"
    )
    info = read_sceneflow_camdata(tmp_path / "cam.txt")
    assert len(info) == 2
    assert info[0]["frame_id"] == 0 and info[0]["left"][0, 3] == 5
    assert info[0]["right"][0, 3] == 8
    assert info[1]["left"][0, 3] == 9


def test_visim_trajectory(tmp_path):
    (tmp_path / "cam0.visim").write_text(
        "# header\n"
        "0, 1.0, 2.0, 3.0, 1.0, 0.0, 0.0, 0.0\n"
    )
    mats = parse_visim_trajectory(tmp_path / "cam0.visim")
    assert mats.shape == (1, 4, 4)
    np.testing.assert_allclose(mats[0, :3, :3], np.eye(3), atol=1e-7)
    np.testing.assert_allclose(mats[0, :3, 3], [1, 2, 3], atol=1e-7)


def _make_carla_tree(tmp_path, n=3, h=16, w=16):
    import cv2

    rng = np.random.default_rng(0)
    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    (tmp_path / "flow" / "future").mkdir(parents=True)
    (tmp_path / "flow" / "past").mkdir(parents=True)
    base = (rng.uniform(0.3, 0.7, (h, w, 3)) * 255).astype(np.uint8)
    for i in range(n):
        img = np.roll(base, i, axis=1)
        cv2.imwrite(str(tmp_path / "rgb" / f"{i:04d}.png"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        np.save(tmp_path / "depth" / f"{i:04d}.npy",
                np.full((h, w), 3.0, np.float32))
        fwd = np.zeros((h, w, 2), np.float32)
        fwd[..., 0] = 1.0
        write_flo(tmp_path / "flow" / "future" / f"{i:04d}.flo", fwd)
        write_flo(tmp_path / "flow" / "past" / f"{i:04d}.flo", -fwd)
    np.savez(tmp_path / "poses.npz",
             intrinsics=np.array([[8.0, 0, w / 2], [0, 8.0, h / 2], [0, 0, 1]]),
             c2ws=np.stack([np.eye(4)] * n))


def test_carla_parser_load_data(tmp_path):
    _make_carla_tree(tmp_path)
    cfg = ConfigDict({"data_dir": str(tmp_path), "height": 16, "width": 16})
    parser = CarlaDataParser(cfg)
    assert parser.n_frames == 3
    rgbs, depths, c2ws, fut, past, masks = parser.load_data([0, 1, 2])
    assert rgbs.shape == (3, 16, 16, 3)
    assert depths.shape == (3, 16, 16)
    assert fut.shape == (3, 16, 16, 2) and fut[0, 0, 0, 0] == 1.0
    assert parser.unq_inv is not None and parser.n_unique > 0
    assert parser.unq_inv.shape == (3 * 16 * 16,)


def test_video_parser_flow_cache(tmp_path, rng):
    frames = rng.uniform(0.3, 0.7, (3, 24, 24, 3)).astype(np.float32)
    vid_dir = tmp_path / "vid"
    save_frames(frames, vid_dir)
    cfg = ConfigDict({"rgb_path": str(vid_dir), "height": 24, "width": 24,
                      "flow_model": "farneback"})
    parser = VideoDataParser(cfg)
    rgbs, _, _, fut, past, masks = parser.load_data([0, 1, 2])
    assert fut.shape == (3, 24, 24, 2)
    # cache dirs created next to the video
    assert (tmp_path / "vid_future_flow_farneback").exists()
    assert (tmp_path / "vid_past_flow_farneback").exists()
    # second load hits the cache (files unchanged)
    parser2 = VideoDataParser(cfg)
    _, _, _, fut2, _, _ = parser2.load_data([0, 1, 2])
    np.testing.assert_allclose(fut2, fut)
    # same-parser repeat is memoized (serving: many prompts per video) —
    # identical objects, no recompute
    unq = parser.unq_inv
    parser.unq_inv = None
    rgbs2, _, _, fut3, _, masks2 = parser.load_data([0, 1, 2])
    assert fut3 is fut and masks2 is masks and rgbs2 is rgbs
    assert parser.unq_inv is unq
    # a different frame set misses the memo
    parser.load_data([0, 1])
    assert parser.unq_inv is not unq
