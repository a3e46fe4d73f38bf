"""Full evaluate.py metric set: psnr/ssim/lpips parity and the
checkpoint-gated loader wiring (reference eval_utils.py:369-443 +
evaluate.py:119-122)."""

import numpy as np
import pytest


def _torch_ref_ssim(a, b, win=11):
    """The reference eval ssim (eval_utils.py:395-434) verbatim in torch."""
    import torch
    import torch.nn.functional as F
    from math import exp

    def gaussian(window_size, sigma):
        g = torch.Tensor([
            exp(-(x - window_size // 2) ** 2 / float(2 * sigma**2))
            for x in range(window_size)
        ])
        return g / g.sum()

    a = torch.from_numpy(np.moveaxis(a, -1, 1).copy()).double()
    b = torch.from_numpy(np.moveaxis(b, -1, 1).copy()).double()
    channel = a.size(-3)
    _1d = gaussian(win, 1.5).unsqueeze(1).double()
    window = _1d.mm(_1d.t()).unsqueeze(0).unsqueeze(0).expand(
        channel, 1, win, win).contiguous()
    mu1 = F.conv2d(a, window, padding=win // 2, groups=channel)
    mu2 = F.conv2d(b, window, padding=win // 2, groups=channel)
    s1 = F.conv2d(a * a, window, padding=win // 2, groups=channel) - mu1**2
    s2 = F.conv2d(b * b, window, padding=win // 2, groups=channel) - mu2**2
    s12 = F.conv2d(a * b, window, padding=win // 2, groups=channel) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))
    return float(m.mean())


def test_ssim_gaussian_matches_reference_formula(rng):
    from tclight_tpu.eval.metrics import ssim_gaussian

    a = rng.uniform(size=(2, 24, 24, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    ref = np.mean([_torch_ref_ssim(a[i : i + 1], b[i : i + 1])
                   for i in range(2)])
    ours = ssim_gaussian(a, b)
    assert ours == pytest.approx(ref, abs=1e-6)
    assert ssim_gaussian(a, a) == pytest.approx(1.0, abs=1e-9)


def test_psnr_reference_values(rng):
    from tclight_tpu.eval.metrics import psnr

    a = rng.uniform(size=(3, 16, 16, 3)).astype(np.float32)
    b = np.clip(a + 0.1, 0, 1)
    mse = ((a - b) ** 2).reshape(3, -1).mean(1)
    ref = np.mean(20 * np.log10(1.0 / np.sqrt(mse)))
    assert psnr(a, b) == pytest.approx(ref, rel=1e-6)
    assert psnr(a, a) > 100.0


@pytest.mark.slow
def test_frame_lpips_wiring(rng):
    import jax

    from tclight_tpu.eval.metrics import frame_lpips
    from tclight_tpu.models.vgg_lpips import LPIPS, VGG16Features

    model = VGG16Features()
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32))
    feats = model.apply(variables, np.zeros((1, 32, 32, 3), np.float32))
    lp = LPIPS(variables, [np.ones(f.shape[-1], np.float32) for f in feats])
    frames = rng.uniform(size=(3, 32, 32, 3)).astype(np.float32)
    same = frame_lpips(frames, frames, lp)
    diff = frame_lpips(frames, frames[::-1].copy(), lp)
    assert same == pytest.approx(0.0, abs=1e-6)
    assert diff > same


def test_evaluate_cli_full_rows(tmp_path, rng, eval_cli):
    """CLI emits psnr/ssim rows alongside warp-error without any ckpts."""
    import yaml

    from tclight_tpu.utils.video_io import save_video

    run_dir = tmp_path / "run"
    run_dir.mkdir()
    base = rng.uniform(0.3, 0.7, (24, 32, 3)).astype(np.float32)
    frames = np.stack([np.roll(base, t, axis=1) for t in range(4)])
    save_video(frames, run_dir / "output.mp4", fps=8)
    save_video(frames, run_dir / "output_gt.mp4", fps=8)
    (run_dir / "config.yaml").write_text(yaml.safe_dump({
        "generation": {"prompt": {"x": "a prompt"}},
    }))
    rc = eval_cli.main(["--output_dir", str(tmp_path)])
    assert rc == 0
    result = (run_dir / "result.txt").read_text()
    assert "warp-error-ssim" in result
    assert "psnr" in result and "ssim" in result


def test_flow_backend_loader_errors(tmp_path):
    from tclight_tpu.eval.loaders import load_flow_backend

    assert load_flow_backend("farneback", None) == ("farneback", None)
    with pytest.raises(FileNotFoundError):
        load_flow_backend("raft", tmp_path / "missing.pth")
    with pytest.raises(ValueError):
        load_flow_backend("bogus", None)
