"""Evaluation CLI — mirrors the reference evaluate.py (:17-133).

Walks an output dir (the Generator's per-prompt run folders), computes
warp-error-ssim (+ CLIP/PickScore metrics when local CLIP checkpoints are
configured) and cost metrics, and writes `result.txt` in the reference
format (warp-error-ssim x100 etc., evaluate.py:67-88).
"""

from __future__ import annotations

import argparse
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np
import yaml


def find_run_dirs(output_dir: Path):
    if (output_dir / "config.yaml").exists():
        return [output_dir]
    return sorted(
        p for p in output_dir.rglob("*") if p.is_dir() and (p / "config.yaml").exists()
    )


def evaluate_run(run_dir: Path, eval_cost: bool, clip_embed=None) -> dict:
    from tclight_tpu.data.flow_backends import compute_flow_pairs
    from tclight_tpu.eval.metrics import warp_error_ssim, clip_frame_score
    from tclight_tpu.utils.video_io import load_video

    cfg = yaml.safe_load((run_dir / "config.yaml").read_text()) or {}
    video_path = run_dir / (
        "output_opt.mp4" if (run_dir / "output_opt.mp4").exists() else "output.mp4"
    )
    source_path = run_dir / "output_gt.mp4"
    scores: dict = {}
    if not video_path.exists():
        return scores

    edited = load_video(video_path)
    source = load_video(source_path) if source_path.exists() else edited
    if source.shape[1:3] != edited.shape[1:3]:
        import cv2

        source = np.stack([
            cv2.resize(f, (edited.shape[2], edited.shape[1])) for f in source
        ])

    flow_fwd = compute_flow_pairs(source, "future")[:-1]
    flow_bwd_full = compute_flow_pairs(source, "past")
    flow_bwd = flow_bwd_full[1:]
    scores["warp-error-ssim"] = warp_error_ssim(
        edited, source, flow_fwd=flow_fwd, flow_bwd=flow_bwd
    )

    if clip_embed is not None:
        prompts = (cfg.get("generation", {}) or {}).get("prompt", {}) or {}
        prompt = next(iter(prompts.values()), "") or ""
        embs, temb = clip_embed(edited, prompt)
        scores["clip-frame"] = clip_frame_score(embs)
        if prompt:
            from tclight_tpu.eval.metrics import clip_text_score

            scores["clip-text"] = clip_text_score(embs, temb)

    if eval_cost:
        spf = cfg.get("sec_per_frame")
        if spf:
            scores["z_fps"] = 1.0 / spf
        scores["z_max_memory_allocated(M)"] = cfg.get("max_memory_allocated", 0.0)
        scores["z_resolution"] = float(np.sqrt(edited.shape[1] * edited.shape[2]))
        scores["z_total_frames"] = edited.shape[0]
        scores["z_total_time(s)"] = cfg.get("total_time", 0.0)
    return scores


def print_and_save_results(run_dir: Path, scores: dict) -> None:
    lines = [f"{run_dir.name}"]
    for metric, score in sorted(scores.items()):
        if "warp-error-l1" in metric:
            lines.append(f"{metric}: {score * 1e5:.2f}")
        elif "warp-error-l2" in metric or "warp-error-ssim" in metric:
            lines.append(f"{metric}: {score * 100:.2f}")
        else:
            lines.append(f"{metric}: {score:.4f}")
    text = "\n".join(lines) + "\n"
    print(text)
    (run_dir / "result.txt").write_text(text)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_dir", type=str, default="workdir")
    parser.add_argument("--eval_cost", action="store_true")
    args = parser.parse_args(argv)

    run_dirs = find_run_dirs(Path(args.output_dir))
    if not run_dirs:
        print(f"no runs under {args.output_dir}")
        return 1
    for run_dir in run_dirs:
        scores = evaluate_run(run_dir, args.eval_cost)
        if scores:
            print_and_save_results(run_dir, scores)
    return 0


if __name__ == "__main__":
    sys.exit(main())
