"""Checkpoint downloader / layout verifier.

Mirrors the reference's downloader scripts
(cosmos1/scripts/download_diffusion.py:16-120,
cosmos1/scripts/download_autoregressive.py:16-137): the same
size->HF-repo model maps, the same always-included extra models, and the
same post-download Pixtral conversion step — here routed into this
repo's JAX converters (tclight_tpu/models/convert_ar.py,
tclight_tpu/cosmos/convert_dit.py, convert_dv.py) instead of the
reference's convert_pixtral_ckpt.py.

Network access is optional: with `huggingface_hub` installed the script
downloads; without it (or with --verify) it checks an existing
checkpoint directory against the expected layout and prints what is
missing, so air-gapped hosts can stage checkpoints by hand and validate
them with the same tool.

Usage:
  python scripts/download_checkpoints.py diffusion --model_sizes 7B
  python scripts/download_checkpoints.py autoregressive --model_sizes 4B
  python scripts/download_checkpoints.py tclight            # SD1.5+IC-Light+flow
  python scripts/download_checkpoints.py diffusion --verify # layout check only
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

ORG = "nvidia"

# cosmos1/scripts/download_diffusion.py:63-77
DIFFUSION_MODELS = {
    "7B": "Cosmos-1.0-Diffusion-7B",
    "14B": "Cosmos-1.0-Diffusion-14B",
}
DIFFUSION_TYPES = ("Text2World", "Video2World")
DIFFUSION_EXTRA = [
    "Cosmos-1.0-Guardrail",
    "Cosmos-1.0-Tokenizer-CV8x8x8",
]
# model.pt + config + tokenizer JITs, per the reference's allow_patterns
# (download_diffusion.py:83)
COSMOS_PATTERNS = ["README.md", "model.pt", "config.json", "*.jit"]

# cosmos1/scripts/download_autoregressive.py:52-68
AR_MODELS = {
    "4B": "Cosmos-1.0-Autoregressive-4B",
    "5B": "Cosmos-1.0-Autoregressive-5B-Video2World",
    "12B": "Cosmos-1.0-Autoregressive-12B",
    "13B": "Cosmos-1.0-Autoregressive-13B-Video2World",
}
AR_EXTRA = [
    "Cosmos-1.0-Guardrail",
    "Cosmos-1.0-Diffusion-7B-Decoder-DV8x16x16ToCV8x8x8",
    "Cosmos-1.0-Tokenizer-CV8x8x8",
    "Cosmos-1.0-Tokenizer-DV8x16x16",
]

# TC-Light's own model column (README model-prep instructions in the
# reference): SD1.5 base, the IC-Light offset deltas, annotators, flow.
TCLIGHT_MODELS = {
    "stablediffusionapi/realistic-vision-v51": None,
    "lllyasviel/ic-light": ["iclight_sd15_fc.safetensors",
                            "iclight_sd15_fbc.safetensors"],
    "briaai/RMBG-1.4": ["model.pth"],
    "lllyasviel/Annotators": ["dpt_hybrid-midas-501f0c75.pt",
                              "ControlNetHED.pth", "body_pose_model.pth",
                              "sk_model.pth"],
}


def expected_repos(family: str, sizes: list[str], types: list[str]) -> dict:
    """repo_id -> allow_patterns (None = whole snapshot)."""
    out: dict[str, list | None] = {}
    if family == "diffusion":
        for s in sizes:
            for t in types:
                out[f"{ORG}/{DIFFUSION_MODELS[s]}-{t}"] = COSMOS_PATTERNS
        for m in DIFFUSION_EXTRA:
            out[f"{ORG}/{m}"] = None
        if "Text2World" in types:
            out[f"{ORG}/Cosmos-1.0-Prompt-Upsampler-12B-Text2World"] = None
        if "Video2World" in types:
            out["mistral-community/pixtral-12b"] = None
    elif family == "autoregressive":
        for s in sizes:
            out[f"{ORG}/{AR_MODELS[s]}"] = COSMOS_PATTERNS
        for m in AR_EXTRA:
            out[f"{ORG}/{m}"] = None
        if any(s in ("5B", "13B") for s in sizes):
            out["google-t5/t5-11b"] = None
    elif family == "tclight":
        out = dict(TCLIGHT_MODELS)
    else:
        raise SystemExit(f"unknown family {family!r}")
    return out


def verify(checkpoint_dir: Path, repos: dict) -> int:
    """Check an existing checkpoint dir; returns number of missing repos."""
    missing = 0
    for repo_id, patterns in repos.items():
        local = checkpoint_dir / repo_id.split("/")[-1]
        if not local.is_dir() or not any(local.iterdir()):
            print(f"MISSING  {local}  (from {repo_id})")
            missing += 1
            continue
        if patterns:
            absent = [p for p in patterns if "*" not in p
                      and not (local / p).exists()]
            if absent:
                print(f"PARTIAL  {local}: no {', '.join(absent)}")
                missing += 1
                continue
        print(f"ok       {local}")
    return missing


def download(checkpoint_dir: Path, repos: dict) -> None:
    try:
        from huggingface_hub import snapshot_download
    except ImportError:
        raise SystemExit(
            "huggingface_hub is not installed; stage checkpoints manually "
            "under the layout printed by --verify, then re-run with --verify"
        )
    for repo_id, patterns in repos.items():
        local = checkpoint_dir / repo_id.split("/")[-1]
        local.mkdir(parents=True, exist_ok=True)
        print(f"downloading {repo_id} -> {local}")
        kwargs = {"allow_patterns": patterns} if patterns else {}
        snapshot_download(repo_id=repo_id, local_dir=str(local), **kwargs)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("family",
                    choices=["diffusion", "autoregressive", "tclight"])
    ap.add_argument("--model_sizes", nargs="*", default=None)
    ap.add_argument("--model_types", nargs="*", default=list(DIFFUSION_TYPES),
                    choices=list(DIFFUSION_TYPES))
    ap.add_argument("--checkpoint_dir", default="checkpoints")
    ap.add_argument("--verify", action="store_true",
                    help="only check the existing layout (no network)")
    args = ap.parse_args(argv)

    sizes = args.model_sizes
    if sizes is None:
        sizes = ["7B", "14B"] if args.family == "diffusion" else ["4B", "5B"]
    repos = expected_repos(args.family, sizes, args.model_types)
    ckpt_dir = Path(args.checkpoint_dir)

    if args.verify:
        missing = verify(ckpt_dir, repos)
        print(f"{len(repos) - missing}/{len(repos)} present")
        return 1 if missing else 0

    download(ckpt_dir, repos)
    print("done. Convert with tclight_tpu.models.convert / convert_ar / "
          "tclight_tpu.cosmos.convert_dit / convert_dv (see docstrings).")
    return 0


if __name__ == "__main__":
    sys.exit(main())
