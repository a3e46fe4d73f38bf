"""Layout contract of scripts/download_checkpoints.py vs the reference
downloaders (cosmos1/scripts/download_diffusion.py:63-120,
download_autoregressive.py:52-137)."""

import importlib.util
import sys
from pathlib import Path

_spec = importlib.util.spec_from_file_location(
    "download_checkpoints",
    Path(__file__).resolve().parents[1] / "scripts" / "download_checkpoints.py",
)
dl = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(dl)


def test_diffusion_repo_set_matches_reference():
    repos = dl.expected_repos("diffusion", ["7B", "14B"],
                              ["Text2World", "Video2World"])
    assert "nvidia/Cosmos-1.0-Diffusion-7B-Text2World" in repos
    assert "nvidia/Cosmos-1.0-Diffusion-14B-Video2World" in repos
    # always-included extras (download_diffusion.py:70-77)
    assert "nvidia/Cosmos-1.0-Guardrail" in repos
    assert "nvidia/Cosmos-1.0-Tokenizer-CV8x8x8" in repos
    assert "nvidia/Cosmos-1.0-Prompt-Upsampler-12B-Text2World" in repos
    # Video2World pulls the Pixtral upsampler source weights
    assert "mistral-community/pixtral-12b" in repos
    assert repos["nvidia/Cosmos-1.0-Diffusion-7B-Text2World"] == dl.COSMOS_PATTERNS


def test_autoregressive_repo_set_matches_reference():
    repos = dl.expected_repos("autoregressive", ["4B", "5B"], [])
    assert "nvidia/Cosmos-1.0-Autoregressive-4B" in repos
    assert "nvidia/Cosmos-1.0-Autoregressive-5B-Video2World" in repos
    # extras incl. the AR diffusion decoder (download_autoregressive.py:62-68)
    assert "nvidia/Cosmos-1.0-Diffusion-7B-Decoder-DV8x16x16ToCV8x8x8" in repos
    assert "nvidia/Cosmos-1.0-Tokenizer-DV8x16x16" in repos
    # 5B (video2world) needs the T5 text encoder
    assert "google-t5/t5-11b" in repos
    assert "google-t5/t5-11b" not in dl.expected_repos(
        "autoregressive", ["4B"], [])


def test_verify_reports_missing_and_partial(tmp_path):
    repos = dl.expected_repos("autoregressive", ["4B"], [])
    assert dl.verify(tmp_path, repos) == len(repos)
    # stage one repo fully and one partially
    full = tmp_path / "Cosmos-1.0-Autoregressive-4B"
    full.mkdir()
    for f in ("README.md", "model.pt", "config.json"):
        (full / f).touch()
    partial = tmp_path / "Cosmos-1.0-Guardrail"
    partial.mkdir()
    (partial / "anything.bin").touch()
    missing = dl.verify(tmp_path, repos)
    assert missing == len(repos) - 2


def test_cli_verify_exit_codes(tmp_path, capsys):
    assert dl.main(["tclight", "--verify",
                    "--checkpoint_dir", str(tmp_path)]) == 1
    for repo, files in dl.TCLIGHT_MODELS.items():
        d = tmp_path / repo.split("/")[-1]
        d.mkdir()
        for f in files or ["x.bin"]:
            (d / f).touch()
    assert dl.main(["tclight", "--verify",
                    "--checkpoint_dir", str(tmp_path)]) == 0
