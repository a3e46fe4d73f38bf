"""Guardrail framework: text/video safety checks around generation.

Rebuild of cosmos1/models/guardrail/ (`GuardrailRunner` common/core.py:33,
presets common/presets.py:28-77): a runner composes checkers; shipped
checkers: the blocklist (profanity + exact/lemmatized word match,
blocklist/blocklist.py:218, pure python), the SigLIP-so400m + 7-class
video content safety filter (video_content_safety_filter/, real Flax
models in models/siglip.py, checkpoint-gated), the RetinaFace face-blur
postprocessor (face_blur_filter/, models/retinaface.py), and the Aegis
interface (a 7B LlamaGuard LoRA — interface-level by design, see
PARITY.md).
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
    """LlamaGuard-7B + Aegis-Defensive-LoRA prompt checker
    (aegis/aegis.py:40-130). With a checkpoint dir configured this is the
    REAL model: weights are LoRA-merged host-side and run on the repo's
    GQA Transformer with the reference's exact moderation template and
    unsafe-category parse (tclight_tpu/cosmos/aegis.py). Without a
    checkpoint it passes through with a warning; `predict` still accepts
    any custom classifier callable."""

    name = "aegis"

    def _load(self) -> bool:
        if getattr(self, "_model", None) is not None:
            return True
        if self.ckpt_dir is None or not Path(str(self.ckpt_dir)).exists():
            return False
        from tclight_tpu.cosmos.aegis import AegisLlamaGuard

        self._model = AegisLlamaGuard(self.ckpt_dir)
        return True

    def __call__(self, item) -> SafetyResult:
        if self.predict is not None:
            return self.predict(item)
        if self._load():
            safe, msg = self._model.is_safe(str(item))
            return SafetyResult(safe, msg)
        return SafetyResult(True, f"{self.name}: no checkpoint, pass-through")


# class names for the 7-way video safety head
# (video_content_safety_filter.py:34-42)
SAFETY_CLASS_NAMES = {
    0: "Safe", 1: "Sexual_Content", 2: "Violence", 3: "Drugs",
    4: "Child_Abuse", 5: "Hate_and_Harassment", 6: "Self-Harm",
}


class VideoContentSafetyChecker(ModelBackedChecker):
    """SigLIP-so400m encoder + 7-class safety head over sampled frames
    (video_content_safety_filter.py:45-155). Expects a checkpoint dir with
    `siglip_vision.safetensors` (transformers SiglipVisionModel sd) and
    `safety_filter.pt` (the Cosmos classifier). Any non-'Safe' frame marks
    the video unsafe."""

    name = "video-safety-siglip"

    def _load(self):
        if getattr(self, "_fn", None) is not None:
            return True
        if not self.available() or self.ckpt_dir is None:
            return False
        import jax
        import jax.numpy as jnp

        from tclight_tpu.models.convert import load_torch_state_dict
        from tclight_tpu.models.siglip import (
            SafetyClassifier, SiglipVisionConfig, SiglipVisionTower,
            convert_safety_classifier, convert_siglip_vision)

        d = Path(str(self.ckpt_dir))
        vis = d / "siglip_vision.safetensors"
        clf = d / "safety_filter.pt"
        if not vis.exists() or not clf.exists():
            return False
        cfg = SiglipVisionConfig.so400m()
        tower = SiglipVisionTower(cfg)
        tower_params = convert_siglip_vision(load_torch_state_dict(vis))
        head = SafetyClassifier(input_size=cfg.hidden_size, num_classes=7)
        head_params = convert_safety_classifier(load_torch_state_dict(clf))
        self._image_size = cfg.image_size

        def fn(frames):
            emb = tower.apply(tower_params, jnp.asarray(frames))
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
            return np.asarray(head.apply(head_params, emb))

        self._fn = fn
        return True

    def __call__(self, frames) -> SafetyResult:
        if self.predict is not None:
            return self.predict(frames)
        if not self._load():
            return SafetyResult(True, f"{self.name}: no checkpoint, pass-through")
        from tclight_tpu.models.siglip import preprocess_siglip

        frames = np.asarray(frames)
        # sample at 2 fps like the reference (is_safe_file sample_rate=2)
        fps = getattr(self, "fps", 25.0)
        step = max(1, int(fps / 2))
        sel = frames[::step]
        logits = self._fn(preprocess_siglip(sel, self._image_size))
        classes = logits.argmax(-1)
        for fi, cls in zip(range(0, len(frames), step), classes):
            if int(cls) != 0:
                return SafetyResult(
                    False, f"frame {fi}: "
                    f"{SAFETY_CLASS_NAMES.get(int(cls), 'Unknown')}")
        return SafetyResult(True)


class FaceBlurFilter(ModelBackedChecker):
    """Postprocessor: pixelates RetinaFace detections
    (face_blur_filter.py:89-187); identity without a checkpoint."""

    name = "face-blur"

    def _load(self):
        if getattr(self, "_detector", None) is not None:
            return True
        if not self.available() or self.ckpt_dir is None:
            return False
        ckpt = Path(str(self.ckpt_dir))
        if ckpt.is_dir():
            cands = list(ckpt.glob("*.pth")) + list(ckpt.glob("*.safetensors"))
            if not cands:
                return False
            ckpt = cands[0]
        from tclight_tpu.models.convert import load_torch_state_dict
        from tclight_tpu.models.retinaface import (
            RetinaFaceDetector, convert_retinaface)

        params = convert_retinaface(load_torch_state_dict(ckpt))
        self._detector = RetinaFaceDetector(params)
        return True

    def process(self, frames: np.ndarray) -> np.ndarray:
        if self.predict is not None:
            return self.predict(frames)
        if not self._load():
            return frames
        return self._detector.blur_faces(np.asarray(frames))


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
