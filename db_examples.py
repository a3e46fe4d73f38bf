"""Demo example galleries for the IC-Light gradio demos.

Mirrors the reference db_examples.py: three module-level galleries the
demo UIs bind as `gr.Examples` / quick-list `gr.Gallery` rows —
`foreground_conditioned_examples` ([image, prompt, bg_source, width,
height, seed, output]), `bg_samples` (background quick-list paths) and
`background_conditioned_examples` ([foreground, background, prompt,
bg_source, width, height, seed, output]).

The reference ships its gallery assets in-repo (imgs_iclight/); this
build cannot (zero-egress), so every row points under `examples/demo/`
and the demos surface only rows whose files exist on disk via
`available(...)` — drop your own curated assets in and they appear.
"""

from __future__ import annotations

import os

ASSET_DIR = os.environ.get("TCLIGHT_DEMO_ASSETS", "examples/demo")


def _a(*parts: str) -> str:
    return os.path.join(ASSET_DIR, *parts)


# [foreground image, prompt, bg_source, width, height, seed, output]
foreground_conditioned_examples = [
    [_a("fg", "portrait_01.png"),
     "portrait, golden hour sunlight through trees, warm rim light",
     "Right Light", 512, 960, 12345, _a("out", "portrait_01_right.png")],
    [_a("fg", "portrait_01.png"),
     "portrait, cool overcast daylight, soft shadows",
     "Left Light", 512, 960, 50, _a("out", "portrait_01_left.png")],
    [_a("fg", "portrait_02.png"),
     "portrait, neon signage reflections, midnight street",
     "Left Light", 512, 768, 12345, _a("out", "portrait_02_neon.png")],
    [_a("fg", "portrait_02.png"),
     "portrait, morning light from a side window",
     "Left Light", 512, 768, 12345, _a("out", "portrait_02_window.png")],
    [_a("fg", "portrait_03.png"),
     "portrait, warm bedside lamp, cozy interior",
     "Left Light", 512, 768, 123, _a("out", "portrait_03_lamp.png")],
    [_a("fg", "portrait_04.png"),
     "portrait, direct sunlight from a window, hard shadows",
     "Right Light", 512, 768, 42, _a("out", "portrait_04_sun.png")],
    [_a("fg", "product_01.png"),
     "product photo, softbox studio lighting, seamless backdrop",
     "Top Light", 512, 640, 5, _a("out", "product_01_studio.png")],
    [_a("fg", "statue_01.png"),
     "marble statue, dramatic museum spotlights, dark hall",
     "Top Light", 512, 768, 7, _a("out", "statue_01_spot.png")],
    [_a("fg", "animal_01.png"),
     "pet portrait, dappled forest light, green bokeh",
     "Right Light", 512, 640, 21, _a("out", "animal_01_forest.png")],
    [_a("fg", "portrait_05.png"),
     "portrait, blue hour cityscape glow, cinematic",
     "Bottom Light", 512, 960, 99, _a("out", "portrait_05_blue.png")],
]

# background quick-list for the fbc demo's gallery strip
bg_samples = [_a("bgs", f"{i:02d}.png") for i in range(1, 16)]

# [foreground, background, prompt, bg_source, width, height, seed, output]
background_conditioned_examples = [
    [_a("fg", "portrait_01.png"), _a("bgs", "01.png"),
     "portrait, light matched to the sunset beach behind",
     "Use Background Image", 512, 768, 12345,
     _a("out", "fbc_portrait_01.png")],
    [_a("fg", "statue_01.png"), _a("bgs", "02.png"),
     "statue, ambient light of an overcast courtyard",
     "Use Flipped Background Image", 512, 768, 12345,
     _a("out", "fbc_statue_01.png")],
    [_a("fg", "portrait_02.png"), _a("bgs", "03.png"),
     "portrait, neon alley color spill on the face",
     "Use Background Image", 512, 768, 12345,
     _a("out", "fbc_portrait_02.png")],
    [_a("fg", "portrait_03.png"), _a("bgs", "04.png"),
     "portrait, warm cafe interior bounce light",
     "Use Background Image", 512, 768, 12345,
     _a("out", "fbc_portrait_03.png")],
    [_a("fg", "product_01.png"), _a("bgs", "05.png"),
     "product shot, bright daylight showroom reflections",
     "Use Background Image", 512, 768, 12345,
     _a("out", "fbc_product_01.png")],
]


def available(rows: list[list], img_cols: tuple[int, ...] = (0,)) -> list[list]:
    """Rows whose input-image columns all exist on disk (the output column
    may be absent — gradio renders those rows without a preview)."""
    out = []
    for row in rows:
        if all(os.path.exists(row[c]) for c in img_cols):
            out.append(row)
    return out


def available_paths(paths: list[str]) -> list[str]:
    return [p for p in paths if os.path.exists(p)]
