"""Demo example galleries for the IC-Light demos (db_examples.py in the
reference holds curated image/prompt pairs for the gradio UIs). The
zero-egress build ships the structure with user-suppliable paths."""

foreground_conditioned_examples = [
    # [foreground image, prompt, bg_source, width, height, seed, output]
    ["examples/demo/fg1.png", "warm sunset glow, cinematic", "Left Light", 512, 640, 12345, None],
    ["examples/demo/fg2.png", "soft studio light, product photo", "Top Light", 512, 640, 5, None],
    ["examples/demo/fg3.png", "neon city night, rim light", "Right Light", 512, 640, 42, None],
]

bg_samples = [
    "examples/background/bg1.png",
    "examples/background/bg2.png",
    "examples/background/bg3.png",
]
