"""IC-Light single-image relight demo (fc, text/direction-conditioned) —
mirrors the reference gradio_demo_iclight.py. Launches a gradio UI when
gradio is installed; otherwise runs once from the CLI.

Usage (headless):
    python gradio_demo_iclight.py --input fg.png --prompt "warm sunlight" \
        --bg_source "Left Light" --output out.png
"""

from __future__ import annotations

import argparse
import sys


def build_relighter():
    import os
    from pathlib import Path

    from tclight_tpu.pipeline.iclight import build_tiny_iclight, load_iclight
    from tclight_tpu.pipeline.single_image import SingleImageRelighter

    model_dir = os.environ.get("ICLIGHT_MODEL_DIR")
    if model_dir and Path(model_dir).exists():
        models = load_iclight(model_dir, mode="fc")
    else:
        print("[WARN] ICLIGHT_MODEL_DIR unset; tiny random-weight models")
        models = build_tiny_iclight(in_channels=8)
    return SingleImageRelighter(models)


def main(argv=None) -> int:
    from tclight_tpu.pipeline.single_image import BGSource

    p = argparse.ArgumentParser()
    p.add_argument("--input", help="foreground image")
    p.add_argument("--prompt", default="best quality")
    p.add_argument("--bg_source", default="None",
                   choices=[b.value for b in BGSource])
    p.add_argument("--seed", type=int, default=12345)
    p.add_argument("--output", default="relit.png")
    p.add_argument("--serve", action="store_true", help="launch gradio UI")
    args = p.parse_args(argv)

    if args.serve:
        try:
            import gradio as gr
        except ImportError:
            print("gradio is not installed; run headless with --input")
            return 1
        relight = build_relighter()

        def ui_process(img, prompt, bg_source, seed):
            out = relight.process(
                img.astype("float32") / 255.0, prompt,
                BGSource(bg_source), int(seed),
            )
            return (out * 255).astype("uint8")

        import db_examples

        # curated gallery rows whose assets exist on disk (the reference
        # binds db_examples.foreground_conditioned_examples the same way;
        # rows are [image, prompt, bg_source, width, height, seed, output]
        # — the Interface takes the first four input columns)
        rows = db_examples.available(
            db_examples.foreground_conditioned_examples, img_cols=(0,))
        examples = [[r[0], r[1], r[2], r[5]] for r in rows] or None

        demo = gr.Interface(
            ui_process,
            [gr.Image(), gr.Textbox(value="best quality"),
             gr.Dropdown([b.value for b in BGSource], value="None"),
             gr.Number(value=12345)],
            gr.Image(),
            title="IC-Light TPU (fc)",
            examples=examples,
        )
        demo.launch()
        return 0

    if not args.input:
        print("--input required (or --serve)")
        return 2
    import cv2
    import numpy as np

    img = cv2.cvtColor(cv2.imread(args.input), cv2.COLOR_BGR2RGB)
    relight = build_relighter()
    out = relight.process(
        img.astype(np.float32) / 255.0, args.prompt,
        BGSource(args.bg_source), args.seed,
    )
    cv2.imwrite(args.output, cv2.cvtColor((out * 255).astype(np.uint8),
                                          cv2.COLOR_RGB2BGR))
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
