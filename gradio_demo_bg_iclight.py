"""IC-Light background-conditioned demo (fbc, 12-ch) — mirrors the
reference gradio_demo_bg_iclight.py. Gradio UI when available; headless CLI
otherwise.

Usage:
    python gradio_demo_bg_iclight.py --fg fg.png --bg bg.png -p "studio light"
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
        models = load_iclight(model_dir, mode="fbc")
    else:
        print("[WARN] ICLIGHT_MODEL_DIR unset; tiny random-weight models")
        models = build_tiny_iclight(in_channels=12)
    return SingleImageRelighter(models)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--fg", help="foreground image")
    p.add_argument("--bg", help="background image")
    p.add_argument("-p", "--prompt", default="best quality")
    p.add_argument("--seed", type=int, default=12345)
    p.add_argument("--output", default="relit_bg.png")
    p.add_argument("--serve", action="store_true")
    args = p.parse_args(argv)

    if args.serve:
        try:
            import gradio as gr
        except ImportError:
            print("gradio is not installed; run headless with --fg/--bg")
            return 1
        relight = build_relighter()

        def ui_process(fg, bg, prompt, seed):
            out = relight.process_bg(
                fg.astype("float32") / 255.0, bg.astype("float32") / 255.0,
                prompt, int(seed),
            )
            return (out * 255).astype("uint8")

        import db_examples

        # curated fbc gallery rows with on-disk assets (reference binds
        # db_examples.background_conditioned_examples + the bg quick list);
        # rows are [fg, bg, prompt, bg_source, width, height, seed, output]
        rows = db_examples.available(
            db_examples.background_conditioned_examples, img_cols=(0, 1))
        examples = [[r[0], r[1], r[2], r[6]] for r in rows] or None
        bg_list = db_examples.available_paths(db_examples.bg_samples)
        if bg_list:
            print("background quick list:", *bg_list, sep="\n  ")

        demo = gr.Interface(
            ui_process,
            [gr.Image(), gr.Image(), gr.Textbox(value="best quality"),
             gr.Number(value=12345)],
            gr.Image(),
            title="IC-Light TPU (fbc)",
            examples=examples,
        )
        demo.launch()
        return 0

    if not (args.fg and args.bg):
        print("--fg and --bg required (or --serve)")
        return 2
    import cv2
    import numpy as np

    fg = cv2.cvtColor(cv2.imread(args.fg), cv2.COLOR_BGR2RGB)
    bg = cv2.cvtColor(cv2.imread(args.bg), cv2.COLOR_BGR2RGB)
    relight = build_relighter()
    out = relight.process_bg(
        fg.astype(np.float32) / 255.0, bg.astype(np.float32) / 255.0,
        args.prompt, args.seed,
    )
    cv2.imwrite(args.output, cv2.cvtColor((out * 255).astype(np.uint8),
                                          cv2.COLOR_RGB2BGR))
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
