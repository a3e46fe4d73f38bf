from tclight_tpu.eval.metrics import (
    ssim_uniform,
    warp_error_ssim,
    clip_frame_score,
    clip_text_score,
    pick_score,
)
