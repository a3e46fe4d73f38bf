from tclight_tpu.ops.resample import grid_sample_2d, bilinear_sample, bicubic_sample
from tclight_tpu.ops.flow import (
    warp_flow,
    compute_fwdbwd_mask,
    get_mask_bwds,
    get_soft_mask_bwds,
    get_flowid,
    voxelization,
)
from tclight_tpu.ops.losses import (
    l1_loss,
    l2_loss,
    ssim,
    relaxed_ms_ssim,
    tv_loss,
    psnr,
)
from tclight_tpu.ops.color import (
    adaptive_instance_normalization,
    calc_mean_std,
    RGB2SH,
    SH2RGB,
    color_correct,
)
from tclight_tpu.ops.schedules import expon_lr_schedule
