from tclight_tpu.diffusion.schedulers import (
    DDIMScheduler,
    DPMSolverMultistepScheduler,
    NoiseSchedule,
)
