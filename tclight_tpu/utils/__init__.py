from tclight_tpu.utils.logging import get_logger, timer
from tclight_tpu.utils.video_io import (
    load_video,
    save_video,
    save_frames,
    get_frame_ids,
)
