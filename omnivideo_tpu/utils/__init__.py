from .misc import best_output_size, masks_like, str2bool
from .video import read_video_frames, sample_and_transform_frames, save_image, save_video

__all__ = [
    "str2bool",
    "masks_like",
    "best_output_size",
    "save_video",
    "save_image",
    "read_video_frames",
    "sample_and_transform_frames",
]
