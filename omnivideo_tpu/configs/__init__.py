"""Config registries (reference: `omnivideo/configs/__init__.py:8-30`)."""

from .base import (
    I2V_14B,
    PipelineConfig,
    T2V_1_3B,
    T2V_14B,
    T2V_A14B,
    T5Config,
    VAEConfig,
    WanDiTConfig,
)
from . import prompts

WAN_CONFIGS = {
    "t2v-A14B": T2V_A14B,
    "t2v-1.3B": T2V_1_3B,
    # the x2x pipeline serves t2v, v2v-edit and mixed-condition from the same
    # configs; aliases below match reference task substrings
    "v2v-A14B": T2V_A14B,
    "v2v-1.3B": T2V_1_3B,
    # vanilla Wan2.1 third-party stack (reference wan/configs/): t2i shares
    # the t2v-1.3B weights (t2i_1_3B.py is the same table; frame_num=1)
    "t2v-14B": T2V_14B,
    "i2v-14B": I2V_14B,
    "t2i-1.3B": T2V_1_3B,
}

SIZE_CONFIGS = {
    "720*1280": (720, 1280),
    "1280*720": (1280, 720),
    "480*832": (480, 832),
    "832*480": (832, 480),
}

MAX_AREA_CONFIGS = {
    "720*1280": 720 * 1280,
    "1280*720": 1280 * 720,
    "480*832": 480 * 832,
    "832*480": 832 * 480,
}

SUPPORTED_SIZES = {
    "t2v-A14B": ("720*1280", "1280*720", "480*832", "832*480"),
    "t2v-1.3B": ("480*832", "832*480"),
    "v2v-A14B": ("720*1280", "1280*720", "480*832", "832*480"),
    "v2v-1.3B": ("480*832", "832*480"),
    "t2v-14B": ("720*1280", "1280*720", "480*832", "832*480"),
    "i2v-14B": ("720*1280", "1280*720", "480*832", "832*480"),
    "t2i-1.3B": ("480*832", "832*480"),
}

__all__ = [
    "PipelineConfig",
    "WanDiTConfig",
    "VAEConfig",
    "T5Config",
    "T2V_1_3B",
    "T2V_14B",
    "T2V_A14B",
    "I2V_14B",
    "WAN_CONFIGS",
    "SIZE_CONFIGS",
    "MAX_AREA_CONFIGS",
    "SUPPORTED_SIZES",
    "prompts",
]
