"""Config registries (reference: `omnivideo/configs/__init__.py:8-30`)."""

from .base import (
    PipelineConfig,
    T2V_1_3B,
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
}

__all__ = [
    "PipelineConfig",
    "WanDiTConfig",
    "VAEConfig",
    "T5Config",
    "T2V_1_3B",
    "T2V_A14B",
    "WAN_CONFIGS",
    "SIZE_CONFIGS",
    "MAX_AREA_CONFIGS",
    "SUPPORTED_SIZES",
    "prompts",
]
