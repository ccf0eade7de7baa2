from .adapters import dm_adapter_apply, vision_head_apply
from .t5 import T5EncoderModel, init_t5, t5_encode
from .unified import (
    build_mixed_context,
    build_mixed_context_batch,
    init_unified_companions,
    null_ar_vision,
)
from .vae2_1 import Wan21VAE, init_vae, vae_decode, vae_encode
from .vae2_2 import Wan22VAE, vae22_decode, vae22_encode
from .visual_context_adapter import init_vca, vca_apply
from .wan_dit import SPConfig, init_wan_dit, wan_dit_apply

__all__ = [
    "SPConfig",
    "init_wan_dit",
    "wan_dit_apply",
    "Wan21VAE",
    "Wan22VAE",
    "vae22_encode",
    "vae22_decode",
    "init_vae",
    "vae_encode",
    "vae_decode",
    "T5EncoderModel",
    "init_t5",
    "t5_encode",
    "init_vca",
    "vca_apply",
    "init_unified_companions",
    "build_mixed_context",
    "build_mixed_context_batch",
    "null_ar_vision",
    "dm_adapter_apply",
    "vision_head_apply",
]
