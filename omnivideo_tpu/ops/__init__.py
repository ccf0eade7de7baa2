from .attention import attention, attention_xla
from .fused_adaln import fused_adaln
from .norms import layer_norm, rms_norm, t5_layer_norm
from .rope import apply_rope, rope_3d_tables

__all__ = [
    "attention",
    "fused_adaln",
    "attention_xla",
    "rms_norm",
    "layer_norm",
    "t5_layer_norm",
    "apply_rope",
    "rope_3d_tables",
]
