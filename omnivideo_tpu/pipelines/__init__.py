from .generator import OmniVideoGenerator
from .i2v import WanI2V
from .x2x import ExpertParams, OmniVideoX2XUnified

__all__ = ["OmniVideoX2XUnified", "ExpertParams", "WanI2V", "OmniVideoGenerator"]
