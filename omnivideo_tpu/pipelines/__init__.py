from .x2x import ExpertParams, OmniVideoX2XUnified

__all__ = ["OmniVideoX2XUnified", "ExpertParams"]
