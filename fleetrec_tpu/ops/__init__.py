from .mlp_fused import fused_mlp, fused_mlp_available

__all__ = ["fused_mlp", "fused_mlp_available"]
