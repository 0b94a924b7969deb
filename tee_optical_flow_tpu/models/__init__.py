from .registry import sam_model_registry, build_sam_vit_t, build_sam_vit_b
from .sam import Sam

__all__ = ["sam_model_registry", "build_sam_vit_t", "build_sam_vit_b", "Sam"]
