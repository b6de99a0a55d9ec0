"""Display post-processing (ACES + color pipeline)."""

from .pipeline import PostProcessingParams, aces_tonemap, apply_post_pipeline

__all__ = ["PostProcessingParams", "aces_tonemap", "apply_post_pipeline"]
