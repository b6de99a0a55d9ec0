"""Image and config IO."""

from .image import load_image, save_hdr, save_ldr

__all__ = ["load_image", "save_hdr", "save_ldr"]
