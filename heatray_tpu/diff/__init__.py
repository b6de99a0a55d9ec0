"""Differentiable rendering: inverse-rendering optimization."""

from .inverse import apply_material_params, make_loss_fn, optimize

__all__ = ["apply_material_params", "make_loss_fn", "optimize"]
