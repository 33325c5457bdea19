"""Headless visualization of solver fields."""

from .renderer import FieldRenderer, rainbow_colormap

__all__ = ["FieldRenderer", "rainbow_colormap"]
