"""Datasets + target generation (reference src/pdftable/dataset/)."""

from .wtw import WtwDataset, gaussian_radius, draw_gaussian, make_lore_targets

__all__ = ["WtwDataset", "gaussian_radius", "draw_gaussian",
           "make_lore_targets"]
