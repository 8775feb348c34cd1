"""Scalar/statistical function library."""

from .permanova import permanova

__all__ = ["permanova"]
