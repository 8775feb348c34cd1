"""View layer + query entry points (SURVEY §7 step 5)."""

from .query import MmedsSession
from .views import build_views

__all__ = ["MmedsSession", "build_views"]
