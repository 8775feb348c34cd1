"""Metadata validation engine (SURVEY §2.8, reference mmeds/validate.py)."""

from .validator import Diagnostic, Validator, validate_file

__all__ = ["Diagnostic", "Validator", "validate_file"]
