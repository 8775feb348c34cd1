"""Set-based snowflake normalization (SURVEY §7 step 4)."""

from .normalizer import MetaDataError, Warehouse, import_study, parse_icd_codes

__all__ = ["MetaDataError", "Warehouse", "import_study", "parse_icd_codes"]
