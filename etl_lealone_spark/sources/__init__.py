"""Sources & sinks (SURVEY.md §2.1)."""

from .csv_io import csvread, csvwrite
from .info_schema import information_schema

__all__ = ["csvread", "csvwrite", "information_schema"]
