"""Sources & sinks (SURVEY.md §2.1)."""

from .csv_io import csvread, csvwrite, file_read
from .jsonl_io import jsonlread, jsonlwrite
from .info_schema import information_schema

__all__ = [
    "csvread",
    "csvwrite",
    "file_read",
    "information_schema",
    "jsonlread",
    "jsonlwrite",
]
