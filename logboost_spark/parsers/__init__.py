"""Format detection + per-format field extraction over the text column."""

from .formats import FORMATS, detect_format, parse_stage  # noqa: F401
