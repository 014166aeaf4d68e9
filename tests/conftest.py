"""Shared test utilities."""

import hashlib


def h60(text: str) -> int:
    """Python mirror of the suite's 60-bit md5-prefix hash
    (material_parsers_spark.queries._h / _H_SQL)."""
    return int(hashlib.md5(text.encode()).hexdigest()[:15], 16)
