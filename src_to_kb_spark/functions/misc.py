"""Small scalar utilities mirrored from the reference
(SURVEY.md §2.2 P6/P10) — as both plain-Python helpers and Catalyst
column expressions.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

_SIZES = ["Bytes", "KB", "MB", "GB"]


def format_bytes(n: int) -> str:
    """P6 — log-1024 unit string (kb-generator.js:603-609):
    ``parseFloat((bytes / 1024**i).toFixed(2)) + ' ' + sizes[i]``."""
    if n == 0:
        return "0 Bytes"
    i = math.floor(math.log(n) / math.log(1024))
    val = n / (1024 ** i)
    # JS toFixed(2) then parseFloat: 2-decimal round, trailing zeros dropped
    s = f"{val:.2f}".rstrip("0").rstrip(".")
    # sizes[] stops at GB: for >= 1 TB the reference reads sizes[4] ==
    # undefined and happily returns e.g. '2 undefined' — mirror that
    # (degrade, don't crash) rather than IndexError on exactly the
    # inputs a 100 TB engine summarizes
    unit = _SIZES[i] if 0 <= i < len(_SIZES) else "undefined"
    return f"{s} {unit}"


def extract_notion_page_id(url: str) -> str | None:
    """P10 (part 1) — first 32-hex-char run in the URL
    (notion-source.js:34-37)."""
    import re

    m = re.search(r"([a-f0-9]{32})", url)
    return m.group(1) if m else None


def format_notion_page_id(page_id: str) -> str:
    """P10 (part 2) — hyphenate a 32-char id as a UUID
    (notion-source.js:43-53)."""
    clean = page_id.replace("-", "")
    if len(clean) == 32:
        return (
            f"{clean[0:8]}-{clean[8:12]}-{clean[12:16]}-"
            f"{clean[16:20]}-{clean[20:]}"
        )
    return page_id


def notion_page_id_col(url: Column) -> Column:
    """P10 as one Catalyst expression: extract + hyphenate."""
    raw = F.regexp_extract(url, r"([a-f0-9]{32})", 1)
    hyphenated = F.concat_ws(
        "-",
        F.substring(raw, 1, 8),
        F.substring(raw, 9, 4),
        F.substring(raw, 13, 4),
        F.substring(raw, 17, 4),
        F.substring(raw, 21, 12),
    )
    return F.when(raw == "", None).otherwise(hyphenated)
