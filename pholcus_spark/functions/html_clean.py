"""HTML cleaning helpers — the reference's spider-rule utility surface
(`app/spider/common/common.go:18-41` CleanHtml, `:80-99`
Deprive/Deprive2), re-expressed as JVM-side column expressions.

The reference chain is 5 cumulative regex depths; every pattern here is
a `regexp_replace` chain, so the whole cleanup stays inside
whole-stage codegen (no Python in the plan). The only reference step
that is not a pure substitution — depth>0 lowercases each tag via a
replace-callback — exists solely so the later (Go, case-sensitive)
patterns match; we instead make the later patterns case-insensitive
(`(?i)`), which yields the same surviving text. ``lowercase_tags_udf``
provides the literal tag-lowercasing behavior for parity tests.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# [\S\s]+? — the reference's any-char-including-newline non-greedy span
_SPAN = r"[\S\s]+?"


def clean_html(col, depth: int = 5) -> Column:
    """CleanHtml(str, depth) (`common.go:18-41`): strip tags at
    increasing aggressiveness. depth>1 drops <style> blocks, >2 drops
    <script> blocks, >3 replaces every remaining tag with newline,
    >4 collapses whitespace runs to newline."""
    c = F.col(col) if isinstance(col, str) else col
    if depth > 1:
        c = F.regexp_replace(c, f"(?i)<style{_SPAN}</style>", "")
    if depth > 2:
        c = F.regexp_replace(c, f"(?i)<script{_SPAN}</script>", "")
    if depth > 3:
        c = F.regexp_replace(c, f"<{_SPAN}>", "\n")
    if depth > 4:
        c = F.regexp_replace(c, r"\s{2,}", "\n")
    return c


def deprive(col) -> Column:
    """Deprive (`common.go:80-86`): remove newline/CR/tab/space."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, "\n\r\t ", "")


def deprive2(col) -> Column:
    """Deprive2 (`common.go:89-99`): Deprive plus the *literal* two-char
    escape sequences \\n \\r \\t."""
    c = F.col(col) if isinstance(col, str) else col
    for lit in ("\\n", "\\r", "\\t"):
        c = F.replace(c, F.lit(lit), F.lit(""))
    return F.translate(c, "\n\r\t ", "")


@pandas_udf(StringType())
def lowercase_tags_udf(html: pd.Series) -> pd.Series:
    """The reference's depth>0 step verbatim: lowercase every
    ``<...>`` span via a replace-callback (`common.go:20-23`).
    Parity-test helper; the JVM chain above uses (?i) instead."""
    import re

    tag = re.compile(r"<[\S\s]+?>")
    return html.map(
        lambda s: tag.sub(lambda m: m.group(0).lower(), s)
        if isinstance(s, str)
        else s
    )
