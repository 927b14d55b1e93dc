"""Sort-key expressions.

``smart_alpha_key`` reproduces the reference's smart-alpha comparator
(GxdImagePaneIndexer.java:280-300: split digit runs so "a2" < "a10")
as a pure native-expression sort key: digit runs are zero-padded to a
fixed width, everything else passes through — orderBy on the key gives
the comparator's order with no Python and no custom ordering object.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SEP = "\x00"


def smart_alpha_key(c: Column, width: int = 12) -> Column:
    """Sort key under which digit runs compare numerically."""
    marked = F.regexp_replace(c, "([0-9]+)", _SEP + "$1" + _SEP)
    parts = F.split(marked, _SEP)
    norm = F.transform(
        parts,
        lambda p: F.when(
            p.rlike("^[0-9]+$"), F.lpad(p, width, "0")
        ).otherwise(p),
    )
    return F.concat_ws("", norm)
