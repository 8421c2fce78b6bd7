"""Text column expressions (JVM-side, no UDFs).

Token/quality primitives used by the text-analysis operators. Regexes are
kept to the POSIX-ish subset that Spark (Java regex) and ANSI engines agree
on so oracle SQL can replicate them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_ws(c: Column) -> Column:
    """Lowercase, collapse all whitespace runs to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(c: Column) -> Column:
    """Whitespace tokenization of a non-empty trimmed string."""
    return F.split(F.trim(c), r"\s+")


def token_count(c: Column) -> Column:
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(tokens(c)))


def punct_ratio(c: Column) -> Column:
    """Fraction of characters that are common punctuation."""
    n = F.length(c)
    stripped = F.length(F.regexp_replace(c, r"[.,!?;:'\"()\[\]-]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise((n - stripped).cast("double") / n.cast("double"))
