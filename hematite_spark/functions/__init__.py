"""Reusable column-expression library (SURVEY.md §2 B scalar
functions; §2 C vector/text primitives). Every expression here is a
Catalyst Column built from JVM-side built-ins and higher-order
functions — whole-stage-codegen'd, no Python UDFs — so composing
them keeps queries on the fast path at any scale.

The DUCK_* strings are the DuckDB-equivalent SQL fragments the
oracle queries splice in, kept beside their Spark twins so the
engine/oracle pairing stays reviewable in one place.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# ------------------------------------------------------------ vector math


def dbl(col) -> Column:
    """array<float> → array<double> (testdata embeddings are float32;
    both engines must fold in float64 for bit-identical results)."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    """Left-fold Σ aᵢbᵢ in double — deterministic summation order."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a, b) -> Column:
    """Cosine similarity of two (already-double) vectors."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# DuckDB computes the same fold with list_reduce over the zipped
# product list; both engines see float64 after ::DOUBLE[].
DUCK_DOT = "list_reduce(list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (acc, x) -> acc + x)"
DUCK_NORM = "sqrt(list_reduce(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x))"


# ----------------------------------------------------- count-min sketch


def cms_rb_structs(col, d: int = 4, w: int = 64) -> list:
    """The count-min-sketch (row, bucket) coordinates of a token
    column: d structs, one per sketch row, each bucketing by an
    md5-derived hash so DuckDB (('0x'||hex)::BIGINT) computes the
    byte-identical sketch. Shared by the batch heavy-hitter query and
    the streaming sketch maintainer so both paths agree counter for
    counter."""
    return [
        F.struct(
            F.lit(r).alias("r"),
            (
                F.conv(F.substring(F.md5(F.concat(F.lit(str(r)), F.lit(":"), col)), 1, 8), 16, 10)
                .cast("long")
                % w
            ).alias("bucket"),
        )
        for r in range(d)
    ]


# ------------------------------------------------------------ text


def norm_text(col: str = "text") -> Column:
    """Whitespace-normalized document text — the shared normalization
    every dedup/fingerprint path applies before hashing, so exact
    dedup, MinHash shingles, and the corpus pipeline agree on what
    'the same text' means."""
    return F.regexp_replace(F.trim(F.col(col)), r"\s+", " ")


def words(col: str = "text") -> Column:
    """Whitespace tokenization (the cheap path; regex token counting
    lives in queries/text.py beside its oracle)."""
    return F.split(F.col(col), " ")


__all__ = [
    "cms_rb_structs",
    "dbl",
    "dot",
    "l2_norm",
    "cosine",
    "norm_text",
    "words",
    "DUCK_DOT",
    "DUCK_NORM",
]
