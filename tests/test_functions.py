"""Direct unit tests for the shared expression library — the query
suite exercises these through the oracle gate; these pin the math
against plain Python so a library regression is localized instantly."""

import math

from pyspark.sql import functions as F

from hematite_spark.functions import cosine, dbl, dot, l2_norm, norm_text, words


def test_vector_math_against_python(spark):
    a = [1.5, -2.0, 3.25]
    b = [0.5, 4.0, -1.0]
    df = spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
    row = df.select(
        dot(dbl("a"), dbl("b")).alias("d"),
        l2_norm(dbl("a")).alias("na"),
        cosine(dbl("a"), dbl("b")).alias("c"),
    ).first()
    exp_dot = sum(x * y for x, y in zip(a, b))
    exp_na = math.sqrt(sum(x * x for x in a))
    exp_nb = math.sqrt(sum(x * x for x in b))
    assert abs(row.d - exp_dot) < 1e-9
    assert abs(row.na - exp_na) < 1e-9
    assert abs(row.c - exp_dot / (exp_na * exp_nb)) < 1e-9


def test_dot_is_left_fold_order(spark):
    """The fold order is part of the contract (oracle bit-equality
    depends on it): summation must run left to right."""
    # values chosen so float addition is non-associative
    a = [1e16, 1.0, -1e16]
    b = [1.0, 1.0, 1.0]
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    got = df.select(dot(F.col("a"), F.col("b")).alias("d")).first().d
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    assert got == acc  # exactly the left fold, not a rearranged sum


def test_norm_text_and_words(spark):
    df = spark.createDataFrame([("  hello   world\tagain  ",)], "text string")
    row = df.select(norm_text().alias("n"), words().alias("w")).first()
    assert row.n == "hello world again"
    # words() tokenizes the RAW column (normalization is the caller's
    # choice); on normalized text it yields clean tokens
    assert df.select(F.split(norm_text(), " ").alias("w")).first().w == [
        "hello",
        "world",
        "again",
    ]
