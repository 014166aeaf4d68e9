"""Pins the identity the r6 PQ-encode NumPy rewrite relies on:
Spark's pow(x, 2.0) returns exactly x * x for doubles (a pow correct
to < 0.5 ulp must return the correctly-rounded square, which IS the
rounded product). The PQ oracle keeps pow() in its SQL while the Spark
side accumulates x*x, so this identity is what keeps the two engines
bit-equal. A sampled sweep over the value domain the suite uses
(float32-derived differences and unit-scale doubles)."""

from pyspark.sql import functions as F

from material_parsers_spark.pipeline.session import build_session


def test_pow_two_equals_square():
    spark = build_session(app_name="pow-identity", master="local[4]",
                          shuffle_partitions=4)
    doubles = spark.range(0, 2_000_000).select(
        (F.expr("(rand(42) - 0.5) * 4").cast("double")).alias("x"))
    assert doubles.where(F.expr("pow(x, 2.0) != x * x")).count() == 0
    f32_diffs = spark.range(0, 2_000_000).select(
        (F.expr("cast(rand(7) - 0.5 as float)").cast("double")
         - F.expr("cast(rand(9) - 0.5 as float)").cast("double"))
        .alias("x"))
    assert f32_diffs.where(F.expr("pow(x, 2.0) != x * x")).count() == 0
