"""Salted aggregation/join equivalence with the unsalted plans."""

from pyspark.sql import functions as F

from meerschaum_spark.functions.skew import salted_agg, salted_join, with_salt


def test_salted_agg_matches_plain(spark):
    # one hot key (0) dominating
    df = spark.range(10_000).select(
        (F.when(F.col("id") % 10 < 8, 0).otherwise(F.col("id") % 100))
        .alias("k"),
        (F.col("id") * 2).alias("v"))
    plain = {(r["k"]): (r["s"], r["n"], r["mn"], r["mx"])
             for r in df.groupBy("k").agg(
                 F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"),
                 F.min("v").alias("mn"), F.max("v").alias("mx")).collect()}
    salted = {(r["k"]): (r["sum_v"], r["count_v"], r["min_v"], r["max_v"])
              for r in salted_agg(df, ["k"],
                                  {"v": "sum"} | {}, n_salts=8)
              .join(salted_agg(df, ["k"], {"v": "count"}, 8), "k")
              .join(salted_agg(df, ["k"], {"v": "min"}, 8), "k")
              .join(salted_agg(df, ["k"], {"v": "max"}, 8), "k").collect()}
    assert plain == salted


def test_salted_join_matches_plain(spark):
    big = spark.range(5_000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v"))
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(7)], "k long, name string")
    plain = sorted((r["v"], r["name"])
                   for r in big.join(small, "k").collect())
    salted = sorted((r["v"], r["name"])
                    for r in salted_join(big, small, "k", n_salts=4).collect())
    assert plain == salted


def test_salt_is_deterministic(spark):
    df = spark.range(100).select(F.col("id").alias("k"))
    a = [r["_salt"] for r in with_salt(df, 8).orderBy("k").collect()]
    b = [r["_salt"] for r in with_salt(df, 8).orderBy("k").collect()]
    assert a == b
    assert set(a) <= set(range(8))
