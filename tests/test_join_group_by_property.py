"""Seeded randomized cross-check: join_group_by vs Spark's native
join + groupBy computing the identical fixed-point arithmetic —
random key skew/nulls/duplication, random group sides, sum/min/max/
count/sumprod specs, with and without b_exists."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from arcade_spark.encode import encode_job
from arcade_spark.readops import join_group_by


@pytest.mark.parametrize("seed", [3, 17, 91])
def test_join_group_by_matches_native(spark, tmp_path_factory, seed):
    rng = np.random.default_rng(seed)
    n_f = int(rng.integers(200, 700))
    n_d = int(rng.integers(20, 120))
    n_keys = int(rng.integers(5, 40))

    fk = rng.integers(0, n_keys, n_f).astype(object)
    fk[rng.random(n_f) < 0.06] = None
    fact = spark.createDataFrame(
        [(f"f{i:04d}",
          None if fk[i] is None else int(fk[i]),
          round(float(rng.integers(0, 9999)) / 100.0, 2),
          int(rng.integers(-20, 20)),
          ["p", "q", "r"][int(rng.integers(0, 3))])
         for i in range(n_f)],
        "url string, k long, price double, x long, fg string",
    )
    dk = rng.integers(0, n_keys + 5, n_d).astype(object)
    dk[rng.random(n_d) < 0.05] = None
    dim = spark.createDataFrame(
        [(f"d{i:03d}",
          None if dk[i] is None else int(dk[i]),
          ["A", "B"][int(rng.integers(0, 2))])
         for i in range(n_d)],
        "url string, k long, dg string",
    )
    base = tmp_path_factory.mktemp(f"jgp{seed}")
    out_f, out_d = str(base / "f"), str(base / "d")
    encode_job(spark, fact, out_f, num_parts=int(rng.integers(1, 4)),
               block_rows=int(rng.choice([16, 64, 256])), order_col="url")
    encode_job(spark, dim, out_d, num_parts=1,
               block_rows=int(rng.choice([8, 32])), order_col="url")

    b_exists = bool(rng.integers(0, 2))
    group_a = ["fg"] if rng.integers(0, 2) else []
    group_b = [] if b_exists else (["dg"] if rng.integers(0, 2) else [])
    if not group_a and not group_b:
        group_a = ["fg"]

    got = join_group_by(
        spark, out_f, out_d, "k",
        [("s_price", "sum", "price"),
         ("mn_x", "min", "x"), ("mx_x", "max", "x"),
         ("rev", "sumprod", [("price", 1, 0), ("x", 1, 0)]),
         ("cnt", "count", None)],
        group_a=group_a, group_b=group_b, b_exists=b_exists,
    ).toPandas()

    # native replay in the same quantized domain
    qf = (fact
          .withColumn("qp", F.expr("CAST(floor(price*100 + 0.5) AS BIGINT)"))
          .withColumn("qrev", F.col("qp") * F.col("x")))
    if b_exists:
        j = qf.join(dim.select("k").distinct(), "k", "left_semi")
    else:
        j = qf.join(dim.withColumnRenamed("url", "durl"), "k")
    gcols = group_a + group_b
    want = (
        j.groupBy(*gcols).agg(
            (F.sum("qp").cast("double") / 100.0).alias("s_price"),
            F.min("x").alias("mn_x"), F.max("x").alias("mx_x"),
            (F.sum("qrev").cast("double") / 100.0).alias("rev"),
            F.count("*").alias("cnt"),
        )
        .toPandas()
    )
    got = got.sort_values(gcols).reset_index(drop=True)
    want = want.sort_values(gcols).reset_index(drop=True)
    assert len(got) == len(want), (group_a, group_b, b_exists)
    for c in gcols + ["s_price", "mn_x", "mx_x", "rev", "cnt"]:
        assert list(got[c]) == list(want[c]), (c, group_a, group_b, b_exists)
