"""JSON/ORC source+sink roundtrips: schema fidelity and pushdown."""

import pytest
from pyspark.sql import functions as F

from bigdata_hits_spark.sinks import write_json, write_orc
from bigdata_hits_spark.sources.readers import load_table, read_json, read_orc


@pytest.fixture(scope="module")
def nation(spark, sf_dir):
    return load_table(spark, sf_dir, "nation")


def test_json_roundtrip_with_explicit_schema(spark, nation, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fmt") / "nation_json")
    write_json(nation, path)
    back = read_json(spark, path, nation.schema)
    assert back.schema == nation.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_json_reader_accepts_ddl_schema(spark, nation, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fmt") / "nation_json_ddl")
    write_json(nation.select("n_nationkey", "n_name"), path)
    back = read_json(spark, path, "n_nationkey bigint, n_name string")
    assert back.count() == nation.count()
    assert dict(back.dtypes) == {"n_nationkey": "bigint", "n_name": "string"}


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path_factory):
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path_factory.mktemp("fmt") / "orders_orc")
    write_orc(orders, path)
    back = read_orc(spark, path)
    assert back.schema == orders.schema
    assert back.count() == orders.count()
    # Filters and pruning reach the ORC scan just like parquet.
    plan = (
        back.filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)" in plan
    assert "o_totalprice" not in plan


def test_write_zordered_clusters_every_dimension(spark, tmp_path):
    """Z-order files must be narrow in BOTH dimensions; a plain sort is
    narrow in its sort key and full-range in the other — that contrast
    is the entire point of the layout."""
    import itertools

    from pyspark.sql import functions as F

    from bigdata_hits_spark.sources.bucketed import write_zordered

    n = 40_000
    df = spark.range(n).select(
        (F.xxhash64("id", F.lit(1)) % 10_000).cast("double").alias("x"),
        (F.xxhash64("id", F.lit(2)) % 10_000).cast("double").alias("y"),
    )

    def file_spans(path):
        got = (
            spark.read.parquet(path)
            .withColumn("f", F.input_file_name())
            .groupBy("f")
            .agg(
                (F.max("x") - F.min("x")).alias("sx"),
                (F.max("y") - F.min("y")).alias("sy"),
            )
            .collect()
        )
        import statistics

        return (
            statistics.mean(r["sx"] for r in got),
            statistics.mean(r["sy"] for r in got),
            len(got),
        )

    zpath = str(tmp_path / "zorder")
    write_zordered(df, zpath, ["x", "y"], num_files=64)
    zx, zy, nfiles = file_spans(zpath)
    assert nfiles >= 32
    # global span ~20k per dim; 64 curve segments ~ 1/8-range tiles, and a
    # sampled range split can straddle two adjacent tiles -> bound at two
    # tile widths (plus slack), far below the full range either way
    assert zx < 0.35 * 20_000, zx
    assert zy < 0.35 * 20_000, zy

    spath = str(tmp_path / "sorted")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(spath)
    sx, sy, _ = file_spans(spath)
    assert sx < 0.2 * 20_000  # sort clusters its own key tightly...
    assert sy > 0.9 * 20_000  # ...and leaves the other dimension useless


def test_write_zordered_rejects_bad_args(spark):
    from bigdata_hits_spark.sources.bucketed import write_zordered

    df = spark.range(4).selectExpr("id as x", "id as y", "id as w")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        write_zordered(df, "/tmp/never", ["x"])
    with _pytest.raises(ValueError):
        write_zordered(df, "/tmp/never", ["x", "y", "w"], bits=21)
    # all-NULL z-column is a clear error, not an opaque TypeError
    dfn = spark.range(4).selectExpr("id as x", "cast(null as double) as y")
    with _pytest.raises(ValueError, match="no non-NULL"):
        write_zordered(dfn, "/tmp/never", ["x", "y"])


def test_write_zordered_max_lands_in_top_cell(spark, tmp_path):
    """Rows at a column's maximum must cluster with other HIGH values,
    not wrap to share z-bits with NULLs/minima (width_bucket's overflow
    bucket is one past the top; the writer clamps it)."""
    from pyspark.sql import functions as F

    from bigdata_hits_spark.sources.bucketed import write_zordered

    # half the rows sit AT the max in both dims, half at the min
    df = spark.range(8_000).select(
        F.when(F.col("id") % 2 == 0, 0.0).otherwise(1000.0).alias("x"),
        F.when(F.col("id") % 2 == 0, 0.0).otherwise(1000.0).alias("y"),
    )
    zpath = str(tmp_path / "zmax")
    write_zordered(df, zpath, ["x", "y"], num_files=8)
    got = (
        spark.read.parquet(zpath)
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.countDistinct("x").alias("nx"))
        .collect()
    )
    # with the clamp, minima and maxima occupy opposite curve ends — no
    # file mixes both values (pre-fix, every max row collided into cell 0)
    assert all(r["nx"] == 1 for r in got), got
