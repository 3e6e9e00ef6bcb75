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
