"""FileCatalog: csv/json format support, options, and staged swap parity."""

import os

import pytest

from database_transportor_spark import DBT, FileCatalog, ParquetCatalog


@pytest.fixture()
def src_csv(spark, tmp_path):
    root = tmp_path / "src"
    cat = FileCatalog(spark, str(root), format="csv")
    df = spark.createDataFrame(
        [(1, "alice", 10.5), (2, "bob", 20.0), (3, "carol", 30.25)],
        ["id", "name", "score"],
    )
    cat.write(df, "users", mode="overwrite")
    return str(root)


def test_csv_roundtrip_with_schema_inference(spark, src_csv):
    cat = FileCatalog(spark, src_csv, format="csv")
    out = cat.read("users")
    assert out.count() == 3
    # header + inferSchema defaults: typed columns, not strings
    assert dict(out.dtypes)["id"] in ("int", "bigint")
    assert dict(out.dtypes)["score"] == "double"


def test_transport_parquet_to_json(spark, tmp_path):
    out_root = tmp_path / "json_out"
    maps = {
        "nations": {
            "original_table": "nation",
            "extra_conditions": [["n_regionkey", "=", 0]],
            "columns": {"id": "n_nationkey", "name": "n_name"},
        }
    }
    eng = DBT(
        maps,
        target=FileCatalog(spark, str(out_root), format="json"),
        original=ParquetCatalog(spark, "/root/testdata/sf0.001"),
    )
    eng.do_transport(mode="overwrite")
    back = FileCatalog(spark, str(out_root), format="json").read("nations")
    assert back.count() == 5
    assert set(back.columns) == {"id", "name"}


def test_csv_transport_source(spark, src_csv, tmp_path):
    """CSV as the ORIGINAL side of a transport."""
    out_root = tmp_path / "out"
    maps = {
        "scored": {
            "original_table": "users",
            "extra_conditions": ["score > 15"],
            "columns": {"id": "id", "label": "name"},
        }
    }
    eng = DBT(
        maps,
        target=ParquetCatalog(spark, str(out_root)),
        original=FileCatalog(spark, src_csv, format="csv"),
    )
    eng.do_transport(mode="overwrite")
    back = spark.read.parquet(str(out_root / "scored.parquet"))
    assert sorted(r["id"] for r in back.collect()) == [2, 3]


def test_file_catalog_staged_swap(spark, tmp_path):
    root = tmp_path / "tgt"
    cat = FileCatalog(spark, str(root), format="csv", staged=True)
    v1 = spark.createDataFrame([(1, "a")], ["id", "v"])
    v2 = spark.createDataFrame([(2, "b"), (3, "c")], ["id", "v"])
    cat.write(v1, "t", mode="overwrite")
    assert cat.read("t").count() == 1
    cat.write(v2, "t", mode="overwrite")
    assert sorted(r["id"] for r in cat.read("t").collect()) == [2, 3]
    assert not os.path.exists(str(root / "t.csv.__staging"))


def test_write_options_respected(spark, tmp_path):
    root = tmp_path / "noheader"
    cat = FileCatalog(
        spark, str(root), format="csv",
        write_options={"header": "false"},
        read_options={"header": "false", "inferSchema": "true"},
    )
    df = spark.createDataFrame([(1, "x")], ["id", "v"])
    cat.write(df, "t", mode="overwrite")
    back = cat.read("t")
    assert back.columns == ["_c0", "_c1"]  # headerless file, positional names
    assert back.count() == 1
