"""Source layer: listing, zip-archive input (Text/TextSource.cs:80-108)."""

import zipfile

import pytest
from pyspark.sql import functions as F

from kusto_pre_forge_spark.config import Compression, DataFormat, RunSettings
from kusto_pre_forge_spark.sources.blob import list_source, read_landing, read_zip_lines


@pytest.fixture(scope="module")
def zipped_orders(spark, sf_smoke, tmp_path_factory):
    d = tmp_path_factory.mktemp("zip")
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    pdf = orders.toPandas()
    csv_path = d / "orders.csv"
    pdf.to_csv(csv_path, index=False)
    zpath = d / "orders.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        z.write(csv_path, "orders.csv")
    return str(zpath), orders


def test_zip_txt_lines(spark, zipped_orders):
    zpath, orders = zipped_orders
    txt = read_landing(
        spark, zpath, RunSettings(fmt=DataFormat.TXT, input_compression=Compression.ZIP)
    )
    assert txt.count() == orders.count() + 1  # header line included in txt mode
    assert txt.columns == ["Text", "_kpf_source"]


def test_zip_csv_parsed(spark, zipped_orders):
    zpath, orders = zipped_orders
    # pandas CSV serializes timestamps in a format from_csv won't parse by
    # default; string/long/double columns cover the parse contract
    import pyspark.sql.types as T

    schema = T.StructType(
        [f for f in orders.schema.fields if not isinstance(f.dataType, T.TimestampType)]
    )
    proj = [f.name for f in schema.fields]
    csv = read_landing(
        spark,
        zpath,
        RunSettings(fmt=DataFormat.CSV, input_compression=Compression.ZIP),
        schema=schema,
    ).select(*proj)
    assert csv.count() == orders.count()
    got = csv.agg(F.sum("o_totalprice")).collect()[0][0]
    want = orders.agg(F.sum("o_totalprice")).collect()[0][0]
    assert abs(got - want) < 1e-6


def test_zip_first_entry_only(spark, tmp_path):
    z = tmp_path / "multi.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("first.txt", "a\nb\n")
        zf.writestr("second.txt", "IGNORED\n")
    lines = read_zip_lines(spark, str(z))
    assert [r.Text for r in lines.collect()] == ["a", "b"]


def test_zip_csv_requires_schema(spark, zipped_orders):
    zpath, _ = zipped_orders
    with pytest.raises(ValueError):
        read_landing(
            spark,
            zpath,
            RunSettings(fmt=DataFormat.CSV, input_compression=Compression.ZIP),
        )


def test_list_source_suffix_filter(spark, tmp_path):
    (tmp_path / "a-1.csv").write_text("x\n")
    (tmp_path / "a-2.txt").write_text("y\n")
    got = list_source(spark, f"{tmp_path}/a-", ".csv")
    assert len(got) == 1 and got[0].endswith("a-1.csv")
