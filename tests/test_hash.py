"""Hash parity: Spark expression == reference semantics == DuckDB oracle.

Reference semantics: code/KustoPreForgeLib/Transforms/PartitioningHelper.cs:15-24
(hash = seed; hash ^= each UTF-8 byte; hash % maxPartitionCount).
"""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kusto_pre_forge_spark.functions.hashing import (
    duckdb_hash_sql,
    kusto_preforge_hash,
    kusto_preforge_hash_sql,
)


def py_ref(s: str, n: int, seed: int) -> int:
    h = seed
    for b in s.encode("utf-8"):
        h ^= b
    return h % n


CASES = ["", "hello", "Machine7", "a,b c", "Ünïcode-✓", '"quoted"', "x" * 300]


@pytest.mark.parametrize("n,seed", [(8, 42), (1, 0), (256, 7), (2048, 123)])
def test_spark_matches_reference(spark, n, seed):
    df = spark.createDataFrame([(c,) for c in CASES], ["k"])
    rows = df.withColumn("pid", kusto_preforge_hash("k", n, seed)).collect()
    for r in rows:
        assert r.pid == py_ref(r.k, n, seed), (r.k, n, seed)


def test_null_yields_null(spark):
    df = spark.createDataFrame([(None,), ("a",)], "k string")
    rows = {r.k: r.pid for r in df.withColumn("pid", kusto_preforge_hash("k", 8, 1)).collect()}
    assert rows[None] is None
    assert rows["a"] == py_ref("a", 8, 1)


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=50))
@settings(max_examples=200, deadline=None)
def test_duckdb_oracle_matches_reference_ascii(s):
    lit = "'" + s.replace("'", "''") + "'"
    got = duckdb.sql(f"SELECT {duckdb_hash_sql(lit, 8, 42)}").fetchone()[0]
    assert got == py_ref(s, 8, 42)


def test_sql_form_usable_in_spark_sql(spark):
    spark.createDataFrame([("abc",)], ["k"]).createOrReplaceTempView("t_hash")
    got = spark.sql(f"SELECT {kusto_preforge_hash_sql('k', 16, 5)} AS p FROM t_hash").collect()
    assert got[0].p == py_ref("abc", 16, 5)
