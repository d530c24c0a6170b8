"""The builder's oracle gate must be as strict as the driver's hash
(VERDICT r4 #8): run a sample of real entries through
tools/check_oracle.check_one at sf0.001, and prove the gate CATCHES the
failure classes that slipped in r4 — int32-vs-BIGINT type drift and
value-level drift — with deliberately-broken fixtures.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import __spark_entry__ as entrymod
from check_oracle import check_one, oracle_connection
from tests.conftest import SF_DIR

# cheap, deterministic, SQL-exact entries spanning the operator families:
# knn scan, IVF, text, corpus packing (the r4 hash-red), codec stats
SMOKE = [
    "knn_l2",
    "ivf_search_exact",
    "pack_sequences",
    "rowwise_minmax",
    "term_frequencies",
]


@pytest.fixture(scope="module")
def oracle_con():
    con = oracle_connection(SF_DIR)
    yield con
    con.close()


def test_smoke_entries_driver_green(spark, oracle_con):
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    for name in SMOKE:
        res = check_one(spark, oracle_con, qs[name], osql[name], SF_DIR)
        assert res["ok"], f"{name}: {res}"


def test_gate_catches_int32_vs_bigint(spark, oracle_con):
    """The r4 failure shape: values equal in Python (3 == 3.0 == int32 3)
    but the driver hash is dtype-sensitive. The gate must flag it."""

    def fn(spark_, sf_dir):
        return spark_.range(3).select(F.col("id").cast("int").alias("n"))

    res = check_one(
        spark, oracle_con, fn, "SELECT CAST(x AS BIGINT) AS n FROM (VALUES (0), (1), (2)) t(x)", SF_DIR
    )
    assert not res["ok"]
    assert not res["ok_types"]
    assert res["type_mismatch"] == {"n": ("int32", "int64")}


def test_gate_catches_value_drift(spark, oracle_con):
    def fn(spark_, sf_dir):
        return spark_.range(3).select(F.col("id").cast("bigint").alias("n"))

    res = check_one(
        spark, oracle_con, fn, "SELECT CAST(x AS BIGINT) AS n FROM (VALUES (0), (1), (7)) t(x)", SF_DIR
    )
    assert not res["ok"] and res["ok_types"] and not res["ok_vals"]


def test_gate_catches_schema_drift(spark, oracle_con):
    """Aggregate aliased differently on the two sides (the documented
    column-name trap) must fail the schema compare."""

    def fn(spark_, sf_dir):
        return spark_.range(3).select(F.sum("id").alias("sum_id"))

    res = check_one(spark, oracle_con, fn, "SELECT 3 AS total", SF_DIR)
    assert not res["ok"] and not res["ok_schema"]
