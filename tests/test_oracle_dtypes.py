"""Pin the oracle↔Spark *dtype* contract, not just values.

Three consecutive rounds produced a red driver CORRECTNESS row from
type drift the value-level checks couldn't see locally: r01 parquet
TIMESTAMP(NANOS), r02 TIMESTAMP_NTZ arithmetic, r03 DuckDB widening a
window ``sum()`` over BIGINT to HUGEINT — which the driver's
pandas-based comparator materializes as float64 (``1.0``) while Spark
emits int64 (``1``), so the value hash differs even though the row
multisets are identical.

This test runs every registered oracle through DuckDB's ``.df()`` (the
same pandas materialization the driver uses) and asserts each result
column's pandas dtype is hash-compatible with the Spark plan's schema:

- Spark integral  -> pandas integer dtype. float64 is tolerated ONLY
  when the column actually contains NULLs (pandas upcasts both sides
  identically then); a NULL-free float64 under an integral Spark
  column is exactly the HUGEINT/DECIMAL drift class — fail.
- Spark float     -> pandas float dtype (an int dtype would hash
  ``1`` vs Spark's ``1.0`` — fail).
- Spark bool/str/timestamp/date/binary -> the matching pandas image.

Deleting the ``CAST(... AS BIGINT)`` from the ``sequence_packing``
oracle makes this fail, which is the point.
"""

from __future__ import annotations

import duckdb
import pandas.api.types as pt
import pytest

from advisorydatapipeline_spark.registry import ORACLES, QUERIES

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def _spark_kind(dt):
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    return type(dt).__name__


def _pandas_kind(series):
    d = series.dtype
    if pt.is_bool_dtype(d):
        return "bool"
    if pt.is_integer_dtype(d):
        return "int"
    if pt.is_float_dtype(d):
        return "float"
    if pt.is_datetime64_any_dtype(d):
        return "ts"
    if d == object:
        import datetime
        import decimal

        non_null = series.dropna()
        if non_null.empty:
            return "empty"
        v = non_null.iloc[0]
        if isinstance(v, str):
            return "str"
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, int):
            return "int"
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, datetime.datetime):
            return "ts"
        if isinstance(v, datetime.date):
            return "date"
        if isinstance(v, (bytes, bytearray)):
            return "bytes"
        return f"object[{type(v).__name__}]"
    return str(d)


def _compatible(spark_kind, duck_kind, has_nulls):
    if spark_kind == duck_kind:
        return True
    # pandas upcasts a NULL-bearing int column to float64 on BOTH
    # sides, so values still hash equal; without NULLs it's drift.
    if spark_kind == "int" and duck_kind == "float":
        return has_nulls
    if spark_kind == "int" and duck_kind == "empty":
        return True
    if duck_kind == "empty":
        return True
    # DuckDB DATE may materialize as datetime64 at midnight while
    # Spark emits datetime.date objects -> would hash-differ.
    return False


ORACLE_NAMES = sorted(ORACLES)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_dtype_matches_spark_schema(duck, spark, sf_dir, name):
    odf = duck.execute(ORACLES[name]).df()
    schema = {f.name.lower(): f.dataType for f in QUERIES[name](spark, sf_dir).schema.fields}
    odf.columns = [c.lower() for c in odf.columns]
    assert sorted(odf.columns) == sorted(schema), (
        f"{name}: oracle columns {sorted(odf.columns)} != spark {sorted(schema)}"
    )
    problems = []
    for col in odf.columns:
        sk = _spark_kind(schema[col])
        dk = _pandas_kind(odf[col])
        if not _compatible(sk, dk, bool(odf[col].isna().any())):
            problems.append(
                f"{col}: spark={sk} duckdb-pandas={dk} (dtype {odf[col].dtype})"
            )
    assert not problems, f"{name}: dtype drift -> driver hash mismatch: {problems}"
