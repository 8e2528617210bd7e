"""Postgres-dialect JDBC parity matrix (r11 verdict item 6).

Embedded Derby stands in for the reference's live PostgreSQL
(spark_utils.py:94-126 option-style, :218-277 properties-style) —
no Postgres daemon exists in this sandbox. These tests prove the
stand-in transfers: every dialect-sensitive behavior the reference
relies on is either (a) asserted identical between Spark's
PostgresDialect and DerbyDialect through Spark's own public dialect
registry, or (b) exercised live on Derby in exactly the shape the
reference uses against Postgres.

Matrix rows:
- dialect resolution for the reference's URL shapes;
- identifier quoting (Postgres folds unquoted to lower, Derby to
  UPPER — both dialects double-quote, so written mixed-case names
  survive either engine);
- type round-trip for the 5 declared not_applicable_cves columns
  (all VARCHAR in the reference, NOT_APPLICABLE_SCHEMA) plus the
  wider numeric/timestamp/boolean set the TPC-H twin tables use;
- schema-qualified table names (reference reads "schema.table");
- absent-table SQLState: Derby raises 42X05 where Postgres raises
  42P01 — both funnel into read_jdbc_table's empty-relation
  contract, and strict mode surfaces the real error.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from pyspark.sql import types as T

from advisorydatapipeline_spark.sources.jdbc import read_jdbc_table
from advisorydatapipeline_spark.queries.parity_formats import (
    DERBY_DRIVER,
    NOT_APPLICABLE_SCHEMA,
)

PG_URL = "jdbc:postgresql://host:5432/db"


def _dialect(spark, url):
    return spark._jvm.org.apache.spark.sql.jdbc.JdbcDialects.get(url)


def _derby_url(tmp_path, name="db"):
    return f"jdbc:derby:{tmp_path}/{name};create=true"


def test_dialect_resolution_for_reference_url_shapes(spark):
    """Spark must resolve a real PostgresDialect for the URL shape the
    reference passes (jdbc:postgresql://host:port/database) — if it
    fell back to NoopDialect, none of the quoting/type behavior below
    would transfer."""
    pg = _dialect(spark, PG_URL)
    derby = _dialect(spark, "jdbc:derby:/tmp/x")
    assert "Postgres" in pg.getClass().getName()
    assert "Derby" in derby.getClass().getName()


def test_identifier_quoting_identical_across_dialects(spark):
    """Both dialects double-quote identifiers, so a mixed-case or
    keyword-colliding column written by df.write.jdbc survives
    unfolded on BOTH engines — the behavior the cast-projection
    conform() depends on for name-addressed columns."""
    pg = _dialect(spark, PG_URL)
    derby = _dialect(spark, "jdbc:derby:/tmp/x")
    for ident in ("fixedVersion", "internal_status", "user", "ORDER"):
        assert pg.quoteIdentifier(ident) == f'"{ident}"'
        assert derby.quoteIdentifier(ident) == f'"{ident}"'


def test_declared_five_columns_roundtrip_and_types(spark, tmp_path):
    """The reference's not_applicable_cves table: 5 VARCHAR columns.
    Write through Spark's Derby mapping, read back through
    read_jdbc_table's cast-projection, assert names, types, and
    values — including NULLs (nullable VARCHAR on both engines)."""
    url = _derby_url(tmp_path)
    rows = [
        ("CVE-2024-1", "pkgA", "fixed", "1.2.3", "resolved"),
        ("CVE-2024-2", "pkgB", None, None, "pending"),
    ]
    spark.createDataFrame(rows, NOT_APPLICABLE_SCHEMA).write.jdbc(
        url, "not_applicable_cves", properties={"driver": DERBY_DRIVER}
    )
    back = read_jdbc_table(
        spark, url, "not_applicable_cves", NOT_APPLICABLE_SCHEMA,
        driver=DERBY_DRIVER, strict=True,
    )
    assert back.schema == NOT_APPLICABLE_SCHEMA
    assert sorted(tuple(r) for r in back.collect()) == sorted(rows)


WIDE_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("qty", T.IntegerType(), True),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("flag", T.BooleanType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def test_wide_type_matrix_roundtrip(spark, tmp_path):
    """BIGINT/VARCHAR/INTEGER/DOUBLE/BOOLEAN/TIMESTAMP: the widest
    type set the TPC-H twin tables push through JDBC. Derby's
    getJDBCType mapping differs from Postgres in DECLARATION only
    (e.g. DOUBLE vs DOUBLE PRECISION); what parity needs — and what
    this asserts — is that the Catalyst type surviving the
    write->read->conform round trip equals the declared schema,
    which is dialect-neutral by construction of conform()."""
    url = _derby_url(tmp_path)
    rows = [
        (1, "a", 10, 1.5, True, datetime(2024, 1, 2, 3, 4, 5)),
        (2, None, None, None, None, None),
    ]
    spark.createDataFrame(rows, WIDE_SCHEMA).write.jdbc(
        url, "wide_tbl", properties={"driver": DERBY_DRIVER}
    )
    back = read_jdbc_table(
        spark, url, "wide_tbl", WIDE_SCHEMA,
        driver=DERBY_DRIVER, strict=True,
    )
    assert back.schema == WIDE_SCHEMA
    assert sorted(
        tuple(r) for r in back.collect()
    ) == sorted(rows)


def test_schema_qualified_table_name(spark, tmp_path):
    """The reference reads 'schema.table_name' (spark_utils.py:232).
    Derby's default schema is APP; the qualified name must resolve to
    the same relation as the bare one."""
    url = _derby_url(tmp_path)
    spark.createDataFrame(
        [("CVE-1", "p", "s", "v", "i")], NOT_APPLICABLE_SCHEMA
    ).write.jdbc(url, "qual_tbl", properties={"driver": DERBY_DRIVER})
    bare = read_jdbc_table(
        spark, url, "qual_tbl", NOT_APPLICABLE_SCHEMA,
        driver=DERBY_DRIVER, strict=True,
    )
    qual = read_jdbc_table(
        spark, url, "APP.qual_tbl", NOT_APPLICABLE_SCHEMA,
        driver=DERBY_DRIVER, strict=True,
    )
    assert bare.collect() == qual.collect()


def test_absent_table_sqlstate_and_contract(spark, tmp_path):
    """Absent table: Derby raises SQLState 42X05 (Postgres's
    undefined_table is 42P01 — different code, same class 42 syntax
    error). strict=True surfaces the real engine error; strict=False
    is the reference's bootstrap contract (spark_utils.py:266-271):
    empty relation WITH the declared schema, regardless of which
    SQLState the engine chose."""
    url = _derby_url(tmp_path)
    # touch the db so the failure is table-absence, not db-absence
    spark.createDataFrame(
        [("x", "x", "x", "x", "x")], NOT_APPLICABLE_SCHEMA
    ).write.jdbc(url, "exists_tbl", properties={"driver": DERBY_DRIVER})
    with pytest.raises(Exception) as ei:
        read_jdbc_table(
            spark, url, "no_such_tbl", NOT_APPLICABLE_SCHEMA,
            driver=DERBY_DRIVER, strict=True,
        ).collect()
    assert "42X05" in str(ei.value) or "NO_SUCH_TBL" in str(ei.value)
    soft = read_jdbc_table(
        spark, url, "no_such_tbl", NOT_APPLICABLE_SCHEMA,
        driver=DERBY_DRIVER, strict=False,
    )
    assert soft.schema == NOT_APPLICABLE_SCHEMA
    assert soft.count() == 0
