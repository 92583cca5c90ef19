"""Contract guard: no oracle may produce a result column the driver's
pandas canonicalizer mangles (CORRECTNESS_r01 root cause).

- HUGEINT/UHUGEINT: DuckDB widens integer sum(); pandas renders
  float64 and the exact-representation hash diverges from Spark int64.
- LIST/STRUCT/MAP: pandas sort_values dies on ndarray cells.
- DECIMAL: object-Decimal vs Spark float64 representation risk.

Runs DuckDB only (no Spark) against sf0.001 — fast enough for every
pytest run, so a newly-added oracle can never regress the gate.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")

BAD_PREFIXES = ("HUGEINT", "UHUGEINT", "DECIMAL")
NESTED_MARKERS = ("[]", "STRUCT", "MAP(")


@pytest.mark.skipif(not os.path.isdir(SF), reason="testdata missing")
def test_no_driver_hostile_oracle_types():
    import __spark_entry__ as entrymod
    from mo_etl_spark.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    offenders = []
    for name, sql in sorted(entrymod.oracle_sql().items()):
        rel = con.sql(sql)
        for c, ty in zip(rel.columns, [str(t) for t in rel.types]):
            tyu = ty.upper()
            if tyu.startswith(BAD_PREFIXES) or any(m in tyu for m in NESTED_MARKERS):
                offenders.append((name, c, ty))
    assert not offenders, (
        f"{len(offenders)} oracle columns have driver-hostile types "
        f"(fix the SQL or regen mo_etl_spark/oracle_fixups.py via "
        f"`python tools/scan_oracle_types.py --emit`): {offenders[:20]}"
    )
