"""Table provisioning + registration utilities (SURVEY.md §2.1 S7/S10/S11).

The reference walks a query's unanalyzed logical plan for
UnresolvedRelation names and saves any missing table from the benchmark's
Table members (Benchmark.scala:342-374). Same here: parse the SQL, collect
unresolved relation names, `saveAsTable` the missing ones.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel


def unresolved_tables(spark: SparkSession, sql_text: str) -> set[str]:
    """Names of tables a SQL query references, from the PARSED (unanalyzed)
    plan — so it works before the tables exist (Benchmark.scala:349-358).
    """
    parser = spark._jsparkSession.sessionState().sqlParser()
    plan_str = parser.parsePlan(sql_text).toString()
    names = set(re.findall(r"'UnresolvedRelation \[([^\]]+)\]", plan_str))
    # strip catalog/db qualifiers; keep the table segment
    out = set()
    for n in names:
        out.add(n.split(",")[-1].strip().strip("`"))
    return out


def provision_tables(
    spark: SparkSession, sql_text: str, tables: dict[str, DataFrame]
) -> list[str]:
    """Auto-create any table the query references that the catalog lacks
    (S7 managed-table sink): data.write.saveAsTable(name)."""
    created = []
    for name in sorted(unresolved_tables(spark, sql_text)):
        if spark.catalog.tableExists(name):
            continue
        if name not in tables:
            raise KeyError(f"query references unknown table {name!r}")
        tables[name].write.mode("overwrite").saveAsTable(name)
        created.append(name)
    return created


def create_temporary_table(
    spark: SparkSession, name: str, df: DataFrame, materialize: bool = True
) -> DataFrame:
    """Temp view persisted MEMORY_AND_DISK with a forced count
    (tpcds/Tables.scala:187-193 createTemporaryTable semantics)."""
    cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    cached.createOrReplaceTempView(name)
    if materialize:
        cached.count()
    return cached


def create_external_table(
    spark: SparkSession, name: str, location: str, fmt: str = "parquet",
    overwrite: bool = False,
) -> None:
    """External table over an existing location
    (tpcds/Tables.scala:174-185 createExternalTable)."""
    if overwrite:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} USING {fmt} LOCATION '{location}'"
    )
