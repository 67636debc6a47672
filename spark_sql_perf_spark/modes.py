"""ExecutionMode — how a benchmarked query's result is consumed.

Parity with the reference's ExecutionMode.scala:23-56:

  CollectResults   df.collect()                       (drive-side rows)
  ForeachResults   full execution, rows discarded     (noop sink)
  CountResults     df.count()
  HashResults      SELECT SUM(CRC32(CONCAT_WS(',',*))) -- order-insensitive
                   result fingerprint (Query.scala:130-136)
  WriteParquet     df.write.parquet(location/name.parquet)

Each mode returns an optional result value recorded in BenchmarkResult
(the crc32 hash for HashResults, the count for CountResults).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ExecutionMode:
    name: str
    location: str | None = None  # WriteParquet only

    def consume(self, df: DataFrame, query_name: str) -> int | None:
        if self.name == "collect":
            df.collect()
            return None
        if self.name == "foreach":
            # modern noop sink: full execution, zero driver transfer
            df.write.format("noop").mode("overwrite").save()
            return None
        if self.name == "count":
            return df.count()
        if self.name == "hash":
            row = df.select(
                F.sum(F.crc32(F.concat_ws(",", *df.columns))).alias("h")
            ).collect()[0]
            return row.h
        if self.name == "write_parquet":
            if not self.location:
                raise ValueError("WriteParquet mode needs a location")
            df.write.mode("overwrite").parquet(f"{self.location}/{query_name}.parquet")
            return None
        raise ValueError(f"unknown execution mode {self.name!r}")


COLLECT = ExecutionMode("collect")
FOREACH = ExecutionMode("foreach")
COUNT = ExecutionMode("count")
HASH = ExecutionMode("hash")


def write_parquet(location: str) -> ExecutionMode:
    return ExecutionMode("write_parquet", location=location)
