"""Table catalogs — the Spark equivalent of the reference's two named Laravel
connections (``original``/``target``, DBT.php:17-19,58-66).

The engine takes one catalog per side.  Production uses :class:`JDBCCatalog`
(DataFrame JDBC read/write per the driver's approach); fixtures/tests use
:class:`ParquetCatalog` (a directory of ``<table>.parquet``) or
:class:`MemoryCatalog` (pre-built DataFrames; writes captured for assertions).

Scale notes
-----------
- The reference's chunked pagination scan (S2, DBT.php:157,170) is replaced by
  Spark partitioned reads: set ``numPartitions``/``partitionColumn``/bounds and
  ``fetchsize`` on JDBC so a 1000-executor cluster reads in parallel, and
  ``batchsize`` on writes.  Reference pagination without an ``order`` spec has
  no stable sort ⇒ rows can be skipped/duplicated across windows; Spark reads
  are exactly-once — a strict improvement we inherit for free.
- Parquet scans get predicate pushdown + column pruning from Catalyst; do not
  cache source DataFrames unless they are probed repeatedly.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession

__all__ = ["Catalog", "ParquetCatalog", "JDBCCatalog", "MemoryCatalog", "TableCatalog"]


class Catalog:
    """Read/write access to named tables on one side of the migration."""

    def read(self, table: str) -> DataFrame:
        raise NotImplementedError

    def write(self, df: DataFrame, table: str, mode: str = "append") -> None:
        raise NotImplementedError

    def is_nonempty(self, table: str) -> bool:
        """Seed validation (S6, DBT.php:512-518): cheap existence probe."""
        try:
            return len(self.read(table).take(1)) > 0
        except Exception:
            return False


class ParquetCatalog(Catalog):
    """One parquet file/dir per table under ``root`` (driver fixtures).

    ``staged=True`` implements the X7 transaction-gap strategy
    (CreateTemp.temp:26-38 wraps the whole reference run in one DB
    transaction; Spark has no cross-table equivalent): each write lands in
    ``<table>.__staging`` and is swapped into place only after the job
    succeeds, so readers never observe a half-written table and a failed
    run leaves the previous data intact.  The swap is per-table — the
    cross-TABLE guarantee remains weaker than the reference's single
    transaction, which is documented, not hidden.
    """

    def __init__(self, spark: SparkSession, root: str, suffix: str = ".parquet",
                 staged: bool = False):
        self.spark = spark
        self.root = root.rstrip("/")
        self.suffix = suffix
        self.staged = staged

    def path(self, table: str) -> str:
        return f"{self.root}/{table}{self.suffix}"

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    def write(self, df: DataFrame, table: str, mode: str = "append") -> None:
        if not self.staged or mode == "append":
            # append can't stage meaningfully (the swap would drop history)
            df.write.mode(mode).parquet(self.path(table))
            return
        import shutil
        import os

        final = self.path(table)
        staging = f"{final}.__staging"
        shutil.rmtree(staging, ignore_errors=True)
        df.write.mode("overwrite").parquet(staging)
        # job succeeded — swap
        if os.path.isdir(final) or os.path.isfile(final):
            shutil.rmtree(final, ignore_errors=True)
        os.replace(staging, final)


class JDBCCatalog(Catalog):
    """Live-RDBMS catalog via Spark's JDBC source.

    ``partition_options`` per table (optional): ``{"partitionColumn": ...,
    "lowerBound": ..., "upperBound": ..., "numPartitions": ...}`` enables
    parallel reads; without it the read is single-task (fine for dims, wrong
    for facts at scale).

    Staged-swap (X7) over JDBC: Spark's JDBC writer cannot rename tables,
    so the swap needs one direct statement on the target DB — write with
    ``table + "__staging"`` then run ``ALTER TABLE ... RENAME`` (or the
    dialect's equivalent) in a ``run_after_transport`` hook; the parquet
    catalog implements the same pattern natively.
    """

    def __init__(
        self,
        spark: SparkSession,
        url: str,
        properties: Optional[dict[str, str]] = None,
        fetchsize: int = 10_000,
        batchsize: int = 10_000,
        partition_options: Optional[dict[str, dict[str, Any]]] = None,
    ):
        self.spark = spark
        self.url = url
        self.properties = dict(properties or {})
        self.fetchsize = fetchsize
        self.batchsize = batchsize
        self.partition_options = dict(partition_options or {})

    def read(self, table: str) -> DataFrame:
        reader = (
            self.spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", table)
            .option("fetchsize", self.fetchsize)
        )
        for k, v in self.properties.items():
            reader = reader.option(k, v)
        for k, v in self.partition_options.get(table, {}).items():
            reader = reader.option(k, v)
        return reader.load()

    def write(self, df: DataFrame, table: str, mode: str = "append") -> None:
        writer = (
            df.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", table)
            .option("batchsize", self.batchsize)
            .mode(mode)
        )
        for k, v in self.properties.items():
            writer = writer.option(k, v)
        writer.save()


class TableCatalog(Catalog):
    """Session-catalog tables (``saveAsTable``/``spark.table``) with
    optional per-table **bucketing** — the co-located-join tool Spark
    offers for fact tables that are joined on the same key repeatedly.

    ``bucket_specs``: ``{table: (num_buckets, [cols])}``.  Two tables
    bucketed by the same key and count join WITHOUT a shuffle (both sides
    already hash-partitioned on disk); at 100 TB that converts the
    dominant exchange of every enrichment run into a local zip of bucket
    files.  Bucketing requires the table write path (not raw parquet
    dirs), which is why this catalog exists alongside ParquetCatalog.
    """

    def __init__(
        self,
        spark: SparkSession,
        bucket_specs: Optional[dict[str, tuple[int, list[str]]]] = None,
        database: Optional[str] = None,
    ):
        self.spark = spark
        self.bucket_specs = dict(bucket_specs or {})
        self.database = database

    def _qualified(self, table: str) -> str:
        return f"{self.database}.{table}" if self.database else table

    def read(self, table: str) -> DataFrame:
        return self.spark.table(self._qualified(table))

    def write(self, df: DataFrame, table: str, mode: str = "append") -> None:
        writer = df.write.mode(mode).format("parquet")
        spec = self.bucket_specs.get(table)
        if spec:
            n, cols = spec
            writer = writer.bucketBy(n, *cols).sortBy(*cols)
        writer.saveAsTable(self._qualified(table))


class MemoryCatalog(Catalog):
    """Dict-backed catalog for tests; ``write`` unions into the dict so the
    captured sink table can be asserted on."""

    def __init__(self, tables: Optional[dict[str, DataFrame]] = None):
        self.tables: dict[str, DataFrame] = dict(tables or {})

    def read(self, table: str) -> DataFrame:
        if table not in self.tables:
            raise KeyError(f"table {table!r} not in catalog")
        return self.tables[table]

    def write(self, df: DataFrame, table: str, mode: str = "append") -> None:
        if mode == "overwrite" or table not in self.tables:
            self.tables[table] = df
        else:
            self.tables[table] = self.tables[table].unionByName(df, allowMissingColumns=True)
