"""Table IO behind one interface: Iceberg when the runtime is on the
classpath, parquet-with-manifest otherwise (this sandbox has no network
to resolve iceberg-spark-runtime jars — SURVEY.md §7.1).

The API is identical either way, so production flips to Iceberg by
setting `spark.sql.catalog.<name>` configs at submit time — no code
change. Partition layout: bucket(hash(clip_id)) for clips-shaped
tables, matching the manifest's partition accounting.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


class Catalog:
    """Minimal write/read/append interface over Iceberg or parquet dirs."""

    def __init__(self, spark: SparkSession, root: str, catalog_name: str = "graft"):
        self.spark = spark
        self.root = root
        self.catalog_name = catalog_name
        self.use_iceberg = iceberg_available(spark) and bool(
            spark.conf.get(f"spark.sql.catalog.{catalog_name}", None)
        )

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _ident(self, table: str) -> str:
        return f"{self.catalog_name}.db.{table}"

    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> None:
        """partition_by: physical partition columns (parquet dir layout /
        Iceberg identity partition spec) — e.g. the IVF cell id, so a
        probe-cell equi-join prunes whole partitions at the scan."""
        if self.use_iceberg:
            writer = df.writeTo(self._ident(table))
            if partition_by:
                from pyspark.sql import functions as F

                writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
            if mode == "overwrite":
                writer.createOrReplace()
            else:
                writer.append()
        else:
            w = df.write.mode(mode)
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(self._path(table))

    def append(self, df: DataFrame, table: str) -> None:
        if self.use_iceberg:
            df.writeTo(self._ident(table)).append()
        else:
            df.write.mode("append").parquet(self._path(table))

    def read(self, table: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(self._ident(table))
        return self.spark.read.parquet(self._path(table))

    def exists(self, table: str) -> bool:
        if self.use_iceberg:
            return self.spark.catalog.tableExists(self._ident(table))
        p = self._path(table)
        return os.path.exists(p) and any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(p)
        )
