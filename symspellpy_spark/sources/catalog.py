"""Checkpoint table catalog: Iceberg when available, parquet otherwise.

STATUS — parquet-checkpointed with an Iceberg-ready layout. The
production target is Iceberg (BASELINE.json: "resumable from
Iceberg-checkpointed signature and edge tables"): snapshots give
atomic commits, schema evolution, and table properties for the config
stamp. This environment has no Iceberg runtime jar and no network to
fetch one, so ONLY the parquet branch (data/ + _PROPERTIES.json —
config-stamped, atomic-enough via directory overwrite, resumable) is
exercised by the test suite; the Iceberg branch is written against the
public DataFrameWriterV2/tableProperty API but is UNTESTED here and
should be smoke-tested once on a cluster with the jar before relying
on it.

To enable Iceberg on a real cluster:
    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
      --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \
      --conf spark.sql.catalog.graft=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.graft.type=hadoop \
      --conf spark.sql.catalog.graft.warehouse=<path>
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

__all__ = ["TableCatalog", "iceberg_available"]


def iceberg_available(spark: SparkSession, catalog: str = "graft") -> bool:
    """True when an Iceberg catalog named ``catalog`` is configured and
    its classes are on the classpath."""
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    except Exception:
        impl = None
    if not impl:
        return False
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class TableCatalog:
    """save/load/exists for config-stamped checkpoint tables."""

    def __init__(
        self,
        spark: SparkSession,
        base_path: str,
        catalog: str = "graft",
        namespace: str = "dedup",
    ):
        self.spark = spark
        self.base_path = base_path
        self.catalog = catalog
        self.namespace = namespace
        self.use_iceberg = iceberg_available(spark, catalog)

    def _ident(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{name}"

    def _dir(self, name: str) -> str:
        return os.path.join(self.base_path, name)

    def save(
        self,
        df: DataFrame,
        name: str,
        properties: dict,
        compression: str | None = None,
    ) -> DataFrame:
        if self.use_iceberg:
            self.spark.sql(
                f"CREATE NAMESPACE IF NOT EXISTS {self.catalog}.{self.namespace}"
            )
            writer = df.writeTo(self._ident(name))
            for k, v in properties.items():
                writer = writer.tableProperty(str(k), json.dumps(v))
            if compression:
                writer = writer.tableProperty(
                    "write.parquet.compression-codec", compression
                )
            writer = writer.tableProperty("graft.ts", str(time.time()))
            writer.createOrReplace()
            return self.spark.read.table(self._ident(name))
        path = self._dir(name)
        w = df.write.mode("overwrite")
        if compression:
            w = w.option("compression", compression)
        w.parquet(os.path.join(path, "data"))
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "_PROPERTIES.json"), "w") as fh:
            json.dump(dict(properties, ts=time.time()), fh)
        return self.spark.read.parquet(os.path.join(path, "data"))

    def properties(self, name: str) -> dict | None:
        if self.use_iceberg:
            try:
                rows = self.spark.sql(
                    f"SHOW TBLPROPERTIES {self._ident(name)}"
                ).collect()
            except Exception:
                return None
            out = {}
            for r in rows:
                try:
                    out[r["key"]] = json.loads(r["value"])
                except (ValueError, TypeError):
                    out[r["key"]] = r["value"]
            return out
        prop_file = os.path.join(self._dir(name), "_PROPERTIES.json")
        if not os.path.exists(prop_file):
            return None
        with open(prop_file) as fh:
            return json.load(fh)

    def load(self, name: str) -> DataFrame | None:
        if self.properties(name) is None:
            return None
        if self.use_iceberg:
            return self.spark.read.table(self._ident(name))
        return self.spark.read.parquet(os.path.join(self._dir(name), "data"))
