"""Sink adapters: Iceberg when a catalog is configured, parquet otherwise.

The production contract (north rule) writes each route's stream to an
Iceberg table partitioned by days(ts) + bucket(conv_id) — atomic snapshot
commits give the transactional exactly-once the reference's exporter
sending-queues approximate with retries (exporter/fileexporter,
exporterhelper queued_retry). In-sandbox there is no Iceberg runtime jar,
so the same interface degrades to Hive-layout parquet + the JSON lineage
manifest (plans/lineage.py), which implements the identical
resume contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is on the classpath + configured."""
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
    except Exception:  # noqa: BLE001
        return False
    confs = spark.conf
    try:
        return any(
            confs.get(f"spark.sql.catalog.{name}", None) is not None for name in ("iceberg", "spark_catalog", "local")
        )
    except Exception:  # noqa: BLE001
        return False


def write_sink(
    df: DataFrame,
    target: str,
    mode: str = "append",
    partition_cols: list[str] | None = None,
) -> str:
    """Write one sink. `target` = Iceberg table name (catalog.db.table) when
    Iceberg is available and the name has no '/', else a filesystem path.

    Iceberg path: `writeTo(target).append()` — snapshot-atomic; partitioning
    comes from the table's partition spec (days(ts), bucket(conv_id)) set at
    table creation, so writers need no layout knowledge.
    Parquet path: Hive layout via partitionBy, directory-atomic per task
    commit + lineage manifest for resume."""
    spark = df.sparkSession
    if "/" not in target and iceberg_available(spark):
        writer = df.writeTo(target)
        if mode == "overwrite":
            writer.replace()
        else:
            writer.append()
        return target
    w = df.write.mode("overwrite" if mode == "overwrite" else "append")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(target)
    return target
