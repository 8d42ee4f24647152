"""Optional Iceberg-backed tier storage (import/jar-guarded).

The north rule targets Iceberg tables; this container ships no Iceberg
runtime jars, so :class:`~atsc_spark.retention.TieredStore` uses
day-partitioned parquet with a rename-based staged commit instead.
This module carries the Iceberg path for clusters that DO have the
jars + a catalog configured (``spark.sql.catalog.<name>`` set to
``org.apache.iceberg.spark.SparkCatalog``): partition replacement
becomes a single atomic snapshot commit (``overwritePartitions``) and
the crash-safety dance in retention collapses to one API call.

Everything here degrades gracefully: :func:`iceberg_available` probes
the JVM for the Iceberg catalog class and callers fall back to the
parquet path when it returns False — no import error, no job failure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_CATALOG_CLASS = "org.apache.iceberg.spark.SparkCatalog"


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(_CATALOG_CLASS)
        return True
    except Exception:
        return False


def ensure_table(spark: SparkSession, table: str, like: DataFrame, partition_col: str = "day") -> None:
    """CREATE TABLE IF NOT EXISTS <table> ... USING iceberg
    PARTITIONED BY (<partition_col>), schema taken from ``like``."""
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in like.schema.fields)
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {table} ({cols}) USING iceberg "
        f"PARTITIONED BY ({partition_col})"
    )


def replace_partitions(df: DataFrame, table: str) -> None:
    """Atomically replace exactly the partitions present in ``df`` —
    one Iceberg snapshot commit (the dynamic-overwrite semantics the
    parquet path emulates with staged renames).  Readers see the old
    snapshot or the new one, never a mix, and time travel keeps the
    old one addressable."""
    df.writeTo(table).overwritePartitions()


def drop_partition(spark: SparkSession, table: str, partition_col: str, value) -> None:
    """DELETE FROM <table> WHERE <partition_col> = <value> — an
    Iceberg metadata-only delete when the predicate aligns with
    partition boundaries (no data files rewritten)."""
    spark.sql(f"DELETE FROM {table} WHERE {partition_col} = '{value}'")
