"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship ATSC pipeline (derive series from
events -> fit frames -> compression report) on sf0.001.
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with DuckDB oracles where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: events -> per-type 1m series -> ATSC frames at 3% ->
    compression report (ratio + max error per metric/compressor)."""
    from atsc_spark.queries import q_atsc_frames_report

    return q_atsc_frames_report(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from atsc_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from atsc_spark.queries import ORACLES

    return dict(ORACLES)
