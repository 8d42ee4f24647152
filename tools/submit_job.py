"""spark-submit entry script (the cluster-mode counterpart of
``python -m atsc_spark.pipeline``).

    spark-submit --master local[8] \\
        --py-files atsc_spark.zip tools/submit_job.py \\
        --store /tmp/store --n-convs 500

The package is resolved from --py-files (no repo checkout needed on
executors).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--store", required=True)
    p.add_argument("--input", default=None)
    p.add_argument("--n-convs", type=int, default=200)
    p.add_argument("--error", type=float, default=0.03)
    args = p.parse_args()

    spark = (
        SparkSession.builder.appName("atsc_spark_submit")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    from atsc_spark.pipeline import run

    stats = run(spark, args.store, args.input, args.n_convs, args.error)
    print("ATSC_SPARK_RESULT " + json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
