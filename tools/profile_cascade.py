"""Drill into the rollup-cascade anomaly: r1m noop is ~0.9 s but the
full 1m->1h->1d cascade count is ~6.7 s at sf1.0.  Time each step with
a noop sink and dump the final plan."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from atsc_spark.session import get_spark
    from atsc_spark.rollup import rollup, rollup_cascade_step
    from atsc_spark.series import series_from_events

    spark = get_spark("cascade_prof", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    events = spark.read.parquet(f"{sf_dir}/events.parquet").cache()
    print("events rows:", events.count())

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def t(name, fn, reps=2):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        print(f"{name}: {best:.3f}s", flush=True)

    series = series_from_events(events, "1 minute")
    r1m = rollup(series, "1 minute")
    r1h = rollup_cascade_step(r1m, "1 hour")
    r1d = rollup_cascade_step(r1h, "1 day")

    print("r1m rows:", r1m.count())
    t("r1m noop", lambda: noop(r1m))
    t("r1h noop", lambda: noop(r1h))
    t("r1d noop", lambda: noop(r1d))
    t("r1d count", lambda: r1d.count())
    r1d.explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
