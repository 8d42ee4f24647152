"""Decompose the fit path's mapInPandas cost at sf1.0: JVM grouping vs
Arrow-in transfer vs Python compute vs Arrow-out transfer, and how each
scales with the fit task count (guide §4.1: you control how many
columns cross and how efficiently; here we also measure the per-task
fixed cost)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def _consume_only(batches):
    n = 0
    for pdf in batches:
        n += len(pdf)
    yield pd.DataFrame({"n": [n]})


def _touch_arrays(batches):
    # force materialization of the point arrays into numpy (the real
    # fit does this per group) but do no math
    s = 0.0
    for pdf in batches:
        for v in pdf["vals"].to_numpy():
            s += float(np.asarray(v, dtype=np.float64)[0])
    yield pd.DataFrame({"n": [s]})


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from atsc_spark.session import get_spark
    from atsc_spark.frames import fit_frames, grouped_points
    from atsc_spark.lossless import fit_lossless
    from atsc_spark.fixtures import monitoring_series

    spark = get_spark("fit_boundary", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    fit_frames(monitoring_series(spark, n_series=int(cpus), samples_per_series=64)).count()

    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 1.0
    m_input = monitoring_series(spark, n_series=max(8, int(2400 * sf))).cache()
    m_input.count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def t(name, fn, reps=2):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        print(f"{name}: {best:.3f}s", flush=True)

    for nt in (32, 64, 128, 256):
        gp = grouped_points(m_input, nt)
        t(f"grouped_points[{nt}] noop      ", lambda gp=gp: noop(gp))
        t(f"grouped->consume_only[{nt}]    ",
          lambda gp=gp: gp.mapInPandas(_consume_only, "n long").count())
        t(f"grouped->touch_arrays[{nt}]    ",
          lambda gp=gp: gp.mapInPandas(_touch_arrays, "n double").count())
        t(f"fit_frames[{nt}] noop          ",
          lambda nt=nt: noop(fit_frames(m_input, max_error=0.03, num_tasks=nt)))
        t(f"fit_lossless[{nt}] noop        ",
          lambda nt=nt: noop(fit_lossless(m_input, num_tasks=nt)))
    m_input.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
