"""Local replica of the driver's correctness gate: run each Spark
query and its DuckDB oracle side-by-side, compare row count, schema
arity, and order-insensitive exact values.

Usage: python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows — the
    order-insensitive frame both sides are compared on."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def values_equal(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"row count {len(a)} vs {len(b)}"
    for c in a.columns:
        # Dtype drift gate (VERDICT r6 #2): the driver's hash is
        # dtype/repr-sensitive, so Spark bigint 123 vs a DuckDB
        # HUGEINT rendered as float64 123.0 fails there while the
        # numeric compare below calls them equal.  After canonical()
        # the only surviving dtype classes are Int64 / float64 /
        # boolean / datetime64[us] / object — require exact equality
        # so any int-vs-float (or other) drift is loud locally.
        if a[c].dtype != b[c].dtype:
            return False, (
                f"dtype drift col {c}: spark {a[c].dtype} vs oracle "
                f"{b[c].dtype} (driver hash fails on this even when "
                f"values compare equal — e.g. DuckDB HUGEINT -> float64)"
            )
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            ok = ((av.isna() & bv.isna()) | (av == bv)).all()
        else:
            ok = av.fillna("\0NULL").eq(bv.fillna("\0NULL")).all() if av.dtype == object else (
                (av.isna() & bv.isna()) | (av == bv)
            ).all()
        if not ok:
            mism = (~((av.isna() & bv.isna()) | (av == bv))).idxmax()
            return False, f"col {c} first mismatch at row {mism}: {av[mism]!r} vs {bv[mism]!r}"
    return True, ""


def dump_mismatch(name: str, a: pd.DataFrame, b: pd.DataFrame, max_rows: int = 10) -> None:
    """On a value mismatch, print the first ``max_rows`` differing rows
    from BOTH canonical frames plus engine versions, so a mismatch
    artifact is self-diagnosing (VERDICT r5 #1: the driver graded a
    hash fail the judge could not reproduce — the artifact must say
    which rows and which engine versions)."""
    import duckdb as _duckdb
    import pyspark as _pyspark

    print(f"--- MISMATCH DUMP {name} ---", flush=True)
    print(f"    duckdb={_duckdb.__version__} pyspark={_pyspark.__version__} pandas={pd.__version__}")
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        print(f"    shape/columns differ: spark {a.shape} {list(a.columns)}")
        print(f"                          oracle {b.shape} {list(b.columns)}")
        return
    neq = pd.Series(False, index=a.index)
    for c in a.columns:
        neq |= ~((a[c].isna() & b[c].isna()) | (a[c] == b[c]))
    bad_idx = a.index[neq][:max_rows]
    print(f"    {int(neq.sum())} differing rows of {len(a)}; first {len(bad_idx)}:")
    for i in bad_idx:
        print(f"    row {i} spark : {a.loc[i].to_dict()}")
        print(f"    row {i} oracle: {b.loc[i].to_dict()}")
    print(f"--- END DUMP {name} ---", flush=True)


def compare(spark, sf_dir: str, names: list[str] | None = None) -> dict:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duck_connection(sf_dir)
    results = {}
    for name, fn in qs.items():
        if names and name not in names:
            continue
        print(f"... running {name}", flush=True)
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
            if name in oracles:
                odf = con.execute(oracles[name]).df()
                ca, cb = canonical(sdf), canonical(odf)
                ok, why = values_equal(ca, cb)
                if not ok:
                    dump_mismatch(name, ca, cb)
                results[name] = {
                    "status": "MATCH" if ok else "MISMATCH",
                    "rows": len(sdf),
                    "why": why,
                    "sec": round(time.time() - t0, 2),
                }
            else:
                results[name] = {
                    "status": "ROWS_ONLY",
                    "rows": len(sdf),
                    "why": "",
                    "sec": round(time.time() - t0, 2),
                }
        except Exception as exc:  # noqa: BLE001
            results[name] = {
                "status": "ERROR",
                "rows": -1,
                "why": f"{type(exc).__name__}: {exc}"[:400],
                "sec": round(time.time() - t0, 2),
            }
        r = results[name]
        print(f"{r['status']:<10} {name:<22} rows={r['rows']:<7} {r['sec']:>6}s  {r['why']}", flush=True)
    return results


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or None
    from atsc_spark.session import get_spark

    spark = get_spark("compare_oracle", master="local[8]", shuffle_partitions=8)
    results = compare(spark, sf_dir, names)
    bad = 0
    for name, r in results.items():
        print(f"{r['status']:<10} {name:<22} rows={r['rows']:<7} {r['sec']:>6}s  {r['why']}")
        if r["status"] in ("MISMATCH", "ERROR"):
            bad += 1
    print(f"\n{len(results) - bad}/{len(results)} ok")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
