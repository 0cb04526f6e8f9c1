"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at the given
sf dir, compare row counts and order-insensitive values (columns sorted
by name, doubles compared exactly after both sides' rounding).

Usage: python scripts/parity_check.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from terrier_spark.session import get_spark  # noqa: E402
from terrier_spark.sources.tables import TESTDATA_TABLES  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(str)
            except Exception:
                pass
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if len(a) != len(b):
        return f"row count {len(a)} vs {len(b)}"
    if sorted(a.columns) != sorted(b.columns):
        return f"columns {sorted(a.columns)} vs {sorted(b.columns)}"
    a, b = normalize(a), normalize(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            bad = [
                i
                for i, (x, y) in enumerate(zip(av, bv))
                # exact equality by design: the engine brounds every
                # float to 9 decimals and the oracle rounds identically,
                # so any residual drift is a bug to surface (an earlier
                # isclose(rel_tol=0, abs_tol=0) clause here was exactly
                # == and misleadingly suggested a tolerance)
                if not ((pd.isna(x) and pd.isna(y)) or (x == y))
            ]
            if bad:
                i = bad[0]
                return f"col {c} row {i}: {av[i]!r} vs {bv[i]!r} ({len(bad)} diffs)"
        else:
            if not av.astype(str).equals(bv.astype(str)):
                neq = (av.astype(str) != bv.astype(str))
                i = int(neq.idxmax())
                return f"col {c} row {i}: {av[i]!r} vs {bv[i]!r} ({int(neq.sum())} diffs)"
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        err = compare(sdf, odf)
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"ok   {name}: {len(sdf)} rows")
    spark.stop()
    print("FAILURES:", n_fail)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
