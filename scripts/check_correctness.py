"""Driver-style self-check: run every queries() entry at sf0.01 against its
oracle_sql() in DuckDB; compare row-count, column names, and values
(order-insensitive, exact for non-floats, bit-exact-then-tolerant report for
floats). Run me after adding any query.

Usage: PYTHONPATH=/root/repo python scripts/check_correctness.py [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from rabitq_spark.session import get_spark
from rabitq_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.01"


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows")
            continue
        odf = con.execute(oracles[name]).df()
        s, o = normalize(sdf), normalize(odf)
        if list(s.columns) != list(o.columns):
            print(f"[FAIL] {name}: columns {list(s.columns)} vs {list(o.columns)}")
            failed.append(name)
            continue
        if len(s) != len(o):
            print(f"[FAIL] {name}: rows {len(s)} vs {len(o)}")
            failed.append(name)
            continue
        exact = True
        for c in s.columns:
            sv, ov = s[c].values, o[c].values
            if sv.dtype.kind == "f" or ov.dtype.kind == "f":
                if not np.array_equal(
                    sv.astype(float), ov.astype(float), equal_nan=True
                ):
                    exact = False
                    close = np.allclose(
                        sv.astype(float), ov.astype(float), rtol=1e-9, equal_nan=True
                    )
                    print(
                        f"[{'WARN-close' if close else 'FAIL'}] {name}.{c}: "
                        f"floats not bit-equal (close={close})"
                    )
                    if not close:
                        failed.append(name)
            else:
                if not (pd.Series(sv).astype(str) == pd.Series(ov).astype(str)).all():
                    exact = False
                    failed.append(name)
                    bad = np.where(pd.Series(sv).astype(str) != pd.Series(ov).astype(str))[0][:5]
                    print(f"[FAIL] {name}.{c}: first diffs at rows {bad.tolist()}")
                    for i in bad[:3]:
                        print(f"    spark={sv[i]!r} oracle={ov[i]!r}")
        if exact:
            print(f"[OK] {name}: {len(s)} rows, bit-exact")
    spark.stop()
    print("FAILED:", sorted(set(failed)) if failed else "none")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
