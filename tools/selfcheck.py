"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares:
  1. row count
  2. schema (column names; types loosely — int-kinds equal, float-kinds equal)
  3. order-insensitive value hash (columns sorted by name, rows sorted,
     floats rounded to 6 decimals before hashing)

Usage:  python tools/selfcheck.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import json
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        k = df[c].dtype.kind
        if k == "f":
            df[c] = df[c].round(6)
        elif k == "M":
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif k == "O":
            df[c] = df[c].apply(
                lambda v: json.dumps(v, default=str, sort_keys=True)
                if isinstance(v, (list, dict)) else ("\0NULL" if v is None else str(v))
            )
    rows = sorted(df.itertuples(index=False, name=None), key=lambda r: tuple(map(str, r)))
    return pd.DataFrame(rows, columns=df.columns)


def value_hash(df: pd.DataFrame) -> str:
    canon = _canon(df)
    h = hashlib.sha256()
    for row in canon.itertuples(index=False, name=None):
        h.update(repr(row).encode())
    return h.hexdigest()[:16]


def main() -> int:
    args = sys.argv[1:]
    sf_dir = SF_DIR
    if args and "/" in args[0]:
        sf_dir, args = args[0], args[1:]

    from fastpyvectordb_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("selfcheck")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    names = args or list(qs)
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark side raised")
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in oracles:
            ok = len(sdf) >= 0
            print(f"rows-only  {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception:
            print(f"FAIL  {name}: oracle sql raised")
            traceback.print_exc()
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        if not problems:
            hs, ho = value_hash(sdf), value_hash(odf)
            if hs != ho:
                problems.append(f"value-hash {hs} != {ho}")
                cs, co = _canon(sdf), _canon(odf)
                neq = (cs.astype(str).values != co.astype(str).values)
                if neq.shape == co.shape and neq.any():
                    i, j = list(zip(*neq.nonzero()))[0] if False else (neq.nonzero()[0][0], neq.nonzero()[1][0])
                    problems.append(
                        f"first diff row {i} col {cs.columns[j]}: "
                        f"spark={cs.iloc[i, j]!r} oracle={co.iloc[i, j]!r}"
                    )
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
