#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against views named after the
testdata tables, and compares: column-name sets, row counts, and values with
columns sorted by name (row order preserved). Exits nonzero on any mismatch.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact: the convention makes aggregates exact
    return a == b


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # Optional 3rd arg: comma-separated query names — check just those
    # (pairs with Verify's SPARK_GRAFT_ONLY filtered dumps).
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    failures = []
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            failures.append((name, f"spark output unreadable: {e}"))
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        # Driver-parity dtype check: the driver's hash is dtype-sensitive
        # (round 3's q61 red row was DuckDB HUGEINT->float64 vs Spark
        # BIGINT, values identical). Flag kind mismatches BEFORE norm()
        # erases them — FAIL when the column is null-free (a real parity
        # break), WARN when nulls could explain a float upcast.
        raw_g = got.reindex(sorted(got.columns), axis=1)
        raw_w = want.reindex(sorted(want.columns), axis=1)
        for c in set(raw_g.columns) & set(raw_w.columns):
            gk, wk = raw_g[c].dtype.kind, raw_w[c].dtype.kind
            num = {"i", "u", "f"}
            if gk != wk and (gk in num) and (wk in num) and not (gk in "iu" and wk in "iu"):
                if raw_g[c].isna().any() or raw_w[c].isna().any():
                    print(f"  WARN {name}: col '{c}' dtype kind spark={gk} oracle={wk} (nullable)")
                else:
                    failures.append((name, f"dtype parity: col '{c}' spark kind={gk} oracle kind={wk} "
                                           f"(driver hash is dtype-sensitive; CAST the oracle column)"))
                    break
        if failures and failures[-1][0] == name:
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            failures.append((name, f"columns differ: spark={list(g.columns)} oracle={list(w.columns)}"))
            continue
        if len(g) != len(w):
            failures.append((name, f"row count differs: spark={len(g)} oracle={len(w)}"))
            continue
        bad = None
        for ci, c in enumerate(g.columns):
            gv, wv = g[c].tolist(), w[c].tolist()
            for ri in range(len(gv)):
                if not values_equal(gv[ri], wv[ri]):
                    bad = f"first diff at row {ri} col '{c}': spark={gv[ri]!r} oracle={wv[ri]!r}"
                    break
            if bad:
                break
        if bad:
            failures.append((name, bad))
        else:
            print(f"  OK   {name}  ({len(g)} rows x {len(g.columns)} cols)")

    for name, msg in failures:
        print(f"  FAIL {name}: {msg}")
    no_oracle = []  # declared queries without oracle: just report
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} oracle queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
