#!/usr/bin/env python3
"""sf-scale oracle check for q137_pareto_parts with a collapsed oracle.

q137's contractual oracle is the quadratic dominance NOT EXISTS over all
parts — semantics stated directly, and exactly what DuckDB cannot finish
at sf3 (600k x 600k nested loop). Dominance depends ONLY on the
(p_retailprice, p_size) pair, so the frontier of the part table is the
frontier of its DISTINCT pairs expanded back over members — the same
duplication collapse the engine's own plan uses. The distinct-pair NOT
EXISTS (~16k^2 at sf3) runs in seconds, and the collapse is exact, not
approximate: a part is dominated iff some part dominates its pair, iff
some DISTINCT pair dominates its pair.

Usage: check_q137_collapsed.py <sfDir> <verifyOutDir>. Exit 0 on match.
"""
import sys

import duckdb
import pandas as pd

SF_DIR, OUT_DIR = sys.argv[1], sys.argv[2]

SQL = f"""
WITH pr AS (
  SELECT p_retailprice, p_size
  FROM read_parquet('{SF_DIR}/part.parquet') GROUP BY 1, 2),
fr AS (
  SELECT * FROM pr p WHERE NOT EXISTS (
    SELECT 1 FROM pr q
    WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
      AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)))
SELECT t.p_partkey, t.p_name, t.p_retailprice, t.p_size
FROM read_parquet('{SF_DIR}/part.parquet') t
JOIN fr USING (p_retailprice, p_size)
ORDER BY p_retailprice, p_partkey
"""


def main() -> int:
    got = pd.read_parquet(f"{OUT_DIR}/q137_pareto_parts")
    want = duckdb.sql(SQL).df()
    got = got.reindex(sorted(got.columns), axis=1).reset_index(drop=True)
    want = want.reindex(sorted(want.columns), axis=1).reset_index(drop=True)
    for df in (got, want):
        for c in df.columns:
            if pd.api.types.is_integer_dtype(df[c]):
                df[c] = df[c].astype("Int64")
    if list(got.columns) != list(want.columns):
        print(f"FAIL columns: {list(got.columns)} vs {list(want.columns)}")
        return 1
    if len(got) != len(want):
        print(f"FAIL rows: spark={len(got)} oracle={len(want)}")
        return 1
    for c in got.columns:
        neq = (got[c] != want[c])
        if neq.any():
            i = int(neq.idxmax())
            print(f"FAIL first diff row {i} col {c}: "
                  f"spark={got[c][i]} oracle={want[c][i]}")
            return 1
    print(f"  OK   q137_pareto_parts (collapsed oracle) "
          f"({len(got)} rows x {len(got.columns)} cols)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
