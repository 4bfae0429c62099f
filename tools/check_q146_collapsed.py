#!/usr/bin/env python3
"""sf-scale oracle check for q146_incremental_neardup (and its streamed
twin q148_stream_neardup) with a duplication-collapsed oracle.

The contractual oracle (SparkEntry.IncrementalNearDupSql) states the
semantics naively per document; on the replicated scale corpora its
candidate join grows quadratically in the duplication factor. This
collapsed form runs the same pipeline at the distinct-text level — stop
frequencies weighted by even-side copy counts, exactly the integers the
naive SQL computes — then expands the odd-side verdicts back over the
member id lists. The winning match at the rep level (max rounded
jaccard, tie to min even rep id) equals the naive per-member argmax
because every member of an even content group is an equally-scored
candidate and the group's min id IS its rep id. Validated
collapsed-vs-naive at the sf0.1 gate before any scale use.

Usage: check_q146_collapsed.py <sfDir> <verifyOutDir> [queryName ...]
"""
import sys

import duckdb
import pandas as pd

SF_DIR, OUT_DIR = sys.argv[1], sys.argv[2]
WHICH = sys.argv[3:] or ["q146_incremental_neardup", "q148_stream_neardup"]

Q146 = f"""
WITH repx AS (
  SELECT text, min(doc_id) AS rid, COUNT(*) AS n_copies
  FROM read_parquet('{SF_DIR}/documents.parquet')
  WHERE doc_id % 2 = 0 GROUP BY text),
repi AS (
  SELECT text, min(doc_id) AS iid, list(doc_id ORDER BY doc_id) AS ids
  FROM read_parquet('{SF_DIR}/documents.parquet')
  WHERE doc_id % 2 = 1 GROUP BY text),
shx AS (
  SELECT rid, n_copies, unnest(list_distinct(
    CASE WHEN len(w) < 3 THEN [text]
         ELSE list_transform(range(1, len(w) - 1),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END)) AS sh
  FROM (SELECT rid, n_copies, text, string_split(text, ' ') AS w FROM repx)),
shi AS (
  SELECT iid, unnest(list_distinct(
    CASE WHEN len(w) < 3 THEN [text]
         ELSE list_transform(range(1, len(w) - 1),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END)) AS sh
  FROM (SELECT iid, text, string_split(text, ' ') AS w FROM repi)),
nex AS (SELECT SUM(n_copies) AS n FROM repx),
stop AS (
  SELECT sh FROM (SELECT sh, SUM(n_copies) AS df FROM shx GROUP BY sh)
  CROSS JOIN nex WHERE df > CAST(floor(n * 0.5) AS BIGINT)),
fex AS (SELECT rid, sh FROM shx WHERE sh NOT IN (SELECT sh FROM stop)),
fi AS (SELECT iid, sh FROM shi WHERE sh NOT IN (SELECT sh FROM stop)),
sex AS (SELECT rid, COUNT(*) AS n_ex FROM fex GROUP BY 1),
sinc AS (SELECT iid, COUNT(*) AS n_inc FROM fi GROUP BY 1),
cand AS (
  SELECT iid, rid, COUNT(*) AS n_common
  FROM fi JOIN fex USING (sh) GROUP BY 1, 2),
jac AS (
  SELECT iid, rid, n_common,
    round(CAST(n_common AS DOUBLE) / (n_inc + n_ex - n_common), 6) AS jaccard
  FROM cand JOIN sinc USING (iid) JOIN sex USING (rid)
  WHERE CAST(n_common AS DOUBLE) / (n_inc + n_ex - n_common) >= 0.8),
best AS (
  SELECT iid, rid AS matched_doc, n_common, jaccard
  FROM (SELECT *, row_number() OVER (
          PARTITION BY iid ORDER BY jaccard DESC, rid ASC) AS rn
        FROM jac)
  WHERE rn = 1)
SELECT unnest(r.ids) AS doc_id, b.matched_doc, b.n_common, b.jaccard
FROM best b JOIN repi r ON b.iid = r.iid
ORDER BY doc_id
"""


def check(name: str) -> int:
    got = pd.read_parquet(f"{OUT_DIR}/{name}")
    want = duckdb.sql(Q146).df()
    got = got.reindex(sorted(got.columns), axis=1).reset_index(drop=True)
    want = want.reindex(sorted(want.columns), axis=1).reset_index(drop=True)
    for df in (got, want):
        for c in df.columns:
            if pd.api.types.is_integer_dtype(df[c]):
                df[c] = df[c].astype("Int64")
            elif pd.api.types.is_float_dtype(df[c]):
                df[c] = df[c].astype("float64")
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name} columns: {list(got.columns)} vs {list(want.columns)}")
        return 1
    if len(got) != len(want):
        print(f"FAIL {name} rows: spark={len(got)} oracle={len(want)}")
        return 1
    for c in got.columns:
        neq = (got[c] != want[c])
        if neq.any():
            i = int(neq.idxmax())
            print(f"FAIL {name} first diff row {i} col {c}: "
                  f"spark={got[c][i]} oracle={want[c][i]}")
            return 1
    print(f"  OK   {name} (collapsed oracle) "
          f"({len(got)} rows x {len(got.columns)} cols)")
    return 0


if __name__ == "__main__":
    sys.exit(max(check(k) for k in WHICH))
