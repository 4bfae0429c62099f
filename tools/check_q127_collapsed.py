#!/usr/bin/env python3
"""sf-scale oracle check for q127_cluster_canonical with a duplication-
collapsed oracle.

q127's contractual oracle (SparkEntry.oracleSql) states the semantics
naively: shingle every document, self-join postings, transitively close
the pair graph. On the adversarially-replicated scale corpora
(tools/make_sf1.py: every document has `copies` byte-identical twins)
that SQL's intersection join and recursive closure grow quadratically in
the duplication factor — at sf3 DuckDB spills >50 GB on the closure and
never finishes. The ENGINE's plan is duplication-aware precisely to
avoid this; the oracle needs the same collapse to be runnable.

This script re-states the SAME semantics in collapsed form and checks
the Spark parquet against it. The equivalence argument, step by step:

  1. Identical texts produce identical shingle sets, so full-corpus
     shingle doc-frequency = sum of copy-counts over the DISTINCT texts
     containing the shingle, and the stop-shingle guard
     `df <= floor(0.5 * n_docs)` evaluates identically.
  2. Two documents pair iff their (surviving) shingle sets pair — a
     property of their TEXTS. So the pair graph is the rep-level pair
     graph expanded over copies, plus (Jaccard(t,t)=1 >= tau) a clique
     over the copies of any text with a nonempty surviving shingle set.
  3. Components therefore = rep-level components, expanded to all copies
     of member texts; a text with NO surviving shingles never pairs (not
     even with its own twins — the documented stop-filter singleton
     policy), so its copies stay singletons.
  4. Labels: every cluster's min doc_id equals the min rep id (reps ARE
     the per-text minima); keep-policy (max n_chars, tie min doc_id) and
     the aggregates fold over all member docs as in the naive SQL.

Usage: check_q127_collapsed.py <sfDir> <verifyOutDir>
Exit 0 on match.
"""
import sys

import duckdb
import pandas as pd

SF_DIR, OUT_DIR = sys.argv[1], sys.argv[2]

SQL = f"""
WITH RECURSIVE rep AS (
  SELECT text, min(doc_id) AS rid, COUNT(*) AS n_copies
  FROM read_parquet('{SF_DIR}/documents.parquet') GROUP BY text),
shr AS (
  SELECT rid, n_copies, unnest(list_distinct(
    CASE WHEN len(w) < 3 THEN [text]
         ELSE list_transform(range(1, len(w) - 1),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END)) AS sh
  FROM (SELECT rid, n_copies, text, string_split(text, ' ') AS w FROM rep)),
df AS (SELECT sh AS s, SUM(n_copies) AS df FROM shr GROUP BY sh),
total AS (SELECT SUM(n_copies) AS n FROM rep),
filtered AS (
  SELECT shr.rid, shr.sh FROM shr
  JOIN df ON shr.sh = df.s CROSS JOIN total
  WHERE df.df <= CAST(floor(total.n * 0.5) AS BIGINT)),
sizes AS (SELECT rid, COUNT(*) AS n_sh FROM filtered GROUP BY rid),
inter AS (
  SELECT a.rid AS ra, b.rid AS rb, COUNT(*) AS n_common
  FROM filtered a JOIN filtered b ON a.sh = b.sh
  WHERE a.rid < b.rid GROUP BY 1, 2),
prs AS (
  SELECT ra, rb FROM inter
  JOIN sizes sa ON inter.ra = sa.rid
  JOIN sizes sb ON inter.rb = sb.rid
  WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.2),
undirected AS (SELECT ra AS u, rb AS v FROM prs
  UNION SELECT rb, ra FROM prs),
closure(u, v) AS (
  SELECT u, v FROM undirected
  UNION
  SELECT c.u, d.v FROM closure c JOIN undirected d ON c.v = d.u),
comp AS (SELECT u AS rid, LEAST(u, MIN(v)) AS cluster_rid
  FROM closure GROUP BY u),
-- Per-doc labels: docs of a shingled rep share the rep's component
-- label; docs of a shingle-less rep stay self-labeled singletons.
lab AS (
  SELECT d.doc_id,
    CASE WHEN s.rid IS NOT NULL
         THEN COALESCE(comp.cluster_rid, r.rid)
         ELSE d.doc_id END AS cluster_id,
    d.n_chars
  FROM read_parquet('{SF_DIR}/documents.parquet') d
  JOIN rep r ON d.text = r.text
  LEFT JOIN sizes s ON r.rid = s.rid
  LEFT JOIN comp ON r.rid = comp.rid),
ranked AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
    ORDER BY n_chars DESC, doc_id) AS rn FROM lab),
agg AS (SELECT cluster_id, COUNT(*) AS n_members,
    CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM lab GROUP BY cluster_id)
SELECT a.cluster_id, r.doc_id AS kept_doc_id, a.n_members,
  r.n_chars AS kept_chars, a.total_chars - r.n_chars AS chars_dropped
FROM agg a JOIN ranked r ON r.cluster_id = a.cluster_id AND r.rn = 1
ORDER BY a.cluster_id
"""


def main() -> int:
    got = pd.read_parquet(f"{OUT_DIR}/q127_cluster_canonical")
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
    print(f"  OK   q127_cluster_canonical (collapsed oracle) "
          f"({len(got)} rows x {len(got.columns)} cols)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
