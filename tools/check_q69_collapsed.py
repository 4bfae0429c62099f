#!/usr/bin/env python3
"""sf-scale oracle check for q69_embedding_clusters with a collapsed oracle.

The naive oracle pairs ALL vectors (quadratic in the duplication factor
on the replicated corpora) before a transitive closure whose row count
grows with the SQUARE of component sizes — components that replication
inflates 30x at sf3. The collapse: similarity depends only on the
vector VALUES, so the pair graph is the distinct-vector (rep) pair
graph expanded over copies, plus the intra-copy clique of any vector
whose self-similarity passes the threshold (the same expression the
naive SQL evaluates on two identical copies — NaN-safe for zero
vectors). Components are rep-level components expanded to all copies;
every label is a min-id, which is a rep id by construction.

Usage: check_q69_collapsed.py <sfDir> <verifyOutDir>. Exit 0 on match.
"""
import sys

import duckdb
import pandas as pd

SF_DIR, OUT_DIR = sys.argv[1], sys.argv[2]

SQL = f"""
WITH RECURSIVE rep AS (
  SELECT embedding, min(vec_id) AS rid, COUNT(*) AS n_copies
  FROM read_parquet('{SF_DIR}/embeddings.parquet') GROUP BY embedding),
pairsR AS (
  SELECT a.rid AS ra, b.rid AS rb
  FROM rep a JOIN rep b ON a.rid < b.rid
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
    CAST(b.embedding AS DOUBLE[])) >= 0.4),
undirected AS (
  SELECT ra AS u, rb AS v FROM pairsR
  UNION SELECT rb, ra FROM pairsR),
closure(u, v) AS (
  SELECT u, v FROM undirected
  UNION
  SELECT c.u, d.v FROM closure c JOIN undirected d ON c.v = d.u),
compR AS (
  SELECT u AS rid, LEAST(u, MIN(v)) AS cluster_id
  FROM closure GROUP BY u),
selfok AS (
  SELECT rid FROM rep
  WHERE n_copies >= 2 AND list_cosine_similarity(
    CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) >= 0.4)
SELECT e.vec_id,
  CASE WHEN compR.cluster_id IS NOT NULL THEN compR.cluster_id
       WHEN s.rid IS NOT NULL THEN r.rid
       ELSE e.vec_id END AS cluster_id,
  (CASE WHEN compR.cluster_id IS NOT NULL THEN compR.cluster_id
        WHEN s.rid IS NOT NULL THEN r.rid
        ELSE e.vec_id END) = e.vec_id AS is_representative
FROM read_parquet('{SF_DIR}/embeddings.parquet') e
JOIN rep r ON e.embedding = r.embedding
LEFT JOIN compR ON r.rid = compR.rid
LEFT JOIN selfok s ON r.rid = s.rid
ORDER BY e.vec_id
"""


def main() -> int:
    got = pd.read_parquet(f"{OUT_DIR}/q69_embedding_clusters")
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
    print(f"  OK   q69_embedding_clusters (collapsed oracle) "
          f"({len(got)} rows x {len(got.columns)} cols)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
