#!/usr/bin/env python3
"""sf-scale oracle checks for the pair-emitting queries q28/q35 with
duplication-collapsed oracles.

Both contractual oracles state the semantics naively (all-pairs joins);
on the replicated scale corpora their join work grows quadratically in
the duplication factor (900x sf0.1 at sf3) while the ENGINE collapses
exact duplicates first. The collapsed oracles here apply the same
collapse — rep-level pair pipeline (with copy-count-weighted document
frequencies where the naive SQL counts docs), then exact expansion:
cross-rep pairs replicate over both copy lists, and copies of one
text/vector pair among themselves (Jaccard n/n = 1.0 exactly; cosine
computed by the SAME expression the naive SQL would run on the
identical copies). Every derivation step preserves the naive SQL's
arithmetic on the same integers/floats, so values match bit-for-bit —
validated by running collapsed-vs-naive at the sf0.01 gate before any
scale use.

Usage: check_pairs_collapsed.py <sfDir> <verifyOutDir> [q28|q35 ...]
"""
import sys

import duckdb
import pandas as pd

SF_DIR, OUT_DIR = sys.argv[1], sys.argv[2]
WHICH = sys.argv[3:] or ["q28", "q35"]

Q28 = f"""
WITH rep AS (
  SELECT text, min(doc_id) AS rid, COUNT(*) AS n_copies,
    list(doc_id ORDER BY doc_id) AS ids
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
interR AS (
  SELECT a.rid AS ra, b.rid AS rb, COUNT(*) AS n_common
  FROM filtered a JOIN filtered b ON a.sh = b.sh
  WHERE a.rid < b.rid GROUP BY 1, 2),
pairsR AS (
  SELECT ra, rb, n_common,
    CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
  FROM interR
  JOIN sizes sa ON interR.ra = sa.rid
  JOIN sizes sb ON interR.rb = sb.rid
  WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.2),
e1 AS (SELECT p.rb, p.n_common, p.jaccard, unnest(a.ids) AS ia
  FROM pairsR p JOIN rep a ON p.ra = a.rid),
e2 AS (SELECT e1.ia, e1.n_common, e1.jaccard, unnest(b.ids) AS jb
  FROM e1 JOIN rep b ON e1.rb = b.rid),
cross_exp AS (
  SELECT LEAST(ia, jb) AS doc_a, GREATEST(ia, jb) AS doc_b,
    n_common, jaccard FROM e2),
i1 AS (SELECT r.rid, r.ids, unnest(r.ids) AS a1
  FROM rep r JOIN sizes s ON r.rid = s.rid),
i2 AS (SELECT i1.rid, i1.a1, unnest(i1.ids) AS a2 FROM i1),
intra AS (
  SELECT i2.a1 AS doc_a, i2.a2 AS doc_b, s.n_sh AS n_common,
    CAST(s.n_sh AS DOUBLE) / s.n_sh AS jaccard
  FROM i2 JOIN sizes s ON i2.rid = s.rid WHERE i2.a1 < i2.a2)
SELECT * FROM (SELECT * FROM cross_exp UNION ALL SELECT * FROM intra)
ORDER BY doc_a, doc_b
"""

Q35 = f"""
WITH rep AS (
  SELECT embedding, min(vec_id) AS rid, list(vec_id ORDER BY vec_id) AS ids
  FROM read_parquet('{SF_DIR}/embeddings.parquet') GROUP BY embedding),
pairsR AS (
  SELECT a.rid AS ra, b.rid AS rb,
    round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      CAST(b.embedding AS DOUBLE[])), 6) AS cosine_sim
  FROM rep a JOIN rep b ON a.rid < b.rid
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
    CAST(b.embedding AS DOUBLE[])) >= 0.4),
e1 AS (SELECT p.rb, p.cosine_sim, unnest(a.ids) AS ia
  FROM pairsR p JOIN rep a ON p.ra = a.rid),
e2 AS (SELECT e1.ia, e1.cosine_sim, unnest(b.ids) AS jb
  FROM e1 JOIN rep b ON e1.rb = b.rid),
cross_exp AS (
  SELECT LEAST(ia, jb) AS vec_a, GREATEST(ia, jb) AS vec_b, cosine_sim
  FROM e2),
selfsim AS (
  SELECT rid, ids,
    round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
      CAST(embedding AS DOUBLE[])), 6) AS cosine_sim
  FROM rep
  WHERE list_cosine_similarity(CAST(embedding AS DOUBLE[]),
    CAST(embedding AS DOUBLE[])) >= 0.4),
i1 AS (SELECT rid, ids, cosine_sim, unnest(ids) AS a1 FROM selfsim),
i2 AS (SELECT i1.a1, i1.cosine_sim, unnest(i1.ids) AS a2 FROM i1),
intra AS (SELECT a1 AS vec_a, a2 AS vec_b, cosine_sim
  FROM i2 WHERE a1 < a2)
SELECT * FROM (SELECT * FROM cross_exp UNION ALL SELECT * FROM intra)
ORDER BY vec_a, vec_b
"""

QUERIES = {"q28": ("q28_ngram_jaccard", Q28),
           "q35": ("q35_embedding_neardup", Q35)}


def check(key: str) -> int:
    name, sql = QUERIES[key]
    got = pd.read_parquet(f"{OUT_DIR}/{name}")
    want = duckdb.sql(sql).df()
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
