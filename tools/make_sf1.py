#!/usr/bin/env python3
"""Synthesize an sf1 testdata set as a deterministic 10x scale-up of sf0.1.

Usage: python3 tools/make_sf1.py [srcDir] [outDir] [copies]
Defaults: /root/testdata/sf0.1 -> /tmp/graft_sf1, 10 copies.

Construction: the whole star schema is replicated `copies` times with a
per-copy key offset (10_000_000 * copy) added to every entity key and the
foreign keys that reference it, so every copy is a self-consistent universe
and cross-table joins behave exactly as they do at sf0.1. The shared
dimension tables (region, nation) are NOT replicated — nation keys stay
valid FKs from every copy.

Implemented with pyarrow (not a SQL engine) so every output file carries
the EXACT source schema — the events table's physical timestamp encoding
is load-bearing (the fixture has shipped as both timestamp[ns] and
timestamp[us] across driver generations; graft.Tables detects and
normalizes either, but a SQL engine would silently rewrite the encoding
and stop exercising that detection).

Deliberate properties:
  - documents/embeddings copies keep their text/vectors byte-identical:
    dedup and similarity operators face a corpus where every item has
    `copies` exact duplicates — the adversarial case for near-dup pipelines
    (clusters must straddle copies; pair counts grow ~copies^2).
  - the offset is a multiple of 100, so doc_id % {2,20,100} split
    predicates (q54/q55/q77) classify each copy identically to sf0.1.
  - no randomness anywhere: reruns are byte-stable, and the DuckDB oracle
    sees the same rows Spark does.
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFF = 10_000_000

# table -> columns that take the per-copy offset (int64 entity/FK keys).
OFFSET_COLS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main():
    os.makedirs(OUT, exist_ok=True)
    for table, keys in OFFSET_COLS.items():
        src = pq.read_table(f"{SRC}/{table}.parquet")
        # Drop pandas metadata but keep field names/types bit-identical.
        schema = src.schema.remove_metadata()
        src = src.cast(schema)
        if not keys:
            out = src
        else:
            chunks = []
            for c in range(COPIES):
                t = src
                for col in keys:
                    i = t.schema.get_field_index(col)
                    shifted = pc.add(t.column(i), pa.scalar(c * OFF, type=t.schema.field(i).type))
                    t = t.set_column(i, t.schema.field(i), shifted)
                chunks.append(t)
            out = pa.concat_tables(chunks)
        pq.write_table(out, f"{OUT}/{table}.parquet")
        check = pq.read_schema(f"{OUT}/{table}.parquet")
        assert check.equals(schema), f"{table}: schema drifted\n{check}\nvs\n{schema}"
        print(f"{table}: {out.num_rows} rows"
              + ("" if keys else " (shared dimension, not replicated)"))


if __name__ == "__main__":
    main()
