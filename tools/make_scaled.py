#!/usr/bin/env python3
"""Synthesize a perf-only scaled replica of a driver fixture directory.

Usage: python3 tools/make_scaled.py <srcDir> <dstDir> <copies>

Replicates every table <copies> times with key columns shifted by a
large per-copy offset so join integrity is preserved (facts reference
the shifted dimension copies; nation/region stay shared). Schemas are
preserved bit-for-bit via pyarrow — events.ts stays parquet
TIMESTAMP(NANOS), which graft.Tables special-cases.

NOT part of the engine and NOT an oracle input: the output exists only
to measure per-query scaling exponents (BENCHNOTES.md). Dev tooling,
driver-side libs only.
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFF = 10_000_000  # larger than any key at the source SF

# key columns to shift per copy, per table (dims region/nation shared)
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "region": [],
    "nation": [],
}


def main():
    src, dst, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os
    os.makedirs(dst, exist_ok=True)
    for table, keys in SHIFT.items():
        t = pq.read_table(f"{src}/{table}.parquet")
        if not keys:  # shared dims: single copy
            pq.write_table(t, f"{dst}/{table}.parquet")
            print(f"{table}: {t.num_rows} rows (shared dim)")
            continue
        parts = []
        for c in range(copies):
            shifted = t
            for k in keys:
                col = shifted.column(k)
                newcol = pc.add(col, pa.scalar(c * OFF, type=col.type))
                shifted = shifted.set_column(
                    shifted.schema.get_field_index(k), shifted.field(k), newcol)
            parts.append(shifted)
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{dst}/{table}.parquet")
        print(f"{table}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
