#!/usr/bin/env python3
"""Null-injected variant of an sf dir for the nulls oracle gate
(driver-side tooling like check.py/gen_sf.py — NOT part of the library).

Usage: python3 tools/gen_nulls.py <srcSfDir> <outDir>

Dims and fact keys stay non-null (a lake's NOT NULL key columns);
measurement/payload columns get deterministic nulls, the place real data
actually has them:
  events.value     -> NULL on ~2% of rows
  events.props     -> NULL on ~2% of rows (different mask)
  documents.text   -> NULL on ~4% of docs
  lineitem.l_quantity -> NULL on ~2% of rows (exercises the A-family aggs)

Masks are pure functions of the key columns (no RNG). events round-trips
through pyarrow so its TIMESTAMP(NANOS) physical type survives.
"""
import shutil
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

KNUTH = 2654435761


def mask(key_col, mod, table):
    """True where the row keeps its value (hash(key) % mod != 0)."""
    h = pc.bit_wise_and(pc.multiply(
        pc.cast(key_col, pa.int64()), pa.scalar(KNUTH, pa.int64())), 0x7FFFFFFF)
    # pyarrow.compute has no mod kernel: a % m == a - (a // m) * m
    q = pc.divide(h, pa.scalar(mod, pa.int64()))  # int64 / int64 truncates
    r = pc.subtract(h, pc.multiply(q, pa.scalar(mod, pa.int64())))
    return pc.not_equal(r, 0)


def null_out(table, col, keep):
    i = table.schema.get_field_index(col)
    nulled = pc.if_else(keep, table.column(col), pa.scalar(None, table.schema.field(col).type))
    return table.set_column(i, table.schema.field(col), nulled)


def main(src, out):
    src, out = Path(src), Path(out)
    out.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        sp = src / f"{t}.parquet"
        if not sp.exists():
            continue
        if t == "events":
            tab = pq.read_table(sp)
            tab = null_out(tab, "value", mask(tab.column("event_id"), 50, tab))
            tab = null_out(tab, "props",
                           mask(pc.add(tab.column("event_id"), 17), 50, tab))
            pq.write_table(tab, out / f"{t}.parquet")
        elif t == "documents":
            tab = pq.read_table(sp)
            tab = null_out(tab, "text", mask(tab.column("doc_id"), 25, tab))
            pq.write_table(tab, out / f"{t}.parquet")
        elif t == "lineitem":
            tab = pq.read_table(sp)
            key = pc.add(pc.multiply_checked(tab.column("l_orderkey"), 7),
                         tab.column("l_linenumber"))
            tab = null_out(tab, "l_quantity", mask(key, 50, tab))
            pq.write_table(tab, out / f"{t}.parquet")
        else:
            shutil.copyfile(sp, out / f"{t}.parquet")
        print(f"wrote {t}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
