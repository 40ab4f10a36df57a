#!/usr/bin/env python3
"""Scale the sf0.1 test tables up by an integer factor for local scaling
benches (driver-side tooling, like check.py — NOT part of the library).

Usage: python3 tools/gen_sf.py <outDir> [factor]

Facts (lineitem/orders/events/documents/embeddings) replicate `factor`
times with key shifts so uniqueness and join structure survive; dims
(region/nation/customer/supplier/part) copy unchanged — the fixed-dim
scaling a real fact-grows-dims-don't lake sees. Per-user event density
stays constant (user_id shifts per replica) so per-key window costs scale
by key count, not key depth. Document text is word-perturbed per replica
(~20% of words) so cross-replica pairs are NOT near-duplicates at the
shingle level — otherwise dedup pair counts would grow quadratically in
the factor and poison the slope measurement. Embeddings get a tiny
deterministic per-replica component perturbation. events keeps its
TIMESTAMP(NANOS) physical type via pyarrow ns timestamps.

Everything is seed-free and deterministic (pure functions of replica
index and row position).
"""
import sys
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DIMS = ["region", "nation", "customer", "supplier", "part"]


def main():
    out = Path(sys.argv[1])
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    for t in DIMS:
        con.sql(f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")

    # --- lineitem + orders: shift the shared order-key space together ---
    okmax = con.sql(f"SELECT MAX(o_orderkey) FROM read_parquet('{SRC}/orders.parquet')").fetchone()[0]
    shifts = " UNION ALL ".join(
        f"SELECT *, {i * (okmax + 1)}::BIGINT AS shift FROM read_parquet('{SRC}/orders.parquet')"
        for i in range(factor))
    con.sql(f"""COPY (
        SELECT o_orderkey + shift AS o_orderkey, o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority
        FROM ({shifts})) TO '{out}/orders.parquet' (FORMAT PARQUET)""")
    shifts = " UNION ALL ".join(
        f"SELECT *, {i * (okmax + 1)}::BIGINT AS shift FROM read_parquet('{SRC}/lineitem.parquet')"
        for i in range(factor))
    con.sql(f"""COPY (
        SELECT l_orderkey + shift AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM ({shifts})) TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")
    print("orders+lineitem: replicated")

    # --- events: pyarrow keeps ns timestamps; shift ids and users ---
    ev = pq.read_table(f"{SRC}/events.parquet")
    eidmax = pa.compute.max(ev["event_id"]).as_py()
    uidmax = pa.compute.max(ev["user_id"]).as_py()
    parts = []
    for i in range(factor):
        parts.append(pa.table({
            "event_id": pa.compute.add(ev["event_id"], i * (eidmax + 1)),
            "ts": ev["ts"],
            "user_id": pa.compute.add(ev["user_id"], i * (uidmax + 1)),
            "event_type": ev["event_type"],
            "value": ev["value"],
            "props": ev["props"],
        }))
    pq.write_table(pa.concat_tables(parts), f"{out}/events.parquet")
    print("events: replicated (ns timestamps preserved)")

    # --- documents: perturb ~20% of words per replica ---
    docs = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
    didmax = int(docs["doc_id"].max())
    frames = []
    for i in range(factor):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + i * (didmax + 1)
        if i > 0:
            def perturb(text, i=i):
                words = text.split(" ")
                return " ".join(
                    f"w{i}x{j}" if (j + i) % 5 == 0 else w
                    for j, w in enumerate(words))
            d["text"] = d["text"].map(perturb)
            d["n_chars"] = d["text"].str.len()
        frames.append(d)
    import pandas as pd
    pq.write_table(pa.Table.from_pandas(pd.concat(frames, ignore_index=True),
                                        preserve_index=False),
                   f"{out}/documents.parquet")
    print("documents: replicated with per-replica word perturbation")

    # --- embeddings: tiny deterministic per-replica perturbation ---
    emb = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
    vidmax = int(emb["vec_id"].max())
    frames = []
    for i in range(factor):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + i * (vidmax + 1)
        if i > 0:
            e["embedding"] = e["embedding"].map(
                lambda v, i=i: (np.asarray(v, dtype=np.float32)
                                + np.float32(0.001 * i)).tolist())
        frames.append(e)
    tbl = pa.Table.from_pandas(pd.concat(frames, ignore_index=True),
                               preserve_index=False)
    # keep FLOAT[] (list<float>) schema
    schema = pa.schema([
        ("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.float32())),
        ("label", pa.int32()),
    ])
    pq.write_table(tbl.cast(schema), f"{out}/embeddings.parquet")
    print("embeddings: replicated")

    for t in ["lineitem", "orders", "events", "documents", "embeddings"]:
        n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
