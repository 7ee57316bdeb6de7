#!/usr/bin/env python
"""Build a larger synthetic lake by key-shifted replication of
/root/testdata/sf0.1 — the protocol behind the sf1 rows in
BASELINE.md (VERDICT r4 item 1: run the full oracle sweep and bench
an order of magnitude above the driver gate).

``python tools/gen_sf_scale.py [--copies 10] [--out /tmp/w4c_sf1]``

Replication rules (copy i of N, OFF = 10_000_000):

- ``region``/``nation``: fixed dims, copied once unchanged.
- fact/dim keys (``*_key``, ``o_orderkey``/``o_custkey``,
  ``l_orderkey``/``l_partkey``/``l_suppkey``, ``event_id``/
  ``user_id``, ``doc_id``, ``vec_id``) shift by ``i*OFF`` —
  referential integrity holds WITHIN a copy, so join selectivities
  and group cardinalities scale linearly, exactly like a bigger
  TPC-H SF.
- ``documents.text``: copies i>0 re-salt every token with ``_c{i}``
  (the scale_smoke GROWTH rule): doc length and shingle structure are
  preserved but vocabularies stay disjoint across copies, so the
  near-dup pair volume grows linearly (a verbatim 10x replica is the
  DUP adversarial lake, measured separately in SCALING.md §5);
  ``n_chars`` is recomputed for the salted text.
- ``embeddings.embedding``: copy i circularly rotates the vector by
  i positions — norm and component distribution unchanged, but
  copies are not near-duplicates of each other.

Everything is a deterministic pure function of the (read-only) sf0.1
input; both engines read the same output parquet, so every DuckDB
oracle stays valid verbatim. Output schemas are bit-compatible with
the driver's (same arrow types, timestamp[us]).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OFF = 10_000_000

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _shift_keys(tbl: pa.Table, cols: list[str], delta: int) -> pa.Table:
    for c in cols:
        idx = tbl.schema.get_field_index(c)
        shifted = pc.add(tbl.column(c), pa.scalar(delta, type=tbl.schema.field(c).type))
        tbl = tbl.set_column(idx, tbl.schema.field(c), shifted)
    return tbl


def _salt_documents(tbl: pa.Table, i: int) -> pa.Table:
    texts = tbl.column("text").to_pylist()
    salted = [" ".join(f"{t}_c{i}" for t in s.split()) for s in texts]
    tbl = tbl.set_column(
        tbl.schema.get_field_index("text"),
        tbl.schema.field("text"),
        pa.array(salted, type=pa.string()),
    )
    n_chars = pa.array([len(s) for s in salted], type=tbl.schema.field("n_chars").type)
    return tbl.set_column(
        tbl.schema.get_field_index("n_chars"), tbl.schema.field("n_chars"), n_chars
    )


def _rotate_embeddings(tbl: pa.Table, i: int) -> pa.Table:
    vecs = tbl.column("embedding").to_pylist()
    rolled = [np.roll(np.asarray(v, dtype=np.float32), i).tolist() for v in vecs]
    return tbl.set_column(
        tbl.schema.get_field_index("embedding"),
        tbl.schema.field("embedding"),
        pa.array(rolled, type=tbl.schema.field("embedding").type),
    )


def build(out: str, copies: int) -> None:
    os.makedirs(out, exist_ok=True)
    for name in ("region", "nation"):
        pq.write_table(
            pq.read_table(f"{SRC}/{name}.parquet"), f"{out}/{name}.parquet"
        )
        print(f"{name}: copied unchanged")
    for name, keys in KEY_COLS.items():
        base = pq.read_table(f"{SRC}/{name}.parquet")
        parts = []
        for i in range(copies):
            t = _shift_keys(base, keys, i * OFF)
            if name == "documents" and i > 0:
                t = _salt_documents(t, i)
            if name == "embeddings" and i > 0:
                t = _rotate_embeddings(t, i)
            parts.append(t)
        full = pa.concat_tables(parts)
        pq.write_table(full, f"{out}/{name}.parquet")
        print(f"{name}: {base.num_rows} x {copies} = {full.num_rows} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--out", default="/tmp/w4c_sf1")
    args = ap.parse_args()
    build(args.out, args.copies)


if __name__ == "__main__":
    main()
