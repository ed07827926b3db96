"""Replicate a testdata sf dir K× for scale validation.

The driver ships sf0.001/0.01/0.1 only; the 100 TB posture claims need
measured scaling, so this script manufactures x10/x100 datasets from
sf0.1 with the SAME layout (one parquet file per table) and the same
distributions:

- **facts scale, dims stay** — customer/orders/lineitem/part/supplier/
  events/documents/embeddings replicate with key offsets that preserve
  referential integrity (l_orderkey→o_orderkey, o_custkey→c_custkey,
  l_partkey→p_partkey, l_suppkey→s_suppkey); nation/region copy as-is.
  This matches how the TPC-H generator itself scales.
- **names follow keys** — c_name/s_name are rewritten from the new key
  so name-keyed operators (fuzzy matching) see K× distinct entities,
  not K copies of each name (which would inflate per-bucket pair counts
  quadratically and measure the data, not the operator).
- **documents get a per-replica letter rotation** — a Caesar shift of
  [a-zA-Z] keyed by the replica. Lengths, word boundaries, token shapes
  and intra-replica duplicate structure are preserved exactly; shingles
  across replicas share nothing, so near-dup workloads scale in corpus
  size rather than in manufactured cross-replica duplicates.
- **embeddings get a per-replica dimension rotation** — norms and
  intra-replica geometry are exact; cross-replica vectors are generic.

Usage: python scripts/make_scale_data.py SRC_DIR OUT_DIR K
"""

from __future__ import annotations

import os
import string
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LETTERS = string.ascii_lowercase + string.ascii_uppercase


def _shift_table(text: pa.ChunkedArray, k: int) -> list:
    """Per-replica Caesar shift over ASCII letters (identity for k=0)."""
    if k == 0:
        return None
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    s = k % 26
    return str.maketrans(
        LETTERS, lower[s:] + lower[:s] + upper[s:] + upper[:s]
    )


def _offset(col: pa.ChunkedArray, delta: int) -> pa.Array:
    return pa.chunked_array([pa.compute.add(c, delta) for c in col.chunks])


def replicate(src: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    tabs = {
        name: pq.read_table(f"{src}/{name}.parquet")
        for name in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings".split()
        )
    }
    # key strides from the source maxima (replica k adds k*stride)
    stride = {
        "cust": pa.compute.max(tabs["customer"]["c_custkey"]).as_py() + 1,
        "ord": pa.compute.max(tabs["orders"]["o_orderkey"]).as_py() + 1,
        "part": pa.compute.max(tabs["part"]["p_partkey"]).as_py() + 1,
        "supp": pa.compute.max(tabs["supplier"]["s_suppkey"]).as_py() + 1,
        "event": pa.compute.max(tabs["events"]["event_id"]).as_py() + 1,
        "user": pa.compute.max(tabs["events"]["user_id"]).as_py() + 1,
        "doc": pa.compute.max(tabs["documents"]["doc_id"]).as_py() + 1,
        "vec": pa.compute.max(tabs["embeddings"]["vec_id"]).as_py() + 1,
    }

    for name in ("region", "nation"):
        pq.write_table(tabs[name], f"{out}/{name}.parquet")

    def emit(name: str, replica_fn) -> None:
        writer = None
        try:
            for k in range(factor):
                t = replica_fn(tabs[name], k)
                if writer is None:
                    writer = pq.ParquetWriter(f"{out}/{name}.parquet", t.schema)
                writer.write_table(t)
        finally:
            if writer is not None:
                writer.close()

    def keyed_name(prefix: str, keys: pa.ChunkedArray) -> pa.Array:
        return pa.array(
            [f"{prefix}#{k:09d}" for k in keys.to_pylist()], type=pa.string()
        )

    def customer_rep(t: pa.Table, k: int) -> pa.Table:
        keys = _offset(t["c_custkey"], k * stride["cust"])
        return t.set_column(
            t.schema.get_field_index("c_custkey"), "c_custkey", keys
        ).set_column(
            t.schema.get_field_index("c_name"),
            "c_name",
            keyed_name("Customer", keys),
        )

    def supplier_rep(t: pa.Table, k: int) -> pa.Table:
        keys = _offset(t["s_suppkey"], k * stride["supp"])
        return t.set_column(
            t.schema.get_field_index("s_suppkey"), "s_suppkey", keys
        ).set_column(
            t.schema.get_field_index("s_name"),
            "s_name",
            keyed_name("Supplier", keys),
        )

    def part_rep(t: pa.Table, k: int) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("p_partkey"),
            "p_partkey",
            _offset(t["p_partkey"], k * stride["part"]),
        )

    def orders_rep(t: pa.Table, k: int) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("o_orderkey"),
            "o_orderkey",
            _offset(t["o_orderkey"], k * stride["ord"]),
        ).set_column(
            t.schema.get_field_index("o_custkey"),
            "o_custkey",
            _offset(t["o_custkey"], k * stride["cust"]),
        )

    def lineitem_rep(t: pa.Table, k: int) -> pa.Table:
        for col, st in (
            ("l_orderkey", "ord"),
            ("l_partkey", "part"),
            ("l_suppkey", "supp"),
        ):
            t = t.set_column(
                t.schema.get_field_index(col),
                col,
                _offset(t[col], k * stride[st]),
            )
        return t

    def events_rep(t: pa.Table, k: int) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("event_id"),
            "event_id",
            _offset(t["event_id"], k * stride["event"]),
        ).set_column(
            t.schema.get_field_index("user_id"),
            "user_id",
            _offset(t["user_id"], k * stride["user"]),
        )

    def documents_rep(t: pa.Table, k: int) -> pa.Table:
        t = t.set_column(
            t.schema.get_field_index("doc_id"),
            "doc_id",
            _offset(t["doc_id"], k * stride["doc"]),
        )
        trans = _shift_table(t["text"], k)
        if trans is not None:
            shifted = pa.array(
                [s.translate(trans) if s is not None else None
                 for s in t["text"].to_pylist()],
                type=pa.string(),
            )
            t = t.set_column(t.schema.get_field_index("text"), "text", shifted)
        return t

    def embeddings_rep(t: pa.Table, k: int) -> pa.Table:
        t = t.set_column(
            t.schema.get_field_index("vec_id"),
            "vec_id",
            _offset(t["vec_id"], k * stride["vec"]),
        )
        if k:
            col = t["embedding"].combine_chunks()
            flat = np.asarray(col.values)
            n = len(col)
            dim = len(flat) // n
            mat = flat.reshape(n, dim)
            rot = np.roll(mat, k % dim, axis=1)
            arr = pa.FixedSizeListArray.from_arrays(
                pa.array(rot.ravel(), type=pa.float32()), dim
            ).cast(t.schema.field("embedding").type)
            t = t.set_column(
                t.schema.get_field_index("embedding"), "embedding", arr
            )
        return t

    emit("customer", customer_rep)
    emit("supplier", supplier_rep)
    emit("part", part_rep)
    emit("orders", orders_rep)
    emit("lineitem", lineitem_rep)
    emit("events", events_rep)
    emit("documents", documents_rep)
    emit("embeddings", embeddings_rep)


if __name__ == "__main__":
    src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    replicate(src, out, k)
    for f in sorted(os.listdir(out)):
        p = os.path.join(out, f)
        print(f, pq.ParquetFile(p).metadata.num_rows, round(os.path.getsize(p) / 1e6, 1), "MB")
