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
- **names follow keys, except part** — c_name/s_name are rewritten from
  the new key so name-keyed operators see K× distinct entities. p_name is
  deliberately NOT rewritten: the x10/x100 catalogs recycle part names K×
  as an adversarial duplication stressor for fuzzy matching (this is what
  exposed the 16.2 s fuzzy_name_matches blowup the r4 sweep found and
  fixed — see SCALING.md).
- **documents get a per-replica seeded letter permutation** — replica k
  maps [a-z] (and [A-Z], same permutation) through an independent
  RandomState(k)-seeded permutation of the 26 letters (26! space, so no
  two replicas collide — unlike a Caesar shift, which wraps at k % 26 and
  would make replicas 26/52/78 byte-identical to replica 0). Lengths,
  word boundaries, token shapes and intra-replica duplicate structure are
  preserved exactly; shingles across replicas share (essentially) nothing,
  so near-dup workloads scale in corpus size rather than in manufactured
  cross-replica duplicates.
- **embeddings get a per-replica signed dimension permutation** — an
  orthogonal transform (RandomState-seeded axis permutation composed with
  per-axis sign flips, keyed by the full replica index, not k % dim):
  norms and intra-replica geometry are exact; cross-replica vectors are
  generic and never repeat across replicas.

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


def _shift_table(text: pa.ChunkedArray, k: int) -> dict | None:
    """Per-replica seeded letter permutation (identity for k=0).

    RandomState(k) draws an independent permutation of the 26 letters per
    replica (applied to lower and upper case alike), so distinct replicas
    produce byte-distinct documents for every k — a Caesar shift would wrap
    at k % 26 and reproduce replica 0 verbatim at k=26/52/78 (ADVICE r4).
    """
    if k == 0:
        return None
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    perm = np.random.RandomState(k).permutation(26)
    return str.maketrans(
        LETTERS,
        "".join(lower[i] for i in perm) + "".join(upper[i] for i in perm),
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
            # Orthogonal per-replica transform keyed by the FULL replica
            # index: seeded axis permutation + per-axis sign flips. Unlike
            # np.roll(mat, k % dim) this never repeats across replicas
            # (k and k+dim previously shared identical vectors, ADVICE r4).
            rs = np.random.RandomState(1_000_003 + k)
            perm = rs.permutation(dim)
            signs = rs.choice(np.array([-1.0, 1.0], dtype=np.float32), dim)
            rot = mat[:, perm] * signs
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
