"""Multimodal columns: opaque binary payloads + typed metadata, with
Arrow-batched Pandas-UDF decode / feature-extract plumbing.

Design (the part that matters at 100 TB):

- Media lives in a plain ``BINARY`` column beside a typed metadata
  struct — the lakehouse-native layout (no side files, prunable
  metadata, binary only read when projected).
- Decode / feature-extract runs in ``mapInPandas``: Arrow transfers
  whole record batches to Python once per partition, the worker loops
  over a pandas column of byte arrays — the only acceptable Python
  boundary shape (row-at-a-time UDFs are ~100× slower).
- Real codecs (PIL/librosa/av) are not in this container: the decode
  step degrades to a clearly-marked deterministic fake behind an
  import-try (``_decode_image``). The schema, batching, partitioning
  and UDF signatures are production-real; only the pixel math is
  stubbed.

The corpus has no media, so a deterministic binary payload is
synthesized from ``documents.text`` (utf-8 bytes playing the role of
an encoded image). That keeps the whole pipeline oracle-checkable:
byte length, first byte, and content hash are recomputable in SQL.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eventstreamer_spark.registry import query
from eventstreamer_spark.sources.tables import load_table

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def _decode_image(data: bytes) -> dict:
    """Decode one media payload to features.

    With a real codec this would be ``Image.open(io.BytesIO(data))``
    etc.; here it is a deterministic fake (documented stub — the
    container ships no image libraries). The fake is pure byte math so
    the SQL oracle can reproduce it.
    """
    if _HAVE_PIL:
        raise NotImplementedError(
            "real image decode intentionally not wired: synthesized payloads "
            "are not valid image files; swap _decode_image's body for "
            "Image.open when real media lands"
        )
    return {
        "n_bytes": len(data),
        "first_byte": data[0] if data else -1,
        "byte_sum_mod": sum(data[:64]) % 997,
    }


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents re-shaped as a multimodal table: (id, media BINARY,
    meta STRUCT<media_type, n_chars, lang>)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("text").cast("binary").alias("media"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            F.col("n_chars").alias("n_chars"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


_DECODE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, first_byte int, byte_sum_mod int"
)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one Arrow batch in, one feature frame out."""
    for pdf in batches:
        feats = [_decode_image(bytes(b)) for b in pdf["media"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "media_type": [m["media_type"] for m in pdf["meta"]],
                "n_bytes": [f["n_bytes"] for f in feats],
                "first_byte": [f["first_byte"] for f in feats],
                "byte_sum_mod": [f["byte_sum_mod"] for f in feats],
            }
        )


_DECODE_ORACLE = """
SELECT doc_id,
       'image/fake' AS media_type,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte,
       CAST(list_sum(list_transform(generate_series(1, least(octet_length(CAST(text AS BLOB)), 64)),
                     i -> ascii(substr(text, i, 1)))) % 997 AS INTEGER) AS byte_sum_mod
FROM documents
"""


@query("multimodal_decode_features", oracle=_DECODE_ORACLE)
def q_multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary → per-item features through the Arrow/Pandas boundary.

    The oracle reproduces the fake decode in SQL (ASCII payloads make
    byte math == char math), proving the plumbing delivers exactly the
    bytes written.
    """
    return media_table(spark, sf_dir).mapInPandas(_decode_batches, _DECODE_SCHEMA)


_CHUNK_ORACLE = """
WITH base AS (
  SELECT doc_id, text, octet_length(CAST(text AS BLOB)) AS n,
         CAST(ceil(octet_length(CAST(text AS BLOB)) / 2.0) AS INTEGER) AS half
  FROM documents
)
SELECT doc_id, CAST(0 AS INTEGER) AS chunk_idx, md5(substr(text, 1, half)) AS chunk_md5
FROM base
UNION ALL
SELECT doc_id, CAST(1 AS INTEGER), md5(substr(text, half + 1, n - half))
FROM base
"""


def _chunk_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    for pdf in batches:
        ids, idxs, hashes = [], [], []
        for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
            data = bytes(blob)
            half = (len(data) + 1) // 2
            for i, chunk in enumerate((data[:half], data[half:])):
                ids.append(doc_id)
                idxs.append(i)
                hashes.append(hashlib.md5(chunk).hexdigest())
        yield pd.DataFrame({"doc_id": ids, "chunk_idx": idxs, "chunk_md5": hashes})


@query("multimodal_frame_sample", oracle=_CHUNK_ORACLE)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame/segment sampling shape: one binary payload fans out to N
    chunk rows (here N=2 halves), each independently hashed — the
    video-frame / audio-window extraction pattern. 1:N row fan-out
    through mapInPandas keeps the Arrow batch contract."""
    return media_table(spark, sf_dir).mapInPandas(
        _chunk_batches, "doc_id bigint, chunk_idx int, chunk_md5 string"
    )


_META_STATS_ORACLE = """
SELECT 'image/fake' AS media_type,
       lang,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       round(avg(n_chars), 6) AS avg_chars
FROM documents
GROUP BY lang
"""


@query("multimodal_metadata_stats", oracle=_META_STATS_ORACLE)
def q_multimodal_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregation over the multimodal table — the query
    that makes the lakehouse layout pay: because the payload is a
    plain column beside a typed metadata struct, a stats/inventory
    query projects only the struct and Catalyst prunes the BINARY
    column out of the scan entirely (pinned by
    test_multimodal_metadata_prunes_payload). At 100 TB this is the
    difference between scanning kilobytes of footer-indexed metadata
    and petabytes of media bytes."""
    m = media_table(spark, sf_dir).select("doc_id", "meta")
    return m.groupBy(
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.lang").alias("lang"),
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.min("meta.n_chars").alias("min_chars"),
        F.max("meta.n_chars").alias("max_chars"),
        F.round(F.avg("meta.n_chars"), 6).alias("avg_chars"),
    )


_RESIZE_ORACLE = """
SELECT doc_id,
       md5(substr(text, 1, 32)) AS thumb_md5,
       CAST(least(octet_length(CAST(text AS BLOB)), 32) AS INTEGER) AS thumb_bytes
FROM documents
"""


@query("multimodal_resize_stub", oracle=_RESIZE_ORACLE)
def q_multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/re-encode shape: binary in → binary out, metadata
    updated. The pixel math is a stub (first 32 bytes as the
    'thumbnail'); the binary-in/binary-out Arrow round-trip is real —
    the UDF emits a BINARY thumb column through Arrow, and the final
    select hashes it JVM-side so the output is value-comparable across
    engines (ASCII payloads make byte math == char math for the
    oracle's substr)."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = [bytes(b)[:32] for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "thumb": thumbs,
                    "thumb_bytes": [len(t) for t in thumbs],
                }
            )

    resized = media_table(spark, sf_dir).mapInPandas(
        resize, "doc_id bigint, thumb binary, thumb_bytes int"
    )
    return resized.select(
        "doc_id", F.md5("thumb").alias("thumb_md5"), "thumb_bytes"
    )


# ---------------------------------------------------------------------------
# Payload-level exact dedup (content-addressed storage reclaim)
# ---------------------------------------------------------------------------

_PAYLOAD_DEDUP_ORACLE = """
WITH doubled AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 4 = 1
)
SELECT md5(text) AS content_md5,
       CAST(count(*) AS BIGINT) AS n_copies,
       CAST(min(doc_id) AS BIGINT) AS keeper_id,
       CAST((count(*) - 1) * min(octet_length(CAST(text AS BLOB))) AS BIGINT)
         AS reclaimed_bytes
FROM doubled
GROUP BY md5(text)
"""


@query("multimodal_payload_dedup", oracle=_PAYLOAD_DEDUP_ORACLE)
def q_multimodal_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed dedup over the BINARY media payload — the
    storage-reclaim step of a multimodal ingest (dedup by bytes, keep
    one copy, report bytes saved). Grouping is on md5(payload): the
    32-byte digests shuffle, the payloads stay at rest — the only
    payload touch is the map-side hash, so the plan survives payloads
    of any size. A deterministic duplicate-bearing input (every
    doc_id % 4 = 1 payload re-ingested under an offset id) keeps the
    keep-one semantics non-vacuous, exactly like exact_dedup's text
    twin. ASCII payloads make md5(bytes) == md5(text), which is what
    lets the DuckDB oracle hash the same content."""
    m = media_table(spark, sf_dir).select("doc_id", "media")
    doubled = m.unionByName(
        m.filter(F.col("doc_id") % 4 == 1).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "media"
        )
    )
    return doubled.groupBy(F.md5("media").alias("content_md5")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("keeper_id"),
        ((F.count(F.lit(1)) - 1) * F.min(F.length("media")))
        .cast("long")
        .alias("reclaimed_bytes"),
    )
