"""Binary corpus ingestion: compressed documents and framed record
streams — the shapes a web-scale text corpus actually arrives in
(gzip members, WARC-style length-prefixed records), processed with
REAL stdlib codecs (zlib, struct), no external deps.

Both paths are round-trip value-gated: the engine compresses/frames
and then decompresses/parses inside Arrow kernels, and the decoded
stats (byte length + md5 digest per document) must equal the oracle's
direct derivation from the plain table — a corrupted frame boundary,
a truncated inflate, or a mis-ordered record flips the hash.

Scale shape: compression and parsing are per-row / per-group map
stages (mapInPandas / applyInPandas) — they scale as the scan does;
nothing here shuffles more than the one groupBy that assembles
documents into file-sized blobs (which a real pipeline gets for free
from its input layout).
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gzip_compress_corpus(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """(id, payload BINARY) with payload = zlib-compressed UTF-8 text —
    the compressed-at-rest corpus layout."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def comp(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: zlib.compress(t.encode("utf-8"), 6))

    return docs.select(F.col(id_col), comp(F.col(text_col)).alias("payload"))


def gzip_decompress_stats(compressed: DataFrame,
                          id_col: str = "doc_id") -> DataFrame:
    """REAL inflate of each payload; emits (id, n_bytes, digest) of the
    DECOMPRESSED text (md5 hex) — compare against the plain table to
    prove the round trip lossless."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for b in batches:
            out = []
            for mid, payload in zip(b[id_col], b["payload"]):
                raw = zlib.decompress(bytes(payload))
                out.append((int(mid), len(raw), hashlib.md5(raw).hexdigest()))
            yield pd.DataFrame(out, columns=[id_col, "n_bytes", "digest"])

    return compressed.select(id_col, "payload").mapInPandas(
        kernel, f"{id_col} long, n_bytes long, digest string"
    )


def frame_records(docs: DataFrame, docs_per_file: int = 16,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Assemble documents into WARC-style framed blobs: one row per
    file (file_id = id div docs_per_file), blob = concatenation of
    ``[8-byte BE id][4-byte BE length][utf-8 payload]`` frames in id
    order — the length-prefixed record stream every crawl archive
    uses."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        blob = bytearray()
        for _, row in pdf.iterrows():
            body = row[text_col].encode("utf-8")
            blob += struct.pack(">QI", int(row[id_col]), len(body)) + body
        return pd.DataFrame(
            {"file_id": [int(pdf["file_id"].iloc[0])], "blob": [bytes(blob)]}
        )

    with_file = docs.select(
        F.col(id_col), F.col(text_col),
        (F.col(id_col) / docs_per_file).cast("long").alias("file_id"),
    )
    return with_file.groupBy("file_id").applyInPandas(
        build, "file_id long, blob binary"
    )


def parse_record_stream(files: DataFrame) -> DataFrame:
    """REAL frame parsing: walk each blob's length-prefixed records and
    emit (file_id, rec_idx, doc_id, n_bytes, digest) per record —
    rec_idx is the physical position in the stream.  A wrong length
    field desynchronizes every subsequent frame, which the per-record
    digests catch immediately."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for b in batches:
            out = []
            for fid, blob in zip(b["file_id"], b["blob"]):
                raw = bytes(blob)
                pos, idx = 0, 0
                while pos < len(raw):
                    did, ln = struct.unpack_from(">QI", raw, pos)
                    body = raw[pos + 12 : pos + 12 + ln]
                    if len(body) != ln:
                        raise ValueError(f"file {fid}: truncated frame at {pos}")
                    out.append(
                        (int(fid), idx, int(did), ln,
                         hashlib.md5(body).hexdigest())
                    )
                    pos += 12 + ln
                    idx += 1
            yield pd.DataFrame(
                out,
                columns=["file_id", "rec_idx", "doc_id", "n_bytes", "digest"],
            )

    return files.mapInPandas(
        kernel,
        "file_id long, rec_idx long, doc_id long, n_bytes long, digest string",
    )
