"""M68 — round-4 wave 8: real binary ingestion paths — WAV decode,
compressed corpus round trip, WARC-style record framing.

q245 completes the audio leg of the real-decode story (q244 did
images/BMP): RIFF/PCM parsing with stdlib struct.  q246/q247 cover
the two layouts a web-scale text corpus actually ships in —
zlib-compressed members and length-prefixed record streams — both
processed with REAL codecs and value-gated by per-document byte
lengths + md5 digests the oracle derives from the plain table.  A
truncated inflate, corrupted frame boundary, or desynchronized length
field flips the hash.

Registered after m67 — outside the round-4 driver window; first
driver rows with the round-5 rotation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.ingest import (
    frame_records,
    gzip_compress_corpus,
    gzip_decompress_stats,
    parse_record_stream,
)
from ..operators.multimodal import decode_wav_stats, synth_wav_media
from ..queries import query


# -- q245: real 16-bit PCM WAV decode
@query(
    "q245_wav_decode",
    """
    WITH m AS (SELECT unnest(generate_series(0, 47)) AS media_id),
         dims AS (SELECT media_id, 64 + media_id % 37 AS n FROM m),
         s AS (SELECT media_id, n,
                      ((media_id * 131 + i * 17) % 4001) - 2000 AS v
               FROM dims, unnest(generate_series(0, n - 1)) AS t(i))
    SELECT media_id,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(n AS BIGINT) AS n_samples,
           CAST(sum(v) AS BIGINT) AS sample_sum,
           CAST(max(abs(v)) AS BIGINT) AS peak
    FROM s GROUP BY 1, 3
    """,
)
def q245_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """48 synthetic PCM WAVs decoded for real (RIFF chunks, sample
    rate, 16-bit LE samples) in the Arrow kernel; sample sums and peak
    amplitude must equal the oracle's arithmetic derivation
    (operators/multimodal.synth_wav_media + decode_wav_stats)."""
    return decode_wav_stats(synth_wav_media(spark, n=48))


# -- q246: compressed-corpus round trip (zlib inflate under the hash)
@query(
    "q246_gzip_corpus",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS digest
    FROM documents WHERE doc_id % 4 = 0
    """,
)
def q246_gzip_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents compressed to a BINARY column then REALLY inflated in
    the kernel; decompressed byte length + md5 per doc must equal the
    oracle's direct read of the plain table — the lossless-round-trip
    proof for a compressed-at-rest corpus
    (operators/ingest.gzip_compress_corpus + gzip_decompress_stats)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 0)
    return gzip_decompress_stats(gzip_compress_corpus(docs))


# -- q247: WARC-style record framing round trip
@query(
    "q247_record_stream",
    """
    WITH d AS (SELECT doc_id, text, doc_id // 16 AS file_id
               FROM documents WHERE doc_id % 3 = 0),
         r AS (SELECT file_id, doc_id, text,
                      row_number() OVER (PARTITION BY file_id
                                         ORDER BY doc_id) - 1 AS rec_idx
               FROM d)
    SELECT file_id, CAST(rec_idx AS BIGINT) AS rec_idx, doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS digest
    FROM r
    """,
)
def q247_record_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents assembled into length-prefixed record blobs (16 per
    file, id order) then parsed back record by record; every record's
    (position, embedded id, length, digest) must match the oracle — a
    single wrong length field desynchronizes the stream and flips the
    digests (operators/ingest.frame_records + parse_record_stream)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    return parse_record_stream(frame_records(docs, docs_per_file=16))
