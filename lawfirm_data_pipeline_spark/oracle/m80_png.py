"""M80 — round-5 wave 1: REAL compressed-image decode (PNG via zlib).

q244 proved the fixed-layout leg (BMP); q269 adds the compressed leg
the r4 verdict asked for (#4): chunk walk + CRC32 verification + IDAT
inflate + the spec's five scanline filter reconstructions, all stdlib.
The oracle re-derives (width, height, px_sum) arithmetically from the
generation formula — identical to q244's derivation, so a single
mis-reconstructed filter byte anywhere in the Sub/Up/Average/Paeth
chain flips the hash (the filters are chained: row y's reconstruction
feeds row y+1's).

Registered after m59 — inside the round-7 rotation window per the
coverage schedule (r4 verdict #2 caps round-5 window displacement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import decode_png_stats, synth_png_media
from ..queries import query


@query(
    "q269_png_decode",
    """
    WITH m AS (SELECT unnest(generate_series(0, 63)) AS media_id),
         dims AS (SELECT media_id,
                         4 + media_id % 5 AS w,
                         3 + media_id % 4 AS h
                  FROM m),
         px AS (SELECT media_id, w, h, t1.x, t2.y
                FROM dims,
                     unnest(generate_series(0, w - 1)) AS t1(x),
                     unnest(generate_series(0, h - 1)) AS t2(y))
    SELECT media_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(sum((media_id * 7 + x * 3 + y * 5) % 256
                    + (media_id * 11 + x + 2 * y) % 256
                    + (media_id * 13 + 2 * x + y) % 256) AS BIGINT)
             AS px_sum
    FROM px GROUP BY 1, 2, 3
    """,
)
def q269_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64 synthetic PNGs (every filter type, multi-IDAT for ids % 3 == 0)
    ride as opaque bytes; the kernel walks chunks, checks CRCs, inflates,
    and reconstructs each scanline; the decoded (width, height, px_sum)
    must equal the oracle's arithmetic derivation
    (operators/multimodal.synth_png_media + decode_png_stats)."""
    return decode_png_stats(synth_png_media(spark, n=64))
