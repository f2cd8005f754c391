"""SURVEY §2.G — multimodal batch pipelines: the @register query
definitions for this section (split out of the former monolithic
plans/queries.py in round 11; shared helpers live in
plans/_prelude.py, re-exported through plans/queries.py).
Importing this module registers the queries into the shared
QUERIES/ORACLES dicts."""

from __future__ import annotations

from ._prelude import *  # noqa: F401,F403



@register("mm_image_pipeline", f"""
WITH {_MM_INV_CTE}
SELECT image_path, doc_id,
       (64 + (('0x' || substr(md5(image_path), 1, 2))::INT % 8) * 32)::INT
           AS width,
       (64 + (('0x' || substr(md5(image_path), 31, 2))::INT % 8) * 32)::INT
           AS height,
       CASE WHEN substr(md5(image_path), 1, 8) = '89504e47'
            THEN 'png' ELSE 'raw' END AS format
FROM inv
""")
def q_mm_image_pipeline(spark, sf_dir):
    """Binary image columns → mapInPandas decode (stubbed) → metadata.

    Blobs are synthesized deterministically from the chart inventory
    (content = md5 bytes of the path); the oracle replays the stub's
    byte arithmetic (first/last md5 byte → dimensions, PNG magic →
    format) in SQL, value-hash-gating the Arrow plumbing: if the
    batches delivered wrong bytes, rows, or types, the hash breaks.
    multimodal.py:decode_images."""
    from ..operators.multimodal import decode_images

    inv = charts_op.chart_inventory(
        load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    )
    blobs = inv.select(
        "image_path",
        F.unhex(F.md5("image_path")).alias("content"),
        F.lit("image/png").alias("content_type"),
    )
    return decode_images(blobs).drop("feature")


@register("mm_audio_features", f"""
WITH {_MM_INV_CTE}
SELECT image_path AS audio_path,
       CASE WHEN ('0x' || substr(md5(image_path), 1, 2))::INT % 2 = 0
            THEN 16000 ELSE 44100 END::INT AS sample_rate,
       64::BIGINT AS n_samples,
       (CASE WHEN ('0x' || substr(md5(image_path), 1, 2))::INT % 2 = 0
             THEN 0.004 ELSE 0.0015 END)::DOUBLE AS duration_s
FROM inv
""")
def q_mm_audio_features(spark, sf_dir):
    """Audio binary columns → mapInPandas decode (stubbed) → typed
    metadata + fixed-dim features. Blobs synthesized
    deterministically like the image pipeline; the oracle replays the
    header-parse stub (first byte parity → sample rate, 16-byte blobs
    → 64 samples → round(64/rate, 4) duration) so the audio plumbing
    is value-hash-gated too. multimodal.py:extract_audio_features."""
    from ..operators.multimodal import extract_audio_features

    inv = charts_op.chart_inventory(
        load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    )
    blobs = inv.select(
        "image_path",
        F.unhex(F.md5("image_path")).alias("content"),
        F.lit("audio/wav").alias("content_type"),
    )
    return extract_audio_features(blobs).drop("feature")


@register("mm_video_frames", f"""
WITH {_MM_INV_CTE},
v AS (
    SELECT image_path,
           (16 * 160 * (1 + (('0x' || substr(md5(image_path), 3, 2))::INT
                             % 4))) // 256 AS n_frames
    FROM inv
)
SELECT image_path AS video_path,
       unnest(generate_series(0, n_frames - 1, 10))::BIGINT AS frame_index
FROM v
""")
def q_mm_video_frames(spark, sf_dir):
    """Video binary columns → per-frame rows (flatMap shape: variable
    rows out per blob, the contract a real ffmpeg frame extractor
    needs). Blobs are synthesized at VARIABLE length (md5 bytes
    repeated 160·(1 + md5_byte₂ mod 4) times → 2.5–10 KB → 10–40
    fake frames → 1–4 sampled rows per blob at every_n=10), so the
    oracle replays the length arithmetic and hash-gates the fanout:
    a mapInPandas batch that dropped, duplicated, or mis-indexed
    frame rows breaks the hash. multimodal.py:sample_video_frames."""
    from ..operators.multimodal import sample_video_frames

    inv = charts_op.chart_inventory(
        load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    )
    blobs = inv.select(
        "image_path",
        F.unhex(
            F.expr(
                "repeat(md5(image_path),"
                " 160 * (1 + cast(conv(substring(md5(image_path), 3, 2),"
                " 16, 10) as int) % 4))"
            )
        ).alias("content"),
        F.lit("video/mp4").alias("content_type"),
    )
    return sample_video_frames(blobs)


@register("q_mm_phash_dedup", f"""
WITH {_CHARTS_CTE},
h AS (
    SELECT image_path,
           ('0x' || substr(md5(chart_type || '#' || chart_index::VARCHAR
                           || '#' || (doc_id % 7)::VARCHAR), 1, 15))::BIGINT
               AS phash
    FROM charts_f WHERE doc_id < 100
), g AS (
    SELECT phash, min(image_path) AS canon, count(*)::BIGINT AS group_size
    FROM h GROUP BY 1
)
SELECT h.image_path, h.phash, g.group_size,
       (h.image_path = g.canon) AS is_canonical
FROM h JOIN g USING (phash)
""")
def q_mm_phash_dedup(spark, sf_dir):
    """Exact BINARY-media dedup via perceptual hash — the multimodal
    twin of dedup_exact/dedup_materialize: image blobs hash through
    the Arrow-batched pHash stub (multimodal.py:phash_images), then a
    linear groupBy(phash) marks each image's group size and one
    canonical keeper (min path) per duplicate group — no pair join at
    any scale. Blobs are synthesized so that charts sharing
    (type, index, doc_id mod 7) carry IDENTICAL bytes: real duplicate
    groups exist and the keeper choice is exercised. The oracle
    replays the 60-bit digest-prefix arithmetic in SQL, hash-gating
    the binary Arrow plumbing like the other mm_* oracles."""
    from ..operators.multimodal import phash_images

    inv = charts_op.chart_inventory(
        load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    )
    blobs = inv.select(
        "image_path",
        F.unhex(F.md5(F.concat_ws(
            "#",
            F.col("chart_type"),
            F.col("chart_index").cast("string"),
            F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
        ))).alias("content"),
        F.lit("image/png").alias("content_type"),
    )
    hashed = phash_images(blobs)
    groups = hashed.groupBy("phash").agg(
        F.min("image_path").alias("canon"),
        F.count("*").cast("long").alias("group_size"),
    )
    return hashed.join(groups, "phash").select(
        "image_path", "phash", "group_size",
        (F.col("image_path") == F.col("canon")).alias("is_canonical"),
    )
