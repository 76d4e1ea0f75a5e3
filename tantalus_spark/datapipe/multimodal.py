"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery here is real and tested — schemas, partition-size
control, batch iteration, UDF signatures. Metadata decode is REAL for the
formats whose headers parse with stdlib byte math (PNG/GIF/BMP/JPEG
dimensions, WAV duration — :func:`stdlib_media_probe`); full pixel/PCM
decode stays a stub behind ``set_decoder`` because the image/audio
libraries are not in this container — swapping in Pillow/torchaudio is a
one-function change and does not alter any plan shape.

Scale design: binary payloads never shuffle — all transforms are map-only
(``mapInPandas``); metadata extraction prunes to the binary column plus ids;
``repartition`` before heavy decode stages controls task memory
(payload_bytes_per_task budget), the knob that matters at 100 TB."""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),      # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StringType(), True),        # JSON sidecar
])

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, payload_xxh string, "
    "width int, height int, duration_ms int"
)

_DECODER: Callable[[bytes, str], dict] | None = None


def set_decoder(fn: Callable[[bytes, str], dict] | None) -> None:
    """Install a real decoder: fn(payload, kind) -> {width, height,
    duration_ms}. None restores the deterministic fake."""
    global _DECODER
    _DECODER = fn


def stdlib_media_probe(payload: bytes, kind: str) -> dict | None:
    """REAL metadata decode for the formats whose headers parse with pure
    byte math / stdlib: PNG, GIF, BMP, JPEG dimensions and WAV duration.
    Returns None for unrecognized payloads (caller falls back). This is
    the part of "decode" a features pass actually needs; full pixel/pcm
    decode stays behind ``set_decoder`` (Pillow/torchaudio swap point)."""
    if not payload:
        return None
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
            return {"width": int.from_bytes(payload[16:20], "big"),
                    "height": int.from_bytes(payload[20:24], "big"),
                    "duration_ms": None}
        if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
            return {"width": int.from_bytes(payload[6:8], "little"),
                    "height": int.from_bytes(payload[8:10], "little"),
                    "duration_ms": None}
        if payload[:2] == b"BM" and len(payload) >= 26:
            return {"width": int.from_bytes(payload[18:22], "little"),
                    "height": int.from_bytes(payload[22:26], "little",
                                             signed=True),
                    "duration_ms": None}
        if payload[:2] == b"\xff\xd8":  # JPEG: scan for a SOF marker
            i = 2
            while i + 9 < len(payload):
                if payload[i] != 0xFF:
                    break
                # 0xFF fill bytes before a marker are legal — skip them
                while i + 9 < len(payload) and payload[i + 1] == 0xFF:
                    i += 1
                marker = payload[i + 1]
                if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
                    # standalone markers (TEM, RSTn, SOI, EOI): no length
                    i += 2
                    continue
                seg_len = int.from_bytes(payload[i + 2:i + 4], "big")
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    return {
                        "height": int.from_bytes(payload[i + 5:i + 7], "big"),
                        "width": int.from_bytes(payload[i + 7:i + 9], "big"),
                        "duration_ms": None}
                i += 2 + seg_len
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            import io
            import wave

            with wave.open(io.BytesIO(payload)) as w:
                rate = w.getframerate()
                return {"width": None, "height": None,
                        "duration_ms": int(w.getnframes() * 1000 / rate)
                        if rate else None}
    except Exception:
        return None
    return None


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic fallback for payloads no real probe recognizes:
    derives plausible dimensions from the payload bytes so synthetic-data
    tests exercise the full plumbing. A real deployment narrows this to
    set_decoder(...) or a loud failure."""
    if payload is None:
        return {"width": None, "height": None, "duration_ms": None}
    h = int.from_bytes(payload[:8].ljust(8, b"\0"), "big")
    if kind == "image":
        return {"width": 64 + h % 1024, "height": 64 + (h >> 10) % 1024,
                "duration_ms": None}
    if kind in ("audio", "video"):
        return {"width": None, "height": None,
                "duration_ms": 1000 + h % 600000}
    return {"width": None, "height": None, "duration_ms": None}


def media_features(media: DataFrame) -> DataFrame:
    """(media_id, kind, n_bytes, payload_xxh, width, height, duration_ms)
    via mapInPandas — one pass, no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        installed = _DECODER
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = r.payload
                if installed is not None:
                    decoded = installed(payload, r.kind)
                else:
                    decoded = (stdlib_media_probe(payload, r.kind)
                               or _fake_decode(payload, r.kind))
                rows.append({
                    "media_id": r.media_id,
                    "kind": r.kind,
                    "n_bytes": len(payload) if payload is not None else 0,
                    "payload_xxh": (
                        hashlib.md5(payload).hexdigest()[:16]
                        if payload is not None else None),
                    "width": decoded["width"],
                    "height": decoded["height"],
                    "duration_ms": decoded["duration_ms"],
                })
            yield pd.DataFrame(rows, columns=[
                "media_id", "kind", "n_bytes", "payload_xxh", "width",
                "height", "duration_ms"])

    pruned = media.select("media_id", "kind", "payload")
    return pruned.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame with
    the decode stubbed. Shows the explode-from-metadata shape: frames per
    row = duration/every_ms — the row explosion happens JVM-side from the
    duration column, and only then does the (stub) frame decode map over
    the exploded rows."""
    feats = media_features(media).filter(F.col("kind") == "video")
    n_frames = F.greatest(
        (F.col("duration_ms") / F.lit(every_ms)).cast("int"), F.lit(1))
    return (
        feats.withColumn("frame_idx",
                         F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .select(
            "media_id", "frame_idx",
            (F.col("frame_idx") * every_ms).alias("frame_ts_ms"),
            F.lit(None).cast("binary").alias("frame_payload"),  # stub decode
        )
    )


RESIZED_SCHEMA = (
    "media_id long, width int, height int, payload binary, resized boolean"
)


def resize_images(media: DataFrame, target_w: int = 224,
                  target_h: int = 224) -> DataFrame:
    """Image resize plumbing via mapInPandas: prune to (id, payload),
    map-only, no shuffle. The actual pixel transform is behind the same
    ``set_decoder``-style stub boundary as decoding (Pillow is a
    one-function swap); the deterministic fake emits the target dims and
    passes the payload through so batch shapes and schemas are real."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                has = r.payload is not None
                rows.append({
                    "media_id": r.media_id,
                    "width": target_w if has else None,
                    "height": target_h if has else None,
                    # stub: a real impl decodes + resizes + re-encodes here
                    "payload": r.payload,
                    "resized": has,
                })
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "payload", "resized"])

    pruned = media.filter(F.col("kind") == "image") \
        .select("media_id", "payload")
    return pruned.mapInPandas(batches, schema=RESIZED_SCHEMA)


def exact_media_dedup(media: DataFrame) -> DataFrame:
    """Exact duplicate media by payload digest — groupBy on the 16-byte md5,
    never on the payload itself."""
    return (
        media.select(F.md5(F.col("payload")).alias("payload_md5"), "media_id")
        .groupBy("payload_md5")
        .agg(F.min("media_id").alias("keep_id"),
             F.count(F.lit(1)).alias("n_copies"))
    )
