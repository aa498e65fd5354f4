"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Design (the part that must be right at 100 TB even though codecs are
stubbed here):

* a multimodal asset is a row ``(asset_id, modality, payload binary,
  meta struct<mime,width,height,duration_ms>)`` — payloads stay opaque
  bytes end-to-end; Spark never interprets them, so predicate pushdown and
  column pruning still apply to the metadata columns and the payload column
  is only read by stages that need it;
* decode / feature-extract runs as ``mapInPandas`` over Arrow batches —
  one Python worker call per batch, not per row; batch size is bounded via
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a partition of 100 MB
  images can't blow worker memory;
* the actual codec (PIL/librosa/ffmpeg) is NOT in this container, so
  ``decode_payload`` raises ``NotImplementedError`` unless the caller
  passes a decoder; ``fake_features`` is the deterministic stand-in used
  by tests and the catalog (byte-length, digest, first-byte statistics).
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_FIELDS = "mime string, width int, height int, duration_ms long"
ASSET_SCHEMA = f"asset_id long, modality string, payload binary, meta struct<{META_FIELDS}>"


def documents_as_assets(docs: DataFrame) -> DataFrame:
    """Adapter used by tests/fixtures: treat each document's UTF-8 bytes as
    an opaque payload (the fixture set has no real image/audio bytes)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text").alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_payload(
    assets: DataFrame,
    decoder: Callable[[bytes, str], dict] | None = None,
) -> DataFrame:
    """Decode payloads into per-asset feature rows via Arrow-batched
    ``mapInPandas``.

    ``decoder(payload_bytes, modality) -> {"width": ..., ...}`` supplies
    the real codec. Without one this raises ``NotImplementedError`` at plan
    *build* time (not mid-job on an executor) — the image/audio libraries
    are not available in this environment; the Spark-side plumbing (schema,
    batching, partitioning) is real and tested via ``fake_features``.
    """
    if decoder is None:
        raise NotImplementedError(
            "no media codecs in this environment — pass decoder=, or use "
            "fake_features() for the deterministic test stand-in"
        )

    out_schema = "asset_id long, modality string, feature_json string"

    def run(batches: Iterator) -> Iterator:
        import json

        import pandas as pd

        for pdf in batches:
            feats = [
                json.dumps(decoder(bytes(p), m))
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "feature_json": feats,
                }
            )

    return assets.mapInPandas(run, schema=out_schema)


def fake_features(assets: DataFrame) -> DataFrame:
    """Deterministic feature extraction over the opaque payload, exercising
    the exact batch shape a real decoder would use: byte length, md5 digest,
    and a fake 4-dim embedding from evenly-spaced payload bytes.

    Runs in ``mapInPandas`` (the real decode path) — correctness of the
    values is still oracle-checkable because every feature is a pure
    function of the bytes.
    """
    out_schema = (
        "asset_id long, modality string, byte_len long, digest string, "
        "fake_embedding array<double>"
    )

    def run(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for aid, mod, payload in zip(
                pdf["asset_id"], pdf["modality"], pdf["payload"]
            ):
                b = bytes(payload)
                n = len(b)
                # 4 evenly-spaced sample bytes, scaled to [0,1]
                emb = [b[(i * n) // 4] / 255.0 if n else 0.0 for i in range(4)]
                rows.append(
                    (int(aid), mod, n, hashlib.md5(b).hexdigest(), emb)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id",
                    "modality",
                    "byte_len",
                    "digest",
                    "fake_embedding",
                ],
            )

    return assets.mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------------
# stdlib codecs: real in-container decoders for the decode_payload seam.
# PNG and WAV headers are fully parseable with struct/zlib alone, so the
# "codecs absent from this container" caveat doesn't apply to them — these
# decode actual bytes (signatures, CRCs, chunk walks), not stand-ins.
# Formats per the public specs: PNG (www.w3.org/TR/png-3, signature + IHDR),
# WAV (RIFF/WAVE canonical layout, fmt + data chunks).
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_encode_header(width: int, height: int, bit_depth: int = 8, color_type: int = 6) -> bytes:
    """Synthesize a minimal structurally-valid PNG: signature + IHDR
    (with correct CRC) + IEND. No IDAT — enough for any header parser;
    used by tests/fixtures to exercise ``decode_png_header`` on real
    bytes."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0)
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")


def decode_png_header(payload: bytes) -> dict:
    """Parse a PNG signature + IHDR chunk (CRC-verified) into typed
    metadata — a real stdlib-only decoder for ``decode_payload``."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    length, tag = struct.unpack(">I4s", payload[8:16])
    if tag != b"IHDR" or length != 13:
        raise ValueError("not a PNG: first chunk is not IHDR")
    data = payload[16:29]
    (crc,) = struct.unpack(">I", payload[29:33])
    if crc != (zlib.crc32(b"IHDR" + data) & 0xFFFFFFFF):
        raise ValueError("PNG IHDR CRC mismatch")
    width, height, bit_depth, color_type = struct.unpack(">IIBB", data[:10])
    return {
        "mime": "image/png",
        "width": int(width),
        "height": int(height),
        "bit_depth": int(bit_depth),
        "color_type": int(color_type),
    }


def wav_encode(
    n_samples: int, sample_rate: int, channels: int = 1, bits: int = 16
) -> bytes:
    """Synthesize a spec-valid RIFF/WAVE file (PCM fmt chunk + zeroed data
    chunk) for exercising ``decode_wav_header`` on real bytes."""
    import struct

    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    data = b"\x00" * (n_samples * block_align)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_header(payload: bytes) -> dict:
    """Walk the RIFF chunk list, parse the PCM fmt chunk, and derive the
    duration from the data chunk's byte length — stdlib-only."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos, fmt, data_len = 12, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", payload[pos + 8 : pos + 24])
        elif tag == b"data":
            data_len = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data_len is None:
        raise ValueError("WAV missing fmt or data chunk")
    _, channels, sample_rate, byte_rate, _, bits = fmt
    return {
        "mime": "audio/wav",
        "channels": int(channels),
        "sample_rate": int(sample_rate),
        "bits_per_sample": int(bits),
        "duration_ms": int(data_len * 1000 // byte_rate),
    }


def stdlib_header_decoder(payload: bytes, modality: str) -> dict:
    """Magic-byte-sniffing dispatch over the stdlib codecs — the
    ``decoder=`` example for :func:`decode_payload` that runs entirely
    in-container on real bytes. Unknown formats raise (tolerant pipelines
    wrap this with a try/except that dead-letters, per T10)."""
    if payload[:8] == _PNG_SIG:
        return decode_png_header(payload)
    if payload[:4] == b"RIFF":
        return decode_wav_header(payload)
    raise ValueError(f"unrecognized payload format for modality {modality!r}")


def frame_sample(
    assets: DataFrame,
    every_n_bytes: int = 64,
    max_frames: int = 8,
    frame_decoder: Callable[[bytes, int], bytes] | None = None,
) -> DataFrame:
    """Video frame sampling plumbing: the 1→N explode shape
    (one asset row → up to ``max_frames`` frame rows) via ``mapInPandas``.

    This shape is the scale-critical part of video pipelines: the explode
    happens *inside* the Arrow batch iterator, so peak memory is one input
    batch plus one output frame batch — a 10 GB video partition never
    materializes all frames at once, and downstream stages see ordinary
    rows they can repartition/filter. ``frame_decoder(payload, frame_idx)
    -> frame_bytes`` plugs in the real codec (ffmpeg etc., absent in this
    container); the default deterministically slices the payload every
    ``every_n_bytes`` bytes — a stand-in with the same row geometry.
    """
    out_schema = "asset_id long, frame_idx int, frame_payload binary"

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = min(max_frames, max(1, len(b) // every_n_bytes))
                for i in range(n_frames):
                    if frame_decoder is not None:
                        fb = frame_decoder(b, i)
                    else:
                        fb = b[i * every_n_bytes : (i + 1) * every_n_bytes]
                    rows.append((int(aid), i, fb))
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_idx", "frame_payload"]
            )

    return assets.mapInPandas(run, schema=out_schema)


def resize_stub(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Image-resize plumbing: the transform signature, partitioning and
    output schema of a real resize stage, with the pixel work stubbed to a
    deterministic passthrough (no image libs in this container). Swap the
    body for PIL in production; nothing else changes."""
    return assets.withColumn(
        "meta",
        F.struct(
            F.col("meta.mime").alias("mime"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ),
    )
