"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched pandas UDFs via mapInPandas.

WAV, PNG, and AVI get REAL encode/decode built on the standard library
alone (`wave` for RIFF/PCM; `zlib`+`struct` for the PNG chunk walk,
IDAT inflate and all five scanline filters; a RIFF tree walk pulling
'00db'/'00dc' frame chunks for AVI) — see `encode_wav`/`decode_wav`,
`encode_png`/`decode_png`, `encode_avi`/`decode_avi`, and
`decode_real`. Since r05 the FEATURE paths consume real decoded output
too: `extract_features` computes stripe features over the DECODED
samples/pixels, `sample_frames` iterates the frames a real RIFF demux
produced, `resize_images` taps decoded PNG pixels. The only remaining
stub is COMPRESSED codec decode (h264/jpeg/mp3 inside a container),
which genuinely needs ffmpeg/av; the `_fake_decode` fallback (stripe
features over raw container bytes) marks that seam.

Scale notes: binary payloads ride the columnar scan (parquet BYTE_ARRAY);
mapInPandas streams Arrow batches so one task never holds more than
spark.sql.execution.arrow.maxRecordsPerBatch rows of payload; decode
parallelism == partition count, so repartition by size before decoding
heavy media.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mimic2ts_spark.operators.text import MOD

FEATURE_DIM = 8

_FEATURES_SCHEMA = (
    "doc_id long, media_type string, payload_len long, checksum long, "
    "width long, height long, features array<double>"
)


# --- real stdlib codecs (WAV via `wave`, PNG via `zlib`+`struct`) ----------
#
# The container ships no third-party media libraries, but WAV and PNG
# are decodable with the standard library alone — so those two formats
# get REAL encode/decode (RIFF parsing, IDAT inflate, scanline
# unfilter for all five PNG filter types). Only video remains a stub
# (an mp4 demuxer genuinely needs ffmpeg/av).


def encode_wav(payload: bytes, sample_rate: int = 8000) -> bytes:
    """8-bit mono PCM WAV container around raw sample bytes (unsigned
    8-bit PCM stores samples verbatim, so decode roundtrips exactly)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(sample_rate)
        w.writeframes(payload)
    return buf.getvalue()


def decode_wav(content: bytes) -> dict:
    import io
    import wave

    with wave.open(io.BytesIO(content)) as w:
        return {
            "channels": w.getnchannels(),
            "sample_width": w.getsampwidth(),
            "sample_rate": w.getframerate(),
            "payload": w.readframes(w.getnframes()),
        }


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(payload: bytes, width: int = 1) -> bytes:
    """Grayscale 8-bit PNG whose pixel bytes ARE the payload (width
    must divide the length; the default width-1 column image preserves
    any length exactly). Rows cycle through all five PNG filter types
    so a decoder must implement real unfiltering, not just filter 0."""
    import struct
    import zlib

    n = len(payload)
    if n == 0 or n % width:
        raise ValueError("payload length must be a positive multiple of width")
    height = n // width
    raw = bytearray()
    prev = bytes(width)
    for r in range(height):
        row = payload[r * width : (r + 1) * width]
        ft = r % 5
        raw.append(ft)
        if ft == 0:
            raw += row
        elif ft == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - 1] if i else 0)) & 0xFF for i in range(width)
            )
        elif ft == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(width))
        elif ft == 3:  # Average
            raw += bytes(
                (row[i] - (((row[i - 1] if i else 0) + prev[i]) >> 1)) & 0xFF
                for i in range(width)
            )
        else:  # Paeth
            raw += bytes(
                (
                    row[i]
                    - _paeth(row[i - 1] if i else 0, prev[i], prev[i - 1] if i else 0)
                )
                & 0xFF
                for i in range(width)
            )
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(content: bytes) -> dict:
    """Chunk walk (CRC-verified) → IDAT inflate → per-row unfilter
    (None/Sub/Up/Average/Paeth) for 8-bit grayscale."""
    import struct
    import zlib

    if content[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, dims = 8, b"", None
    while pos + 12 <= len(content):
        (ln,) = struct.unpack(">I", content[pos : pos + 4])
        tag = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", content[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", data)
            if (depth, ctype, comp, filt, inter) != (8, 0, 0, 0, 0):
                raise NotImplementedError("only 8-bit grayscale, no interlace")
            dims = (w, h)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if dims is None:
        raise ValueError("missing IHDR")
    w, h = dims
    raw = zlib.decompress(idat)
    stride = w + 1
    if len(raw) != h * stride:
        raise ValueError("IDAT size mismatch")
    out = bytearray()
    prev = bytes(w)
    for r in range(h):
        ft = raw[r * stride]
        line = bytearray(raw[r * stride + 1 : (r + 1) * stride])
        for i in range(w):
            a = line[i - 1] if i else 0  # reconstructed left neighbor
            b, c = prev[i], (prev[i - 1] if i else 0)
            if ft == 1:
                line[i] = (line[i] + a) & 0xFF
            elif ft == 2:
                line[i] = (line[i] + b) & 0xFF
            elif ft == 3:
                line[i] = (line[i] + (a + b) // 2) & 0xFF
            elif ft == 4:
                line[i] = (line[i] + _paeth(a, b, c)) & 0xFF
            elif ft != 0:
                raise ValueError(f"bad filter type {ft}")
        out += line
        prev = bytes(line)
    return {"width": w, "height": h, "payload": bytes(out)}


AVI_FRAME_BYTES = 256


def encode_avi(payload: bytes, frame_bytes: int = AVI_FRAME_BYTES) -> bytes:
    """Minimal RIFF/AVI container whose '00db' (uncompressed DIB) frame
    chunks carry the payload split into fixed-size frames (last frame
    short). Structure: RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh
    strf)) LIST('movi' 00db…)) with spec-correct chunk sizes and
    even-byte padding — a real demuxer can walk it."""
    import struct

    n = len(payload)
    if n == 0:
        raise ValueError("empty payload")
    frames = [payload[i : i + frame_bytes] for i in range(0, n, frame_bytes)]

    def chunk(tag: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return tag + struct.pack("<I", len(data)) + data + pad

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    avih = struct.pack(
        "<14I", 40_000, 0, 0, 0x10, len(frames), 0, 1, 0, frame_bytes, 1, 0, 0, 0, 0
    )
    strh = struct.pack("<4s4sI2H8I4i", b"vids", b"DIB ", 0, 0, 0, 0, 1, 25,
                       0, len(frames), frame_bytes, 0, 0, 0, 0, 0, 0)
    strf = struct.pack("<I2i2H6I", 40, frame_bytes, 1, 1, 8, 0, frame_bytes, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", f) for f in frames))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def decode_avi(content: bytes) -> dict:
    """RIFF walk: verify the RIFF/'AVI ' signature, locate the 'movi'
    LIST, iterate its '00db'/'00dc' frame chunks (honoring even-byte
    padding), return the frames and the re-joined payload."""
    import struct

    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI")
    (riff_len,) = struct.unpack("<I", content[4:8])
    if riff_len + 8 != len(content):
        raise ValueError("RIFF size mismatch")
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            tag = content[pos : pos + 4]
            (ln,) = struct.unpack("<I", content[pos + 4 : pos + 8])
            data_at = pos + 8
            if tag == b"LIST":
                kind = content[data_at : data_at + 4]
                if kind in (b"movi", b"hdrl", b"strl", b"rec "):
                    walk(data_at + 4, data_at + ln)
            elif tag in (b"00db", b"00dc"):
                frames.append(content[data_at : data_at + ln])
            pos = data_at + ln + (ln % 2)

    walk(12, len(content))
    if not frames:
        raise ValueError("no frame chunks found")
    return {"n_frames": len(frames), "frames": frames, "payload": b"".join(frames)}


def _decode_av(content: bytes, media_type: str) -> dict:
    """Compressed-codec decode via PyAV (ffmpeg bindings), when installed.

    Executor-side import (this runs inside mapInPandas workers): jpeg
    decodes to one RGB frame, mp3 to PCM samples, mp4/h264 to demuxed
    video frames — the same dict shape as the stdlib decoders so the
    feature extraction downstream is codec-agnostic."""
    import io

    import av  # noqa: F401 — optional extra, ImportError handled by caller

    with av.open(io.BytesIO(content)) as container:
        if media_type in ("image/jpeg", "image/png"):
            frame = next(container.decode(video=0))
            arr = frame.to_ndarray(format="rgb24")
            return {
                "width": int(frame.width),
                "height": int(frame.height),
                "pixels": arr.tobytes(),
                "payload": arr.tobytes(),
            }
        if media_type in ("audio/mp3", "audio/mpeg", "audio/wav"):
            chunks = [f.to_ndarray().tobytes() for f in container.decode(audio=0)]
            payload = b"".join(chunks)
            st = container.streams.audio[0]
            return {
                "sample_rate": int(st.rate or 0),
                "n_channels": int(len(st.layout.channels) if st.layout else 1),
                "payload": payload,
            }
        # video containers (mp4/h264/avi): demux + decode frames
        frames = [
            f.to_ndarray(format="rgb24").tobytes()
            for f in container.decode(video=0)
        ]
        return {
            "n_frames": len(frames),
            "frames": frames,
            "payload": b"".join(frames),
        }


def decode_real(content: bytes, media_type: str) -> dict:
    """Real decode for the stdlib-decodable formats. AVI gets a real
    container DEMUX (frame chunks out of the RIFF tree). *Compressed*
    codecs (h264/jpeg/mp3) route to PyAV when the optional extra is
    importable; the stdlib path stays the hermetic default so the engine
    has zero non-stdlib decode dependencies in CI containers."""
    if media_type == "audio/wav":
        return decode_wav(content)
    if media_type == "image/png":
        return decode_png(content)
    if media_type == "video/avi":
        return decode_avi(content)
    try:
        return _decode_av(content, media_type)
    except ImportError:
        raise NotImplementedError(
            "compressed codecs need the optional PyAV extra (pip install av); "
            "stdlib formats (wav/png/avi) decode without it"
        )


def _stripe_features(payload: bytes) -> list[float]:
    """Deterministic stripe features: mean of each of FEATURE_DIM
    fixed-size byte stripes. Since r05 this is fed by REAL decoded
    samples/pixels (decode_real); it stands in for a learned feature
    extractor, not for the decode."""
    n = max(1, len(payload))
    stripe = max(1, n // FEATURE_DIM)
    out = []
    for i in range(FEATURE_DIM):
        chunk = payload[i * stripe : (i + 1) * stripe] or b"\x00"
        out.append(float(sum(chunk)) / float(len(chunk)))
    return out


# The remaining STUB seam: compressed codecs without the optional PyAV
# extra fall back to stripe features over the raw container bytes.
_fake_decode = _stripe_features


def extract_features(media: DataFrame) -> DataFrame:
    """REAL-decode feature extraction over an attach_media table
    (doc_id, media_type, content): wav/png/avi containers decode via
    decode_real (stdlib codecs — PCM samples, unfiltered pixels,
    demuxed frames) and the stripe features are computed over the
    DECODED payload; width/height are the decoded image dims (0 for
    non-image media). Compressed codecs without PyAV fall back to
    `_fake_decode` over the container bytes — the marked stub seam."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {k: [] for k in
                                    ("doc_id", "media_type", "payload_len",
                                     "checksum", "width", "height", "features")}
            for doc_id, mt, content in zip(
                pdf["doc_id"], pdf["media_type"], pdf["content"]
            ):
                content = bytes(content)
                try:
                    d = decode_real(content, mt)
                    payload = d["payload"]
                    w, h = int(d.get("width", 0)), int(d.get("height", 0))
                except NotImplementedError:
                    payload, w, h = content, 0, 0  # compressed-codec seam
                out["doc_id"].append(doc_id)
                out["media_type"].append(mt)
                out["payload_len"].append(len(payload))
                out["checksum"].append(sum(payload) % MOD)
                out["width"].append(w)
                out["height"].append(h)
                out["features"].append(_stripe_features(payload))
            yield pd.DataFrame(
                {
                    k: (pd.Series(v, dtype="int64")
                        if k in ("doc_id", "payload_len", "checksum",
                                 "width", "height")
                        else v)
                    for k, v in out.items()
                }
            )

    return media.mapInPandas(batches, schema=_FEATURES_SCHEMA)


FRAME_STRIDE = 5

_FRAMES_SCHEMA = (
    "doc_id long, n_frames long, frame_idx long, frame_len long, frame_checksum long"
)


def sample_frames(media: DataFrame, stride: int = FRAME_STRIDE) -> DataFrame:
    """Frame sampling over REAL demuxed video: every `stride`-th frame
    chunk the RIFF/AVI walk (decode_avi) produces, one row per sampled
    frame — n_frames and frame bytes come from the container, not a
    declared metadata stub. The pipeline shape is what a video
    preprocessor needs at scale: metadata filter (JVM-side, prunes the
    scan to video rows), mapInPandas over Arrow batches, long-form
    scalar output. Decode parallelism follows partition count, so heavy
    video scans should be repartitioned by size first (see module
    docstring)."""
    video = media.where(F.col("media_type") == "video/avi")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {k: [] for k in
                                    ("doc_id", "n_frames", "frame_idx",
                                     "frame_len", "frame_checksum")}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                frames = decode_avi(bytes(content))["frames"]
                nf = len(frames)
                for i in range(0, nf, stride):
                    out["doc_id"].append(doc_id)
                    out["n_frames"].append(nf)
                    out["frame_idx"].append(i)
                    out["frame_len"].append(len(frames[i]))
                    out["frame_checksum"].append(sum(frames[i]) % MOD)
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in out.items()}
            )

    return video.mapInPandas(batches, schema=_FRAMES_SCHEMA)


RESIZE_W = 8
RESIZE_H = 6

_RESIZE_SCHEMA = (
    "doc_id long, width long, height long, out_w long, out_h long, "
    "n_sampled long, resized_checksum long"
)


def resize_images(
    media: DataFrame, out_w: int = RESIZE_W, out_h: int = RESIZE_H
) -> DataFrame:
    """Image resize over REAL decoded pixels: the PNG decodes through
    the full chunk walk + unfilter (decode_png), then a nearest-neighbor
    downsample taps evenly-spaced DECODED pixels into a fixed
    out_w × out_h grid — the data movement of a vision-model
    preprocessor (decode → resample → fixed-size output), with the
    metadata filter pruning the scan JVM-side before any Python."""
    images = media.where(F.col("media_type") == "image/png")
    n_px = out_w * out_h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {k: [] for k in
                                    ("doc_id", "width", "height", "out_w",
                                     "out_h", "n_sampled", "resized_checksum")}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                d = decode_png(bytes(content))
                px = d["payload"]
                n = len(px)
                taps = [px[k * n // n_px] for k in range(n_px)] if n else []
                out["doc_id"].append(doc_id)
                out["width"].append(int(d["width"]))
                out["height"].append(int(d["height"]))
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                out["n_sampled"].append(len(taps))
                out["resized_checksum"].append(sum(taps) % MOD)
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in out.items()}
            )

    return images.mapInPandas(batches, schema=_RESIZE_SCHEMA)


PHASH_TAPS = 128
PHASH_BANDS = 4  # 32 bits each; pigeonhole needs max_hamming < PHASH_BANDS

_PHASH_SCHEMA = "doc_id long, payload_len long, bands array<long>"


def perceptual_hashes(media: DataFrame) -> DataFrame:
    """Perceptual hash (aHash) over REAL decoded PNG pixels: 128
    evenly-spaced taps of the decoded pixel buffer, mean-thresholded
    into a 128-bit signature carried as PHASH_BANDS × 32-bit band
    values — the image counterpart of text fingerprinting, and the
    blocking key for image near-dup (`phash_near_dup_pairs`).

    Integer-exact by construction (cross-engine oracle-safe): taps are
    pixel BYTES at positions k·n//128, and the threshold comparison is
    `128·tap_k > Σtaps` — no float mean. Empty images (no pixels) have
    no hash and are dropped, mirrored by the oracle's n > 0 predicate.

    Scale: one mapInPandas decode pass (Arrow batches, parallelism =
    partition count); band width must WIDEN with the corpus like every
    LSH key (dedup.SIMHASH_BITS lesson) — 32-bit bands give 2^32
    buckets per band, collapsing only for genuinely similar content."""
    images = media.where(F.col("media_type") == "image/png")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # dict built in exact schema order (mapInPandas matches
            # yielded columns POSITIONALLY)
            out: dict[str, list] = {"doc_id": [], "payload_len": [], "bands": []}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                px = decode_png(bytes(content))["payload"]
                n = len(px)
                if n == 0:
                    continue
                taps = [px[k * n // PHASH_TAPS] for k in range(PHASH_TAPS)]
                total = sum(taps)
                bands = []
                for b in range(PHASH_BANDS):
                    v = 0
                    for j in range(32):
                        if PHASH_TAPS * taps[32 * b + j] > total:
                            v |= 1 << j
                    bands.append(v)
                out["doc_id"].append(doc_id)
                out["payload_len"].append(n)
                out["bands"].append(bands)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "payload_len": pd.Series(out["payload_len"], dtype="int64"),
                    "bands": pd.Series(out["bands"], dtype="object"),
                }
            )

    return images.mapInPandas(batches, schema=_PHASH_SCHEMA)


def phash_near_dup_pairs(hashes: DataFrame, max_hamming: int = 2) -> DataFrame:
    """Image near-dup pairs by banded hamming join over perceptual
    hashes: hamming(a, b) ≤ max_hamming over 128 bits means at most
    max_hamming of the PHASH_BANDS band values differ, so (pigeonhole,
    max_hamming < PHASH_BANDS) at least one band is EXACTLY equal —
    candidates come from a band-value equi-join, never all-pairs, and
    the exact bit_count(xor) verify on the carried band arrays removes
    false positives. The same banded-LSH shape as simhash_pairs, keyed
    on pixel-space signatures instead of token hashes."""
    if max_hamming >= PHASH_BANDS:
        raise ValueError("pigeonhole requires max_hamming < PHASH_BANDS")
    posting = hashes.select(
        "doc_id", "bands", F.posexplode("bands").alias("band", "val")
    )
    a = posting.select(
        F.col("doc_id").alias("doc_a"), F.col("bands").alias("bands_a"), "band", "val"
    )
    b = posting.select(
        F.col("doc_id").alias("doc_b"), F.col("bands").alias("bands_b"), "band", "val"
    )
    cand = (
        a.join(b, ["band", "val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.aggregate(
        F.zip_with("bands_a", "bands_b", lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


_MEDIA_SCHEMA = "doc_id long, media_type string, content binary, raw binary"


def attach_media(docs: DataFrame) -> DataFrame:
    """Build a multimodal table with REAL containers: the utf-8 text
    payload wrapped as a genuine 8-bit-PCM WAV (doc_id%3==1), a
    CRC-valid grayscale PNG with cycling filter types (doc_id%3==0),
    or a RIFF/AVI whose frame chunks carry the payload (doc_id%3==2).
    `raw` carries the original payload so a decode query can assert
    the container roundtrip row by row. Encoding runs in mapInPandas
    (the encode side of a media pipeline is a Python-batch UDF too)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            media, content = [], []
            for doc_id, raw in zip(pdf["doc_id"], pdf["raw"]):
                m = int(doc_id) % 3
                if m == 0:
                    media.append("image/png")
                    content.append(encode_png(bytes(raw)))
                elif m == 1:
                    media.append("audio/wav")
                    content.append(encode_wav(bytes(raw)))
                else:
                    media.append("video/avi")
                    content.append(encode_avi(bytes(raw)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": media,
                    "content": content,
                    "raw": pdf["raw"],
                }
            )

    return docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("raw")
    ).mapInPandas(batches, schema=_MEDIA_SCHEMA)


_DECODE_SCHEMA = (
    "doc_id long, media_type string, container_len long, payload_len long, "
    "roundtrip_ok boolean, features array<double>"
)


def decode_features(media: DataFrame) -> DataFrame:
    """Decode REAL containers (decode_real: stdlib WAV/PNG/AVI-demux)
    and extract the stripe-mean features from the DECODED payload.
    `roundtrip_ok` compares the decoded bytes against the carried
    original payload — the per-row proof that the codec path is real,
    and trivially oracle-checkable (all true, features computable from
    the text bytes)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {
                k: []
                for k in (
                    "doc_id", "media_type", "container_len", "payload_len",
                    "roundtrip_ok", "features",
                )
            }
            for doc_id, mt, content, raw in zip(
                pdf["doc_id"], pdf["media_type"], pdf["content"], pdf["raw"]
            ):
                content, raw = bytes(content), bytes(raw)
                payload = decode_real(content, mt)["payload"]
                rows["doc_id"].append(doc_id)
                rows["media_type"].append(mt)
                rows["container_len"].append(len(content))
                rows["payload_len"].append(len(payload))
                rows["roundtrip_ok"].append(payload == raw)
                rows["features"].append(_stripe_features(payload))
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, schema=_DECODE_SCHEMA)


def features_long(feats: DataFrame) -> DataFrame:
    """Long-form view: posexplode the feature vector into scalar
    (feature_idx, feature_value) rows.

    This is the canonical exchange format for downstream relational
    consumers (and the driver's correctness gate, whose canonicalizer
    sorts rows by every column — array columns are unsortable there):
    scalar rows survive any engine boundary, and at scale the explode
    is a narrow map (no shuffle)."""
    return feats.select(
        "doc_id",
        "media_type",
        "payload_len",
        "checksum",
        "width",
        "height",
        F.posexplode("features").alias("feature_idx", "feature_value"),
    ).withColumn("feature_idx", F.col("feature_idx").cast("long"))


# --- audio frame features (energy + zero crossings) -------------------------

AUDIO_FRAME = 400  # samples per analysis frame (50 ms at 8 kHz)


def audio_frame_features(media: DataFrame, frame: int = AUDIO_FRAME) -> DataFrame:
    """(doc_id, frame, energy, zero_crossings, n_samples): classic
    voice-activity / energy-gating features per fixed PCM frame, after
    per-doc DC-offset removal (center = floor of the doc's sample
    mean — the standard first step, and load-bearing here: a fixed 128
    center never fires zero crossings on this corpus because every
    ASCII sample sits below it) — energy = Σ (s−c)², zero crossings =
    strict sign flips between CONSECUTIVE centered samples within the
    frame (frame-local; zero samples never count). Pure integer math
    (the center is an exact floor-div), so the kernel is exact.

    The Spark side decodes the REAL WAV container (stdlib wave, the
    X54 path); the DuckDB oracle never parses WAV — the synthetic
    payload IS the utf-8 text (attach_media), so the oracle recomputes
    samples via ascii() directly. The hash compare therefore re-proves
    the container roundtrip on every gate run, row by row."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "frame": [], "energy": [],
                   "zero_crossings": [], "n_samples": []}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                payload = decode_wav(bytes(content))["payload"]
                raw = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                s = raw - int(raw.sum()) // len(raw)
                for f0 in range(0, len(s), frame):
                    seg = s[f0 : f0 + frame]
                    out["doc_id"].append(int(doc_id))
                    out["frame"].append(f0 // frame)
                    out["energy"].append(int((seg * seg).sum()))
                    out["zero_crossings"].append(
                        int((seg[:-1] * seg[1:] < 0).sum())
                    )
                    out["n_samples"].append(len(seg))
            yield pd.DataFrame(out)

    return media.where(F.col("media_type") == "audio/wav").mapInPandas(
        batches,
        schema="doc_id long, frame long, energy long, "
        "zero_crossings long, n_samples long",
    )


def sql_audio_frame_features(
    table: str = "documents", frame: int = AUDIO_FRAME
) -> str:
    """Oracle via the generative identity (payload == utf-8 text, all
    ASCII in the synthetic corpus): samples from ascii(), the same
    frame math in SQL."""
    return f"""
WITH audio AS (SELECT doc_id, text FROM {table} WHERE doc_id % 3 = 1),
raw AS (
    SELECT doc_id, g.i - 1 AS pos,
           ascii(substr(text, CAST(g.i AS INTEGER), 1)) AS b
    FROM audio, unnest(generate_series(1, length(text))) AS g(i)
),
ctr AS (SELECT doc_id, sum(b) // count(*) AS c FROM raw GROUP BY 1),
samp AS (
    SELECT r.doc_id, r.pos, r.b - t.c AS s
    FROM raw r JOIN ctr t ON t.doc_id = r.doc_id
),
fr AS (
    SELECT doc_id, pos // {frame} AS frame, s, pos % {frame} AS off,
           lead(s) OVER (PARTITION BY doc_id ORDER BY pos) AS s2
    FROM samp
)
SELECT doc_id, CAST(frame AS BIGINT) AS frame,
       CAST(sum(s * s) AS BIGINT) AS energy,
       CAST(sum(CASE WHEN off < {frame - 1} AND s2 IS NOT NULL
                     AND s * s2 < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS zero_crossings,
       CAST(count(*) AS BIGINT) AS n_samples
FROM fr GROUP BY doc_id, frame
"""
