"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched pandas UDFs (``mapInPandas``).

The general image/audio decode libraries are not in this container, so
the generic decode step is STUBBED (``decode_image`` raises
``NotImplementedError`` for non-PNG; a deterministic fake stands in for
tests/bench) — but two codecs are REAL end to end: PNG (pure stdlib
zlib/struct, below) and int16-LE PCM audio (numpy byte packing, bottom
of this module). Everything Spark-side — schema, batch iteration,
partitioning, UDF signatures — is real: swapping the fake for
PIL/torchaudio is a one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BINARY_FEATURE_SCHEMA = "doc_id long, n_bytes long, checksum string, head_byte long"
FAKE_IMAGE_SCHEMA = ("doc_id long, width long, height long, n_channels long, "
                     "n_frames long")


def with_binary_payload(df: DataFrame, text_col: str = "text",
                        payload_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary column (stand-in for image/audio
    bytes) + its media-type metadata."""
    return df.withColumn(payload_col, F.encode(F.col(text_col), "UTF-8")) \
             .withColumn("media_type", F.lit("application/octet-stream"))


def extract_binary_features(df: DataFrame, id_col: str = "doc_id",
                            payload_col: str = "payload") -> DataFrame:
    """Byte-level features over binary payloads with JVM built-ins —
    length, md5 checksum, and first byte are all native Spark functions,
    so this stays inside whole-stage codegen (no Arrow round-trip; the
    Python-boundary pattern a real decoder needs lives in
    ``fake_decode_images``/``fake_sample_frames``, where Python is
    genuinely required)."""
    pc = F.col(payload_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.octet_length(pc).cast("long").alias("n_bytes"),
        F.md5(pc).alias("checksum"),
        # first BYTE of the payload (−1 when empty): substring works on
        # binary and returns a 1-byte slice; hex→conv turns it into its
        # integer value without any string/charset round-trip
        F.when(F.octet_length(pc) > 0,
               F.conv(F.hex(F.substring(pc, 1, 1)), 16, 10).cast("long"))
        .otherwise(F.lit(-1).cast("long")).alias("head_byte"),
    )


def decode_image(payload: bytes):
    """Image decode dispatch: PNG decodes for real (pure stdlib — see
    ``decode_png``); other formats require PIL/opencv, absent in this
    container."""
    if payload[:8] == PNG_SIGNATURE:
        return decode_png(payload)
    raise NotImplementedError(
        "non-PNG image decode requires PIL/opencv; use fake_decode_images "
        "for the pipeline plumbing"
    )


# ---------------------------------------------------------------------------
# Real PNG codec, pure stdlib (zlib + struct): encoder exercises all five
# scanline filter types, decoder parses chunks, inflates, and unfilters.
# A wrong unfilter breaks the decoded pixel sum, so the oracle-checked
# pixel_sum proves the decode end to end.
# ---------------------------------------------------------------------------

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_line(ftype: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    out = bytearray(len(line))
    for j, x in enumerate(line):
        a = line[j - bpp] if j >= bpp else 0
        b = prev[j]
        c = prev[j - bpp] if j >= bpp else 0
        if ftype == 0:
            out[j] = x
        elif ftype == 1:
            out[j] = (x - a) & 0xFF
        elif ftype == 2:
            out[j] = (x - b) & 0xFF
        elif ftype == 3:
            out[j] = (x - (a + b) // 2) & 0xFF
        else:
            out[j] = (x - _paeth(a, b, c)) & 0xFF
    return bytes(out)


def _unfilter_line(ftype: int, filt: bytes, prev: bytes, bpp: int) -> bytes:
    out = bytearray(len(filt))
    for j, f in enumerate(filt):
        a = out[j - bpp] if j >= bpp else 0
        b = prev[j]
        c = prev[j - bpp] if j >= bpp else 0
        if ftype == 0:
            out[j] = f
        elif ftype == 1:
            out[j] = (f + a) & 0xFF
        elif ftype == 2:
            out[j] = (f + b) & 0xFF
        elif ftype == 3:
            out[j] = (f + (a + b) // 2) & 0xFF
        elif ftype == 4:
            out[j] = (f + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    return bytes(out)


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode_png_scalar(seed: int, width: int, height: int) -> bytes:
    """Reference scalar encoder (byte-for-byte what ``encode_png``'s
    vectorized path must produce; kept for the equivalence test)."""
    bpr = 3 * width
    prev = bytes(bpr)
    lines = []
    for r in range(height):
        base = seed + bpr * r
        line = bytes((base + j) & 0xFF for j in range(bpr))
        ftype = r % 5
        lines.append(bytes([ftype]) + _filter_line(ftype, line, prev, 3))
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (PNG_SIGNATURE + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + _png_chunk(b"IEND", b""))


def encode_png(seed: int, width: int, height: int) -> bytes:
    """Deterministic 8-bit RGB PNG: pixel byte ``i`` (scanline order) is
    ``(seed + i) % 256``; each scanline uses filter type ``row % 5`` so a
    decoder must implement the full None/Sub/Up/Average/Paeth set.

    Filtering is numpy-vectorized (encode filters read only RAW
    neighbors, so there is no loop-carried dependency — unlike decode);
    asserted byte-identical to ``encode_png_scalar`` in tests."""
    import numpy as np

    bpr = 3 * width
    idx = np.arange(height * bpr, dtype=np.int64)
    pix = ((seed + idx) & 0xFF).reshape(height, bpr).astype(np.int16)
    a = np.zeros_like(pix)
    a[:, 3:] = pix[:, :-3]            # left neighbor (bpp=3)
    b = np.zeros_like(pix)
    b[1:, :] = pix[:-1, :]            # up neighbor
    c = np.zeros_like(pix)
    c[1:, 3:] = pix[:-1, :-3]         # up-left neighbor
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    paeth = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    ftypes = (np.arange(height) % 5)[:, None]
    pred = np.select(
        [ftypes == 0, ftypes == 1, ftypes == 2, ftypes == 3],
        [np.zeros_like(pix), a, b, (a + b) // 2], default=paeth)
    out = np.empty((height, bpr + 1), dtype=np.uint8)
    out[:, 0] = (np.arange(height) % 5).astype(np.uint8)
    out[:, 1:] = ((pix - pred) & 0xFF).astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (PNG_SIGNATURE + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(out.tobytes()))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> dict:
    """Parse IHDR, inflate the concatenated IDAT stream, undo per-scanline
    filtering, and return image metadata + the raw pixel byte sum (the
    value the DuckDB oracle reproduces in closed form)."""
    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        if pos + 12 + length > len(payload):
            # explicit bound BEFORE slicing: a short CRC slice would
            # otherwise surface as raw struct.error, breaking the
            # typed ValueError/NotImplementedError fuzz contract
            raise ValueError("truncated chunk")
        data = payload[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length:pos + 12 + length])
        if crc != zlib.crc32(tag + data) & 0xFFFFFFFF:
            raise ValueError(f"bad CRC on {tag!r} chunk")
        if tag == b"IHDR":
            if len(data) != 13:
                raise ValueError("bad IHDR length")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    width, height, bit_depth, color_type, _, _, interlace = ihdr
    if bit_depth != 8 or color_type != 2 or interlace != 0:
        raise NotImplementedError(
            "decoder supports 8-bit truecolor non-interlaced PNG")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt IDAT stream: {exc}") from exc
    bpr = 3 * width
    if len(raw) != height * (bpr + 1):
        raise ValueError("IDAT length does not match dimensions")
    import numpy as np
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, bpr + 1)
    prev = np.zeros(bpr, dtype=np.uint8)
    total = 0
    for r in range(height):
        ftype = int(rows[r, 0])
        filt = rows[r, 1:]
        # None/Up have no intra-line dependency — vectorize; Sub/Avg/
        # Paeth feed on the byte just produced, so they stay scalar
        if ftype == 0:
            line = filt.copy()
        elif ftype == 2:
            line = ((filt.astype(np.int16) + prev) & 0xFF).astype(np.uint8)
        else:
            line = np.frombuffer(
                _unfilter_line(ftype, filt.tobytes(), prev.tobytes(), 3),
                dtype=np.uint8)
        total += int(line.sum())
        prev = line
    return {"width": width, "height": height, "bit_depth": bit_depth,
            "color_type": color_type, "n_pixel_bytes": bpr * height,
            "pixel_sum": total}


def with_png_payload(df: DataFrame, id_col: str = "doc_id",
                     payload_col: str = "payload") -> DataFrame:
    """Attach a deterministic PNG per row (dims and seed derived from the
    id, so an SQL oracle knows them without decoding): width = 4 + id%13,
    height = 4 + id%11, seed = id%256. Arrow-batched — the same
    bytes-out-of-Python shape a real thumbnailer/renderer has."""
    cols = df.select(id_col)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col]
            yield pd.DataFrame({
                "doc_id": ids,
                payload_col: [
                    encode_png(int(i) % 256, 4 + int(i) % 13,
                               4 + int(i) % 11)
                    for i in ids
                ],
            })

    return cols.mapInPandas(op, schema=f"doc_id long, {payload_col} binary")


PNG_DECODE_SCHEMA = ("doc_id long, width long, height long, bit_depth long, "
                     "color_type long, n_pixel_bytes long, pixel_sum long")


def decode_pngs(df: DataFrame, id_col: str = "doc_id",
                payload_col: str = "payload") -> DataFrame:
    """Arrow-batched REAL image decode (bytes in, typed metadata out) —
    the exact pipeline shape a PIL/opencv decoder plugs into, with the
    stdlib PNG codec doing genuine chunk-parse/inflate/unfilter work."""
    cols = df.select(id_col, payload_col)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_png(bytes(b)) for b in pdf[payload_col]]
            out = pd.DataFrame(decoded or None,
                               columns=["width", "height", "bit_depth",
                                        "color_type", "n_pixel_bytes",
                                        "pixel_sum"])
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out.astype("int64")

    return cols.mapInPandas(op, schema=PNG_DECODE_SCHEMA)


def decode_png_tile_sums(payload: bytes, grid: int = 2) -> list:
    """REAL decode + spatial TILING: unfilter the PNG (same path as
    ``decode_png``) and accumulate per-tile pixel-byte sums on a
    ``grid``×``grid`` split with integer boundaries (row band
    ``[h·t//g, h·(t+1)//g)``, pixel-column band ``[w·t//g, w·(t+1)//g)``)
    — the crop/tile preprocessing step of a vision-training pipeline,
    memory-light (one scanline live at a time, g² running sums)."""
    import numpy as np

    meta = None
    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        if pos + 12 + length > len(payload):
            # explicit bound BEFORE slicing: a short CRC slice would
            # otherwise surface as raw struct.error, breaking the
            # typed ValueError/NotImplementedError fuzz contract
            raise ValueError("truncated chunk")
        data = payload[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length:pos + 12 + length])
        if crc != zlib.crc32(tag + data) & 0xFFFFFFFF:
            raise ValueError(f"bad CRC on {tag!r} chunk")
        if tag == b"IHDR":
            if len(data) != 13:
                raise ValueError("bad IHDR length")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    width, height, bit_depth, color_type, _, _, interlace = ihdr
    if bit_depth != 8 or color_type != 2 or interlace != 0:
        raise NotImplementedError(
            "decoder supports 8-bit truecolor non-interlaced PNG")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt IDAT stream: {exc}") from exc
    bpr = 3 * width
    if len(raw) != height * (bpr + 1):
        raise ValueError("IDAT length does not match dimensions")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, bpr + 1)
    xb = [3 * (width * t // grid) for t in range(grid + 1)]
    yb = [height * t // grid for t in range(grid + 1)]
    sums = [[0] * grid for _ in range(grid)]
    prev = np.zeros(bpr, dtype=np.uint8)
    tr = 0
    for r in range(height):
        ftype = int(rows[r, 0])
        filt = rows[r, 1:]
        if ftype == 0:
            line = filt.copy()
        elif ftype == 2:
            line = ((filt.astype(np.int16) + prev) & 0xFF).astype(np.uint8)
        else:
            line = np.frombuffer(
                _unfilter_line(ftype, filt.tobytes(), prev.tobytes(), 3),
                dtype=np.uint8)
        while r >= yb[tr + 1]:
            tr += 1
        for tc in range(grid):
            sums[tr][tc] += int(line[xb[tc]:xb[tc + 1]].sum())
        prev = line
    meta = []
    for trr in range(grid):
        for tcc in range(grid):
            meta.append({
                "tile_row": trr, "tile_col": tcc,
                "tile_w": width * (tcc + 1) // grid - width * tcc // grid,
                "tile_h": height * (trr + 1) // grid - height * trr // grid,
                "tile_pixel_sum": sums[trr][tcc],
            })
    return meta


PNG_TILE_SCHEMA = ("doc_id long, tile_row long, tile_col long, "
                   "tile_w long, tile_h long, tile_pixel_sum long")


def decode_png_tiles(df: DataFrame, grid: int = 2, id_col: str = "doc_id",
                     payload_col: str = "payload") -> DataFrame:
    """Arrow-batched decode+tile: one input row fans out to ``grid``²
    tile rows — the standard vision-pipeline crop stage, running the
    REAL stdlib PNG codec per payload (see ``decode_png_tile_sums``)."""
    cols = df.select(id_col, payload_col)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                for t in decode_png_tile_sums(bytes(b), grid):
                    recs.append({"doc_id": int(i), **t})
            yield pd.DataFrame(
                recs or None,
                columns=["doc_id", "tile_row", "tile_col",
                         "tile_w", "tile_h", "tile_pixel_sum"]
            ).astype("int64")

    return cols.mapInPandas(op, schema=PNG_TILE_SCHEMA)


def image_ahash(tiles: DataFrame, grid: int = 4,
                id_col: str = "doc_id") -> DataFrame:
    """Perceptual AVERAGE-HASH over decoded tile sums (the classic
    aHash: downscale to a grid of block means, one bit per block set
    iff that block is brighter than the image mean) — the image-side
    near-duplicate fingerprint of a vision-training pipeline. Runs on
    :func:`decode_png_tiles` output, so the grid means come from the
    REAL decode. All arithmetic is exact BIGINT: the mean comparison
    cross-multiplies (``tile_sum · total_bytes > total_sum ·
    tile_bytes``) instead of dividing, so there is no float anywhere
    and the hash is deterministic across engines/partitionings.

    Scale shape: one window + one hash agg, both partitioned by the
    image id (never a single-partition window); output is one
    ``grid²``-bit BIGINT per image. grid=8 gives the production 64-bit
    aHash; the 4-16 px synthetic gate images use grid=4 (16 bits).
    Reference analogue: none (attachments are opaque bytes there)."""
    from pyspark.sql import Window

    if grid * grid > 64:
        raise ValueError("image_ahash: grid² must fit one BIGINT "
                         f"(grid={grid} → {grid * grid} bits; max 64)")
    w = Window.partitionBy(id_col)
    tb = (F.col("tile_w") * F.col("tile_h") * F.lit(3)).cast("long")
    t = (tiles.withColumn("_tb", tb)
         .withColumn("_tots", F.sum("tile_pixel_sum").over(w))
         .withColumn("_totb", F.sum("_tb").over(w)))
    bit = (F.col("tile_pixel_sum") * F.col("_totb")
           > F.col("_tots") * F.col("_tb")).cast("long")
    idx = (F.col("tile_row") * grid + F.col("tile_col")).cast("int")
    # SQL-form shiftleft (the Python helper only takes a literal
    # shift); the hash assembles via bit_or, NOT sum — identical for
    # distinct bit positions, but a sum would trip ANSI overflow on
    # bit 63 (shiftleft(1, 63) is Long.MIN_VALUE), which is exactly
    # the production grid=8 64-bit configuration
    return (t.select(F.col(id_col), bit.alias("_bit"), idx.alias("_idx"))
            .selectExpr(id_col, "shiftleft(_bit, _idx) AS _b")
            .groupBy(id_col)
            .agg(F.bit_or("_b").cast("long").alias("ahash")))


def fake_decode_images(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload") -> DataFrame:
    """Deterministic stand-in decode: derives plausible (width, height,
    channels, frames) from the payload bytes. Exercises the full
    mapInPandas pipeline shape of a real decoder."""
    cols = df.select(id_col, payload_col)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf[payload_col].map(
                lambda b: hashlib.md5(bytes(b)).digest())
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "width": digests.map(lambda d: 64 + d[0] % 192).astype("int64"),
                "height": digests.map(lambda d: 64 + d[1] % 192).astype("int64"),
                "n_channels": digests.map(lambda d: 1 + d[2] % 3).astype("int64"),
                "n_frames": digests.map(lambda d: 1 + d[3] % 16).astype("int64"),
            })

    return cols.mapInPandas(op, schema=FAKE_IMAGE_SCHEMA)


FRAME_SAMPLE_SCHEMA = ("doc_id long, frame_idx long, n_frames long, "
                       "frame_checksum string")


def fake_sample_frames(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload",
                       max_frames: int = 4) -> DataFrame:
    """Video-style frame sampling: ONE input row fans out to ≤
    ``max_frames`` evenly-strided frame rows — the row-multiplying
    mapInPandas shape every real frame sampler has (decode replaced by
    the deterministic fake: n_frames from the payload digest, per-frame
    checksum of payload + frame index).

    At scale this shape matters more than the decode: the output is
    k× the input row count, so it must stream through Arrow batches —
    never collect, never explode a driver-built list."""
    cols = df.select(id_col, payload_col)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_n, out_ck = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                n_frames = 1 + hashlib.md5(b).digest()[3] % 16
                stride = (n_frames + max_frames - 1) // max_frames
                for idx in range(0, n_frames, stride):
                    out_id.append(doc_id)
                    out_idx.append(idx)
                    out_n.append(n_frames)
                    out_ck.append(hashlib.md5(
                        b + b"#" + str(idx).encode()).hexdigest())
            yield pd.DataFrame({
                "doc_id": out_id, "frame_idx": out_idx,
                "n_frames": out_n, "frame_checksum": out_ck,
            })

    return cols.mapInPandas(op, schema=FRAME_SAMPLE_SCHEMA)


# ---------------------------------------------------------------------------
# Real VIDEO path (r13): a deterministic multi-frame container of real
# PNGs ("MPNG": magic + frame count, then length-prefixed PNG frames),
# so frame SAMPLING — the stride-decode stage of a video-training
# pipeline — runs the real codec per sampled frame and every pixel sum
# is closed-form predictable for the SQL oracle. The container stands
# in for mp4/mkv (no ffmpeg in this environment); the parse/validate/
# stride/decode plumbing is the real shape.
# ---------------------------------------------------------------------------

VIDEO_MAGIC = b"MPNG"
VIDEO_MAX_FRAMES = 65536


def encode_video(doc_id: int) -> bytes:
    """Deterministic per-id video: ``2 + id % 5`` frames of constant
    dims (the PNG generator's 4+id%13 × 4+id%11), frame ``f`` seeded
    ``(id + 17·f) % 256`` so consecutive frames differ but remain
    closed-form. Layout: magic, u32be frame count, then per frame a
    u32be length + the PNG bytes."""
    import struct

    w, h = 4 + doc_id % 13, 4 + doc_id % 11
    n = 2 + doc_id % 5
    frames = [encode_png((doc_id + 17 * f) % 256, w, h)
              for f in range(n)]
    return (VIDEO_MAGIC + struct.pack(">I", n)
            + b"".join(struct.pack(">I", len(p)) + p for p in frames))


def decode_video_frames(payload: bytes, stride: int = 1) -> list:
    """Parse the MPNG container and REALLY decode every ``stride``-th
    frame (chunk walk, CRC, inflate, unfilter — the full PNG path).
    Every offset is bounds-checked before use and the frame count is
    capped, so truncated/hostile containers raise typed ValueErrors
    instead of overallocating or slicing garbage (the decoder-fuzz
    contract shared with the PNG and PCM codecs)."""
    import struct

    if stride < 1:
        raise ValueError(f"decode_video_frames: stride {stride} < 1")
    if payload[:4] != VIDEO_MAGIC:
        raise ValueError("decode_video_frames: bad container magic")
    if len(payload) < 8:
        raise ValueError("decode_video_frames: truncated header")
    (n,) = struct.unpack(">I", payload[4:8])
    if n > VIDEO_MAX_FRAMES:
        raise ValueError(
            f"decode_video_frames: frame count {n} exceeds cap "
            f"{VIDEO_MAX_FRAMES}")
    out, off = [], 8
    for f in range(n):
        if off + 4 > len(payload):
            raise ValueError(
                f"decode_video_frames: truncated at frame {f} header")
        (ln,) = struct.unpack(">I", payload[off:off + 4])
        off += 4
        if ln > len(payload) - off:
            raise ValueError(
                f"decode_video_frames: frame {f} claims {ln} bytes, "
                f"{len(payload) - off} remain")
        if f % stride == 0:
            d = decode_png(payload[off:off + ln])
            out.append({"frame_idx": f, "n_frames": n,
                        "width": d["width"], "height": d["height"],
                        "pixel_sum": d["pixel_sum"]})
        off += ln
    if off != len(payload):
        raise ValueError(
            f"decode_video_frames: {len(payload) - off} trailing bytes")
    return out


def with_video_payload(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload") -> DataFrame:
    """Attach a deterministic MPNG video per row (Arrow-batched; the
    oracle knows every frame's dims/seed from the id alone)."""
    cols = df.select(id_col)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col]
            yield pd.DataFrame({
                "doc_id": ids,
                payload_col: [encode_video(int(i)) for i in ids],
            })

    return cols.mapInPandas(op, schema=f"doc_id long, {payload_col} binary")


VIDEO_FRAME_SCHEMA = ("doc_id long, frame_idx long, n_frames long, "
                      "width long, height long, pixel_sum long")


def sample_video_frames(df: DataFrame, stride: int = 2,
                        id_col: str = "doc_id",
                        payload_col: str = "payload") -> DataFrame:
    """Stride frame sampling with REAL decode: one input row fans out
    to ``ceil(n_frames / stride)`` frame rows through one Arrow-batched
    mapInPandas node (the row-multiplying shape every real sampler
    has — stream through batches, never collect). Replaces
    ``fake_sample_frames``'s checksum stand-in for callers that need
    pixel-level output."""
    cols = df.select(id_col, payload_col)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                for fr in decode_video_frames(bytes(b), stride):
                    recs.append({"doc_id": int(i), **fr})
            yield pd.DataFrame(
                recs or None,
                columns=["doc_id", "frame_idx", "n_frames",
                         "width", "height", "pixel_sum"]
            ).astype("int64")

    return cols.mapInPandas(op, schema=VIDEO_FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Real PCM audio path (r9): synthesis, decode, and feature extraction of
# int16 little-endian PCM clips need NO external audio library — the
# waveform is an integer sawtooth (no libm in generation, so the SQL
# oracle reproduces every sample exactly), the binary encode/decode is
# numpy '<i2' packing, and the features (peak, zero crossings, energy)
# are exact integers; only RMS divides (by a power of two — exact) and
# takes one IEEE-correctly-rounded sqrt, identical on every engine.
# ---------------------------------------------------------------------------

AUDIO_N_SAMPLES = 2048
AUDIO_FEATURE_SCHEMA = ("clip_id long, n_samples long, peak long, "
                        "zero_crossings long, sum_sq long, rms double")


def synth_pcm_clips(df: DataFrame, id_col: str = "clip_id",
                    payload_col: str = "pcm") -> DataFrame:
    """Arrow-batched PCM synthesis: one int16-LE clip per input row.
    Sawtooth with per-clip period ``20 + id % 50`` and amplitude
    ``1000 + (id % 17) * 500`` — pure integer arithmetic, so the
    encoded bytes are bit-deterministic across machines."""
    import numpy as np

    schema = f"{id_col} long, {payload_col} binary"

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].to_numpy()
            payloads = []
            for cid in ids:
                p = 20 + int(cid) % 50
                a = 1000 + (int(cid) % 17) * 500
                i = np.arange(AUDIO_N_SAMPLES, dtype=np.int64)
                v = (i % p) * (2 * a) // (p - 1) - a
                payloads.append(v.astype("<i2").tobytes())
            yield pd.DataFrame({id_col: ids, payload_col: payloads})

    return df.mapInPandas(gen, schema=schema)


AUDIO_FP_WINDOWS = 16


def audio_energy_fingerprint(df: DataFrame, id_col: str = "clip_id",
                             payload_col: str = "pcm") -> DataFrame:
    """Per-clip acoustic fingerprint (the audio analogue of the image
    aHash): decode the int16-LE payload, split it into
    ``AUDIO_FP_WINDOWS`` equal windows, and set one bit per window iff
    its exact integer energy (Σv²) exceeds the clip mean —
    cross-multiplied (``e_w · n_windows > Σe``), so no float touches
    the hash. Near-dup clips then come from the same lossless
    pigeonhole Hamming join the text/image signatures use
    (``dedup.hamming_near_pairs`` with ``nbits=16``). Map-only
    Arrow-batched stage; one BIGINT out per clip."""
    import numpy as np

    def fp(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for cid, buf in zip(pdf[id_col], pdf[payload_col]):
                v = np.frombuffer(bytes(buf), dtype="<i2").astype(np.int64)
                if len(v) == 0 or len(v) % AUDIO_FP_WINDOWS:
                    raise ValueError(
                        f"audio_energy_fingerprint: clip {cid} has "
                        f"{len(v)} samples, not a positive multiple "
                        f"of {AUDIO_FP_WINDOWS}")
                e = (v * v).reshape(AUDIO_FP_WINDOWS, -1).sum(axis=1)
                te = int(e.sum())
                h = 0
                for wi in range(AUDIO_FP_WINDOWS):
                    if int(e[wi]) * AUDIO_FP_WINDOWS > te:
                        h |= 1 << wi
                rows.append((int(cid), h))
            yield pd.DataFrame(rows, columns=[id_col, "fingerprint"])

    return df.mapInPandas(fp, schema=f"{id_col} long, fingerprint long")


def audio_features(df: DataFrame, id_col: str = "clip_id",
                   payload_col: str = "pcm") -> DataFrame:
    """Decode int16-LE PCM payloads and extract the classic audio-ML
    screening features: peak amplitude, zero-crossing count (sign
    convention ``v >= 0``), energy (exact integer Σv²), and RMS. The
    decode is a real byte-level parse (``np.frombuffer``) — the shape a
    torchaudio-backed extractor would take, with the codec swapped."""
    import math

    import numpy as np

    def feats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for cid, buf in zip(pdf[id_col], pdf[payload_col]):
                v = np.frombuffer(bytes(buf), dtype="<i2").astype(np.int64)
                n = len(v)
                peak = int(np.max(np.abs(v))) if n else 0
                nn = v >= 0
                zc = int(np.count_nonzero(nn[1:] != nn[:-1]))
                ss = int(np.dot(v, v))
                rms = math.sqrt(ss / n) if n else 0.0
                rows.append((int(cid), n, peak, zc, ss, rms))
            yield pd.DataFrame(rows, columns=[
                "clip_id", "n_samples", "peak", "zero_crossings",
                "sum_sq", "rms"])

    return df.mapInPandas(feats, schema=AUDIO_FEATURE_SCHEMA)
