"""Multimodal column plumbing ([EXT] — SURVEY §2.C / build brief).

Images/audio/video ride through the engine as opaque ``binary`` columns
plus typed metadata. The Spark-side machinery — schema, Arrow batch
shape, ``mapInPandas`` partitioned decode — is real and tested, and so is
HEADER-level decode: ``parse_media_header`` reads width/height/channels
(or sample-rate/bit-depth for audio) straight from PNG / GIF / BMP /
JPEG / WAV / MP4 / WEBP / FLAC / HEIC / AVIF file headers in pure
Python. What stays stubbed is full PIXEL
decode (Pillow/libvips/ffmpeg are not in this container): unrecognized
payloads raise under ``fake=False`` and get deterministic fake metadata
under ``fake=True`` so text-payload pipelines remain end-to-end testable.

At scale: decode runs per-partition with Arrow transfer, so executor-side
pixel libraries would slot into ``_decode_one`` unchanged; the binary
column never passes through the driver.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = ("doc_id long, n_bytes int, width int, height int, "
                  "channels int, format string")

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type → sample channels (spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def parse_media_header(p: bytes) -> tuple[int, int, int, int, str] | None:
    """REAL header metadata extraction, no media libraries:
    (n_bytes, width, height, channels, format) or None if the payload is
    not a recognized container.

    For WAV the geometry slots carry (sample_rate, bits_per_sample) —
    the natural 'dimensions' of an audio payload.
    """
    n = len(p)
    if p[:8] == _PNG_SIG and n >= 26 and p[12:16] == b"IHDR":
        w, h = struct.unpack(">II", p[16:24])
        return n, w, h, _PNG_CHANNELS.get(p[25], 0), "png"
    if (p[:6] in (b"GIF87a", b"GIF89a") and n >= 13
            # structural guard: utf-8 TEXT that happens to start with
            # "GIF87a"/"GIF89a" must not sniff as a gif. Text is printable
            # ASCII (+ tab/newline) all the way through; a real image is
            # not — the descriptor plus the bytes that follow it (GCT
            # entries or an 0x21/0x2C block with small binary fields)
            # contain a non-printable byte within the first ~26 bytes in
            # practice. Checking that whole window (not just the 7
            # descriptor bytes) keeps rare GIFs whose descriptor happens
            # to be printable (e.g. width 0x4141, no GCT). Residual false
            # negatives: a real GIF whose first 26 post-signature bytes
            # are ALL printable — possible in principle, not observed.
            and not all(b in (0x09, 0x0A, 0x0D) or 0x20 <= b <= 0x7E
                        for b in p[6:min(n, 32)])):
        w, h = struct.unpack("<HH", p[6:10])
        if w > 0 and h > 0:
            return n, w, h, 3, "gif"
        return None
    if (p[:2] == b"BM" and n >= 30
            # validate the DIB header-size field — "BM"-prefixed TEXT is
            # plausible (utf-8 bytes ride through this decoder as fake
            # payloads), and 4 ascii bytes can never equal a known size
            and struct.unpack("<I", p[14:18])[0] in (12, 40, 52, 56, 64, 108, 124)):
        w, h = struct.unpack("<ii", p[18:26])
        bpp = struct.unpack("<H", p[28:30])[0]
        # negative height = top-down row order, same geometry
        return n, w, abs(h), max(1, bpp // 8), "bmp"
    if p[:2] == b"\xff\xd8":
        # SOFn markers carry the frame geometry: 0xC0-0xCF minus DHT
        # (0xC4), JPG (0xC8) and DAC (0xCC), which are ordinary segments.
        sof = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}
        i = 2
        while i + 1 < n:
            if p[i] != 0xFF:                  # lost marker sync → not a jpeg
                return None
            while i + 1 < n and p[i + 1] == 0xFF:
                i += 1                        # 0xFF fill/padding bytes
            if i + 1 >= n:
                return None
            marker = p[i + 1]
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                i += 2                        # TEM/RSTn: no length field
                continue
            if marker in (0xD9, 0xDA):        # EOI / SOS before any SOF
                return None                   # (never walk entropy data)
            if i + 4 > n:
                return None
            seglen = struct.unpack(">H", p[i + 2:i + 4])[0]
            if seglen < 2:                    # malformed length
                return None
            if marker in sof:
                if i + 10 > n:
                    return None
                h, w = struct.unpack(">HH", p[i + 5:i + 9])
                return n, w, h, p[i + 9], "jpeg"
            i += 2 + seglen
        return None
    if p[4:8] == b"ftyp" and n >= 16:
        return _parse_mp4(p)
    if (p[:4] == b"RIFF" and p[8:12] == b"WAVE" and n >= 36
            and p[12:16] == b"fmt "):
        channels = struct.unpack("<H", p[22:24])[0]
        rate = struct.unpack("<I", p[24:28])[0]
        bits = struct.unpack("<H", p[34:36])[0]
        return n, rate, bits, channels, "wav"
    if p[:4] == b"RIFF" and p[8:12] == b"WEBP" and n >= 25:
        # structural guard: the RIFF size field must be consistent with
        # the payload (± the odd-byte pad). ASCII text "RIFF...WEBP..."
        # would carry a size ≥ 0x20202020 and is rejected here.
        riff_size = struct.unpack("<I", p[4:8])[0]
        if not (n - 9 <= riff_size <= n - 7):
            return None
        four, data = p[12:16], p[20:]
        if four == b"VP8 " and len(data) >= 10 \
                and data[3:6] == b"\x9d\x01\x2a":     # lossy sync code
            w = struct.unpack("<H", data[6:8])[0] & 0x3FFF
            h = struct.unpack("<H", data[8:10])[0] & 0x3FFF
            return n, w, h, 3, "webp"
        if four == b"VP8L" and len(data) >= 5 and data[0] == 0x2F:
            bits = struct.unpack("<I", data[1:5])[0]
            if (bits >> 29) & 0x7:                    # version must be 0
                return None
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            return n, w, h, 4 if (bits >> 28) & 1 else 3, "webp"
        if four == b"VP8X" and len(data) >= 10:
            w = int.from_bytes(data[4:7], "little") + 1
            h = int.from_bytes(data[7:10], "little") + 1
            return n, w, h, 4 if data[0] & 0x10 else 3, "webp"
        return None
    if p[:4] in (b"II*\x00", b"MM\x00*") and n >= 14:
        # TIFF: byte-order magic contains a NUL, so utf-8 text can never
        # impersonate it. Walk the first IFD for ImageWidth(256)/
        # ImageLength(257)/SamplesPerPixel(277); SHORT/LONG values are
        # left-justified in the 4-byte value field per the spec.
        bo = "<" if p[:2] == b"II" else ">"
        off = struct.unpack(bo + "I", p[4:8])[0]
        if off + 2 > n or off < 8:
            return None
        cnt = struct.unpack(bo + "H", p[off:off + 2])[0]
        if cnt == 0 or off + 2 + cnt * 12 > n:
            return None
        w = h = 0
        spp = 1
        for i in range(cnt):
            e = off + 2 + i * 12
            tag, typ = struct.unpack(bo + "HH", p[e:e + 4])
            vcnt = struct.unpack(bo + "I", p[e + 4:e + 8])[0]
            if vcnt != 1:
                # count>1 means the 4-byte field holds a file OFFSET,
                # not the value — reading it as a dimension would emit
                # confident garbage; our tags are all scalar
                continue
            if typ == 3:                          # SHORT
                val = struct.unpack(bo + "H", p[e + 8:e + 10])[0]
            elif typ == 4:                        # LONG
                val = struct.unpack(bo + "I", p[e + 8:e + 12])[0]
            else:
                continue
            if tag == 256:
                w = val
            elif tag == 257:
                h = val
            elif tag == 277:
                spp = val
        if w > 0 and h > 0:
            return n, w, h, spp, "tiff"
        return None
    if p[:4] == b"fLaC" and n >= 42 and (p[4] & 0x7F) == 0 \
            and int.from_bytes(p[5:8], "big") == 34:
        # STREAMINFO must be the first metadata block (type 0, len 34);
        # its type byte is 0x00/0x80 — never printable, so text can't
        # impersonate. Sample-rate 20 bits / channels 3 / bps 5 packed
        # big-endian at offset 18 (FLAC format §METADATA_BLOCK_STREAMINFO).
        rate = (p[18] << 12) | (p[19] << 4) | (p[20] >> 4)
        channels = ((p[20] >> 1) & 0x7) + 1
        bits = (((p[20] & 0x1) << 4) | (p[21] >> 4)) + 1
        if rate == 0:
            return None
        return n, rate, bits, channels, "flac"
    return None


def _iter_boxes(p: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for ISO-BMFF boxes in
    p[start:end]. Stops on malformed sizes instead of over-reading."""
    i = start
    while i + 8 <= end:
        size = struct.unpack(">I", p[i:i + 4])[0]
        btype = p[i + 4:i + 8]
        if size == 0:                 # box extends to end of enclosing scope
            yield btype, i + 8, end
            return
        if size == 1 or size < 8 or i + size > end:
            return                    # 64-bit largesize unsupported / bogus
        yield btype, i + 8, i + size
        i += size


def _parse_mp4(p: bytes) -> tuple[int, int, int, int, str] | None:
    """ISO-BMFF (MP4/MOV) header walk: moov→trak→tkhd gives the video
    geometry (16.16 fixed-point width/height), channels slot carries the
    track count. Pure-Python, bounded by the declared box sizes."""
    n = len(p)
    width = height = 0
    tracks = 0
    saw_moov = False
    for btype, s, e in _iter_boxes(p, 0, n):
        if btype != b"moov":
            continue
        saw_moov = True
        for ctype, cs, ce in _iter_boxes(p, s, e):
            if ctype != b"trak":
                continue
            tracks += 1
            for ttype, ts_, te in _iter_boxes(p, cs, ce):
                if ttype != b"tkhd" or te - ts_ < 4:
                    continue
                ver = p[ts_]
                # v0: 4 ver/flags + 5×4 times/ids + 8 res + 8 layer/vol
                #     + 36 matrix → width at +76; v1 widens 3 fields to
                #     8 bytes → width at +88 (ISO 14496-12 §8.3.2)
                off = ts_ + (88 if ver == 1 else 76)
                if off + 8 <= te and width == 0 and height == 0:
                    width = struct.unpack(">I", p[off:off + 4])[0] >> 16
                    height = struct.unpack(">I", p[off + 4:off + 8])[0] >> 16
    if not saw_moov:
        return _parse_heif(p)
    return n, width, height, tracks, "mp4"


def _parse_heif(p: bytes) -> tuple[int, int, int, int, str] | None:
    """HEIF-family stills (HEIC/AVIF): geometry lives in the ispe
    property, nested meta→iprp→ipco→ispe. ``meta`` is a FULL box — 4
    version/flags bytes precede its children (the one structural
    difference from the plain-box moov walk); ``ispe`` is a full box
    too: version/flags then u32 width/height (ISO 23008-12 §6.5.3).
    Brand gate first: only ftyp major/compatible brands of the HEIF
    family are walked, so arbitrary ftyp files can't reach the walk."""
    n = len(p)
    brands = {b"heic", b"heix", b"mif1", b"avif", b"avis"}
    fmt = None
    for btype, s, e in _iter_boxes(p, 0, n):
        if btype == b"ftyp" and e - s >= 4:
            listed = [p[s:s + 4]] + [p[i:i + 4] for i in range(s + 8, e, 4)]
            hits = brands.intersection(listed)
            if hits:
                fmt = "avif" if (b"avif" in hits or b"avis" in hits) \
                    else "heic"
    if fmt is None:
        return None
    for btype, s, e in _iter_boxes(p, 0, n):
        if btype != b"meta" or e - s < 4:
            continue
        for t1, s1, e1 in _iter_boxes(p, s + 4, e):      # skip ver/flags
            if t1 != b"iprp":
                continue
            for t2, s2, e2 in _iter_boxes(p, s1, e1):
                if t2 != b"ipco":
                    continue
                for t3, s3, e3 in _iter_boxes(p, s2, e2):
                    if t3 == b"ispe" and e3 - s3 >= 12:
                        w, h = struct.unpack(">II", p[s3 + 4:s3 + 12])
                        return n, w, h, 3, fmt
    return None


# --- deterministic synthetic-media builders ------------------------------
# Real byte-exact containers (header-only, zero payload) for testing the
# decode path without media libs — and for load-testing the pipeline with
# realistic binary columns at any scale.

def build_png(w: int, h: int) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)   # 8-bit RGB
    chunk = b"IHDR" + ihdr
    return (_PNG_SIG + struct.pack(">I", len(ihdr)) + chunk
            + struct.pack(">I", zlib.crc32(chunk)))        # 33 bytes


def build_gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\xf7\x00\x00"  # 13 bytes


def build_bmp(w: int, h: int) -> bytes:
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, 0, 2835, 2835, 0, 0)
    return (b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + info)     # 54 bytes


def build_wav(rate: int, bits: int, channels: int) -> bytes:
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    return (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 0))              # 44 bytes


def build_webp(w: int, h: int, variant: str = "vp8") -> bytes:
    """Minimal WEBP containers for all three chunk variants; sizes in the
    RIFF header are exact so the structural size guard accepts them."""
    if variant == "vp8":
        data = (b"\x00\x00\x00" + b"\x9d\x01\x2a"
                + struct.pack("<HH", w, h))
    elif variant == "vp8l":
        bits = (w - 1) | ((h - 1) << 14)            # version+alpha = 0
        data = b"\x2f" + struct.pack("<I", bits)
    elif variant == "vp8x":
        data = (b"\x10\x00\x00\x00"             # alpha flag set
                + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little"))
    else:
        raise ValueError(variant)
    if len(data) % 2:
        data += b"\x00"
    chunk = {"vp8": b"VP8 ", "vp8l": b"VP8L", "vp8x": b"VP8X"}[variant]
    body = b"WEBP" + chunk + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def build_flac(rate: int, bits: int, channels: int) -> bytes:
    """Minimal FLAC: fLaC magic + last-flag STREAMINFO block (34 bytes),
    spec bit packing for rate/channels/bps, zero total samples/md5."""
    packed = (rate << 44) | ((channels - 1) << 41) | ((bits - 1) << 36)
    si = (struct.pack(">HH", 16, 16) + b"\x00" * 6
          + packed.to_bytes(8, "big") + b"\x00" * 16)
    assert len(si) == 34
    return b"fLaC" + b"\x80" + len(si).to_bytes(3, "big") + si


def build_tiff(w: int, h: int, channels: int = 3,
               big_endian: bool = False) -> bytes:
    """Minimal TIFF: header + one IFD with width/height/samples-per-pixel
    SHORT entries (both byte orders). 50 bytes."""
    bo = ">" if big_endian else "<"
    magic = b"MM\x00*" if big_endian else b"II*\x00"
    entries = b"".join(
        struct.pack(bo + "HHIHH", tag, 3, 1, val, 0)
        for tag, val in ((256, w), (257, h), (277, channels)))
    return (magic + struct.pack(bo + "I", 8)
            + struct.pack(bo + "H", 3) + entries
            + struct.pack(bo + "I", 0))


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def build_heif(w: int, h: int, brand: bytes = b"heic") -> bytes:
    """Minimal HEIF-family still: ftyp(major brand) + meta(full box:
    hdlr stub + iprp(ipco(ispe))) — enough structure for the brand gate
    and the ispe walk, byte-exact round-trip."""
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand + b"mif1")
    ispe = _box(b"ispe", struct.pack(">III", 0, w, h))
    ipco = _box(b"ipco", ispe)
    iprp = _box(b"iprp", ipco)
    hdlr = _box(b"hdlr", struct.pack(">I", 0) + b"\x00" * 4 + b"pict"
                + b"\x00" * 12)
    meta = _box(b"meta", struct.pack(">I", 0) + hdlr + iprp)
    return ftyp + meta


def build_mp4(w: int, h: int, duration_ms: int = 1000) -> bytes:
    """Minimal valid ISO-BMFF: ftyp + moov(mvhd + trak(tkhd)), version-0
    boxes, one video track, 16.16 fixed-point geometry. 236 bytes."""
    mvhd = _box(b"mvhd", struct.pack(
        ">B3xIIIIIHH8x36x24xI",
        0, 0, 0, 1000, duration_ms, 0x00010000, 0x0100, 0, 1))
    tkhd = _box(b"tkhd", struct.pack(
        ">B3xIIIII8xHHHH36xII",
        0, 0, 0, 1, 0, duration_ms, 0, 0, 0, 0, w << 16, h << 16))
    moov = _box(b"moov", mvhd + _box(b"trak", tkhd))
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom")
    return ftyp + moov                                     # 236 bytes


def synthesize_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic real-container binary payload per row —
    format cycles png/gif/bmp/wav/mp4/webp/flac/heic/avif/tiff on
    ``doc_id % 10`` (every sniff the header decoder supports), geometry
    derived from the id. Sub-variants cycle on ``doc_id // 10``:
    ``doc_id % 2`` is CONSTANT on every ``% 10`` residue class (shared
    factor 2) and ``% 3`` is constant under a ``% 9`` cycle — the
    nested-modulus trap — so the WEBP chunk variant uses
    ``(did // 10) % 3``, wav/flac channel counts and the TIFF byte
    order use ``(did // 10) % 2``. Runs Arrow-batched per partition;
    no driver round-trip."""

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                did = int(did)
                w, h = 1 + did % 512, 1 + (did * 7) % 512
                kind = did % 10
                if kind == 0:
                    payloads.append(build_png(w, h))
                elif kind == 1:
                    payloads.append(build_gif(w, h))
                elif kind == 2:
                    payloads.append(build_bmp(w, h))
                elif kind == 3:
                    payloads.append(build_wav(16000, 16,
                                              1 + (did // 10) % 2))
                elif kind == 4:
                    payloads.append(build_mp4(w, h, 1000 + did % 3600))
                elif kind == 5:
                    variant = ("vp8", "vp8l", "vp8x")[(did // 10) % 3]
                    payloads.append(build_webp(w, h, variant))
                elif kind == 6:
                    payloads.append(build_flac(8000 + (did % 8) * 4000,
                                               16, 1 + (did // 10) % 2))
                elif kind == 7:
                    payloads.append(build_heif(w, h, b"heic"))
                elif kind == 8:
                    payloads.append(build_heif(w, h, b"avif"))
                else:
                    payloads.append(build_tiff(
                        w, h, 1 + did % 3,
                        big_endian=(did // 10) % 2 == 1))
            yield pd.DataFrame({id_col: pdf[id_col].values,
                                "payload": payloads})

    return (docs.select(id_col)
            .mapInPandas(_build, schema=f"{id_col} long, payload binary"))


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary column (here: utf-8 bytes of the text —
    stand-in for image bytes) plus a content-type tag."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "utf-8")) \
               .withColumn("content_type", F.lit("image/fake"))


def _decode_one(payload: bytes, fake: bool) -> tuple[int, int, int, int, str]:
    meta = parse_media_header(bytes(payload))
    if meta is not None:
        return meta
    if not fake:
        raise NotImplementedError(
            "payload is not a recognized container (png/gif/bmp/jpeg/wav) "
            "and full pixel decode requires Pillow/libvips — not available "
            "in this container; pass fake=True for deterministic stub decode")
    n = len(payload)
    # deterministic fake geometry derived from the byte length
    return n, 64 + n % 577, 64 + (n * 31) % 353, 3, "fake"


def decode_image_batch(docs: DataFrame, fake: bool = True,
                       id_col: str = "doc_id") -> DataFrame:
    """Per-partition Arrow-batched decode: binary payload → metadata rows.
    Recognized containers decode their REAL header metadata regardless of
    ``fake``; ``fake`` only governs unrecognized payloads (True → derived
    stub geometry, False → raise)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_decode_one(p, fake) for p in pdf["payload"]]
            out = pd.DataFrame(meta, columns=["n_bytes", "width", "height",
                                              "channels", "format"])
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return (docs.select(id_col, "payload")
            .mapInPandas(_decode, schema=DECODED_SCHEMA))


def frame_sample(docs: DataFrame, every_n_bytes: int = 64,
                 id_col: str = "doc_id") -> DataFrame:
    """'Frame sampling' over the opaque payload: emit one row per sampled
    offset (stand-in for video frame extraction; shows the explode shape
    a real sampler would produce)."""
    return (docs
            .withColumn("n_bytes", F.length("payload"))
            .withColumn("frame_off", F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("n_bytes") - 1, F.lit(0)),
                           F.lit(every_n_bytes))))
            .select(id_col, "frame_off",
                    F.substring(F.col("payload"), F.col("frame_off") + 1, 8)
                    .alias("frame_bytes")))
