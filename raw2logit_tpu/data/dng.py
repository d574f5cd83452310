"""Built-in pure-numpy DNG/TIFF-container reader for uncompressed CFA raws.

Replaces the reference's rawpy/LibRaw dependency (`rawpy.imread(path)
.raw_image_visible`, reference utils/dataset_utils.py:18-26) for the case
that actually occurs in the published datasets: uncompressed integer CFA
data in a TIFF container.  DNG is TIFF: we walk the IFD chain (including
SubIFDs — DNGs commonly park the raw sensor IFD under tag 330 of a preview
IFD), pick the CFA IFD, assemble its strips, and apply the ActiveArea crop
(the `raw_image_visible` semantics).  Compressed DNGs (lossless JPEG etc.)
raise with guidance to convert on a host with rawpy installed.

A minimal writer (`write_dng`) exists so the reader is testable offline and
so synthetic raws can be materialized in the on-disk dataset format.
"""

import struct
from fractions import Fraction

import numpy as np

# TIFF tag ids used here
_TAG_NEW_SUBFILE_TYPE = 254
_TAG_WIDTH = 256
_TAG_LENGTH = 257
_TAG_BITS_PER_SAMPLE = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES_PER_PIXEL = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_BYTE_COUNTS = 279
_TAG_SUB_IFDS = 330
_TAG_COLOR_MATRIX1 = 50721
_TAG_AS_SHOT_NEUTRAL = 50728
_TAG_BLACK_LEVEL = 50714
_TAG_ACTIVE_AREA = 50829

_PHOTOMETRIC_CFA = 32803  # DNG: color-filter-array raw

# TIFF field types -> (struct char, byte size); 13 is IFD (a LONG offset,
# the type DNG/TIFF-EP permits for SubIFDs alongside plain LONG)
_TYPES = {1: ("B", 1), 3: ("H", 2), 4: ("I", 4), 13: ("I", 4),
          16: ("Q", 8)}
# (S)RATIONAL: two 4-byte ints per value, folded to a float num/den
_RATIONALS = {5: "I", 10: "i"}


def _read_ifd(buf, order, offset):
    """Parse one IFD -> ({tag: list-of-values}, next_ifd_offset)."""
    (n_entries,) = struct.unpack_from(order + "H", buf, offset)
    entries = {}
    pos = offset + 2
    for _ in range(n_entries):
        tag, ftype, count = struct.unpack_from(order + "HHI", buf, pos)
        # a value array can never outsize the file; a corrupt count would
        # otherwise build a giant struct format string before any bounds
        # check fires (same guard spirit as the tilestore header check)
        if ftype in _TYPES or ftype in _RATIONALS:
            size = _TYPES[ftype][1] if ftype in _TYPES else 8
            if size * count > len(buf):
                raise ValueError(
                    f"IFD entry tag {tag}: {count} values of {size} bytes "
                    f"exceed the {len(buf)}-byte file")
        if count == 0:
            # malformed-but-seen-in-the-wild zero-count entries: skip
            # rather than store [] (consumers index [0] on present tags)
            pos += 12
            continue
        if ftype in _TYPES:
            ch, size = _TYPES[ftype]
            total = size * count
            if total <= 4:
                vals = struct.unpack_from(order + ch * count, buf, pos + 8)
            else:
                (val_off,) = struct.unpack_from(order + "I", buf, pos + 8)
                vals = struct.unpack_from(order + ch * count, buf, val_off)
            entries[tag] = list(vals)
        elif ftype in _RATIONALS:
            ch = _RATIONALS[ftype]
            (val_off,) = struct.unpack_from(order + "I", buf, pos + 8)
            raw = struct.unpack_from(order + ch * 2 * count, buf, val_off)
            entries[tag] = [n / d if d else float("nan")
                            for n, d in zip(raw[::2], raw[1::2])]
        pos += 12
    (next_off,) = struct.unpack_from(order + "I", buf, pos)
    return entries, next_off


def _all_ifds(buf, order, first_offset):
    """IFD chain plus any SubIFD trees, in encounter order."""
    ifds, stack, seen = [], [first_offset], set()
    while stack:
        off = stack.pop(0)
        if not off or off in seen or off >= len(buf):
            continue
        seen.add(off)
        entries, next_off = _read_ifd(buf, order, off)
        ifds.append(entries)
        # a corrupt type byte can deliver the SubIFD offsets as rational
        # floats; only integer offsets are followable
        stack.extend(o for o in entries.get(_TAG_SUB_IFDS, [])
                     if isinstance(o, int))
        if next_off:
            stack.append(next_off)
    return ifds


def _parse(path):
    """Read + validate a TIFF/DNG file -> (buf, order, ifds)."""
    with open(path, "rb") as fh:
        buf = fh.read()
    if len(buf) < 8 or buf[:2] not in (b"II", b"MM"):
        raise ValueError(
            f"{path}: not a TIFF/DNG — unrecognized byte-order mark "
            f"{buf[:2]!r} (expected 'II' or 'MM')")
    order = "<" if buf[:2] == b"II" else ">"
    magic, first_off = struct.unpack_from(order + "HI", buf, 2)
    if magic != 42:
        raise ValueError(f"{path}: bad TIFF magic {magic} (byte-order ok, "
                         "but this is not a baseline TIFF)")
    ifds = _all_ifds(buf, order, first_off)
    if not ifds:
        raise ValueError(f"{path}: no IFDs found")
    return buf, order, ifds


def _pick_raw_ifd(ifds):
    """Prefer the CFA IFD; else a full-resolution (NewSubfileType==0) one;
    else the first with image strips."""
    def score(ifd):
        if ifd.get(_TAG_PHOTOMETRIC, [None])[0] == _PHOTOMETRIC_CFA:
            return 2
        if (ifd.get(_TAG_NEW_SUBFILE_TYPE, [1])[0] == 0
                and _TAG_STRIP_OFFSETS in ifd):
            return 1
        return 0 if _TAG_STRIP_OFFSETS in ifd else -1

    return max(ifds, key=score)


def read_dng(path):
    """Read an uncompressed CFA raw from a DNG/TIFF file.

    Returns the ActiveArea-cropped sensor plane as a (H, W) uint8/uint16
    array — the analog of rawpy's ``raw_image_visible``.
    """
    buf, order, ifds = _parse(path)
    ifd = _pick_raw_ifd(ifds)
    if _TAG_STRIP_OFFSETS not in ifd:
        raise ValueError(f"{path}: no raw image strips in any IFD")

    compression = ifd.get(_TAG_COMPRESSION, [1])[0]
    if compression != 1:
        raise ValueError(
            f"{path}: compressed DNG (compression={compression}) — this "
            "built-in reader handles uncompressed CFA raws only; convert on "
            "a host with rawpy installed "
            "(rawpy.imread(path).raw_image_visible)")

    width = ifd[_TAG_WIDTH][0]
    length = ifd[_TAG_LENGTH][0]
    bits = ifd.get(_TAG_BITS_PER_SAMPLE, [16])[0]
    spp = ifd.get(_TAG_SAMPLES_PER_PIXEL, [1])[0]
    if spp != 1:
        raise ValueError(f"{path}: {spp} samples/pixel — expected a single "
                         "CFA sensor plane")
    if bits not in (8, 16):
        raise ValueError(f"{path}: {bits}-bit samples unsupported "
                         "(8/16 only)")
    dtype = np.dtype(np.uint8 if bits == 8 else np.uint16)
    dtype = dtype.newbyteorder(order)

    offsets = ifd[_TAG_STRIP_OFFSETS]
    counts = ifd.get(_TAG_STRIP_BYTE_COUNTS)
    if counts is None:
        if len(offsets) == 1:  # single strip, derivable
            counts = [length * width * (bits // 8)]
        else:
            # per-strip counts from RowsPerStrip — pairing only the first
            # offset with the whole-image count would mis-assemble
            # non-contiguous strips
            rps = ifd.get(_TAG_ROWS_PER_STRIP, [None])[0]
            if not rps:
                raise ValueError(
                    f"{path}: {len(offsets)} strips but no "
                    "StripByteCounts/RowsPerStrip to derive them")
            row_bytes = width * (bits // 8)
            counts = [min(rps, length - i * rps) * row_bytes
                      for i in range(len(offsets))]
    raw = b"".join(buf[o:o + c] for o, c in zip(offsets, counts))
    expect = length * width * (bits // 8)
    if len(raw) < expect:
        raise ValueError(f"{path}: truncated strips "
                         f"({len(raw)} < {expect} bytes)")
    img = np.frombuffer(raw[:expect], dtype=dtype).reshape(length, width)
    img = img.astype(img.dtype.newbyteorder("="))

    area = ifd.get(_TAG_ACTIVE_AREA)
    if area and len(area) == 4:
        top, left, bottom, right = area
        img = img[top:bottom, left:right]
    return img


def get_camera_parameters(path):
    """Extract (black_level, white_balance, colour_matrix) from a DNG.

    The analog of the reference's ``get_camera_parameters(rawpyImg)``
    (reference processing/pipeline_numpy.py:144-149), reading the DNG tags
    directly instead of going through LibRaw's derived fields:

    - ``black_level``: the BlackLevel tag (50714), broadcast to the four
      RGGB sites (rawpy's ``black_level_per_channel``).
    - ``white_balance``: per-channel multipliers from AsShotNeutral
      (50728), ``1/neutral`` normalized to green == 1 — LibRaw's
      ``camera_whitebalance[:3]`` up to its scale convention.
    - ``colour_matrix``: the 9 ColorMatrix1 (50721) values row-major
      (rawpy's ``color_matrix[:, :3].flatten()``; note LibRaw may return
      a profile-adapted matrix where this returns the tag as written).

    Raises ValueError naming whichever tags the file lacks.
    """
    _, _, ifds = _parse(path)
    ifd = _pick_raw_ifd(ifds)
    missing = [name for name, tag in (("BlackLevel", _TAG_BLACK_LEVEL),
                                      ("AsShotNeutral", _TAG_AS_SHOT_NEUTRAL),
                                      ("ColorMatrix1", _TAG_COLOR_MATRIX1))
               if tag not in ifd]
    if missing:
        raise ValueError(f"{path}: no camera parameters — missing DNG "
                         f"tag(s): {', '.join(missing)}")
    bl = ifd[_TAG_BLACK_LEVEL]
    # broadcast/tile the BlackLevel repeat pattern to the four RGGB sites
    # (BlackLevelRepeatDim 1x1 -> scalar, 1x2/2x1 -> column/row pair);
    # anything else (0, 3) is malformed for an RGGB CFA
    if len(bl) == 1:
        black_level = list(bl) * 4
    elif len(bl) == 2:
        black_level = list(bl) * 2
    elif len(bl) >= 4:
        black_level = list(bl[:4])
    else:
        raise ValueError(f"{path}: BlackLevel has {len(bl)} values, "
                         "expected 1, 2, or 4 for an RGGB CFA")
    neutral = ifd[_TAG_AS_SHOT_NEUTRAL][:3]
    # `not (n > 0)` also rejects NaN (a zero-denominator rational)
    if len(neutral) != 3 or any(not (n > 0) for n in neutral):
        raise ValueError(f"{path}: bad AsShotNeutral {neutral}")
    white_balance = [neutral[1] / n for n in neutral]
    cm = ifd[_TAG_COLOR_MATRIX1]
    if len(cm) < 9:
        raise ValueError(f"{path}: ColorMatrix1 has {len(cm)} values, "
                         "expected 9 (3x3 row-major)")
    return black_level, white_balance, cm[:9]


def _pack_entries(order, entries, heap, heap_base):
    """Serialize IFD entries; big values go to the heap."""
    out = struct.pack(order + "H", len(entries))
    for tag, ftype, vals in sorted(entries):
        if ftype in _RATIONALS:  # floats -> num/den pairs, always on heap
            ch = _RATIONALS[ftype]
            out += struct.pack(order + "HHI", tag, ftype, len(vals))
            out += struct.pack(order + "I", heap_base + len(heap))
            lo, hi = (0, 2 ** 32) if ftype == 5 else (-2 ** 31, 2 ** 31)
            for v in vals:
                f = Fraction(v).limit_denominator(65536)
                if not (lo <= f.numerator < hi and 0 <= f.denominator < hi):
                    raise ValueError(
                        f"tag {tag}: value {v} does not fit a "
                        f"{'RATIONAL' if ftype == 5 else 'SRATIONAL'} "
                        "(use signed values only for SRATIONAL tags)")
                heap += struct.pack(order + ch * 2, f.numerator,
                                    f.denominator)
            continue
        ch, size = _TYPES[ftype]
        total = size * len(vals)
        out += struct.pack(order + "HHI", tag, ftype, len(vals))
        if total <= 4:
            out += struct.pack(order + ch * len(vals), *vals).ljust(4, b"\0")
        else:
            out += struct.pack(order + "I", heap_base + len(heap))
            heap += struct.pack(order + ch * len(vals), *vals)
    return out, heap


def write_dng(path, img, rows_per_strip=None, active_area=None,
              compression=1, big_endian=False, use_subifd=False,
              subifd_type=4, omit_byte_counts=False,
              camera_parameters=None):
    """Write a minimal uncompressed CFA DNG (testing/synthesis aid).

    Args:
        img: (H, W) uint8 or uint16 sensor plane.
        rows_per_strip: split the data into multiple strips.
        active_area: (top, left, bottom, right) crop recorded in the file.
        compression: TIFF compression tag value; anything != 1 produces a
            file the reader must reject (used to test the raise path).
        use_subifd: park the raw IFD under a SubIFDs tag of a stub IFD0,
            as real DNGs do.
        camera_parameters: optional (black_level[4], white_balance[3],
            colour_matrix[9]) recorded as BlackLevel / AsShotNeutral
            (1/wb, G-normalized) / ColorMatrix1 tags, round-tripping
            through get_camera_parameters.
    """
    img = np.ascontiguousarray(img)
    if img.dtype not in (np.uint8, np.uint16):
        raise ValueError(f"img must be uint8/uint16, got {img.dtype}")
    h, w = img.shape
    bits = img.dtype.itemsize * 8
    order = ">" if big_endian else "<"
    data = img.astype(img.dtype.newbyteorder(order)).tobytes()

    rps = rows_per_strip or h
    row_bytes = w * img.dtype.itemsize
    strips = [(r, min(rps, h - r)) for r in range(0, h, rps)]

    # layout: header(8) | strip data | heap (big values) | IFDs
    data_base = 8
    strip_offsets, strip_counts = [], []
    pos = data_base
    for _, nrows in strips:
        strip_offsets.append(pos)
        strip_counts.append(nrows * row_bytes)
        pos += nrows * row_bytes

    raw_entries = [
        (_TAG_NEW_SUBFILE_TYPE, 4, [0]),
        (_TAG_WIDTH, 4, [w]),
        (_TAG_LENGTH, 4, [h]),
        (_TAG_BITS_PER_SAMPLE, 3, [bits]),
        (_TAG_COMPRESSION, 3, [compression]),
        (_TAG_PHOTOMETRIC, 3, [_PHOTOMETRIC_CFA]),
        (_TAG_STRIP_OFFSETS, 4, strip_offsets),
        (_TAG_SAMPLES_PER_PIXEL, 3, [1]),
        (_TAG_ROWS_PER_STRIP, 4, [rps]),
    ]
    if not omit_byte_counts:  # some writers omit it; reader must derive
        raw_entries.append((_TAG_STRIP_BYTE_COUNTS, 4, strip_counts))
    if active_area is not None:
        raw_entries.append((_TAG_ACTIVE_AREA, 4, list(active_area)))
    if camera_parameters is not None:
        black_level, white_balance, colour_matrix = camera_parameters
        if len(white_balance) != 3 or any(v <= 0 for v in white_balance):
            raise ValueError(f"bad white_balance {white_balance}")
        g = white_balance[1]
        raw_entries.append((_TAG_BLACK_LEVEL, 5,
                            [float(v) for v in black_level]))
        raw_entries.append((_TAG_AS_SHOT_NEUTRAL, 5,
                            [g / float(v) for v in white_balance]))
        raw_entries.append((_TAG_COLOR_MATRIX1, 10,
                            [float(v) for v in colour_matrix]))

    heap_base = pos
    # two passes: first to size the heap, then with final IFD offsets
    _, heap_probe = _pack_entries(order, raw_entries, b"", heap_base)
    ifd_base = heap_base + len(heap_probe)

    if use_subifd:
        raw_ifd_off = ifd_base
        raw_blob, heap = _pack_entries(order, raw_entries, b"", heap_base)
        raw_blob += struct.pack(order + "I", 0)
        ifd0_entries = [
            (_TAG_NEW_SUBFILE_TYPE, 4, [1]),  # reduced-resolution stub
            (_TAG_WIDTH, 4, [1]),
            (_TAG_LENGTH, 4, [1]),
            (_TAG_SUB_IFDS, subifd_type, [raw_ifd_off]),
        ]
        # heap for ifd0 sits after the raw IFD — recompute base
        ifd0_off = raw_ifd_off + len(raw_blob)
        ifd0_blob, heap2 = _pack_entries(order, ifd0_entries, b"",
                                         ifd0_off + 2 + 12 * 4 + 4)
        ifd0_blob += struct.pack(order + "I", 0)
        body = heap + raw_blob + ifd0_blob + heap2
        first_ifd = ifd0_off
    else:
        blob, heap = _pack_entries(order, raw_entries, b"", heap_base)
        blob += struct.pack(order + "I", 0)
        body = heap + blob
        first_ifd = ifd_base

    header = (b"MM" if big_endian else b"II") + struct.pack(
        order + "HI", 42, first_ifd)
    with open(path, "wb") as fh:
        fh.write(header)
        fh.write(data)
        fh.write(body)
    return path
