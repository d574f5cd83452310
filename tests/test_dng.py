"""Built-in DNG reader: round-trip through the minimal writer, multi-strip
assembly, ActiveArea cropping, big-endian, and the compressed-raise path
(rawpy raw_image_visible analog; reference utils/dataset_utils.py:18-26)."""

import numpy as np
import pytest

from raw2logit_tpu.data.datasets import load_image
from raw2logit_tpu.data.dng import read_dng, write_dng


def _mosaic(h=32, w=48, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.uniform(0, 1, (h, w)) * 65535).astype(np.uint16)


def test_roundtrip_single_strip(tmp_path):
    img = _mosaic()
    path = str(tmp_path / "raw.dng")
    write_dng(path, img)
    out = read_dng(path)
    np.testing.assert_array_equal(out, img)


def test_roundtrip_multi_strip(tmp_path):
    img = _mosaic(h=40)
    path = str(tmp_path / "raw.dng")
    write_dng(path, img, rows_per_strip=16)  # 3 strips (16+16+8)
    np.testing.assert_array_equal(read_dng(path), img)


def test_multi_strip_missing_byte_counts(tmp_path):
    """No StripByteCounts: multi-strip counts derive from RowsPerStrip
    (pairing only the first offset with a whole-image count would
    mis-assemble non-contiguous strips — ADVICE r2)."""
    img = _mosaic(h=40)
    path = str(tmp_path / "raw.dng")
    write_dng(path, img, rows_per_strip=16, omit_byte_counts=True)
    np.testing.assert_array_equal(read_dng(path), img)


def test_multi_strip_missing_counts_and_rps_raises(tmp_path):
    import raw2logit_tpu.data.dng as dng

    img = _mosaic(h=40)
    path = str(tmp_path / "raw.dng")
    write_dng(path, img, rows_per_strip=16, omit_byte_counts=True)
    data = open(path, "rb").read()
    # also strip the RowsPerStrip tag by rewriting it to an unknown id
    import struct
    tag = struct.pack("<H", dng._TAG_ROWS_PER_STRIP)
    assert tag in data
    open(path, "wb").write(data.replace(tag + b"\x04\x00", b"\xff\x7f\x04\x00"))
    with pytest.raises(ValueError, match="RowsPerStrip"):
        read_dng(path)


def test_active_area_crop(tmp_path):
    img = _mosaic(h=32, w=48)
    path = str(tmp_path / "raw.dng")
    write_dng(path, img, active_area=(4, 8, 28, 40))
    out = read_dng(path)
    np.testing.assert_array_equal(out, img[4:28, 8:40])


def test_uint8_raw(tmp_path):
    img = (np.arange(32 * 32) % 251).astype(np.uint8).reshape(32, 32)
    path = str(tmp_path / "raw.dng")
    write_dng(path, img)
    np.testing.assert_array_equal(read_dng(path), img)


def test_compressed_raises_with_guidance(tmp_path):
    img = _mosaic()
    path = str(tmp_path / "raw.dng")
    write_dng(path, img, compression=7)  # lossless JPEG marker
    with pytest.raises(ValueError, match="rawpy"):
        read_dng(path)


def test_not_a_tiff_raises(tmp_path):
    path = tmp_path / "raw.dng"
    path.write_bytes(b"definitely not a tiff")
    with pytest.raises(ValueError, match="byte-order"):
        read_dng(str(path))


def test_load_image_dispatches_dng(tmp_path):
    img = _mosaic()
    path = str(tmp_path / "raw.dng")
    write_dng(path, img)
    out = load_image(path)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, img.astype(np.float32))


@pytest.mark.parametrize("subifd_type", [4, 13])
def test_subifd_walk(tmp_path, subifd_type):
    """Real DNGs park the CFA IFD under a stub IFD0's SubIFDs tag — with
    field type LONG (4) or IFD (13, TIFF-EP); both must be walked."""
    img = _mosaic()
    path = str(tmp_path / "raw.dng")
    write_dng(path, img, use_subifd=True, subifd_type=subifd_type)
    np.testing.assert_array_equal(read_dng(path), img)


def test_big_endian_roundtrip(tmp_path):
    img = _mosaic()
    path = str(tmp_path / "raw.dng")
    write_dng(path, img, big_endian=True)
    np.testing.assert_array_equal(read_dng(path), img)


def test_fuzz_truncation_and_corruption_never_hang_or_crash(tmp_path):
    """The hand-written TIFF parser must fail CLEANLY on malformed input:
    truncations and byte flips either still parse (don't-care bytes /
    legitimately changed values) or raise ValueError/struct.error — never
    any other exception, never a giant allocation from a corrupt count
    (the format string for a value array is built only after a
    bounds-vs-file-size check)."""
    import struct

    from raw2logit_tpu.data.dng import get_camera_parameters

    path = str(tmp_path / "raw.dng")
    write_dng(path, _mosaic(), use_subifd=True, active_area=(0, 0, 16, 16),
              rows_per_strip=4,
              camera_parameters=([8.0] * 4, [1.9, 1.0, 1.4],
                                 [1, 0, 0, 0, 1, 0, 0, 0, 1]))
    with open(path, "rb") as fh:
        good = fh.read()

    ok = errors = 0
    for cut in range(0, len(good), 7):
        trunc = str(tmp_path / "t.dng")
        with open(trunc, "wb") as fh:
            fh.write(good[:cut])
        try:
            read_dng(trunc)
            ok += 1
        except (ValueError, struct.error):
            errors += 1
    assert errors > 0  # truncations are detected, not silently accepted

    rng = np.random.default_rng(0)
    for _ in range(300):
        data = bytearray(good)
        i = int(rng.integers(0, len(data)))
        data[i] = int(rng.integers(0, 256))
        fuzzed = str(tmp_path / "f.dng")
        with open(fuzzed, "wb") as fh:
            fh.write(bytes(data))
        for fn in (read_dng, get_camera_parameters):
            try:
                fn(fuzzed)
            except (ValueError, struct.error):
                pass


@pytest.mark.parametrize("big_endian", [False, True])
def test_camera_parameters_roundtrip(tmp_path, big_endian):
    """get_camera_parameters extracts BlackLevel / AsShotNeutral /
    ColorMatrix1 with the reference's return contract (reference
    processing/pipeline_numpy.py:144-149)."""
    from raw2logit_tpu.data.dng import get_camera_parameters

    bl = [528.0, 528.0, 528.0, 528.0]
    wb = [2.0, 1.0, 1.5]
    cm = [1.06, -0.25, 0.19, -0.05, 1.22, -0.17, 0.02, -0.31, 1.29]
    path = str(tmp_path / "raw.dng")
    write_dng(path, _mosaic(), big_endian=big_endian,
              camera_parameters=(bl, wb, cm))
    got_bl, got_wb, got_cm = get_camera_parameters(path)
    np.testing.assert_allclose(got_bl, bl, rtol=2e-5)
    np.testing.assert_allclose(got_wb, wb, rtol=2e-5)
    np.testing.assert_allclose(got_cm, cm, rtol=2e-5)


def test_camera_parameters_scalar_black_level_broadcasts(tmp_path):
    from raw2logit_tpu.data.dng import get_camera_parameters

    path = str(tmp_path / "raw.dng")
    write_dng(path, _mosaic(),
              camera_parameters=([9.25], [1.0, 1.0, 1.0],
                                 [1, 0, 0, 0, 1, 0, 0, 0, 1]))
    bl, wb, cm = get_camera_parameters(path)
    np.testing.assert_allclose(bl, [9.25] * 4)
    np.testing.assert_allclose(wb, [1.0, 1.0, 1.0])


def test_camera_parameters_blacklevel_pair_tiles_and_nan_neutral_raises(
        tmp_path):
    """A 2-value BlackLevel (1x2 repeat pattern) tiles to the four RGGB
    sites; a non-positive/NaN AsShotNeutral must be rejected, not returned
    as NaN white balance."""
    from raw2logit_tpu.data.dng import (_TAG_AS_SHOT_NEUTRAL,
                                        get_camera_parameters)

    path = str(tmp_path / "raw.dng")
    write_dng(path, _mosaic(),
              camera_parameters=([3.0, 7.0], [1.0, 1.0, 1.0],
                                 [1, 0, 0, 0, 1, 0, 0, 0, 1]))
    bl, _, _ = get_camera_parameters(path)
    np.testing.assert_allclose(bl, [3.0, 7.0, 3.0, 7.0])

    # hand-corrupt AsShotNeutral's first denominator to 0 -> NaN value
    with open(path, "rb") as fh:
        data = bytearray(fh.read())
    import struct
    tag_bytes = struct.pack("<H", _TAG_AS_SHOT_NEUTRAL)
    entry = data.find(tag_bytes)
    assert entry != -1
    (val_off,) = struct.unpack_from("<I", data, entry + 8)
    struct.pack_into("<I", data, val_off + 4, 0)  # first denominator
    with open(path, "wb") as fh:
        fh.write(bytes(data))
    with pytest.raises(ValueError, match="AsShotNeutral"):
        get_camera_parameters(path)


def test_write_dng_rejects_out_of_range_rationals(tmp_path):
    """Unsigned RATIONAL tags (BlackLevel/AsShotNeutral) must reject
    negative values with a clear error, not a bare struct.error."""
    path = str(tmp_path / "raw.dng")
    with pytest.raises(ValueError, match="RATIONAL"):
        write_dng(path, _mosaic(),
                  camera_parameters=([-5.0] * 4, [1.0, 1.0, 1.0],
                                     [1, 0, 0, 0, 1, 0, 0, 0, 1]))


def test_camera_parameters_missing_tags_named(tmp_path):
    from raw2logit_tpu.data.dng import get_camera_parameters

    path = str(tmp_path / "raw.dng")
    write_dng(path, _mosaic())  # no camera tags
    with pytest.raises(ValueError, match="BlackLevel.*AsShotNeutral"):
        get_camera_parameters(path)


def test_camera_parameters_survive_subifd_and_crop(tmp_path):
    """Tags live on the CFA IFD — the same IFD selection as read_dng."""
    from raw2logit_tpu.data.dng import get_camera_parameters

    path = str(tmp_path / "raw.dng")
    write_dng(path, _mosaic(), use_subifd=True, active_area=(0, 0, 16, 16),
              camera_parameters=([100, 101, 102, 103], [1.9, 1.0, 1.4],
                                 [1, 0, 0, 0, 1, 0, 0, 0, 1]))
    bl, wb, _ = get_camera_parameters(path)
    np.testing.assert_allclose(bl, [100, 101, 102, 103])
    np.testing.assert_allclose(wb, [1.9, 1.0, 1.4], rtol=2e-5)
