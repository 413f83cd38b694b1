"""DICOM reader on synthetic Part-10 files (explicit + implicit VR LE)."""
import struct
from pathlib import Path

import numpy as np

from nndetection_tpu.data import dicom


def _el_explicit(group, elem, vr, value: bytes) -> bytes:
    if len(value) % 2:
        value += b"\x00" if vr != b"UI" else b"\x00"
    if vr in (b"OB", b"OW", b"SQ", b"UN", b"UT"):
        return struct.pack("<HH2sHI", group, elem, vr, 0, len(value)) + value
    return struct.pack("<HH2sH", group, elem, vr, len(value)) + value


def _el_implicit(group, elem, value: bytes) -> bytes:
    if len(value) % 2:
        value += b"\x00"
    return struct.pack("<HHI", group, elem, len(value)) + value


def write_slice(
    path: Path,
    pixels: np.ndarray,
    position,
    series_uid="1.2.3.4",
    explicit=True,
    slope=1.0,
    intercept=0.0,
    pixel_spacing=(0.8, 0.7),
):
    rows, cols = pixels.shape
    ts = dicom.EXPLICIT_VR_LE if explicit else dicom.IMPLICIT_VR_LE
    meta = _el_explicit(0x0002, 0x0010, b"UI", ts.encode())
    el = (lambda g, e, vr, v: _el_explicit(g, e, vr, v)) if explicit else (
        lambda g, e, vr, v: _el_implicit(g, e, v)
    )
    ds = b""
    ds += el(0x0018, 0x0050, b"DS", b"2.5")
    ds += el(0x0020, 0x000E, b"UI", series_uid.encode())
    ds += el(0x0020, 0x0032, b"DS",
             "\\".join(f"{p:.4f}" for p in position).encode())
    ds += el(0x0020, 0x0037, b"DS", b"1\\0\\0\\0\\1\\0")
    ds += el(0x0028, 0x0002, b"US", struct.pack("<H", 1))
    ds += el(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    ds += el(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    ds += el(0x0028, 0x0030, b"DS",
             f"{pixel_spacing[0]}\\{pixel_spacing[1]}".encode())
    ds += el(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    ds += el(0x0028, 0x0103, b"US", struct.pack("<H", 1))
    ds += el(0x0028, 0x1052, b"DS", str(intercept).encode())
    ds += el(0x0028, 0x1053, b"DS", str(slope).encode())
    pix = pixels.astype("<i2").tobytes()
    ds += el(0x7FE0, 0x0010, b"OW", pix)
    path.write_bytes(b"\x00" * 128 + b"DICM" + meta + ds)


class TestDicom:
    def _make_series(self, d: Path, explicit=True, n=4, **kw):
        rng = np.random.default_rng(7)
        vols = []
        # write out of order on purpose: sorting must use positions
        for k in [2, 0, 3, 1][:n]:
            px = rng.integers(-900, 900, size=(6, 5)).astype(np.int16)
            vols.append((k, px))
            write_slice(
                d / f"slice_{k}.dcm", px, (10.0, 20.0, 30.0 + 2.5 * k),
                explicit=explicit, **kw,
            )
        vols.sort(key=lambda t: t[0])
        return np.stack([v for _, v in vols])

    def test_series_explicit(self, tmp_path):
        expected = self._make_series(tmp_path, explicit=True)
        vol, spacing, origin, direction = dicom.load_series(tmp_path)
        np.testing.assert_array_equal(vol, expected.astype(np.float32))
        np.testing.assert_allclose(spacing, [2.5, 0.8, 0.7])
        np.testing.assert_allclose(origin, [10.0, 20.0, 30.0])
        np.testing.assert_allclose(direction, np.eye(3))

    def test_series_implicit_with_rescale(self, tmp_path):
        expected = self._make_series(
            tmp_path, explicit=False, slope=2.0, intercept=-1024.0
        )
        vol, spacing, _, _ = dicom.load_series(tmp_path)
        np.testing.assert_allclose(vol, expected * 2.0 - 1024.0)

    def test_series_filter_by_uid(self, tmp_path):
        self._make_series(tmp_path, n=4)
        write_slice(
            tmp_path / "other.dcm",
            np.zeros((6, 5), dtype=np.int16),
            (0, 0, 0),
            series_uid="9.9.9",
        )
        vol, _, _, _ = dicom.load_series(tmp_path)  # majority series wins
        assert vol.shape == (4, 6, 5)
        vol2, _, _, _ = dicom.load_series(tmp_path, series_uid="9.9.9")
        assert vol2.shape == (1, 6, 5)

    def test_resample_to_reference_identity_and_shift(self, tmp_path):
        vol = np.zeros((6, 6, 6), dtype=np.float32)
        vol[2:4, 2:4, 2:4] = 100.0
        aff = dicom.affine_from_geometry(
            np.ones(3), np.zeros(3), np.eye(3)
        )
        out = dicom.resample_to_reference(vol, aff, vol.shape, aff)
        np.testing.assert_allclose(out, vol, atol=1e-4)
        # reference grid shifted by one world unit along x (= i axis)
        ref_aff = aff.copy()
        ref_aff[0, 3] = 1.0
        out = dicom.resample_to_reference(vol, aff, vol.shape, ref_aff)
        np.testing.assert_allclose(out[2:4, 2:4, 1:3], 100.0, atol=1e-4)
