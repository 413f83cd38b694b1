"""MXU shear-decomposition resample vs gather-based map_coordinates."""
import jax
import numpy as np
import jax.numpy as jnp
import pytest
from jax.scipy.ndimage import map_coordinates

from nndetection_tpu.data.affine_mxu import (
    affine_resample_mxu,
    affine_resample_seg_mxu,
)
from nndetection_tpu.data.augment import AugmentConfig, _affine_coords


def reference_resample(vol, out_shape, angles, scale, order):
    """Gather-based golden using the exact coordinate map of augment.py."""
    from nndetection_tpu.data.augment import _rotation_matrix_3d

    dim = 3
    rot = _rotation_matrix_3d(jnp.asarray(angles))
    mat = rot * scale
    grids = jnp.meshgrid(
        *[jnp.arange(s, dtype=jnp.float32) for s in out_shape], indexing="ij"
    )
    out_center = jnp.asarray([(s - 1) / 2.0 for s in out_shape])
    in_center = jnp.asarray([(s - 1) / 2.0 for s in vol.shape[:3]])
    coords = jnp.stack([g - c for g, c in zip(grids, out_center)], axis=0)
    coords = jnp.tensordot(mat, coords.reshape(dim, -1), axes=1).reshape(dim, *out_shape)
    coords = coords + in_center.reshape(dim, 1, 1, 1)
    return map_coordinates(vol[..., 0], list(coords), order=order, mode="constant")


def smooth_volume(rng, shape=(24, 24, 24)):
    """Low-frequency volume so interpolation-scheme differences are small."""
    coarse = rng.rand(6, 6, 6).astype(np.float32)
    z = jax.image.resize(jnp.asarray(coarse), shape, "linear")
    return np.asarray(z)[..., None]


class TestAffineMXU:
    def test_identity(self, rng):
        vol = jnp.asarray(rng.rand(12, 14, 16, 1).astype(np.float32))
        out = affine_resample_mxu(vol, (12, 14, 16), jnp.zeros(3), 1.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(vol), atol=1e-4)

    def test_center_crop(self, rng):
        vol = jnp.asarray(rng.rand(20, 20, 20, 1).astype(np.float32))
        out = affine_resample_mxu(vol, (10, 10, 10), jnp.zeros(3), 1.0)
        want = np.asarray(vol)[5:15, 5:15, 5:15, 0]
        np.testing.assert_allclose(np.asarray(out)[..., 0], want, atol=1e-4)

    def test_pure_scale_matches_gather(self, rng):
        vol = jnp.asarray(smooth_volume(rng))
        out = affine_resample_mxu(vol, (12, 12, 12), jnp.zeros(3), 1.3)
        want = reference_resample(vol, (12, 12, 12), [0, 0, 0], 1.3, order=1)
        np.testing.assert_allclose(np.asarray(out)[..., 0], np.asarray(want), atol=1e-3)

    @pytest.mark.parametrize(
        "angles", [(0.3, 0, 0), (0, 0.3, 0), (0, 0, 0.3), (0.2, -0.25, 0.15)]
    )
    def test_rotation_close_to_gather(self, rng, angles):
        vol = jnp.asarray(smooth_volume(rng, (28, 28, 28)))
        out = affine_resample_mxu(vol, (12, 12, 12), jnp.asarray(angles), 1.0)
        want = reference_resample(vol, (12, 12, 12), list(angles), 1.0, order=1)
        # shear decomposition interpolates three times -> small smoothing
        # differences; on smooth volumes agreement is tight
        diff = np.abs(np.asarray(out)[..., 0] - np.asarray(want))
        assert np.median(diff) < 0.01
        assert diff.mean() < 0.02

    def test_rotation_moves_blob_correctly(self, rng):
        """A delta blob must land where the gather reference puts it."""
        vol = np.zeros((32, 32, 32, 1), np.float32)
        vol[20, 15, 15, 0] = 1.0
        angles = jnp.asarray([0.0, 0.0, 0.4])
        out = np.asarray(affine_resample_mxu(jnp.asarray(vol), (32, 32, 32), angles, 1.0))[..., 0]
        want = np.asarray(reference_resample(jnp.asarray(vol), (32, 32, 32), [0, 0, 0.4], 1.0, 1))
        com_out = np.array(np.unravel_index(np.argmax(out), out.shape))
        com_want = np.array(np.unravel_index(np.argmax(want), want.shape))
        assert np.abs(com_out - com_want).max() <= 1

    def test_seg_nearest_labels_preserved(self, rng):
        seg = np.zeros((24, 24, 24), np.int32)
        seg[8:16, 8:16, 8:16] = 3
        out = np.asarray(
            affine_resample_seg_mxu(
                jnp.asarray(seg), (16, 16, 16), jnp.asarray([0.2, 0.1, -0.15]), 1.1
            )
        )
        assert set(np.unique(out)).issubset({-1, 0, 3})
        assert (out == 3).sum() > 0

    def test_seg_outside_is_cval(self):
        seg = np.ones((8, 8, 8), np.int32)
        # huge upscale -> output samples outside the source volume
        out = np.asarray(
            affine_resample_seg_mxu(jnp.asarray(seg), (8, 8, 8), jnp.zeros(3), 3.0)
        )
        assert (out == -1).any()
        assert (out == 1).any()
