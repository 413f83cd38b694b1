"""Data/seg/box consistency through the full on-device augmentation path.

If the MXU shear resample transformed the image and the label differently,
training targets would silently diverge from pixels — this test plants a
bright cube, augments with forced rotation+scale, derives boxes from the
augmented seg, and verifies the image brightness is concentrated inside the
derived box.
"""
import jax
import numpy as np
import jax.numpy as jnp

from nndetection_tpu.data.augment import AugmentConfig, augment_batch, get_generator_patch_size
from nndetection_tpu.data.gt_prep import prepare_targets


def make_case(rng, gen, cube_lo, cube_hi):
    data = rng.normal(0.0, 0.05, size=(1, *gen, 1)).astype(np.float32)
    seg = np.zeros((1, *gen), np.int32)
    sl = tuple(slice(lo, hi) for lo, hi in zip(cube_lo, cube_hi))
    data[(0, *sl, 0)] += 2.0
    seg[(0, *sl)] = 1
    return data, seg


class TestAugConsistency:
    def test_box_contains_bright_content(self, rng):
        patch = (24, 24, 24)
        cfg = AugmentConfig(
            patch_size=patch,
            p_rotation=1.0,
            p_scale=1.0,
            scale_range=(0.85, 1.2),
            p_noise=0.0, p_blur=0.0, p_brightness=0.0, p_contrast=0.0,
            p_lowres=0.0, p_gamma=0.0,
        )
        gen = get_generator_patch_size(patch)
        c = tuple(g // 2 for g in gen)
        data, seg = make_case(rng, gen, [x - 4 for x in c], [x + 4 for x in c])
        table = np.full((1, 4), -1, np.int32)
        table[0, 0] = 0

        for trial in range(4):
            d, s = augment_batch(
                jax.random.PRNGKey(trial), jnp.asarray(data), jnp.asarray(seg), cfg
            )
            out = prepare_targets(d, s, jnp.asarray(table))
            assert bool(out["gt_mask"][0, 0]), f"instance lost (trial {trial})"
            box = np.asarray(out["gt_boxes"][0, 0])
            img = np.asarray(d[0, ..., 0], np.float32)
            inside = img[
                int(box[0]) : int(np.ceil(box[2])),
                int(box[1]) : int(np.ceil(box[3])),
                int(box[4]) : int(np.ceil(box[5])),
            ]
            # bright cube mass must sit inside the derived box; the box is the
            # AABB of a ROTATED cube (background corners included) and data/
            # label boundary voxels differ by design (linear vs nearest), so
            # assert center alignment + solid-core containment
            assert inside.mean() > 0.5, f"trial {trial}: inside mean {inside.mean()}"
            bright_idx = np.argwhere(img > 1.5)  # solid core
            assert len(bright_idx) > 0
            bright_com = bright_idx.mean(axis=0)
            box_com = np.asarray(
                [(box[0] + box[2]) / 2, (box[1] + box[3]) / 2, (box[4] + box[5]) / 2]
            )
            assert np.abs(bright_com - box_com).max() < 2.0, (
                f"trial {trial}: centers diverge {bright_com} vs {box_com}"
            )
            core_inside = (
                (bright_idx >= np.floor(box[[0, 1, 4]])).all(axis=1)
                & (bright_idx <= np.ceil(box[[2, 3, 5]])).all(axis=1)
            ).mean()
            assert core_inside >= 0.85, f"trial {trial}: core containment {core_inside}"

    def test_mirror_consistency(self, rng):
        patch = (16, 16, 16)
        cfg = AugmentConfig(
            patch_size=patch,
            p_rotation=0.0, p_scale=0.0, p_noise=0.0, p_blur=0.0,
            p_brightness=0.0, p_contrast=0.0, p_lowres=0.0, p_gamma=0.0,
            mirror_axes=(0, 1, 2),
        )
        data, seg = make_case(rng, patch, (2, 3, 4), (6, 8, 9))
        table = np.full((1, 4), -1, np.int32)
        table[0, 0] = 1
        d, s = augment_batch(
            jax.random.PRNGKey(3), jnp.asarray(data), jnp.asarray(seg), cfg
        )
        out = prepare_targets(d, s, jnp.asarray(table))
        box = np.asarray(out["gt_boxes"][0, 0])
        img = np.asarray(d[0, ..., 0], np.float32)
        inside = img[
            int(box[0]) : int(box[2]), int(box[1]) : int(box[3]),
            int(box[4]) : int(box[5]),
        ]
        assert (inside > 1.0).all()
        # semantic seg consistent with class table (class 1 -> semantic 2)
        assert np.asarray(out["seg"]).max() == 2


class TestElasticDummy2DMask:
    """Round-2 parity features: elastic deformation, dummy-2D anisotropic
    mode, mask-norm zeroing (reference ``bg_aug.py:68-90,144-146`` +
    ``MaskTransform``)."""

    def _cfg(self, patch, **kw):
        base = dict(
            patch_size=patch,
            p_rotation=0.0, p_scale=0.0, p_noise=0.0, p_blur=0.0,
            p_brightness=0.0, p_contrast=0.0, p_lowres=0.0, p_gamma=0.0,
            mirror_axes=(),
        )
        base.update(kw)
        return AugmentConfig(**base)

    def test_elastic_deforms_and_preserves_consistency(self, rng):
        patch = (20, 20, 20)
        cfg = self._cfg(patch, p_elastic=1.0, elastic_alpha=(500.0, 900.0))
        gen = tuple(int(p) for p in patch)
        c = tuple(g // 2 for g in gen)
        data, seg = make_case(rng, gen, [x - 5 for x in c], [x + 5 for x in c])
        d, s = augment_batch(
            jax.random.PRNGKey(3), jnp.asarray(data), jnp.asarray(seg), cfg
        )
        d, s = np.asarray(d), np.asarray(s)
        assert np.isfinite(d).all()
        # strong elastic must actually move labels
        assert (s[0] != seg[0]).mean() > 0.01
        # data/seg stay consistent: bright voxels still coincide with label 1
        bright = d[0, ..., 0] > 1.0
        if bright.sum() > 50:
            assert (s[0][bright] == 1).mean() > 0.85

    def test_elastic_off_is_identity_of_affine_path(self, rng):
        patch = (16, 16, 16)
        cfg0 = self._cfg(patch, p_elastic=0.0, use_mxu_resample=False)
        gen = patch
        data, seg = make_case(rng, gen, (5, 5, 5), (11, 11, 11))
        d0, s0 = augment_batch(
            jax.random.PRNGKey(0), jnp.asarray(data), jnp.asarray(seg), cfg0
        )
        # identity transform: data returned unchanged
        np.testing.assert_allclose(np.asarray(d0), data, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(s0), seg)

    def test_dummy_2d_leaves_axis0_unmixed(self, rng):
        """With in-plane-only transforms, a volume that varies ONLY along
        axis 0 is reproduced exactly (up to borders)."""
        patch = (12, 24, 24)
        for use_mxu in (True, False):
            cfg = self._cfg(
                patch, dummy_2d=True, p_rotation=1.0, rotation_deg=180.0,
                p_scale=1.0, scale_range=(0.9, 1.1), use_mxu_resample=use_mxu,
            )
            from nndetection_tpu.data.augment import generator_patch_size_for

            gen = generator_patch_size_for(cfg)
            assert gen[0] == patch[0], "dummy-2D must not enlarge axis 0"
            ramp = np.arange(gen[0], dtype=np.float32)
            data = np.tile(
                ramp[None, :, None, None, None], (1, 1, gen[1], gen[2], 1)
            )
            seg = np.zeros((1, *gen), np.int32)
            d, _ = augment_batch(
                jax.random.PRNGKey(1), jnp.asarray(data), jnp.asarray(seg), cfg
            )
            d = np.asarray(d, np.float32)[0, ..., 0]
            interior = d[:, 4:-4, 4:-4]
            expect = np.broadcast_to(
                ramp[:, None, None], interior.shape
            )
            np.testing.assert_allclose(interior, expect, atol=0.05)

    def test_mask_norm_zeroing(self, rng):
        patch = (12, 12, 12)
        cfg = self._cfg(patch, mask_norm_zero=True)
        data = np.full((1, *patch, 1), 5.0, np.float32)
        seg = np.zeros((1, *patch), np.int32)
        seg[:, :4] = -1  # outside nonzero mask
        d, s = augment_batch(
            jax.random.PRNGKey(0), jnp.asarray(data), jnp.asarray(seg), cfg
        )
        d = np.asarray(d)[0, ..., 0]
        assert np.all(d[:4] == 0.0)
        assert np.all(d[4:] == 5.0)


class TestGammaInvertFinite:
    def test_inverted_gamma_stays_finite_bf16(self, rng):
        """Regression: on TPU the `(x-lo)/rng` normalization divides via an
        approximate reciprocal, so the max voxel's ratio can round above 1;
        with gamma-invert the pow base then goes negative -> NaN that the
        retain-stats normalization spreads to the whole volume (seen ~1%% of
        real toy train steps; root-caused via scripts_dev/nan_hunt.py). The
        clamp must keep every voxel finite for any base value in any dtype."""
        import ml_dtypes

        patch = (16, 16, 16)
        cfg = AugmentConfig(
            patch_size=patch,
            p_rotation=0.0, p_scale=0.0,
            p_noise=0.0, p_blur=0.0, p_brightness=0.0, p_contrast=0.0,
            p_lowres=0.0,
            p_gamma=1.0, p_gamma_invert=1.0,
        )
        gen = get_generator_patch_size(patch, rotation_deg=cfg.rotation_deg,
                                       scale_min=cfg.scale_range[0])
        for scale in (1.0, 1e-4, 1e4):
            data = (rng.normal(0.0, scale, size=(2, *gen, 1))).astype(
                ml_dtypes.bfloat16
            )
            seg = np.zeros((2, *gen), np.int32)
            out, _ = jax.jit(
                lambda k, d, s: augment_batch(k, d, s, cfg)
            )(jax.random.PRNGKey(3), jnp.asarray(data), jnp.asarray(seg))
            assert bool(jnp.isfinite(out.astype(jnp.float32)).all()), scale

    def test_gamma_clamp_handles_overshoot(self):
        """Directly exercise the hazard: if normalized intensities exceeded 1
        (TPU reciprocal rounding), the inverted pow base would be negative.
        The clamp makes the gamma output independent of such overshoot."""
        x = jnp.asarray([0.0, 0.25, 0.5, 1.0 + 1e-6])
        gamma = 0.8
        xn = jnp.clip(x, 0.0, 1.0)
        out = (1.0 - xn) ** gamma
        assert bool(jnp.isfinite(out).all())
