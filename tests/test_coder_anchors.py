import numpy as np
import jax.numpy as jnp

from nndetection_tpu.core.boxes import AnchorGenerator, BoxCoder, compute_anchors_for_strides
from tests.test_box_ops import random_boxes_3d


class TestBoxCoder:
    def test_roundtrip(self, rng):
        coder = BoxCoder(dim=3)
        gt = jnp.asarray(random_boxes_3d(rng, 20))
        anchors = jnp.asarray(random_boxes_3d(rng, 20))
        deltas = coder.encode(gt, anchors)
        back = coder.decode(deltas, anchors)
        np.testing.assert_allclose(np.asarray(back), np.asarray(gt), rtol=1e-4, atol=1e-3)

    def test_golden_values(self):
        # anchor [0,0,4,4,0,4] (ctr 2,2,2, size 4); gt [2,2,10,10,2,10]
        # (ctr 6,6,6, size 8) -> dx=dy=dz=(6-2)/4=1, dw=dh=dd=log(2)
        coder = BoxCoder(dim=3)
        anchors = jnp.asarray([[0, 0, 4, 4, 0, 4]], jnp.float32)
        gt = jnp.asarray([[2, 2, 10, 10, 2, 10]], jnp.float32)
        d = np.asarray(coder.encode(gt, anchors))[0]
        np.testing.assert_allclose(d, [1, 1, np.log(2), np.log(2), 1, np.log(2)], rtol=1e-6)

    def test_decode_clip(self):
        coder = BoxCoder(dim=3, bbox_xform_clip=np.log(8.0))
        anchors = jnp.asarray([[0, 0, 1, 1, 0, 1]], jnp.float32)
        deltas = jnp.asarray([[0, 0, 100.0, 100.0, 0, 100.0]], jnp.float32)
        out = np.asarray(coder.decode(deltas, anchors))[0]
        # size capped at exp(log 8) * 1 = 8
        np.testing.assert_allclose(out[2] - out[0], 8.0, rtol=1e-5)

    def test_weights(self):
        coder = BoxCoder(weights=(2.0, 2.0, 1.0, 1.0, 2.0, 1.0), dim=3)
        anchors = jnp.asarray([[0, 0, 4, 4, 0, 4]], jnp.float32)
        gt = jnp.asarray([[2, 2, 10, 10, 2, 10]], jnp.float32)
        d = np.asarray(coder.encode(gt, anchors))[0]
        np.testing.assert_allclose(d[:2], [2, 2], rtol=1e-6)  # wx=wy=2 scales dx
        back = np.asarray(coder.decode(coder.encode(gt, anchors), anchors))
        np.testing.assert_allclose(back, np.asarray(gt), rtol=1e-4)

    def test_2d(self, rng):
        coder = BoxCoder(dim=2)
        lo = rng.uniform(0, 50, (8, 2))
        hi = lo + rng.uniform(1, 20, (8, 2))
        gt = jnp.asarray(np.concatenate([lo, hi], 1)[:, [0, 1, 2, 3]], jnp.float32)
        anchors = gt + 3.0
        back = coder.decode(coder.encode(gt, anchors), anchors)
        np.testing.assert_allclose(np.asarray(back), np.asarray(gt), rtol=1e-4, atol=1e-3)


class TestAnchors:
    def test_cell_anchor_counts(self):
        gen = AnchorGenerator(
            width=[(4, 8), (8,)], height=[(4,), (8, 16)], depth=[(2,), (4,)]
        )
        assert gen.num_anchors_per_location() == [2, 2]
        assert gen.cell_anchors(0).shape == (2, 6)

    def test_grid_layout(self):
        # one level, stride (2,4,8), single anchor of size (2,2,2)
        gen = AnchorGenerator(width=[2], height=[2], depth=[2])
        anchors, per_level = gen.grid_anchors([(2, 2, 2)], [(2, 4, 8)])
        assert per_level == [8]
        # ordering: row-major over (s0, s1, s2); first anchor centered at 0
        np.testing.assert_allclose(anchors[0], [-1, -1, 1, 1, -1, 1])
        # second anchor: s2 advances first -> center (0, 0, 8)
        np.testing.assert_allclose(anchors[1], [-1, -1, 1, 1, 7, 9])
        # index 4 = s0 advances -> center (2, 0, 0)
        np.testing.assert_allclose(anchors[4], [1, -1, 3, 1, -1, 1])

    def test_multi_level_concat(self):
        gen = AnchorGenerator(width=[2, 4], height=[2, 4], depth=[2, 4])
        anchors, per_level = gen.grid_anchors(
            [(4, 4, 4), (2, 2, 2)], [(1, 1, 1), (2, 2, 2)]
        )
        assert per_level == [64, 8]
        assert anchors.shape == (72, 6)

    def test_anchor_sizes_centered(self):
        gen = AnchorGenerator(width=[(6,)], height=[(10,)], depth=[(4,)])
        cell = gen.cell_anchors(0)
        np.testing.assert_allclose(cell[0], [-3, -5, 3, 5, -2, 2])

    def test_compute_anchors_for_strides(self):
        base = np.asarray([[-2, -2, 2, 2, -1, 1]], np.float32)
        out = compute_anchors_for_strides(base, [(2, 2, 2), (4, 4, 4)], cat=True)
        assert out.shape == (3, 6)
        np.testing.assert_allclose(out[1], [-4, -4, 4, 4, -2, 2])
        np.testing.assert_allclose(out[2], [-8, -8, 8, 8, -4, 4])
