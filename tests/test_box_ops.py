import numpy as np
import jax.numpy as jnp
import pytest

from nndetection_tpu.core.boxes import (
    box_area,
    box_center,
    box_center_dist,
    box_iou,
    center_in_boxes,
    clip_boxes_to_image,
    generalized_box_iou,
    permute_boxes,
    small_boxes_mask,
)
from nndetection_tpu.core.boxes.ops import elementwise_generalized_box_iou
from nndetection_tpu.core.boxes.ops_np import box_iou_np


def random_boxes_3d(rng, n, scale=50):
    lo = rng.uniform(0, scale, size=(n, 3))
    hi = lo + rng.uniform(1, scale / 2, size=(n, 3))
    return np.stack(
        [lo[:, 0], lo[:, 1], hi[:, 0], hi[:, 1], lo[:, 2], hi[:, 2]], axis=1
    ).astype(np.float32)


def iou_brute(b1, b2):
    def vol(b):
        return (b[2] - b[0]) * (b[3] - b[1]) * (b[5] - b[4])

    out = np.zeros((len(b1), len(b2)))
    for i, a in enumerate(b1):
        for j, b in enumerate(b2):
            x1, y1 = max(a[0], b[0]), max(a[1], b[1])
            x2, y2 = min(a[2], b[2]), min(a[3], b[3])
            z1, z2 = max(a[4], b[4]), min(a[5], b[5])
            inter = max(0, x2 - x1) * max(0, y2 - y1) * max(0, z2 - z1)
            out[i, j] = inter / (vol(a) + vol(b) - inter)
    return out


class TestIoU:
    def test_matches_bruteforce(self, rng):
        b1 = random_boxes_3d(rng, 13)
        b2 = random_boxes_3d(rng, 7)
        got = np.asarray(box_iou(jnp.asarray(b1), jnp.asarray(b2)))
        want = iou_brute(b1, b2)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_np_twin_matches(self, rng):
        b1 = random_boxes_3d(rng, 9)
        b2 = random_boxes_3d(rng, 11)
        np.testing.assert_allclose(
            box_iou_np(b1, b2), np.asarray(box_iou(jnp.asarray(b1), jnp.asarray(b2))),
            rtol=1e-5,
        )

    def test_identity(self, rng):
        b = random_boxes_3d(rng, 5)
        iou = np.asarray(box_iou(jnp.asarray(b), jnp.asarray(b)))
        np.testing.assert_allclose(np.diag(iou), 1.0, rtol=1e-6)

    def test_disjoint(self):
        b1 = jnp.asarray([[0, 0, 1, 1, 0, 1]], jnp.float32)
        b2 = jnp.asarray([[5, 5, 6, 6, 5, 6]], jnp.float32)
        assert float(box_iou(b1, b2)[0, 0]) == 0.0

    def test_2d(self):
        b1 = jnp.asarray([[0, 0, 2, 2]], jnp.float32)
        b2 = jnp.asarray([[1, 1, 3, 3]], jnp.float32)
        # inter 1, union 7
        np.testing.assert_allclose(float(box_iou(b1, b2)[0, 0]), 1 / 7, rtol=1e-6)


class TestGIoU:
    def test_equals_iou_when_overlapping_hull(self):
        b = jnp.asarray([[0, 0, 2, 2, 0, 2]], jnp.float32)
        np.testing.assert_allclose(float(generalized_box_iou(b, b)[0, 0]), 1.0)

    def test_disjoint_negative(self):
        b1 = jnp.asarray([[0, 0, 1, 1, 0, 1]], jnp.float32)
        b2 = jnp.asarray([[2, 2, 3, 3, 2, 3]], jnp.float32)
        assert float(generalized_box_iou(b1, b2)[0, 0]) < 0

    def test_elementwise_matches_pairwise_diag(self, rng):
        b1 = random_boxes_3d(rng, 6)
        b2 = random_boxes_3d(rng, 6)
        pair = np.asarray(generalized_box_iou(jnp.asarray(b1), jnp.asarray(b2), eps=1e-7))
        elem = np.asarray(
            elementwise_generalized_box_iou(jnp.asarray(b1), jnp.asarray(b2))
        )
        np.testing.assert_allclose(np.diag(pair), elem, rtol=1e-4, atol=1e-5)


class TestMisc:
    def test_area_center(self):
        b = jnp.asarray([[0, 0, 2, 4, 0, 6]], jnp.float32)
        assert float(box_area(b)[0]) == 2 * 4 * 6
        np.testing.assert_allclose(np.asarray(box_center(b))[0], [1, 2, 3])

    def test_clip(self):
        b = jnp.asarray([[-5, -5, 20, 20, -1, 30]], jnp.float32)
        c = np.asarray(clip_boxes_to_image(b, (10, 12, 8)))
        np.testing.assert_allclose(c[0], [0, 0, 10, 12, 0, 8])

    def test_small_boxes_mask(self):
        b = jnp.asarray(
            [[0, 0, 5, 5, 0, 5], [0, 0, 0.001, 5, 0, 5]], jnp.float32
        )
        m = np.asarray(small_boxes_mask(b, 0.01))
        assert m.tolist() == [True, False]

    def test_center_dist(self):
        b1 = jnp.asarray([[0, 0, 2, 2, 0, 2]], jnp.float32)
        b2 = jnp.asarray([[4, 0, 6, 2, 0, 2]], jnp.float32)
        d, c1, c2 = box_center_dist(b1, b2)
        np.testing.assert_allclose(float(d[0, 0]), 4.0)

    def test_center_in_boxes(self):
        centers = jnp.asarray([[1, 1, 1], [10, 10, 10]], jnp.float32)
        boxes = jnp.asarray(
            [[0, 0, 2, 2, 0, 2], [0, 0, 2, 2, 0, 2]], jnp.float32
        )
        m = np.asarray(center_in_boxes(centers, boxes))
        assert m.tolist() == [True, False]

    def test_permute_roundtrip(self, rng):
        b = jnp.asarray(random_boxes_3d(rng, 4))
        p = permute_boxes(b, (2, 0, 1))
        # inverse of (2,0,1) is (1,2,0)
        back = permute_boxes(p, (1, 2, 0))
        np.testing.assert_allclose(np.asarray(back), np.asarray(b))
