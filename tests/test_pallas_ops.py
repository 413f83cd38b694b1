"""Pallas kernels validated against jnp references in interpreter mode."""
import numpy as np
import jax.numpy as jnp
import pytest

from nndetection_tpu.core.boxes.ops import box_iou
from nndetection_tpu.ops.pallas_ops import iou_matrix_pallas, suppression_matrix_pallas
from tests.test_box_ops import random_boxes_3d


class TestPallasIoU:
    def test_matches_reference(self, rng):
        b1 = random_boxes_3d(rng, 100)
        b2 = random_boxes_3d(rng, 70)
        want = np.asarray(box_iou(jnp.asarray(b1), jnp.asarray(b2)))
        got = np.asarray(
            iou_matrix_pallas(jnp.asarray(b1), jnp.asarray(b2), interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_non_multiple_sizes(self, rng):
        b1 = random_boxes_3d(rng, 13)
        b2 = random_boxes_3d(rng, 300)
        want = np.asarray(box_iou(jnp.asarray(b1), jnp.asarray(b2)))
        got = np.asarray(
            iou_matrix_pallas(jnp.asarray(b1), jnp.asarray(b2), interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestSuppressionMatrix:
    def test_matches_greedy_structure(self, rng):
        boxes = random_boxes_3d(rng, 40)
        scores = rng.uniform(0, 1, 40).astype(np.float32)
        order = np.argsort(-scores)
        sorted_boxes = boxes[order]
        sup = np.asarray(
            suppression_matrix_pallas(jnp.asarray(sorted_boxes), 0.3, interpret=True)
        )
        iou = np.asarray(box_iou(jnp.asarray(sorted_boxes), jnp.asarray(sorted_boxes)))
        want = (iou > 0.3) & (np.arange(40)[None, :] > np.arange(40)[:, None])
        np.testing.assert_array_equal(sup.astype(bool), want)

    def test_greedy_scan_equivalence(self, rng):
        """suppression matrix + greedy scan == reference greedy NMS."""
        from nndetection_tpu.core.boxes.ops_np import nms_np

        boxes = random_boxes_3d(rng, 50)
        scores = rng.uniform(0, 1, 50).astype(np.float32)
        order = np.argsort(-scores, kind="stable")
        sup = np.asarray(
            suppression_matrix_pallas(jnp.asarray(boxes[order]), 0.25, interpret=True)
        ).astype(bool)
        keep = np.ones(50, bool)
        for i in range(50):
            if keep[i]:
                keep &= ~sup[i]
        got = order[keep].tolist()
        want = nms_np(boxes, scores, 0.25).tolist()
        assert got == want
