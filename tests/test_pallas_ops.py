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


class TestNmsTopkPallas:
    """The single-invocation VMEM-resident greedy NMS must reproduce
    ``topk_nms``'s exact semantics (interpret mode on CPU)."""

    def _random_boxes(self, rng, n):
        ctr = rng.uniform(10, 90, (n, 3))
        sz = rng.uniform(2, 25, (n, 3))
        boxes = np.stack([
            ctr[:, 0] - sz[:, 0], ctr[:, 1] - sz[:, 1],
            ctr[:, 0] + sz[:, 0], ctr[:, 1] + sz[:, 1],
            ctr[:, 2] - sz[:, 2], ctr[:, 2] + sz[:, 2],
        ], axis=1).astype(np.float32)
        return boxes

    @pytest.mark.parametrize("n,max_out", [(50, 10), (200, 64), (333, 100)])
    def test_matches_lax_topk_nms(self, n, max_out):
        from nndetection_tpu.core.boxes.nms import topk_nms
        from nndetection_tpu.ops.pallas_ops import nms_topk_pallas

        rng = np.random.RandomState(n)
        boxes = self._random_boxes(rng, n)
        scores = rng.rand(n).astype(np.float32)
        valid = rng.rand(n) > 0.1
        for thresh in (0.1, 0.5):
            ref_idx, ref_valid = topk_nms(
                jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
                thresh, max_out,
            )
            got_idx, got_valid = nms_topk_pallas(
                jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
                thresh, max_out, interpret=True,
            )
            np.testing.assert_array_equal(
                np.asarray(ref_valid), np.asarray(got_valid)
            )
            m = np.asarray(ref_valid)
            np.testing.assert_array_equal(
                np.asarray(ref_idx)[m], np.asarray(got_idx)[m]
            )

    def test_all_invalid(self):
        from nndetection_tpu.ops.pallas_ops import nms_topk_pallas

        boxes = np.zeros((16, 6), np.float32)
        got_idx, got_valid = nms_topk_pallas(
            jnp.asarray(boxes), jnp.zeros(16), jnp.zeros(16, bool), 0.5, 8,
            interpret=True,
        )
        assert not np.asarray(got_valid).any()
