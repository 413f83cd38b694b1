import numpy as np
import jax.numpy as jnp

from nndetection_tpu.core.boxes import batched_nms_mask, nms_mask, topk_nms
from nndetection_tpu.core.boxes.nms import batched_nms_topk
from nndetection_tpu.core.boxes.ops_np import batched_nms_np, nms_np
from nndetection_tpu.core.boxes.wbc import batched_wbc, batched_wbc_np, wbc, wbc_np
from tests.test_box_ops import random_boxes_3d


class TestNMS:
    def test_topk_matches_numpy_greedy(self, rng):
        for trial in range(5):
            boxes = random_boxes_3d(rng, 50)
            scores = rng.uniform(0, 1, 50).astype(np.float32)
            want = nms_np(boxes, scores, 0.3)
            idx, valid = topk_nms(
                jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(50, bool), 0.3, 50
            )
            got = np.asarray(idx)[np.asarray(valid)]
            np.testing.assert_array_equal(got, want)

    def test_truncation_is_prefix(self, rng):
        boxes = random_boxes_3d(rng, 40)
        scores = rng.uniform(0, 1, 40).astype(np.float32)
        full = nms_np(boxes, scores, 0.4)
        idx, valid = topk_nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(40, bool), 0.4, 5
        )
        got = np.asarray(idx)[np.asarray(valid)]
        np.testing.assert_array_equal(got, full[:5])

    def test_validity_mask_respected(self, rng):
        boxes = random_boxes_3d(rng, 20)
        scores = rng.uniform(0, 1, 20).astype(np.float32)
        valid = np.zeros(20, bool)
        valid[:10] = True
        want = nms_np(boxes[:10], scores[:10], 0.5)
        idx, v = topk_nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5, 20
        )
        got = np.asarray(idx)[np.asarray(v)]
        np.testing.assert_array_equal(got, want)

    def test_nms_mask_matches(self, rng):
        boxes = random_boxes_3d(rng, 30)
        scores = rng.uniform(0, 1, 30).astype(np.float32)
        want = set(nms_np(boxes, scores, 0.25).tolist())
        keep = np.asarray(
            nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(30, bool), 0.25)
        )
        assert set(np.where(keep)[0].tolist()) == want

    def test_batched_matches_numpy(self, rng):
        boxes = random_boxes_3d(rng, 40)
        scores = rng.uniform(0, 1, 40).astype(np.float32)
        labels = rng.randint(0, 3, 40)
        want = batched_nms_np(boxes, scores, labels, 0.3)
        idx, v = batched_nms_topk(
            jnp.asarray(boxes),
            jnp.asarray(scores),
            jnp.asarray(labels),
            jnp.ones(40, bool),
            0.3,
            40,
        )
        got = np.asarray(idx)[np.asarray(v)]
        np.testing.assert_array_equal(got, want)
        keep = np.asarray(
            batched_nms_mask(
                jnp.asarray(boxes),
                jnp.asarray(scores),
                jnp.asarray(labels),
                jnp.ones(40, bool),
                0.3,
            )
        )
        assert set(np.where(keep)[0].tolist()) == set(want.tolist())

    def test_idempotent(self, rng):
        boxes = random_boxes_3d(rng, 30)
        scores = rng.uniform(0, 1, 30).astype(np.float32)
        idx, v = topk_nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(30, bool), 0.2, 30)
        kept = np.asarray(idx)[np.asarray(v)]
        idx2, v2 = topk_nms(
            jnp.asarray(boxes[kept]),
            jnp.asarray(scores[kept]),
            jnp.ones(len(kept), bool),
            0.2,
            len(kept),
        )
        assert np.asarray(v2).sum() == len(kept)


class TestWBC:
    def _inputs(self, rng, n=30):
        boxes = random_boxes_3d(rng, n)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        weights = rng.uniform(0.5, 1.0, n).astype(np.float32)
        n_exp = rng.randint(1, 6, n).astype(np.float32)
        return boxes, scores, weights, n_exp

    def test_matches_numpy(self, rng):
        boxes, scores, weights, n_exp = self._inputs(rng)
        wb, ws = wbc_np(boxes, scores, weights, n_exp, iou_thresh=0.1)
        jb, js, jv = wbc(
            jnp.asarray(boxes),
            jnp.asarray(scores),
            jnp.asarray(weights),
            jnp.asarray(n_exp),
            jnp.ones(len(boxes), bool),
            iou_thresh=0.1,
        )
        v = np.asarray(jv)
        np.testing.assert_allclose(np.asarray(js)[v], ws, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(jb)[v], wb, rtol=1e-4)

    def test_score_thresh_drops(self, rng):
        boxes, scores, weights, n_exp = self._inputs(rng, 10)
        jb, js, jv = wbc(
            jnp.asarray(boxes),
            jnp.asarray(scores),
            jnp.asarray(weights),
            jnp.asarray(n_exp),
            jnp.ones(10, bool),
            iou_thresh=0.1,
            score_thresh=2.0,  # impossible
        )
        assert not np.asarray(jv).any()

    def test_batched_matches_numpy(self, rng):
        boxes, scores, weights, n_exp = self._inputs(rng, 24)
        labels = rng.randint(0, 2, 24)
        wb, ws, wl = batched_wbc_np(
            boxes, scores, labels, weights, n_exp, iou_thresh=0.2
        )
        jb, js, jl, jv = batched_wbc(
            jnp.asarray(boxes),
            jnp.asarray(scores),
            jnp.asarray(labels),
            jnp.asarray(weights),
            jnp.asarray(n_exp),
            jnp.ones(24, bool),
            iou_thresh=0.2,
            num_classes=2,
        )
        v = np.asarray(jv)
        # order within class preserved; compare as sorted multisets per class
        for c in (0, 1):
            want = sorted(ws[wl == c].tolist())
            got = sorted(np.asarray(js)[v & (np.asarray(jl) == c)].tolist())
            np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_single_cluster(self):
        boxes = np.asarray(
            [[0, 0, 10, 10, 0, 10], [1, 1, 11, 11, 1, 11]], np.float32
        )
        scores = np.asarray([0.9, 0.8], np.float32)
        weights = np.ones(2, np.float32)
        n_exp = np.ones(2, np.float32)
        jb, js, jv = wbc(
            jnp.asarray(boxes),
            jnp.asarray(scores),
            jnp.asarray(weights),
            jnp.asarray(n_exp),
            jnp.ones(2, bool),
            iou_thresh=0.3,
        )
        assert np.asarray(jv).sum() == 1
