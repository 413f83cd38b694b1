import numpy as np
import jax.numpy as jnp

from nndetection_tpu.core.boxes import ATSSMatcher, IoUMatcher
from nndetection_tpu.core.boxes.matcher import gather_matched
from nndetection_tpu.core.boxes.ops_np import box_iou_np
from tests.test_box_ops import random_boxes_3d


def atss_numpy(gt, anchors, apl, num_anchors_per_loc, num_candidates=4,
               center_in_gt=False, eps=0.01):
    """Independent brute-force ATSS (reference semantics) for goldens."""
    G, A = len(gt), len(anchors)
    if G == 0:
        return np.full(A, -1, np.int64)
    centers_a = np.stack(
        [(anchors[:, 0] + anchors[:, 2]) / 2,
         (anchors[:, 1] + anchors[:, 3]) / 2,
         (anchors[:, 4] + anchors[:, 5]) / 2], 1)
    centers_g = np.stack(
        [(gt[:, 0] + gt[:, 2]) / 2, (gt[:, 1] + gt[:, 3]) / 2,
         (gt[:, 4] + gt[:, 5]) / 2], 1)
    dists = np.linalg.norm(centers_g[:, None] - centers_a[None], axis=-1)
    ious = box_iou_np(gt, anchors)

    cand = []
    start = 0
    for n in apl:
        k = min(num_candidates * num_anchors_per_loc, n)
        idx = np.argsort(dists[:, start:start + n], axis=1, kind="stable")[:, :k]
        cand.append(idx + start)
        start += n
    cand = np.concatenate(cand, axis=1)  # [G, K]

    cand_iou = np.take_along_axis(ious, cand, axis=1)
    thr = cand_iou.mean(1) + cand_iou.std(1, ddof=1)
    is_pos = cand_iou >= thr[:, None]
    if center_in_gt:
        for g in range(G):
            for k in range(cand.shape[1]):
                c = centers_a[cand[g, k]]
                lo = np.array([gt[g, 0], gt[g, 1], gt[g, 4]])
                hi = np.array([gt[g, 2], gt[g, 3], gt[g, 5]])
                inside = min(np.min(c - lo), np.min(hi - c)) > eps
                is_pos[g, k] &= inside

    INF = 100.0
    overlaps = np.full((G, A), -INF)
    for g in range(G):
        for k in range(cand.shape[1]):
            if is_pos[g, k]:
                overlaps[g, cand[g, k]] = ious[g, cand[g, k]]
    matched_vals = overlaps.max(0)
    matches = overlaps.argmax(0)
    matches[matched_vals == -INF] = -1
    return matches


def make_level_anchors(rng, apl=(64, 8), na=1):
    """Anchor grid-ish sets per level."""
    anchors = []
    for n, size in zip(apl, (8, 16)):
        ctr = rng.uniform(0, 100, size=(n, 3))
        half = size / 2
        anchors.append(
            np.stack([ctr[:, 0] - half, ctr[:, 1] - half, ctr[:, 0] + half,
                      ctr[:, 1] + half, ctr[:, 2] - half, ctr[:, 2] + half], 1))
    return np.concatenate(anchors).astype(np.float32)


class TestATSS:
    def test_matches_bruteforce(self, rng):
        apl = [64, 8]
        anchors = make_level_anchors(rng, apl)
        gt = random_boxes_3d(rng, 3, scale=80)
        want = atss_numpy(gt, anchors, apl, 1, num_candidates=4)
        m = ATSSMatcher(num_candidates=4, center_in_gt=False)
        res = m(jnp.asarray(gt), jnp.ones(3, bool), jnp.asarray(anchors), apl, 1)
        np.testing.assert_array_equal(np.asarray(res.matched_idx), want)

    def test_center_in_gt(self, rng):
        apl = [64, 8]
        anchors = make_level_anchors(rng, apl)
        gt = random_boxes_3d(rng, 2, scale=80)
        want = atss_numpy(gt, anchors, apl, 1, num_candidates=4, center_in_gt=True)
        m = ATSSMatcher(num_candidates=4, center_in_gt=True)
        res = m(jnp.asarray(gt), jnp.ones(2, bool), jnp.asarray(anchors), apl, 1)
        np.testing.assert_array_equal(np.asarray(res.matched_idx), want)

    def test_padding_invariant(self, rng):
        apl = [64, 8]
        anchors = make_level_anchors(rng, apl)
        gt = random_boxes_3d(rng, 2, scale=80)
        m = ATSSMatcher(num_candidates=4)
        res2 = m(jnp.asarray(gt), jnp.ones(2, bool), jnp.asarray(anchors), apl, 1)
        gt_pad = np.concatenate([gt, np.zeros((3, 6), np.float32) + 1.0])
        # padded rows get degenerate boxes; mask marks them invalid
        mask = np.array([True, True, False, False, False])
        res5 = m(jnp.asarray(gt_pad), jnp.asarray(mask), jnp.asarray(anchors), apl, 1)
        np.testing.assert_array_equal(
            np.asarray(res2.matched_idx), np.asarray(res5.matched_idx))

    def test_empty_gt(self, rng):
        apl = [64, 8]
        anchors = make_level_anchors(rng, apl)
        gt = np.ones((4, 6), np.float32)
        m = ATSSMatcher(num_candidates=4)
        res = m(jnp.asarray(gt), jnp.zeros(4, bool), jnp.asarray(anchors), apl, 1)
        assert (np.asarray(res.matched_idx) == -1).all()


class TestIoUMatcher:
    def test_thresholds(self, rng):
        anchors = make_level_anchors(rng, [64, 8])
        gt = random_boxes_3d(rng, 3, scale=80)
        m = IoUMatcher(0.1, 0.5, allow_low_quality_matches=False)
        res = m(jnp.asarray(gt), jnp.ones(3, bool), jnp.asarray(anchors))
        ious = box_iou_np(gt, anchors)
        vals = ious.max(0)
        idx = ious.argmax(0)
        want = np.where(vals < 0.1, -1, np.where(vals < 0.5, -2, idx))
        np.testing.assert_array_equal(np.asarray(res.matched_idx), want)

    def test_low_quality(self, rng):
        anchors = make_level_anchors(rng, [64, 8])
        gt = random_boxes_3d(rng, 3, scale=80)
        m = IoUMatcher(0.99, 0.999, allow_low_quality_matches=True)
        res = m(jnp.asarray(gt), jnp.ones(3, bool), jnp.asarray(anchors))
        got = np.asarray(res.matched_idx)
        ious = box_iou_np(gt, anchors)
        # each gt's best anchor must be matched to it (later gt wins ties)
        for g in range(3):
            best = ious[g].argmax()
            claimants = [gg for gg in range(3) if ious[gg].argmax() == best]
            assert got[best] == claimants[-1]

    def test_gather_matched(self):
        from nndetection_tpu.core.boxes.matcher import MatchResult

        gt_boxes = jnp.asarray([[0, 0, 2, 2, 0, 2], [5, 5, 9, 9, 5, 9]], jnp.float32)
        gt_classes = jnp.asarray([0, 1], jnp.int32)
        match = MatchResult(matched_idx=jnp.asarray([1, -1, 0, -2], jnp.int32))
        labels, boxes = gather_matched(match, gt_boxes, gt_classes)
        np.testing.assert_array_equal(np.asarray(labels), [2, 0, 1, -1])
        np.testing.assert_allclose(np.asarray(boxes)[0], [5, 5, 9, 9, 5, 9])
