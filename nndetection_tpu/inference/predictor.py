"""Whole-case sliding-window predictor with mirror TTA and multi-model
ensembling (``/root/reference/nndet/inference/predictor.py:39-341``).

TPU-first structure: tiles are extracted on the host at one static patch
size, batched, and run through a single jitted inference function per model
(fixed shapes; padded final batch). Mirror TTA reuses the same compiled
function — tiles are flipped on the host (cheap views) and boxes are inverted
back before ensembling. Every (model x TTA) stream is a separate ensembler
entry, matching the reference's expected-predictions accounting.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nndetection_tpu.data.patching import compute_grid, pad_to_min_shape
from nndetection_tpu.inference.ensembler import (
    BoxEnsemblerSelective,
    SegmentationEnsembler,
)
from nndetection_tpu.inference.restore import restore_detection
from nndetection_tpu.inference.tta import flip_image, get_tta_flips, invert_boxes, invert_seg
from nndetection_tpu.models.retina_unet import (
    RetinaUNet,
    RetinaUNetConfig,
    batched_postprocess,
)


@dataclass
class ModelBundle:
    """One trained model (e.g. one CV fold)."""

    cfg: RetinaUNetConfig
    params: Any
    name: str = "model"


class Predictor:
    def __init__(
        self,
        models: Sequence[ModelBundle],
        batch_size: int = 4,
        overlap: float = 0.5,
        tta: bool = True,
        tile_topk: int = 1000,
        tile_detections: int = 100,
        ensembler_parameters: Optional[Dict[str, Any]] = None,
        predict_seg: bool = False,
    ):
        assert len(models) > 0
        self.models = list(models)
        self.cfg = models[0].cfg
        self.patch_size = tuple(self.cfg.patch_size)
        self.batch_size = batch_size
        self.overlap = overlap
        self.tta_flips = get_tta_flips(self.cfg.dim, tta)
        self.tile_topk = tile_topk
        self.tile_detections = tile_detections
        self.ensembler_parameters = ensembler_parameters
        self.predict_seg = predict_seg
        self._infer = self._build_infer()

    def _build_infer(self):
        cfg = self.cfg
        anchors_np, _ = cfg.anchors()
        anchors = jnp.asarray(anchors_np)
        model = RetinaUNet(cfg)
        tile_topk, tile_det = self.tile_topk, self.tile_detections

        with_seg = self.predict_seg

        @jax.jit
        def infer(params, images):
            preds = model.apply(params, images.astype(jnp.bfloat16))
            out = batched_postprocess(
                cfg,
                preds,
                anchors,
                cfg.patch_size,
                with_seg=with_seg,  # skip the seg softmax transfer otherwise
                topk_candidates=tile_topk,
                max_out=tile_det,
            )
            return out

        return infer

    # ------------------------------------------------------------------
    def predict_case(
        self,
        data: np.ndarray,  # [C, *spatial] preprocessed
        properties: Optional[Dict[str, Any]] = None,
        restore: bool = False,
    ) -> Dict[str, np.ndarray]:
        properties = properties or {}
        padded, lower = pad_to_min_shape(data, self.patch_size, spatial_offset=1)
        case_shape = padded.shape[1:]
        grid = compute_grid(case_shape, self.patch_size, self.overlap)

        box_ens = BoxEnsemblerSelective(
            case_shape, parameters=self.ensembler_parameters, properties=properties
        )
        seg_ens = (
            SegmentationEnsembler(
                case_shape,
                (1 if self.cfg.segmenter_fg_bg else self.cfg.seg_classes) + 1,
            )
            if self.predict_seg
            else None
        )

        # pre-extract all tiles once (channel-last, bf16 to halve the
        # host->device transfer)
        import ml_dtypes

        tiles = np.stack(
            [
                np.moveaxis(
                    padded[
                        (slice(None),)
                        + tuple(
                            slice(int(o), int(o) + p)
                            for o, p in zip(origin, self.patch_size)
                        )
                    ],
                    0,
                    -1,
                )
                for origin in grid
            ]
        ).astype(ml_dtypes.bfloat16)

        for m_idx, bundle in enumerate(self.models):
            for flips in self.tta_flips:
                stream = f"{bundle.name}{m_idx}_t{flips}"
                box_ens.add_model(stream)
                flipped = flip_image(tiles, flips, spatial_offset=1)
                for start in range(0, len(grid), self.batch_size):
                    batch_tiles = flipped[start : start + self.batch_size]
                    n_valid = len(batch_tiles)
                    if n_valid < self.batch_size:
                        pad = np.zeros(
                            (self.batch_size - n_valid, *batch_tiles.shape[1:]),
                            batch_tiles.dtype,
                        )
                        batch_tiles = np.concatenate([batch_tiles, pad])
                    out = self._infer(bundle.params, jnp.asarray(batch_tiles))
                    out = jax.device_get(out)
                    for b in range(n_valid):
                        origin = grid[start + b]
                        valid = out["valid"][b].astype(bool)
                        boxes = invert_boxes(
                            out["boxes"][b][valid], flips, self.patch_size
                        )
                        box_ens.process_tile(
                            boxes,
                            out["scores"][b][valid],
                            out["labels"][b][valid],
                            tile_origin=origin,
                            tile_size=self.patch_size,
                        )
                        if seg_ens is not None:
                            probs = invert_seg(
                                out["seg_probs"][b], flips, spatial_offset=0
                            )
                            seg_ens.process_tile(probs, origin)

        result = box_ens.get_case_result()
        # undo the min-shape padding offset
        if lower.any() and len(result["pred_boxes"]):
            off = np.asarray(
                [lower[0], lower[1], lower[0], lower[1], lower[2], lower[2]],
                dtype=np.float64,
            )
            result["pred_boxes"] = result["pred_boxes"] - off[None]
        if seg_ens is not None:
            seg = seg_ens.get_case_result()
            sl = tuple(
                slice(int(l), int(l) + s) for l, s in zip(lower, data.shape[1:])
            )
            result["pred_seg"] = seg[sl]
        result["ensembler"] = box_ens

        if restore and properties:
            result["pred_boxes"] = restore_detection(
                result["pred_boxes"],
                transpose_forward=properties.get("transpose_forward", [0, 1, 2]),
                original_spacing=properties.get(
                    "original_spacing", np.ones(self.cfg.dim)
                ),
                resampled_spacing=properties.get(
                    "spacing_after_resampling", np.ones(self.cfg.dim)
                ),
                crop_bbox=properties.get("crop_bbox"),
            )
        return result
