"""Whole-case sliding-window predictor with mirror TTA and multi-model
ensembling (``/root/reference/nndet/inference/predictor.py:39-341``).

TPU-first structure: tiles are extracted on the host at one static patch
size, transferred to the device ONCE per case, and run through a single
jitted inference function per model (fixed shapes; padded final batch).
Mirror TTA is fused INTO the jitted function: all flip variants of a tile
batch are built on-device (``jnp.flip``), run as one model batch, and the
per-variant boxes are inverted back on-device — one device call and one
small host fetch per tile batch instead of 8 (VERDICT r1 #3). Every
(model x TTA) stream is still a separate ensembler entry, matching the
reference's expected-predictions accounting.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nndetection_tpu.data.patching import compute_grid, pad_to_min_shape
from nndetection_tpu.inference.ensembler import (
    BOX_ENSEMBLERS,
    SegmentationEnsembler,
)
from nndetection_tpu.inference.restore import restore_detection
from nndetection_tpu.inference.tta import (
    flip_image,
    get_tta_flips,
    invert_boxes_jnp,
)
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
        ensembler: str = "BoxEnsemblerSelective",
    ):
        assert len(models) > 0
        self.ensembler_cls = BOX_ENSEMBLERS[ensembler]
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
        # tiles per device call: the model batch inside the call is
        # (num TTA variants) x (tiles per call). Default sizes it from a
        # voxel budget — forward-only activations fit far above the training
        # batch, and on remote-dispatch backends (the axon tunnel) per-call
        # overhead dominates small calls: raising the r5 CV campaign's sweep
        # from 1 to 8 tiles/call cut whole-case TTA prediction from ~2 min
        # to ~20-30 s. NNDET_INFER_TILE_FACTOR (tiles = batch*factor/#flips)
        # overrides; NNDET_INFER_BATCH_VOXELS tunes the budget.
        import os

        factor_env = os.environ.get("NNDET_INFER_TILE_FACTOR")
        if factor_env:
            self.tiles_per_call = max(
                1, (batch_size * int(factor_env)) // len(self.tta_flips)
            )
        else:
            # 26M voxels/call reproduces the chip-proven points: deploy patch
            # 96x128x128 x8 flips -> 2 tiles/call (the r2 1.27 vol/min
            # measurement), no-TTA -> 16, campaign sweep 40x96x96 -> 8
            budget = int(os.environ.get("NNDET_INFER_BATCH_VOXELS", 26_000_000))
            vox = int(np.prod(self.patch_size))
            self.tiles_per_call = min(
                16, max(1, budget // (vox * len(self.tta_flips)))
            )
        # memoized across Predictor instances (one per sweep / predict stage):
        # the closure depends only on the model config and the static tile
        # post-processing constants, so every fold reuses one compile
        from nndetection_tpu.utils.jit_cache import freeze, memo_jit

        self._infer = memo_jit(
            (
                "predict_infer",
                freeze(self.cfg),
                tuple(self.tta_flips),
                self.tile_topk,
                self.tile_detections,
                self.predict_seg,
            ),
            self._build_infer,
        )
        # Multi-model (fold-ensemble) path: stack all fold params into one
        # pytree and run the whole infer over the fold axis INSIDE one jitted
        # call — ONE device call serves every fold per tile batch instead of
        # a per-model Python loop multiplying dispatches and host fetches by
        # num_models. The fold axis runs via lax.map (sequential scan), NOT
        # vmap: vmapping keeps every fold's activations live concurrently and
        # OOMs 16 GB HBM at the deploy point (measured r5: a single conv
        # intermediate became bf16[16,96,128,128,5,32] = 30 GB), while the
        # chip is HBM-bandwidth-bound at these shapes so fold concurrency
        # buys no throughput anyway. lax.map keeps peak memory at the
        # single-model level with the same dispatch savings.
        self._multi = len(self.models) > 1 and all(
            freeze(m.cfg) == freeze(self.cfg) for m in self.models[1:]
        )
        if self._multi:
            self._infer_multi = memo_jit(
                (
                    "predict_infer_multi_map",
                    len(self.models),
                    freeze(self.cfg),
                    tuple(self.tta_flips),
                    self.tile_topk,
                    self.tile_detections,
                    self.predict_seg,
                ),
                self._build_infer_multi,
            )
            self._stacked_params = None

    def _build_infer_multi(self):
        body = self._infer_body()

        def multi(stacked_params, tiles):
            return jax.lax.map(lambda p: body(p, tiles), stacked_params)

        return jax.jit(multi)

    def _build_infer(self):
        return jax.jit(self._infer_body())

    def _infer_body(self):
        cfg = self.cfg
        anchors_np, _ = cfg.anchors()
        anchors = jnp.asarray(anchors_np)
        model = RetinaUNet(cfg)
        tile_topk, tile_det = self.tile_topk, self.tile_detections
        flips_list = list(self.tta_flips)
        n_var = len(flips_list)
        with_seg = self.predict_seg

        def infer(params, tiles):
            """tiles ``[B, *patch, C]`` -> per-variant detections
            ``[V, B, K, ...]`` (+ variant-averaged ``seg_probs [B, ..., C]``).

            The TTA flips, the model forward over all variants, the
            postprocessing and the box inversion all live in ONE compiled
            program: the host transfers each tile once and fetches only the
            final small detection arrays."""
            b = tiles.shape[0]
            variants = jnp.concatenate(
                [flip_image(tiles, f, spatial_offset=1) for f in flips_list]
            )
            preds = model.apply(params, variants.astype(jnp.bfloat16))
            out = batched_postprocess(
                cfg,
                preds,
                anchors,
                cfg.patch_size,
                with_seg=with_seg,  # skip the seg softmax transfer otherwise
                topk_candidates=tile_topk,
                max_out=tile_det,
            )
            boxes = out["boxes"].reshape(n_var, b, tile_det, 2 * cfg.dim)
            result = {
                # invert each variant's boxes back to unflipped tile coords
                "boxes": jnp.stack(
                    [
                        invert_boxes_jnp(boxes[v], flips_list[v], cfg.patch_size)
                        for v in range(n_var)
                    ]
                ),
                "scores": out["scores"].reshape(n_var, b, tile_det),
                "labels": out["labels"].reshape(n_var, b, tile_det),
                "valid": out["valid"].reshape(n_var, b, tile_det),
            }
            if with_seg:
                probs = out["seg_probs"].reshape(
                    n_var, b, *out["seg_probs"].shape[1:]
                )
                # inverse-flip each variant (spatial axes start at dim 2) and
                # average: feeding the mean once per tile is equivalent to
                # feeding all variants under the ensembler's weight
                # normalization
                inv = [
                    flip_image(probs[v], flips_list[v], spatial_offset=1)
                    for v in range(n_var)
                ]
                result["seg_probs"] = sum(inv) / float(n_var)
            return result

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

        box_ens = self.ensembler_cls(
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

        # batch + pad the tile stack ON HOST to a multiple of tiles_per_call:
        # the jitted infer then only ever sees the one fixed [bsz, *patch, C]
        # shape. Device-side slicing/concatenation of a per-case-sized tiles
        # array would eagerly compile a new tiny executable per (case shape,
        # slice) pair — ruinous on backends where every compile goes through
        # a remote service (measured: minutes per case on the axon tunnel).
        bsz = self.tiles_per_call
        n_tiles = len(grid)
        n_pad = (-n_tiles) % bsz
        if n_pad:
            tiles = np.concatenate(
                [tiles, np.zeros((n_pad, *tiles.shape[1:]), tiles.dtype)]
            )
        # transfer each fixed-shape batch once; reused across ensemble models
        batches_dev = [
            jax.device_put(tiles[start : start + bsz])
            for start in range(0, n_tiles, bsz)
        ]

        if self._multi:
            # one fused call per tile batch covers every model: out leaves
            # gain a leading model axis [M, V, B, ...]
            if self._stacked_params is None:
                self._stacked_params = jax.tree.map(
                    lambda *xs: jnp.stack(xs), *[m.params for m in self.models]
                )
            # dispatch all batches async, fetch once (seg maps are patch-
            # sized: fetch per call instead of holding them all on device)
            if seg_ens is not None:
                raw = [
                    jax.device_get(self._infer_multi(self._stacked_params, bt))
                    for bt in batches_dev
                ]
            else:
                raw = jax.device_get(
                    [self._infer_multi(self._stacked_params, bt) for bt in batches_dev]
                )
            per_model_calls = {
                m_idx: [
                    (b_idx * bsz, min(bsz, n_tiles - b_idx * bsz),
                     jax.tree.map(lambda x, m=m_idx: x[m], out))
                    for b_idx, out in enumerate(raw)
                ]
                for m_idx in range(len(self.models))
            }
        else:
            per_model_calls = None

        for m_idx, bundle in enumerate(self.models):
            stream_names = [
                f"{bundle.name}{m_idx}_t{flips}" for flips in self.tta_flips
            ]
            if per_model_calls is not None:
                fetched_calls = per_model_calls[m_idx]
            else:
                # dispatch every tile batch asynchronously, then fetch once
                calls = []
                for b_idx, batch_tiles in enumerate(batches_dev):
                    start = b_idx * bsz
                    n_valid = min(bsz, n_tiles - start)
                    out = self._infer(bundle.params, batch_tiles)
                    if seg_ens is not None:
                        # seg maps are patch-sized — fetch per call rather
                        # than holding every call's maps on device
                        out = jax.device_get(out)
                    calls.append((start, n_valid, out))
                fetched = (
                    [c[2] for c in calls]
                    if seg_ens is not None
                    else jax.device_get([c[2] for c in calls])
                )
                fetched_calls = [
                    (start, n_valid, out)
                    for (start, n_valid, _), out in zip(calls, fetched)
                ]

            for start, n_valid, out in fetched_calls:
                for v, stream in enumerate(stream_names):
                    box_ens.add_model(stream)
                    for b in range(n_valid):
                        origin = grid[start + b]
                        valid = out["valid"][v, b].astype(bool)
                        box_ens.process_tile(
                            out["boxes"][v, b][valid],
                            out["scores"][v, b][valid],
                            out["labels"][v, b][valid],
                            tile_origin=origin,
                            tile_size=self.patch_size,
                        )
                if seg_ens is not None:
                    for b in range(n_valid):
                        seg_ens.process_tile(
                            out["seg_probs"][b], grid[start + b]
                        )

        result = box_ens.get_case_result()
        # undo the min-shape padding offset
        if lower.any() and len(result["pred_boxes"]):
            from nndetection_tpu.core.boxes.ops_np import box_axis_vector_np

            off = box_axis_vector_np(lower.astype(np.float64), self.cfg.dim)
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
