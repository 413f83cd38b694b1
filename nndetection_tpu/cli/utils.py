"""Utility entry points: ``nndet_unpack``, ``nndet_boxes2nii``,
``nndet_seg2nii``, ``nndet_env`` (reference ``scripts/utils.py:17-235``)."""
from __future__ import annotations

import argparse
import platform
import sys
from pathlib import Path

import numpy as np

from nndetection_tpu.data import nifti
from nndetection_tpu.data.preprocess import unpack_dataset
from nndetection_tpu.utils.io import load_pickle


def main_unpack() -> None:
    parser = argparse.ArgumentParser(description="Unpack npz -> npy for memmaps")
    parser.add_argument("dir", type=str)
    args = parser.parse_args()
    unpack_dataset(args.dir)


def main_boxes2nii() -> None:
    """Export box predictions as a labelled NIfTI volume for visualization."""
    parser = argparse.ArgumentParser(description="Export boxes to nii masks")
    parser.add_argument("pred_dir", type=str)
    parser.add_argument("out_dir", type=str)
    parser.add_argument("--shape_dir", type=str, default=None,
                        help="dir with {case}.pkl props for target shapes")
    parser.add_argument("--score_thresh", type=float, default=0.0)
    args = parser.parse_args()
    pred_dir, out_dir = Path(args.pred_dir), Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for p in sorted(pred_dir.glob("*_boxes.pkl")):
        cid = p.name[: -len("_boxes.pkl")]
        pred = load_pickle(p)
        boxes = np.asarray(pred["pred_boxes"])
        scores = np.asarray(pred["pred_scores"])
        keep = scores >= args.score_thresh
        boxes = boxes[keep]
        if args.shape_dir and (Path(args.shape_dir) / f"{cid}.pkl").exists():
            props = load_pickle(Path(args.shape_dir) / f"{cid}.pkl")
            shape = props.get("shape_after_resampling") or props.get("shape_after_crop")
        else:
            shape = tuple(
                int(np.ceil(boxes[:, i].max())) + 1 if len(boxes) else 64
                for i in (2, 3, 5)
            )
        from nndetection_tpu.utils.analysis import convert_boxes_to_mask
        from nndetection_tpu.utils.io import save_json

        vol, meta = convert_boxes_to_mask(
            boxes,
            scores[keep],
            np.asarray(pred["pred_labels"])[keep],
            shape,
        )
        nifti.save(out_dir / f"{cid}_boxes.nii.gz", vol.astype(np.int16))
        # per-instance score/label meta (reference ``convert_box_to_nii_meta``)
        save_json(meta, out_dir / f"{cid}_boxes.json")
    print(f"exported {out_dir}")


def main_seg2nii() -> None:
    parser = argparse.ArgumentParser(description="Export seg npz to nii")
    parser.add_argument("pred_dir", type=str)
    parser.add_argument("out_dir", type=str)
    args = parser.parse_args()
    pred_dir, out_dir = Path(args.pred_dir), Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for p in sorted(pred_dir.glob("*_seg.npz")):
        cid = p.name[: -len("_seg.npz")]
        with np.load(p) as f:
            nifti.save(out_dir / f"{cid}_seg.nii.gz", f["seg"].astype(np.int16))
    print(f"exported {out_dir}")


def main_env() -> None:
    """Environment dump (``nndet_env``)."""
    import jax

    print(f"python: {sys.version.split()[0]} on {platform.platform()}")
    print(f"jax: {jax.__version__}")
    try:
        print(f"devices: {jax.devices()}")
    except Exception as e:  # noqa: BLE001
        print(f"devices: unavailable ({e})")
    import os

    for var in ("det_data", "det_models", "det_num_threads", "det_verbose"):
        print(f"{var}={os.environ.get(var, '<unset>')}")


if __name__ == "__main__":
    main_env()


def main_searchpath() -> None:
    """Config-source dump (``nndet_searchpath``, reference
    ``scripts/utils.py:189-199``): shows where the composed config comes from
    — built-in defaults, the optional per-task yaml, and CLI dot overrides."""
    import os

    print("Found config sources:")
    print("---------------------")
    print("defaults: nndetection_tpu.utils.config.DEFAULT_CONFIG")
    task = os.environ.get("det_data", "<det_data unset>")
    print(f"task yaml: <task_dir>/config.yaml under det_data={task}")
    print("overrides: -o key=value CLI dot-list (applied last)")
