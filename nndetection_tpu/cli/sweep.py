"""``nndet_sweep``: postprocessing hyperparameter sweep for a trained fold."""
from __future__ import annotations

from nndetection_tpu.cli.common import (
    base_parser,
    resolve_model_dir,
    resolve_task,
    setup_logging,
)
from nndetection_tpu.pipeline import run_sweep
from nndetection_tpu.utils.config import compose


def main() -> None:
    parser = base_parser("Sweep postprocessing parameters")
    parser.add_argument("--fold", type=int, default=0)
    parser.add_argument("--no_tta", action="store_true")
    args = parser.parse_args()
    cfg = compose(overrides=args.overrides)
    task_dir = resolve_task(args.task)
    model_dir = resolve_model_dir(task_dir, cfg["module"], cfg["plan"])
    setup_logging(model_dir / f"fold{args.fold}" / "sweep.log")
    run_sweep(
        task_dir, model_dir, fold=args.fold, plan_id=cfg["plan"], tta=not args.no_tta
    )


if __name__ == "__main__":
    main()
