"""``nndet_eval``: evaluate box predictions against GT
(reference ``scripts/train.py:405-493``)."""
from __future__ import annotations

import logging

from nndetection_tpu.cli.common import (
    base_parser,
    resolve_model_dir,
    resolve_task,
    setup_logging,
)
from nndetection_tpu.pipeline import run_evaluate
from nndetection_tpu.utils.config import compose

log = logging.getLogger("nndet")


def main() -> None:
    parser = base_parser("Evaluate predictions")
    parser.add_argument("--pred_dir", type=str, default=None)
    parser.add_argument("--split", type=str, default="Ts", choices=["Tr", "Ts"])
    args = parser.parse_args()
    cfg = compose(overrides=args.overrides)
    task_dir = resolve_task(args.task)
    model_dir = resolve_model_dir(task_dir, cfg["module"], cfg["plan"])
    pred_dir = args.pred_dir or (model_dir / "test_predictions")
    setup_logging(model_dir / "eval.log")
    scores, _ = run_evaluate(task_dir, pred_dir, plan_id=cfg["plan"], split=args.split)
    for k, v in sorted(scores.items()):
        log.info(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
