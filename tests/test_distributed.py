"""Multi-process SPMD: 2-process CPU fixture with loss parity vs single-process.

The reference scales out through Lightning's DDP passthrough
(``/root/reference/scripts/train.py:265-289``); the TPU rebuild's equivalent
(SURVEY.md §5.8) is ``jax.distributed`` + per-process batch feeding via
``jax.make_array_from_process_local_data`` (``parallel/distributed.py``).
These tests spawn two real OS processes, each owning 4 virtual CPU devices,
join them into one 8-device SPMD job over gloo collectives, run one train
step on a deterministic global batch, and compare the loss against the same
step executed single-process on an 8-device mesh.
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache"
sys.path.insert(0, os.environ["NNDET_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")

from nndetection_tpu.parallel import distributed

distributed.initialize_from_env()
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

import numpy as np
from tests.test_distributed import make_global_batch, micro_trainer

trainer = micro_trainer()
state = trainer.init_state(rng_seed=7)
gb = make_global_batch()
sl = distributed.local_batch_slice(8)
local = {k: v[sl] for k, v in gb.items()}
from nndetection_tpu.parallel.mesh import shard_batch

db = shard_batch(trainer.mesh, local)
state, losses = trainer._train_step(state, db, jax.random.PRNGKey(3))
out = {k: float(v) for k, v in losses.items()}
out["process_index"] = jax.process_index()
out["is_main"] = distributed.is_main_process()
print("RESULT " + json.dumps(out), flush=True)
"""


def micro_trainer():
    from nndetection_tpu.models import RetinaUNetConfig
    from nndetection_tpu.parallel.mesh import make_mesh
    from nndetection_tpu.train.trainer import Trainer, TrainerConfig

    cfg = RetinaUNetConfig(
        conv_kernels=((3, 3, 3),) * 3,
        strides=((2, 2, 2),) * 2,
        decoder_levels=(1, 2),
        patch_size=(16, 16, 16),
        anchor_width=((6.0,),) * 2,
        anchor_height=((6.0,),) * 2,
        anchor_depth=((6.0,),) * 2,
        start_channels=4,
        max_channels=8,
        fpn_channels=8,
        head_channels=8,
        topk_candidates=64,
        detections_per_img=8,
        dtype="float32",
    )
    tcfg = TrainerConfig(batch_size=8, warm_iterations=2)
    return Trainer(cfg, tcfg, mesh=make_mesh(n_data=8))


def make_global_batch(b=8, patch=(16, 16, 16)):
    """Deterministic prepared batch (gt already extracted: augmentation and
    GT-prep are bypassed so both runs see identical inputs)."""
    rng = np.random.RandomState(0)
    images = rng.standard_normal((b, *patch, 1)).astype(np.float32)
    gt_boxes = np.zeros((b, 4, 6), np.float32)
    gt_boxes[:, 0] = [4, 4, 10, 10, 4, 10]
    gt_classes = np.full((b, 4), -1, np.int32)
    gt_classes[:, 0] = 1
    gt_mask = np.zeros((b, 4), bool)
    gt_mask[:, 0] = True
    seg = np.zeros((b, *patch), np.int32)
    seg[:, 4:10, 4:10, 4:10] = 1
    return {
        "images": images,
        "gt_boxes": gt_boxes,
        "gt_classes": gt_classes.astype(np.int32),
        "gt_mask": gt_mask,
        "seg": seg,
    }


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def two_process_losses(tmp_path_factory):
    port = _free_port()
    script = tmp_path_factory.mktemp("mp") / "worker.py"
    script.write_text(WORKER)
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            NNDET_REPO=str(REPO),
            NNDET_COORDINATOR=f"localhost:{port}",
            NNDET_NUM_PROCESSES="2",
            NNDET_PROCESS_ID=str(pid),
        )
        env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
                cwd=str(REPO),
            )
        )
    results = {}
    for pid, p in enumerate(procs):
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"proc {pid} failed:\n{out}\n{err[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        results[pid] = json.loads(line[len("RESULT "):])
    return results


class TestTwoProcessParity:
    def test_both_processes_agree(self, two_process_losses):
        r0, r1 = two_process_losses[0], two_process_losses[1]
        assert r0["is_main"] is True and r1["is_main"] is False
        for k in ("total", "cls", "reg", "seg_ce", "seg_dice"):
            assert r0[k] == pytest.approx(r1[k], rel=1e-5), k

    def test_loss_parity_with_single_process(self, two_process_losses):
        """Same global batch, same init seed, same 8-way data sharding: the
        multi-process step must reproduce the single-process loss."""
        import jax

        from nndetection_tpu.parallel.mesh import shard_batch

        trainer = micro_trainer()
        state = trainer.init_state(rng_seed=7)
        db = shard_batch(trainer.mesh, make_global_batch())
        _, losses = trainer._train_step(state, db, jax.random.PRNGKey(3))
        ref = {k: float(v) for k, v in losses.items()}
        got = two_process_losses[0]
        for k in ("total", "cls", "reg", "seg_ce", "seg_dice"):
            assert got[k] == pytest.approx(ref[k], rel=2e-4), (
                f"{k}: multi={got[k]} single={ref[k]}"
            )


class TestDistributedHelpers:
    def test_local_batch_slice_single_process(self):
        from nndetection_tpu.parallel import distributed

        assert distributed.local_batch_slice(8) == slice(0, 8)
        assert distributed.local_batch_size(8) == 8
        assert distributed.is_main_process()

    def test_shard_local_batch_single_process(self):
        """shard_local_batch is the multi-process device_put; with one
        process the 'local' rows ARE the global batch and round-trip."""
        import jax

        from nndetection_tpu.parallel import distributed
        from nndetection_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=8)
        x = np.arange(16, dtype=np.float32).reshape(8, 2)
        arr = distributed.shard_local_batch(mesh, {"x": x})["x"]
        assert arr.shape == (8, 2)
        np.testing.assert_array_equal(np.asarray(arr), x)
        assert len(arr.sharding.device_set) == 8
