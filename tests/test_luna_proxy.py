"""LUNA-proxy generator + Task016 converter + CPM scorer round-trip tests."""
import csv
import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def _load_task016():
    spec = importlib.util.spec_from_file_location(
        "task016_prepare", REPO / "projects" / "Task016_Luna" / "prepare.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_generate_proxy_case_statistics():
    from nndetection_tpu.data.luna_proxy import generate_proxy_case

    rng = np.random.RandomState(3)
    vol, spacing, origin, anns = generate_proxy_case(rng, inplane=96)
    assert vol.dtype == np.int16
    assert vol.shape[1:] == (96, 96)
    assert 1.25 <= spacing[0] <= 2.5 and 0.7 <= spacing[1] <= 1.0
    assert spacing[1] == spacing[2]
    # air background and lung parenchyma both present
    assert (vol == -1000).mean() > 0.2
    assert ((vol > -950) & (vol < -700)).mean() > 0.02
    for x, y, z, d in anns:
        assert 3.5 <= d <= 28.0
        center_kji = (np.asarray([z, y, x]) - origin[::-1]) / spacing
        assert np.all(center_kji >= 0) and np.all(center_kji < vol.shape)
        # nodule voxels are soft tissue, far above parenchyma
        k, j, i = np.round(center_kji).astype(int)
        assert vol[k, j, i] > -300


def test_proxy_convert_roundtrip(tmp_path):
    from nndetection_tpu.data.luna_proxy import generate_luna_proxy
    from nndetection_tpu.utils.io import load_json, load_pickle

    task016 = _load_task016()
    src = tmp_path / "luna_raw"
    # seeds chosen small; scan until a case with >=1 nodule exists
    generate_luna_proxy(src, num_cases=6, seed=1, inplane=64, num_subsets=2)
    with open(src / "annotations.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) >= 1

    out = tmp_path / "Task916_LunaProxy"
    task016.convert(src, out)
    images = sorted((out / "raw_splitted" / "imagesTr").glob("*.nii.gz"))
    assert len(images) == 6
    labels_dir = out / "raw_splitted" / "labelsTr"
    ann_by_case = {}
    for r in rows:
        ann_by_case.setdefault(r["seriesuid"], []).append(r)
    for cid, case_rows in ann_by_case.items():
        inst = load_json(labels_dir / f"{cid}.json")["instances"]
        assert len(inst) == len(case_rows)
        geom = load_pickle(labels_dir / f"{cid}_geometry.pkl")
        assert geom["spacing"].shape == (3,)


def test_score_cpm_hand_computed(tmp_path):
    task016 = _load_task016()
    ann_csv = tmp_path / "annotations.csv"
    with open(ann_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["seriesuid", "coordX", "coordY", "coordZ", "diameter_mm"])
        w.writerow(["s1", 10.0, 10.0, 10.0, 10.0])
        w.writerow(["s1", 50.0, 50.0, 50.0, 6.0])
        w.writerow(["s2", 0.0, 0.0, 0.0, 8.0])
    pred_csv = tmp_path / "preds.csv"
    with open(pred_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["seriesuid", "coordX", "coordY", "coordZ", "probability"])
        w.writerow(["s1", 11.0, 10.0, 10.0, 0.9])   # hit ann 1 (within 5mm)
        w.writerow(["s1", 30.0, 30.0, 30.0, 0.8])   # FP
        w.writerow(["s2", 0.5, 0.0, 0.0, 0.7])      # hit ann 3
        w.writerow(["s2", 90.0, 90.0, 90.0, 0.2])   # FP

    res = task016.score_cpm(pred_csv, ann_csv, num_scans=2)
    assert res["num_annotations"] == 3 and res["num_fps"] == 2
    # at FPPI=1 (threshold 0.2 gives 1 FP/scan): sens = 2/3
    assert res["froc"]["1.0"] == pytest.approx(2 / 3, abs=1e-6)
    # at FPPI=0.125 nothing is detected without any FP budget below t=0.8:
    # fppi curve points: t=0.9 -> 0 FP, sens 1/3; t=0.8 -> 0.5 FPPI, 1/3
    assert res["froc"]["0.125"] == pytest.approx(1 / 3, abs=1e-6)
    assert 0 < res["cpm"] <= 1

    # series filter = the official seriesuids.csv semantics: scoring only s1
    # must drop s2's annotation AND its prediction rows (a fold-subset score
    # must not count unscanned scans' nodules as misses)
    res_s1 = task016.score_cpm(pred_csv, ann_csv, series=["s1"])
    assert res_s1["num_annotations"] == 2
    assert res_s1["num_scans"] == 1
    assert res_s1["num_fps"] == 1
    # s1 alone: ann2 (50,50,50) never hit -> sens caps at 1/2 once the one
    # FP (t=0.8 -> 1 FPPI) is admitted
    assert res_s1["froc"]["1.0"] == pytest.approx(1 / 2, abs=1e-6)


def test_export_cpm_perfect_predictions(tmp_path):
    """Predictions at exactly the annotation centers -> CPM 1.0."""
    from nndetection_tpu.data.luna_proxy import generate_luna_proxy
    from nndetection_tpu.utils.io import load_pickle, save_pickle

    task016 = _load_task016()
    src = tmp_path / "luna_raw"
    generate_luna_proxy(src, num_cases=5, seed=2, inplane=64, num_subsets=2)
    out = tmp_path / "Task916_LunaProxy"
    task016.convert(src, out)
    labels_dir = out / "raw_splitted" / "labelsTr"

    ann = task016.load_annotations(src / "annotations.csv")
    pred_dir = tmp_path / "preds"
    pred_dir.mkdir()
    for geom_p in labels_dir.glob("*_geometry.pkl"):
        cid = geom_p.name[: -len("_geometry.pkl")]
        geom = load_pickle(geom_p)
        boxes, scores = [], []
        for x, y, z, d in ann.get(cid, []):
            from nndetection_tpu.data.mhd import world_to_voxel

            ckji = world_to_voxel(
                np.asarray([x, y, z]), geom["origin"], geom["spacing"]
            )
            r = d / 2.0 / geom["spacing"]
            boxes.append([ckji[0] - r[0], ckji[1] - r[1], ckji[0] + r[0],
                          ckji[1] + r[1], ckji[2] - r[2], ckji[2] + r[2]])
            scores.append(0.95)
        save_pickle(
            {"pred_boxes": np.asarray(boxes, np.float64).reshape(-1, 6),
             "pred_scores": np.asarray(scores), "pred_labels": np.zeros(len(scores)),
             "restored": True},
            pred_dir / f"{cid}_boxes.pkl",
        )
    out_csv = tmp_path / "cpm.csv"
    task016.export_cpm(pred_dir, labels_dir, out_csv)
    res = task016.score_cpm(out_csv, src / "annotations.csv", num_scans=5)
    assert res["cpm"] == pytest.approx(1.0)


def test_score_cpm_matches_bruteforce(tmp_path):
    """Randomized cross-check of the FROC/CPM scorer against an independent
    brute-force threshold sweep."""
    rng = np.random.RandomState(11)
    task016 = _load_task016()
    n_scans = 12
    ann_rows, pred_rows = [], []
    anns, preds = {}, {}
    for s in range(n_scans):
        cid = f"s{s}"
        n_ann = rng.randint(0, 3)
        a = []
        for _ in range(n_ann):
            c = rng.uniform(0, 200, 3)
            d = rng.uniform(4, 20)
            ann_rows.append([cid, *c.tolist(), d])
            a.append((c, d))
        anns[cid] = a
        n_pred = rng.randint(0, 8)
        p = []
        for _ in range(n_pred):
            if a and rng.rand() < 0.5:
                base, d = a[rng.randint(len(a))]
                c = base + rng.uniform(-0.4, 0.4, 3) * d / 2
            else:
                c = rng.uniform(0, 200, 3)
            prob = float(rng.rand())
            pred_rows.append([cid, *c.tolist(), prob])
            p.append((c, prob))
        preds[cid] = p

    import csv as _csv

    ann_csv, pred_csv = tmp_path / "a.csv", tmp_path / "p.csv"
    with open(ann_csv, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["seriesuid", "coordX", "coordY", "coordZ", "diameter_mm"])
        w.writerows(ann_rows)
    with open(pred_csv, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["seriesuid", "coordX", "coordY", "coordZ", "probability"])
        w.writerows(pred_rows)

    res = task016.score_cpm(pred_csv, ann_csv, num_scans=n_scans)

    # brute force: explicit hit assignment + threshold sweep + interpolation
    hit_probs, fp_probs = [], []
    for cid in set(list(anns) + list(preds)):
        a, p = anns.get(cid, []), preds.get(cid, [])
        used = [False] * len(p)
        for c_a, d in a:
            best = -np.inf
            for i, (c_p, prob) in enumerate(p):
                if np.linalg.norm(c_p - c_a) <= d / 2:
                    used[i] = True
                    best = max(best, prob)
            hit_probs.append(best)
        fp_probs.extend(prob for i, (c, prob) in enumerate(p) if not used[i])
    hp, fp = np.asarray(hit_probs), np.asarray(fp_probs)
    ts = np.unique(np.concatenate([hp[np.isfinite(hp)], fp]))[::-1]
    sens = np.asarray([(hp >= t).mean() for t in ts])
    fppi = np.asarray([(fp >= t).sum() / n_scans for t in ts])
    order = np.argsort(fppi)
    expect = {
        str(f): float(np.interp(f, fppi[order], sens[order],
                                left=0.0, right=sens[order][-1]))
        for f in task016.FPPI_POINTS
    }
    for k, v in expect.items():
        assert res["froc"][k] == pytest.approx(v, abs=1e-9), k
    assert res["cpm"] == pytest.approx(float(np.mean(list(expect.values()))), abs=1e-9)


class TestMissedGtAudit:
    """scripts_dev/audit_missed.py: hit / near-miss / no-candidate triage."""

    def test_statuses(self, tmp_path):
        import csv
        import importlib.util
        from pathlib import Path

        spec = importlib.util.spec_from_file_location(
            "audit_missed",
            Path(__file__).resolve().parent.parent / "scripts_dev" / "audit_missed.py",
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        pred_csv = tmp_path / "preds.csv"
        ann_csv = tmp_path / "ann.csv"
        with open(pred_csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["seriesuid", "coordX", "coordY", "coordZ", "probability"])
            w.writerow(["s1", 10.0, 10.0, 10.0, 0.9])   # hit for nodule A
            w.writerow(["s1", 40.0, 10.0, 10.0, 0.5])   # FP
            w.writerow(["s1", 10.0, 10.0, 66.0, 0.2])   # near-miss for nodule B
        with open(ann_csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["seriesuid", "coordX", "coordY", "coordZ", "diameter_mm"])
            w.writerow(["s1", 11.0, 10.0, 10.0, 8.0])   # A: within 4mm -> hit
            w.writerow(["s1", 10.0, 10.0, 61.0, 8.0])   # B: dist 5 in (4, 6] -> near miss
            w.writerow(["s1", 90.0, 90.0, 90.0, 8.0])   # C: nothing near
            w.writerow(["s2", 10.0, 10.0, 10.0, 8.0])   # D: no candidates at all

        result = mod.audit(pred_csv, ann_csv)
        s = result["summary"]
        assert s["total_annotations"] == 4
        assert s["hit"] == 1
        assert s["near_miss"] == 1
        assert s["no_candidate"] == 2
        by_status = {r["status"]: r for r in result["per_annotation"]}
        assert by_status["hit"]["best_rank_in_scan"] == 0
        assert by_status["near_miss"]["nearest_dist_mm"] == 5.0
