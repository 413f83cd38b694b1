"""Per-missed-GT rank audit for the LUNA-proxy CV predictions.

VERDICT r3 weak #3: a flat FROC can mean "under-trained scoring" OR
"candidate never generated" (anchor fit / patch coverage / over-aggressive
suppression). This audit separates the two, per annotation:

for every annotation in annotations.csv, over the pooled CV predictions
(world coordinates, ALL candidates — the CPM export writes every box at
score_thresh 0.0):
  * hit        — some candidate center within diameter/2; report the best
                 candidate's score and its score-rank within the scan
  * near-miss  — closest candidate within 1.5x radius but outside the hit
                 sphere (localization, not recall, problem)
  * no-candidate — nothing anywhere near: the detector never proposed it
                 (anchor/coverage problem that no sweep can fix)

Usage: python scripts_dev/audit_missed.py <cpm_csv> <annotations_csv> [out_json]
"""
import csv
import json
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np


def load_csv_preds(path):
    preds = defaultdict(list)
    with open(path) as f:
        for row in csv.DictReader(f):
            preds[row["seriesuid"]].append(
                (float(row["coordX"]), float(row["coordY"]),
                 float(row["coordZ"]), float(row["probability"]))
            )
    return {k: np.asarray(v, np.float64) for k, v in preds.items()}


def load_annotations(path):
    ann = defaultdict(list)
    with open(path) as f:
        for row in csv.DictReader(f):
            ann[row["seriesuid"]].append(
                (float(row["coordX"]), float(row["coordY"]),
                 float(row["coordZ"]), float(row["diameter_mm"]))
            )
    return {k: np.asarray(v, np.float64) for k, v in ann.items()}


def audit(pred_csv, annotations_csv, series=None):
    preds = load_csv_preds(pred_csv)
    ann = load_annotations(annotations_csv)
    if series is not None:
        series = set(series)
        ann = {k: v for k, v in ann.items() if k in series}
    rows = []
    for cid, nodules in sorted(ann.items()):
        cand = preds.get(cid, np.zeros((0, 4)))
        order = np.argsort(-cand[:, 3]) if len(cand) else np.asarray([], int)
        rank_of = np.empty(len(cand), int)
        rank_of[order] = np.arange(len(cand))
        for x, y, z, d in nodules:
            entry = {
                "seriesuid": cid, "x": x, "y": y, "z": z, "diameter_mm": d,
                "num_candidates_in_scan": int(len(cand)),
            }
            if len(cand):
                dist = np.sqrt(((cand[:, :3] - [x, y, z]) ** 2).sum(1))
                within = dist <= d / 2.0
                if within.any():
                    best = np.argmax(np.where(within, cand[:, 3], -np.inf))
                    entry.update(
                        status="hit",
                        best_score=float(cand[best, 3]),
                        best_rank_in_scan=int(rank_of[best]),
                        dist_mm=float(dist[best]),
                    )
                else:
                    nearest = int(np.argmin(dist))
                    entry.update(
                        status="near_miss" if dist[nearest] <= 1.5 * d / 2.0
                        else "no_candidate",
                        nearest_dist_mm=float(dist[nearest]),
                        nearest_score=float(cand[nearest, 3]),
                        nearest_rank_in_scan=int(rank_of[nearest]),
                    )
            else:
                entry.update(status="no_candidate", nearest_dist_mm=None)
            rows.append(entry)
    summary = {
        "total_annotations": len(rows),
        "hit": sum(r["status"] == "hit" for r in rows),
        "near_miss": sum(r["status"] == "near_miss" for r in rows),
        "no_candidate": sum(r["status"] == "no_candidate" for r in rows),
        "hit_rank_worse_than_10": sum(
            r["status"] == "hit" and r["best_rank_in_scan"] >= 10 for r in rows
        ),
        "hit_score_below_0_1": sum(
            r["status"] == "hit" and r["best_score"] < 0.1 for r in rows
        ),
    }
    return {"summary": summary, "per_annotation": rows}


def main():
    pred_csv, annotations_csv = sys.argv[1], sys.argv[2]
    out = Path(sys.argv[3]) if len(sys.argv) > 3 else None
    result = audit(pred_csv, annotations_csv)
    print(json.dumps(result["summary"], indent=1))
    misses = [r for r in result["per_annotation"] if r["status"] != "hit"]
    for r in misses[:20]:
        print(r)
    if out:
        out.parent.mkdir(parents=True, exist_ok=True)
        with open(out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
