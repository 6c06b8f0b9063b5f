"""Offline pseudo-GT merge: triangulated 3D -> annot json (SURVEY §3.2).

The reference's self-supervised workflow is two-stage and OFFLINE: run the
frozen 2D teacher + triangulation over the train set, write pseudo-GT, then
train the 3D student from those labels exactly like full supervision. The
generation half lives in ``scripts/generate_pseudo_gt.py``; this module is
the second half — folding the generated ``joints_3d`` back into an annot
json so the normal H36M reader trains from pseudo-GT unchanged.
"""

from __future__ import annotations

import json


def merge_pseudo_gt_into_annot(annot_path: str, pseudo_path: str,
                               out_path: str,
                               conf_min: float = 0.0) -> int:
    """Write ``out_path``: the annot json with ``joints_3d`` replaced by
    the generated pseudo-GT (keyed by record index, the generator's
    contract). Records without pseudo-GT — or whose min teacher confidence
    is below ``conf_min`` — keep their original labels (or none), matching
    the reference's practice of training only on confident triangulations.

    Returns the number of records that received pseudo-GT.
    """
    with open(annot_path) as f:
        annots = json.load(f)
    with open(pseudo_path) as f:
        pseudo = json.load(f)

    merged = 0
    for key, rec in pseudo.items():
        i = int(key)
        if i >= len(annots):
            continue
        if rec.get("conf") is not None and conf_min > 0.0 and \
                min(rec["conf"]) < conf_min:
            continue
        annots[i]["joints_3d"] = rec["joints_3d"]
        merged += 1
    with open(out_path, "w") as f:
        json.dump(annots, f)
    return merged
