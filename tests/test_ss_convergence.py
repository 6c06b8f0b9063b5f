"""SS convergence pin: student MPJPE must DESCEND under the SS loop.

tools/ss_convergence.py is the chip-scale experiment (curve recorded in
docs/SS_TEACHER.md); this is its CI-scale twin (VERDICT r3 next #4: "plus
a fast CI-scale pin"). It trains a real tiny 2D teacher on the synthetic
rig's crops, freezes it, runs the actual SS loop, and asserts the
student's EVALUATED MPJPE (full validate() protocol, held-out frames)
drops substantially from its pretrained-backbone starting point.
"""

import pathlib
import sys

import pytest

from epipolarpose_tpu.config import config

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]
                       / "tools"))


@pytest.mark.slow
def test_student_mpjpe_descends_under_ss():
    config.MODEL.NAME = "pose3d_resnet"
    config.MODEL.NUM_JOINTS = 17
    config.MODEL.IMAGE_SIZE = [64, 64]
    config.MODEL.EXTRA.HEATMAP_SIZE = [16, 16]
    config.MODEL.EXTRA.NUM_LAYERS = 18
    config.MODEL.EXTRA.NUM_DECONV_FILTERS = [32, 32, 32]
    config.MODEL.EXTRA.TARGET_TYPE = "integral"
    config.MODEL.EXTRA.DEPTH_DIM = 4
    config.LOSS.TYPE = "IntegralL1Loss"
    config.DATASET.LABEL_SOURCE = "triangulated"
    config.TPU.COMPUTE_DTYPE = "float32"

    from ss_convergence import run
    curve, floor = run(config, frames=12, val_frames=6, groups=4,
                       teacher_steps=150, ss_steps=48, eval_every=16,
                       log=lambda *a: None)
    start = curve[0][1]
    best = min(v for _, v in curve)
    final = curve[-1][1]
    # the student must genuinely learn from pseudo-GT: large drop from the
    # (teacher-backbone, random-head) start, and the curve must not end
    # above where it started descending toward the floor
    assert best < 0.6 * start, (start, best, curve)
    assert final <= 1.1 * best, curve
    # floor sanity: the teacher's pseudo-GT is imperfect but not garbage
    assert floor < start, (floor, start)
