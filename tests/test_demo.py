"""Demo surface: scripts/demo.py and demo.ipynb run data-free.

The reference ships demo.ipynb as its de-facto smoke test (SURVEY.md §4
item 3); here both the script twin and the notebook's code cells are
executed end-to-end on the tiny synthetic 3D config so the demo path
(crop -> forward -> soft-argmax -> overlay + 3D plot) stays green.
"""

import json
import os
import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]
DEBUG_CFG = "experiments/debug/synth_smoke_3d.yaml"


@pytest.mark.slow
def test_demo_script_data_free(tmp_path):
    from util import cpu_env
    env = cpu_env()
    out = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "demo.py"),
         "--cfg", str(ROOT / DEBUG_CFG), "--out", str(tmp_path)],
        text=True, capture_output=True, env=env, cwd=str(ROOT), timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert (tmp_path / "pose_2d.jpg").stat().st_size > 0
    # integral config -> the 3D skeleton plot must be written too
    assert (tmp_path / "pose_3d.png").stat().st_size > 0


@pytest.mark.slow
def test_demo_notebook_cells(tmp_path, monkeypatch):
    """Execute demo.ipynb's code cells in-process on the debug config."""
    import matplotlib
    matplotlib.use("Agg")
    nb = json.loads((ROOT / "demo.ipynb").read_text())
    cells = ["".join(c["source"]) for c in nb["cells"]
             if c["cell_type"] == "code"]
    assert len(cells) == 3
    # cell 1 pins the flagship valid config; swap in the tiny one so the
    # notebook executes in test time (the path string is part of cell 1's
    # source — if this replace stops matching, the notebook changed and
    # this test should be updated alongside it)
    assert "experiments/h36m/valid_r50_256_integral.yaml" in cells[0]
    cells[0] = cells[0].replace(
        "experiments/h36m/valid_r50_256_integral.yaml", DEBUG_CFG)
    monkeypatch.chdir(ROOT)
    ns: dict = {}
    for src in cells:
        exec(compile(src, "demo.ipynb", "exec"), ns)
    preds = ns["preds"]
    assert preds.shape[-1] == 3  # integral head -> (x, y, z)
    import numpy as np
    assert np.all(np.isfinite(preds))
