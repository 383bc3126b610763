"""Smoke-run every code cell of every tutorial notebook (CPU mesh).

The reference ships tutorials as notebooks with no CI coverage; here every
cell is executed so the tutorials cannot rot as the API evolves.
"""

import glob
import json
import os

import pytest

TUTORIALS = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "tutorials", "*.ipynb")))


@pytest.mark.slow
@pytest.mark.parametrize("path", TUTORIALS, ids=[os.path.basename(p) for p in TUTORIALS])
def test_tutorial_runs(path, tmp_path, monkeypatch):
    with open(path) as f:
        nb = json.load(f)
    cells = ["".join(c["source"]) for c in nb["cells"] if c["cell_type"] == "code"]
    assert cells, f"{path} has no code cells"
    # notebooks assume cwd == tutorials/; replicate that
    monkeypatch.chdir(os.path.dirname(path))
    ns = {}
    for i, src in enumerate(cells):
        try:
            exec(compile(src, f"{os.path.basename(path)}::cell{i}", "exec"), ns)
        except Exception as e:  # pragma: no cover - failure reporting
            pytest.fail(f"{os.path.basename(path)} cell {i} failed: {type(e).__name__}: {e}\n--- cell source ---\n{src}")


def test_tutorials_exist():
    names = {os.path.basename(p) for p in TUTORIALS}
    expected = {
        "00_QuickStart_CTR_DeepFM.ipynb",
        "01_Ranking_DIN.ipynb",
        "02_Matching_DSSM.ipynb",
        "03_MultiTask_MMOE.ipynb",
        "04_Experiment_Tracking.ipynb",
        "05_Model_Export_and_Serving.ipynb",
    }
    assert expected <= names, expected - names
