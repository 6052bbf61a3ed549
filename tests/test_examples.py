"""Run every example script as an integration test — the reference's example
notebooks are its de-facto integration suite (SURVEY.md §4); here they are
executable and gated in CI."""
import os
import glob
import runpy
import numpy as np
import pytest

EXAMPLES = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "examples", "*.py")))


@pytest.mark.parametrize("path", EXAMPLES, ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_runs(path, monkeypatch):
    np.random.seed(0)
    # keep examples fast under test: cap verbose output
    runpy.run_path(path, run_name="__main__")
