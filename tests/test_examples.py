"""The examples must stay runnable (reference notebook-CI parity)."""
import os
import subprocess
import sys

import pytest

from conftest import REF_TEST_DIR

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not REF_TEST_DIR.is_dir(),
                    reason="reference fixtures unavailable")
def test_python_api_tour():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "python_api_tour.py"),
         str(REF_TEST_DIR)],
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "done" in r.stdout
    assert "database has 24 entries" in r.stdout
