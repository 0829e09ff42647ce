"""Demo CLI smoke test: pretrained plot-only path (reference checkpoint
import + dataset auto-generation + plotting), run in a subprocess so the
NJODE_DATA_PATH env var takes effect at import time."""

import os
import subprocess
import sys

import pytest

from conftest import REPO_ROOT, reference_available

REF_CKPT = "/root/reference/data/saved_models/id-1/last_checkpoint"


@pytest.mark.skipif(not (reference_available() and os.path.exists(REF_CKPT)),
                    reason="reference pretrained checkpoints not available")
def test_demo_pretrained_plot_only(tmp_path):
    env = dict(os.environ)
    env["NJODE_DATA_PATH"] = str(tmp_path / "data")
    env["JAX_PLATFORMS"] = "cpu"
    # CPU-only subprocess: drop the axon TPU site hook from PYTHONPATH —
    # its register() call blocks interpreter startup whenever the TPU
    # relay is down, regardless of JAX_PLATFORMS (measured: 60s+ hang).
    env["PYTHONPATH"] = REPO_ROOT
    out = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "demo.py"),
         "--model_id=1"],
        env=env, cwd=REPO_ROOT, capture_output=True, text=True, timeout=500)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "use pretrained model" in out.stdout
    plots = os.path.join(str(tmp_path / "data"), "saved_models", "id-1",
                         "plots")
    assert os.path.isdir(plots) and len(os.listdir(plots)) >= 4
