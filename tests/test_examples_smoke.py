"""Smoke-run key example scripts end-to-end on the CPU mesh (tiny presets).

Tutorials are CI-tested in test_tutorials.py; this covers the round-5
production-vocab generative recipe script, which exercises sampled softmax +
fully sparse tables through a real argv entrypoint.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_run_hstu_production_vocab_smoke(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # force CPU regardless of site configuration (see conftest note)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import runpy, sys;"
        f"sys.argv = ['x', '--vocab', '300', '--epoch', '1', '--batch_size', '32', '--seq_len', '16', '--num_negatives', '16', '--d_model', '16', '--steps_per_call', '2', '--save_dir', '{tmp_path}'];"
        f"runpy.run_path('{REPO}/examples/generative/run_hstu_production_vocab.py', run_name='__main__')"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=600, env=env)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "test loss" in out.stdout
