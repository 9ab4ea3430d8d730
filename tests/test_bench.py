"""bench.py must run end-to-end and print its one-line JSON contract.

The driver executes ``python bench.py`` on the real accelerator; this
guards the harness itself (small scale, CPU backend, subprocess)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_small_scale_json_contract():
    env = os.environ.copy()
    env["BENCH_SCALE"] = "small"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import runpy, sys; sys.argv=['bench.py'];"
        f"runpy.run_path({os.path.join(REPO, 'bench.py')!r}, run_name='__main__')"
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        timeout=500,
    )
    assert res.returncode == 0, res.stderr[-2000:]

    line = res.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert set(out) >= {"metric", "value", "unit", "vs_baseline"}
    assert out["value"] > 0
    assert out["unit"] == "m-modes/s"
    assert "t_btm_s" in out["detail"] and "t_product_s" in out["detail"]
