"""tools/trace_report.py: jax.profiler xplane parsing -> op-category table.

The trainer's --profiler jax window (engine/trainer.py, steps 12-17; cf.
reference nerfstudio/utils/profiler.py:134-179) writes xplane protos; the
report tool must parse them and attribute time. On the CPU backend the
trace has no per-HLO device plane, so the tool falls back to the host
plane's PjRt-client executable events — that fallback is what CI can cover.
"""

import json
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

TOOLS = Path(__file__).resolve().parent.parent / "tools"


@pytest.fixture(scope="module")
def trace_dir(tmp_path_factory):
    pytest.importorskip("tensorflow")
    d = tmp_path_factory.mktemp("trace")

    @jax.jit
    def f(x):
        return (x @ x).sum() + jnp.take(x.ravel(), jnp.arange(0, 1024, 7)).sum()

    x = jnp.ones((128, 128), jnp.float32)
    f(x).block_until_ready()  # compile outside the window
    jax.profiler.start_trace(str(d))
    for _ in range(3):
        f(x).block_until_ready()
    jax.profiler.stop_trace()
    return d


def run_tool(*args):
    return subprocess.run(
        [sys.executable, str(TOOLS / "trace_report.py"), *map(str, args)],
        capture_output=True, text=True, timeout=300,
    )


def test_report_json(trace_dir):
    out = run_tool(trace_dir, "--json")
    assert out.returncode == 0, out.stderr[-800:]
    blob = json.loads(out.stdout.strip().splitlines()[-1])
    assert blob["device_total_ms"] > 0
    assert blob["categories_ms"]
    assert blob["top_ops_ms"]
    # async completion markers must not be counted as ops
    assert not any(n.startswith("end: ") for n, _ in blob["top_ops_ms"])


def test_report_table_and_run_dir_layout(trace_dir, tmp_path):
    # accepts a run dir containing profiles/ (the trainer's layout)
    run_dir = tmp_path / "run"
    (run_dir / "profiles").mkdir(parents=True)
    for p in Path(trace_dir).rglob("*.xplane.pb"):
        (run_dir / "profiles" / p.name).write_bytes(p.read_bytes())
    out = run_tool(run_dir, "--top", "5")
    assert out.returncode == 0, out.stderr[-800:]
    assert "category rollup" in out.stdout


def test_report_empty_dir(tmp_path):
    out = run_tool(tmp_path)
    assert out.returncode == 2
