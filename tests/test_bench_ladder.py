"""bench.py ladder robustness: the driver-facing contract.

The driver captures BENCH_r{N}.json from bench.py's stdout and may SIGTERM
it at any point; VERDICT r1's top failure was a killed run that recorded
nothing. These tests drive the REAL main_with_retries subprocess ladder with
a scripted fake worker (NEURADAR_BENCH_FAKE_VALUES) and assert:
  * a crashed attempt falls through to the next rung;
  * every successful reading appends to BENCH_HISTORY.jsonl;
  * the best-so-far JSON line hits stdout immediately (not only at exit);
  * a healthy (>= threshold) reading stops the ladder;
  * SIGTERM mid-ladder still exits 0 with the best-so-far as the last line.
"""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

BENCH = str(Path(__file__).resolve().parent.parent / "bench.py")


def _env(tmp_path, values, fail_sleep="0", degraded_sleep="0"):
    env = dict(os.environ)
    env.update(
        NEURADAR_BENCH_FAKE_VALUES=values,
        NEURADAR_BENCH_FAKE_STATE=str(tmp_path / "fake_state"),
        NEURADAR_BENCH_FAIL_SLEEP=fail_sleep,
        NEURADAR_BENCH_DEGRADED_SLEEP=degraded_sleep,
    )
    return env


def _json_lines(text):
    out = []
    for line in text.splitlines():
        if line.startswith("{"):
            out.append(json.loads(line))
    return out


def test_ladder_crash_then_degraded_then_healthy(tmp_path):
    r = subprocess.run(
        [sys.executable, BENCH],
        env=_env(tmp_path, "crash,750,200000"),
        cwd=tmp_path, capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = _json_lines(r.stdout)
    # best-so-far after the degraded attempt, best-so-far after the healthy
    # one, final emit — and the healthy reading stops the ladder
    values = [rec["value"] for rec in lines]
    assert values == [750.0, 200000.0, 200000.0]
    assert int(open(tmp_path / "fake_state").read()) == 3  # exactly 3 attempts
    hist = [json.loads(x) for x in (tmp_path / "BENCH_HISTORY.jsonl").read_text().splitlines()]
    assert [h["value"] for h in hist] == [750.0, 200000.0]
    assert all(h["metric"] == "train_rays_per_sec" for h in hist)


def test_ladder_all_degraded_reports_best_with_history_note(tmp_path):
    # seed history with a prior healthy reading: the degraded-run note must
    # reference the best RECORDED measurement, never a constant
    (tmp_path / "BENCH_HISTORY.jsonl").write_text(
        json.dumps({"ts": 0, "metric": "train_rays_per_sec", "value": 123456.0}) + "\n"
    )
    r = subprocess.run(
        [sys.executable, BENCH],
        env=_env(tmp_path, "300,750,600"),
        cwd=tmp_path, capture_output=True, text=True, timeout=180,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = _json_lines(r.stdout)
    assert lines[-1]["value"] == 750.0
    assert "123456" in lines[-1].get("note", "")


def test_ladder_sigterm_flushes_best_so_far(tmp_path):
    proc = subprocess.Popen(
        [sys.executable, BENCH],
        env=_env(tmp_path, "600,650", degraded_sleep="60"),
        cwd=tmp_path, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    hist = tmp_path / "BENCH_HISTORY.jsonl"
    deadline = time.time() + 60
    while time.time() < deadline and not hist.exists():
        time.sleep(0.2)
    assert hist.exists(), "first reading never landed"
    time.sleep(0.5)  # let the ladder enter its degraded-retry sleep
    proc.send_signal(signal.SIGTERM)
    stdout, _ = proc.communicate(timeout=30)
    assert proc.returncode == 0
    lines = _json_lines(stdout)
    assert lines and lines[-1]["value"] == 600.0


def test_ladder_sigterm_before_any_success_emits_sentinel(tmp_path):
    """r02's exact failure sequence: the driver SIGTERMs the ladder while
    attempt 1 is still running (no success yet). The handler must print the
    parseable outage sentinel (with the committed history-best note), exit 0,
    and leave no stale heartbeat file — never a silent null artifact."""
    (tmp_path / "BENCH_HISTORY.jsonl").write_text(
        json.dumps({"ts": 0, "metric": "train_rays_per_sec", "value": 198800.0}) + "\n"
    )
    env = _env(tmp_path, "hang")
    env["NEURADAR_BENCH_INIT_TIMEOUT"] = "300"  # parent sits in the init watch
    proc = subprocess.Popen(
        [sys.executable, BENCH],
        env=env, cwd=tmp_path, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    state = tmp_path / "fake_state"
    deadline = time.time() + 60
    while time.time() < deadline and not state.exists():
        time.sleep(0.2)  # wait until attempt 1's worker is demonstrably live
    assert state.exists(), "attempt 1 never spawned"
    proc.send_signal(signal.SIGTERM)
    stdout, _ = proc.communicate(timeout=30)
    assert proc.returncode == 0
    lines = _json_lines(stdout)
    assert len(lines) == 1 and lines[0]["value"] == 0.0
    assert "outage" in lines[0]["note"] and "198800" in lines[0]["note"]
    import glob

    assert not glob.glob(f"/tmp/bench_hb_{proc.pid}_*"), "stale heartbeat file left behind"


def test_ladder_bank_first_escalates_past_healthy_micro(tmp_path):
    """A healthy reading on the bank-first (non-headline) rung must NOT stop
    the ladder: the full-scale headline rung still runs, and a healthy
    headline reading stops it."""
    r = subprocess.run(
        [sys.executable, BENCH],
        env=_env(tmp_path, "150000,250000"),
        cwd=tmp_path, capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    values = [rec["value"] for rec in _json_lines(r.stdout)]
    # micro banks 150k immediately, full escalates to 250k, final emit
    assert values == [150000.0, 250000.0, 250000.0]
    assert int(open(tmp_path / "fake_state").read()) == 2


def test_ladder_live_compile_outlasts_legacy_rung_cap(tmp_path):
    """2026-08-19 failure: a host reboot wiped /tmp, the cold first compile
    outlasted the micro rung's fixed 480 s budget, and the ladder killed a
    demonstrably LIVE worker on a healthy relay. A worker whose heartbeat
    keeps advancing must be allowed to run to the hard cap — past any legacy
    attempt timeout — and its eventual reading must bank + escalate."""
    env = _env(tmp_path, "beat:8:150000,250000")
    env["NEURADAR_BENCH_INIT_TIMEOUT"] = "12"  # hb appears ~instantly
    env["NEURADAR_BENCH_HB_STALL"] = "5"  # beats every 0.3 s keep it fresh
    env.pop("NEURADAR_BENCH_ATTEMPT_TIMEOUT", None)  # hard cap = rung default
    r = subprocess.run(
        [sys.executable, BENCH], env=env, cwd=tmp_path,
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    values = [rec["value"] for rec in _json_lines(r.stdout)]
    assert values == [150000.0, 250000.0, 250000.0]


def test_ladder_kills_stalled_heartbeat_worker(tmp_path):
    """A worker whose heartbeat STOPS advancing post-init (frozen process /
    relay plugin wedged holding the GIL) is killed after ~HB_STALL and the
    ladder moves on to the next rung instead of burning the hard cap."""
    env = _env(tmp_path, "beat:1:hang,200000")
    env["NEURADAR_BENCH_INIT_TIMEOUT"] = "12"
    env["NEURADAR_BENCH_HB_STALL"] = "4"
    r = subprocess.run(
        [sys.executable, BENCH], env=env, cwd=tmp_path,
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert _json_lines(r.stdout)[-1]["value"] == 200000.0
    assert "stalled" in r.stderr


def test_ladder_total_outage_emits_parseable_sentinel(tmp_path):
    """A relay that hangs backend init (no worker output at all) must yield a
    parseable zero-marker with the history pointer — never a null artifact —
    and stop after two dead timeouts instead of burning the whole budget."""
    (tmp_path / "BENCH_HISTORY.jsonl").write_text(
        json.dumps({"ts": 0, "metric": "train_rays_per_sec", "value": 278883.0}) + "\n"
    )
    env = _env(tmp_path, "hang")
    # the init-hung worker must be killed by the backend-init heartbeat
    # watch (INIT_TIMEOUT), well before the attempt timeout. The init
    # timeout must still cover ~3 s of interpreter startup on the 1-core
    # host (sitecustomize imports jax) so the fake worker can log its
    # fake-state attempt counter before hanging.
    env["NEURADAR_BENCH_INIT_TIMEOUT"] = "12"
    env["NEURADAR_BENCH_ATTEMPT_TIMEOUT"] = "90"
    r = subprocess.run(
        [sys.executable, BENCH], env=env, cwd=tmp_path,
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = _json_lines(r.stdout)
    assert len(lines) == 1 and lines[0]["value"] == 0.0
    assert "278883" in lines[0]["note"] and "outage" in lines[0]["note"]
    assert int(open(tmp_path / "fake_state").read()) == 2  # stopped after 2 hangs


def test_roofline_fields_self_interpretation():
    """bench JSON roofline fields (VERDICT r3 item 4): present for modeled
    scales, absent otherwise, and arithmetically consistent."""
    from neuradar_tpu.configs.bench_program import (
        MODELED_BYTES_PER_STEP,
        V5E_HBM_BPS,
        roofline_fields,
    )

    out = roofline_fields("full", 113840, 198800.0)
    assert set(out) == {"modeled_gb_per_step", "achieved_gbps_dense_counted", "pct_hbm_sol"}
    steps_per_sec = 198800.0 / 113840
    expect_gbps = MODELED_BYTES_PER_STEP["full"] * steps_per_sec / 1e9
    assert abs(out["achieved_gbps_dense_counted"] - expect_gbps) < 0.1
    assert abs(out["pct_hbm_sol"] - 100 * expect_gbps * 1e9 / V5E_HBM_BPS) < 0.1
    assert roofline_fields("half", 56920, 1e5) == {}  # no modeled bytes
    assert roofline_fields("full", 113840, 0.0) == {}  # outage sentinel
