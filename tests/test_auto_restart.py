"""Auto-restart supervisor: crash-class recovery for the train CLI.

The device runtime can kill the client process mid-training (observed here
as the relay's 'TPU worker crashed or restarted' class); `--auto-restart N`
re-execs training and resumes from the run's latest checkpoint. The
reference's mp.spawn DDP launcher has no equivalent recovery.
"""

from __future__ import annotations

from pathlib import Path

import neuradar_tpu.scripts.train as train_cli


def test_supervise_restarts_and_resumes(tmp_path):
    ckpt_dir = tmp_path / "checkpoints"
    calls = []

    def spawn(argv):
        calls.append(list(argv))
        if len(calls) == 1:
            # crash after the run saved its first checkpoint
            ckpt_dir.mkdir(parents=True, exist_ok=True)
            (ckpt_dir / "step-000000005").mkdir()
            return 17
        if len(calls) == 2:
            return 17  # crash again (no new state)
        return 0

    rc = train_cli.supervise(["neuradar-synthetic", "--seed", "1"], ckpt_dir, 3, spawn=spawn)
    assert rc == 0
    assert len(calls) == 3
    # first attempt: pristine argv, no resume flag
    assert calls[0] == ["neuradar-synthetic", "--seed", "1"]
    # every restart after a checkpoint exists resumes from it
    for argv in calls[1:]:
        assert argv[-2:] == ["--load_dir", str(ckpt_dir)]
        assert argv[:2] == ["neuradar-synthetic", "--seed"]


def test_supervise_cold_restart_without_checkpoint(tmp_path):
    ckpt_dir = tmp_path / "none"
    calls = []

    def spawn(argv):
        calls.append(list(argv))
        return 0 if len(calls) > 1 else 1

    rc = train_cli.supervise(["m"], ckpt_dir, 2, spawn=spawn)
    assert rc == 0
    assert calls == [["m"], ["m"]]  # no --load_dir: nothing to resume from


def test_supervise_gives_up_after_max_restarts(tmp_path):
    calls = []

    def spawn(argv):
        calls.append(argv)
        return 9

    rc = train_cli.supervise(["m"], tmp_path / "c", 2, spawn=spawn)
    assert rc == 9
    assert len(calls) == 3  # initial + 2 restarts


def test_supervise_not_resumable_never_adds_load_dir(tmp_path):
    ckpt_dir = tmp_path / "checkpoints"
    ckpt_dir.mkdir()
    calls = []

    def spawn(argv):
        calls.append(list(argv))
        return 3 if len(calls) == 1 else 0

    rc = train_cli.supervise(["splatfacto"], ckpt_dir, 1, resumable=False, spawn=spawn)
    assert rc == 0
    assert all("--load_dir" not in argv for argv in calls)


def test_cli_wires_auto_restart(monkeypatch, tmp_path):
    seen = {}

    def fake_supervise(child_argv, ckpt_dir, max_restarts, resumable=True, spawn=None):
        seen.update(child_argv=child_argv, ckpt_dir=Path(ckpt_dir),
                    max_restarts=max_restarts, resumable=resumable)
        return 0

    monkeypatch.setattr(train_cli, "supervise", fake_supervise)
    rc = train_cli.main([
        "neuradar-synthetic", "--auto-restart", "2",
        "--output_dir", str(tmp_path), "--coordinator", "h:1234",
        "--num-processes", "1", "--process-id", "0", "--seed", "3",
    ])
    assert rc == 0
    assert seen["max_restarts"] == 2
    assert seen["resumable"] is True
    # the supervisor flag is consumed; dist flags stay for the child
    assert "--auto-restart" not in seen["child_argv"]
    assert "--coordinator" in seen["child_argv"]
    # ckpt dir reflects the overridden output_dir and the method's run layout
    assert seen["ckpt_dir"].parts[-1] == "checkpoints"
    assert str(seen["ckpt_dir"]).startswith(str(tmp_path))
