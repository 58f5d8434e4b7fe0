"""Train entrypoint: `python -m neuradar_tpu.scripts.train <method> [--a.b value]`.

cf. reference nerfstudio/scripts/train.py (tyro CLI, :265-278): same shape —
a method subcommand picks a TrainerConfig preset, dotted overrides tweak any
field, the resolved config is saved alongside checkpoints as YAML-ish JSON.

Multi-process launch (the reference's mp.spawn DDP at train.py:110-231) is
replaced by jax process semantics: single-process-per-host, all local devices
driven by one train step with sharded batches; multi-host adds
jax.distributed.initialize() via --coordinator/--num-processes/--process-id
(see neuradar_tpu/parallel/distributed.py).
"""

from __future__ import annotations

import dataclasses
import json
import sys
from pathlib import Path


def _config_to_jsonable(obj):
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: _config_to_jsonable(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, dict):
        return {k: _config_to_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_config_to_jsonable(v) for v in obj]
    if isinstance(obj, (int, float, str, bool)) or obj is None:
        return obj
    return repr(obj)


_DIST_FLAGS = ("--coordinator", "--num-processes", "--process-id")


def supervise(child_argv, ckpt_dir, max_restarts, resumable=True, spawn=None) -> int:
    """Run training in a child process; on a nonzero exit, restart it up to
    max_restarts times, resuming from the run's latest checkpoint when one
    exists (training continues TO max_num_iterations — Trainer.train resume
    accounting). Production robustness for device-runtime crash classes
    (e.g. a TPU worker restart) that kill the client process; the reference
    has no equivalent (its DDP launcher dies with the worker). `spawn` is
    injectable for tests; default re-execs this CLI."""
    import subprocess

    spawn = spawn or (
        lambda argv: subprocess.call([sys.executable, "-m", "neuradar_tpu.scripts.train", *argv])
    )
    attempt = 0
    while True:
        argv = list(child_argv)
        if attempt and resumable and Path(ckpt_dir).exists():
            argv += ["--load_dir", str(ckpt_dir)]
        rc = spawn(argv)
        if rc == 0 or attempt >= max_restarts:
            return rc
        attempt += 1
        has_ckpt = resumable and Path(ckpt_dir).exists()
        print(
            f"[train] child exited rc={rc}; auto-restart {attempt}/{max_restarts}"
            + (f", resuming from {ckpt_dir}" if has_ckpt else " (no checkpoint yet — cold restart)"),
            file=sys.stderr, flush=True,
        )


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    from neuradar_tpu.configs.cli import describe, parse_overrides
    from neuradar_tpu.configs.method_configs import get_method, method_configs, method_descriptions

    if not argv or argv[0] in ("-h", "--help"):
        print("usage: train.py <method> [--path.to.field value]...")
        print("methods:")
        for name in sorted(method_configs):
            print(f"  {name}: {method_descriptions.get(name, '')}")
        return 0

    method = argv.pop(0)

    # --auto-restart N: supervise training in a child process, restarting on
    # crash (resume from the run's checkpoints). Handled before any jax use.
    n_restarts = 0
    if "--auto-restart" in argv:
        i = argv.index("--auto-restart")
        if i + 1 >= len(argv):
            raise SystemExit("missing value for --auto-restart (expected a restart count)")
        try:
            n_restarts = int(argv[i + 1])
        except ValueError:
            raise SystemExit(f"invalid --auto-restart value {argv[i + 1]!r} (expected an integer)")
        del argv[i : i + 2]
    if n_restarts > 0:
        cfg_argv = list(argv)
        for flag in _DIST_FLAGS:
            while flag in cfg_argv:
                i = cfg_argv.index(flag)
                del cfg_argv[i : i + 2]
        cfg = parse_overrides(get_method(method), cfg_argv)
        ckpt_dir = Path(cfg.output_dir) / cfg.experiment_name / cfg.method_name / "checkpoints"
        return supervise([method, *argv], ckpt_dir, n_restarts,
                         resumable=hasattr(cfg, "load_dir"))

    # Multi-host bootstrap BEFORE any jax use (cf. reference train.py launch()
    # world_size>1 branch): --coordinator/--num-processes/--process-id or the
    # COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID env vars; a plain
    # single-host run is a no-op.
    dist_kw = {}
    for flag, key in (("--coordinator", "coordinator_address"),
                      ("--num-processes", "num_processes"),
                      ("--process-id", "process_id")):
        if flag in argv:
            i = argv.index(flag)
            val = argv[i + 1]
            dist_kw[key] = val if key == "coordinator_address" else int(val)
            del argv[i:i + 2]
    from neuradar_tpu.parallel.distributed import is_main_process, setup_distributed

    setup_distributed(**dist_kw)

    config = get_method(method)
    if argv and argv[0] in ("-h", "--help"):
        print(f"overridable fields for {method}:")
        print("\n".join(describe(config)))
        return 0
    parse_overrides(config, argv)

    if method.startswith("splatfacto"):
        from neuradar_tpu.engine.splatfacto_trainer import SplatfactoTrainer as Trainer
    elif "nerfacto" in method:
        from neuradar_tpu.engine.nerfacto_trainer import NerfactoTrainer as Trainer
    else:
        from neuradar_tpu.engine.trainer import Trainer

    trainer = Trainer(config)
    run_dir = trainer._run_dir
    # host-side effects (config/metrics files, stdout) only on the main
    # process — the reference gates the same on comms.is_main_process()
    if is_main_process():
        run_dir.mkdir(parents=True, exist_ok=True)
        (run_dir / "config.json").write_text(json.dumps(_config_to_jsonable(config), indent=2))
        print(f"[train] method={method} -> {run_dir}")

    trainer.setup()
    metrics = trainer.train()
    if is_main_process():
        (run_dir / "final_metrics.json").write_text(json.dumps(metrics, indent=2))
        print(json.dumps({k: round(v, 5) for k, v in metrics.items() if isinstance(v, float)}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
