"""Benchmark: train rays/sec on the flagship NeuRadar model, real hardware.

Accounting matches the reference (engine/trainer.py:333-340):
world_size x rays_per_batch / iteration_time, with the reference's default
batch composition (40960 camera rays as 40x32^2 patches supervising 96^2 rgb,
16384 lidar rays, 16 radar scans x full ZOD FoV grid (107x33 under
torch.arange semantics) = 56496 radar rays;
BASELINE.md "Reference operating points").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is relative to a nominal 100k train rays/sec for the CUDA
reference on a modern GPU (the repo publishes no number — BASELINE.md §1).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np
from neuradar_tpu.utils.cache_dirs import jax_cache_dir

BASELINE_RAYS_PER_SEC = 100_000.0


def log(msg):
    print(f"[bench +{time.perf_counter() - T0:.1f}s] {msg}", file=sys.stderr, flush=True)


T0 = time.perf_counter()


def main(chunks: int = 8, scale: str = "full", scan_steps: int = 4, radar_chunks: int = 0,
         remat_policy: str = "save_grid", hoist: bool = True, table_moments_dtype=None,
         packed_cells: bool = False):
    import jax

    if os.environ.get("NEURADAR_BENCH_CPU"):
        # developer/CI escape hatch: measure on the local CPU backend (env
        # alone is ignored here — sitecustomize pre-registers the TPU plugin)
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir", jax_cache_dir("cpu"))
    else:
        jax.config.update("jax_compilation_cache_dir", jax_cache_dir("tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    # backend-init heartbeat: a fully wedged relay hangs jax.devices()
    # itself (>420 s measured, no return). Touching this file tells the
    # ladder parent that init succeeded, so it can kill init-hung workers
    # after NEURADAR_BENCH_INIT_TIMEOUT instead of a full attempt timeout.
    t_init = time.perf_counter()
    n_dev = len(jax.devices())
    log(f"backend init: {n_dev} device(s) in {time.perf_counter() - t_init:.1f}s")
    hb = os.environ.get("NEURADAR_BENCH_HEARTBEAT")
    if hb:
        try:
            open(hb, "w").close()
        except OSError as e:
            log(f"heartbeat write failed ({e}); parent may misread init as hung")
        else:
            import threading

            def _beat():
                # liveness signal for the ladder parent: a COLD persistent
                # cache (a host reboot wipes /tmp) makes the first compile
                # alone outlast any fixed rung budget, so the parent extends
                # a live worker to its hard cap as long as this file's mtime
                # keeps advancing. If the relay plugin wedges while holding
                # the GIL, this thread stops beating and the parent kills us
                # within ~NEURADAR_BENCH_HB_STALL instead.
                while True:
                    time.sleep(10)
                    try:
                        os.utime(hb, None)
                    except OSError:
                        return

            threading.Thread(target=_beat, daemon=True, name="bench-heartbeat").start()

    import jax.numpy as jnp
    import optax

    from neuradar_tpu.configs.bench_program import bench_pipeline
    from neuradar_tpu.engine.optimizers import build_optimizer, default_optimizer_groups

    # Reference-scale scene proxy + reference batch composition; micro/eighth
    # /quarter/three8/half are degraded-relay rungs (the 2026-08-17 episode
    # crashed every production train step >= eighth while micro survived —
    # tools/bisect_relay_crash.py). ONE definition shared with the cost-model
    # tools so they always analyze the exact measured program.
    pipeline = bench_pipeline(scale=scale, chunks=chunks, remat_policy=remat_policy,
                              hoist=hoist, radar_chunks=radar_chunks, packed_cells=packed_cells)
    layout = pipeline.layout
    rays_per_batch = layout.total

    log(f"layout: {rays_per_batch} rays/batch on {jax.devices()[0].platform}")
    compile_only = bool(os.environ.get("NEURADAR_BENCH_COMPILE_ONLY"))
    if compile_only:
        # pre-warm the (persistent + relay-side) compile cache for THIS exact
        # program without executing anything on the device — degraded relay
        # episodes crash big executions but serve compiles, so warming during
        # an episode lets the next healthy window spend its minutes timing
        # instead of the 5-12 min compile (docs/PERFORMANCE.md playbook)
        variables = jax.eval_shape(lambda: pipeline.init_variables(0))
    else:
        variables = pipeline.init_variables(0)
    log("init done" + (" (abstract)" if compile_only else ""))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = build_optimizer(params, default_optimizer_groups(
        20001, table_moments_dtype=table_moments_dtype))
    opt_state = jax.eval_shape(tx.init, params) if compile_only else tx.init(params)
    loss_fn = pipeline.make_train_loss_fn()

    # donate params/opt_state/batch_stats: the optimizer update is in-place
    # in HBM instead of allocating a second ~1.5 GB param+Adam-state copy.
    # K training steps run per dispatch via lax.scan over K stacked batches:
    # the host<->device round trip (measured ~37 ms through the axon relay)
    # amortizes over K real optimizer steps.
    @functools.partial(jax.jit, donate_argnums=(0, 1, 2), static_argnames=("k",))
    def train_steps(params, opt_state, batch_stats, batches, rng, k):
        def body(carry, xs):
            params, opt_state, batch_stats = carry
            batch, step_rng = xs
            (total, (loss_dict, metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, batch, step_rng
            )
            updates, new_opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_opt_state, new_bs), total

        rngs = jax.random.split(rng, k)
        (params, opt_state, batch_stats), totals = jax.lax.scan(
            body, (params, opt_state, batch_stats), (batches, rngs)
        )
        return params, opt_state, batch_stats, totals[-1]

    def stack_batches(k):
        bs = [pipeline.datamanager.next_train() for _ in range(k)]
        return jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *bs)

    if compile_only:
        # same stacking code as the timed path (next_train falls back to
        # sample_train_batch before prefetch starts) — the warmed cache entry
        # is provably the program the real bench dispatches
        batches = jax.eval_shape(lambda: stack_batches(scan_steps))
        log(f"compile-only: lowering+compiling (scale={scale}, K={scan_steps})...")
        t0 = time.perf_counter()
        train_steps.lower(params, opt_state, batch_stats, batches,
                          jax.ShapeDtypeStruct((2,), jnp.uint32), k=scan_steps).compile()
        dt = time.perf_counter() - t0
        log(f"compile-only done in {dt:.0f}s (cache warm for this program)")
        print(json.dumps({"metric": "compile_s", "value": round(dt, 1), "unit": "s",
                          "vs_baseline": 0.0, "note": "compile-only cache warm, no execution"}))
        return

    pipeline.datamanager.start_prefetch()
    rng = jax.random.PRNGKey(0)

    # warmup (compile). NOTE: on the relay backend block_until_ready returns
    # before execution finishes — only a value fetch synchronizes, so all
    # timing boundaries below fetch the loss scalar.
    log("compiling train step...")
    params, opt_state, batch_stats, total = train_steps(
        params, opt_state, batch_stats, stack_batches(scan_steps), rng, scan_steps
    )
    warm_loss = float(total)
    log(f"train step compiled (warmup loss {warm_loss:.4f}); timing...")

    # adaptive timing window: estimate one dispatch first, then size the
    # timed loop to ~60 s — a degraded relay episode can execute ~500x slow,
    # where a fixed 12-dispatch window at full scale would outlive the
    # ladder's per-attempt timeout and record nothing
    t0 = time.perf_counter()
    params, opt_state, batch_stats, total = train_steps(
        params, opt_state, batch_stats, stack_batches(scan_steps),
        jax.random.fold_in(rng, 10_000), scan_steps
    )
    _ = float(total)
    est_dispatch = time.perf_counter() - t0
    n_dispatches = int(np.clip(60.0 / max(est_dispatch, 1e-3), 2, max(12 // scan_steps, 2)))
    log(f"~{est_dispatch:.2f}s/dispatch -> timing {n_dispatches} dispatches")
    n_iters = n_dispatches * scan_steps
    t0 = time.perf_counter()
    for i in range(n_dispatches):
        params, opt_state, batch_stats, total = train_steps(
            params, opt_state, batch_stats, stack_batches(scan_steps),
            jax.random.fold_in(rng, i), scan_steps
        )
    _ = float(total)  # hard sync: all scheduled steps complete
    dt = time.perf_counter() - t0
    pipeline.datamanager.stop()

    world = jax.device_count()
    rays_per_sec = world * rays_per_batch * n_iters / dt
    result = {
        "metric": "train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 4),
    }
    from neuradar_tpu.configs.bench_program import roofline_fields

    # self-interpretation vs the HBM roofline (cost-model bytes of this exact
    # program; dense-counted upper bound — configs/bench_program.py). The
    # constants are modeled for the DEFAULT program: ablation arms
    # (remat-policy/hoist/moments knobs) change the program's bytes, so
    # attaching the default's model there would mislabel the arm.
    if remat_policy == "save_grid" and hoist and not table_moments_dtype and not packed_cells:
        result.update(roofline_fields(scale, rays_per_batch, rays_per_sec))
    print(json.dumps(result))
    if os.environ.get("NEURADAR_BENCH_APPEND_HISTORY"):
        # direct-worker sweeps (chunk/K tuning in a healthy relay window)
        # bank their readings too; the ladder appends for itself
        with open("BENCH_HISTORY.jsonl", "a") as f:
            f.write(json.dumps({"ts": time.time(),
                                "args": ["--chunks", str(chunks), "--scale", scale,
                                         "--scan-steps", str(scan_steps)]
                                + (["--radar-chunks", str(radar_chunks)] if radar_chunks else [])
                                + (["--remat-policy", remat_policy] if remat_policy != "save_grid" else [])
                                + ([] if hoist else ["--no-hoist"])
                                + (["--packed-cells"] if packed_cells else [])
                                + (["--table-moments-dtype", table_moments_dtype]
                                   if table_moments_dtype else []),
                                **result}) + "\n")


WALLTIME_BUDGET_S = 25 * 60  # hard cap: the driver window is ~1800 s (r01 AND
# r02 both SIGTERMed at ~1798 s) — finish, with a reading or a sentinel, well
# inside it


def main_with_retries() -> None:
    """Run the measurement in child processes; the axon TPU relay
    occasionally faults ('TPU device error' / worker crash) and a fresh
    process is the only reliable recovery.

    BANK-FIRST ladder: the cheapest all-modality rung (micro, the shape known
    to survive every relay episode) runs FIRST so a real number is on stdout
    within minutes, then the ladder escalates to the reference full-scale
    batch (the headline) with whatever budget remains, keeping best-so-far
    semantics. Only a healthy FULL-SCALE reading stops the ladder early — a
    healthy micro reading must still escalate.

    Robustness contract (the driver may SIGTERM/SIGKILL us at any point):
    * after EVERY successful attempt the best-so-far JSON line is printed to
      stdout immediately — a killed run still leaves a parseable last line;
    * SIGTERM/SIGINT re-print the best reading and exit 0; if NO attempt has
      succeeded yet they print the outage sentinel (with the committed
      history-best note) and still exit 0 — never a silent null artifact;
    * total walltime is capped at WALLTIME_BUDGET_S;
    * a live worker (heartbeat mtime advancing) is never killed before its
      hard cap — a host reboot wipes the /tmp persistent compile cache, and
      the cold first compile alone can outlast any fixed rung budget
      (observed 2026-08-19 on a healthy relay); a stale heartbeat kills in
      ~NEURADAR_BENCH_HB_STALL seconds instead.
    """
    import signal
    import subprocess

    # (worker args, per-rung attempt-timeout cap or None=max, is_headline).
    # Degraded-relay bisects (2026-08-16/17): episodes crash the worker above
    # a PROGRAM-SIZE threshold that varies by episode, and the K=4 batch scan
    # counts ~K-fold — hence micro/--scan-steps 1 as the banked opener and
    # K=1 fallbacks after the K=4 headline.
    ladder = [
        (["--chunks", "8", "--scale", "micro", "--scan-steps", "1"], 480.0, False),
        (["--chunks", "8", "--scale", "full"], None, True),
        (["--chunks", "8", "--scale", "full", "--scan-steps", "1"], None, True),
        (["--chunks", "8", "--scale", "eighth", "--scan-steps", "1"], 480.0, False),
        (["--chunks", "8", "--scale", "three8", "--scan-steps", "1"], 480.0, False),
    ]
    # below this the relay is provably degraded (healthy runs measured
    # 199k-279k rays/s; a degraded-relay episode measured ~750): keep trying
    # for a sane reading but still report the best real measurement
    degraded_thresh = 10_000.0
    # sleeps between attempts are env-tunable so the CI ladder test
    # (tests/test_bench_ladder.py) can drive the real subprocess path fast
    fail_sleep = float(os.environ.get("NEURADAR_BENCH_FAIL_SLEEP", "15"))
    degraded_sleep = float(os.environ.get("NEURADAR_BENCH_DEGRADED_SLEEP", "45"))
    max_attempt_timeout = float(os.environ.get("NEURADAR_BENCH_ATTEMPT_TIMEOUT", "900"))
    history_path = "BENCH_HISTORY.jsonl"
    best = None
    child = None
    hb_live = None  # in-flight heartbeat file, unlinked on signal exit
    dead_timeouts = 0  # consecutive timeouts with no worker progress at all

    def history_best() -> float:
        """Best train_rays_per_sec actually on record (committed history)."""
        hb = 0.0
        try:
            with open(history_path) as f:
                for line in f:
                    try:
                        rec = json.loads(line)
                        if rec.get("metric") == "train_rays_per_sec":
                            hb = max(hb, rec.get("value", 0.0))
                    except (json.JSONDecodeError, AttributeError):
                        continue  # truncated/corrupt line from a killed append
        except OSError:
            pass
        return hb

    def outage_sentinel() -> dict:
        """Parseable honest zero with a pointer at the committed record —
        what the driver sees when NO attempt produced a reading."""
        hist_best = history_best()
        return {
            "metric": "train_rays_per_sec", "value": 0.0, "unit": "rays/s",
            "vs_baseline": 0.0,
            "note": (("TPU relay unreachable (attempts hung before backend init)"
                      if dead_timeouts >= 2 else
                      "TPU relay outage: every attempt crashed or timed out without a reading")
                     + "; this 0.0 is an outage marker, not a measurement. Best recorded "
                     f"measurement for this code path: {hist_best:.0f} rays/s "
                     f"(vs_baseline {hist_best / BASELINE_RAYS_PER_SEC:.2f}, committed BENCH_HISTORY.jsonl)"),
        }

    def emit_best():
        # ALWAYS leaves a parseable JSON line: best-so-far if any attempt
        # succeeded, the outage sentinel otherwise (VERDICT r2: a SIGTERM
        # before the first success must never exit silently)
        print(json.dumps(best if best is not None else outage_sentinel()), flush=True)

    def on_term(signum, frame):
        log(f"signal {signum}: flushing best-so-far (or outage sentinel) and exiting")
        if child is not None and child.poll() is None:
            child.kill()
        if hb_live is not None:
            try:
                os.unlink(hb_live)
            except OSError:
                pass
        emit_best()
        raise SystemExit(0)

    signal.signal(signal.SIGTERM, on_term)
    signal.signal(signal.SIGINT, on_term)

    for attempt, (extra, rung_cap, is_headline) in enumerate(ladder):
        remaining = WALLTIME_BUDGET_S - (time.perf_counter() - T0)
        if remaining < 300:
            log("walltime budget nearly exhausted; stopping the ladder")
            break
        # a live worker (heartbeat advancing) may run to hard_cap — a cold
        # persistent cache after a host reboot makes the first compile alone
        # outlast any fixed rung budget (observed 2026-08-19: the micro rung
        # died at its 480 s cap mid-compile on a HEALTHY relay). rung_cap now
        # only picks the hard-cap tier: capped (bank-first/probe) rungs get
        # 900 s, headline rungs the remaining budget.
        hard_cap = min(
            float(os.environ.get("NEURADAR_BENCH_ATTEMPT_HARD",
                                 "900" if rung_cap is not None else "1380")),
            remaining - 120.0)
        if "NEURADAR_BENCH_ATTEMPT_TIMEOUT" in os.environ:  # explicit operator/CI override
            hard_cap = min(hard_cap, max_attempt_timeout)
        hb_stall = float(os.environ.get("NEURADAR_BENCH_HB_STALL", "90"))
        timed_out = False
        # backend-init watch: the worker touches hb_path the moment
        # jax.devices() returns. A fully wedged relay never gets there
        # (>420 s measured, no return) — kill such workers after
        # init_timeout instead of burning a full attempt_timeout (a wedged
        # window used to cost 2 x 2400 s before the outage sentinel).
        hb_path = hb_live = f"/tmp/bench_hb_{os.getpid()}_{attempt}"
        try:
            os.unlink(hb_path)
        except OSError:
            pass
        init_timeout = min(hard_cap,
                           float(os.environ.get("NEURADAR_BENCH_INIT_TIMEOUT", "300")))
        try:
            child = subprocess.Popen(
                [sys.executable, __file__, "--worker", *extra],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                # compile-only is a direct-worker tool (cache pre-warm); a
                # ladder must always MEASURE — never let workers inherit it
                # and bank compile_s as the benchmark reading
                env={k: v for k, v in dict(os.environ, NEURADAR_BENCH_HEARTBEAT=hb_path).items()
                     if k != "NEURADAR_BENCH_COMPILE_ONLY"},
            )
            t_child = time.monotonic()
            while (child.poll() is None and not os.path.exists(hb_path)
                   and time.monotonic() - t_child < init_timeout):
                time.sleep(2.0)
            if child.poll() is None and not os.path.exists(hb_path):
                timed_out = True
                child.kill()
                stdout, werr = child.communicate()
                stdout = stdout or ""
                stderr = (f"no backend-init heartbeat after {init_timeout:.0f}s — "
                          "relay wedged at jax.devices()\n" + (werr or ""))
            else:
                # init returned: the worker's daemon heartbeat thread now
                # touches hb_path every ~10 s. Poll liveness instead of a
                # blind communicate(timeout): a live, beating worker (e.g.
                # sitting in a cold-cache compile) runs to hard_cap; a stale
                # heartbeat (worker frozen / plugin wedged holding the GIL)
                # kills in ~hb_stall.
                kill_why = None
                while child.poll() is None:
                    elapsed = time.monotonic() - t_child
                    if elapsed > hard_cap:
                        kill_why = (f"attempt killed {elapsed:.0f}s after spawn "
                                    f"(hard cap {hard_cap:.0f}s)")
                    else:
                        try:
                            hb_age = time.time() - os.path.getmtime(hb_path)
                        except OSError:  # hb vanished mid-attempt: no liveness signal to judge
                            hb_age = 0.0
                        if hb_age > hb_stall:
                            kill_why = (f"heartbeat stalled for {hb_age:.0f}s (worker frozen) "
                                        f"{elapsed:.0f}s after spawn")
                    if kill_why:
                        timed_out = True
                        child.kill()
                        break
                    time.sleep(2.0)
                stdout, werr = child.communicate()
                stdout = stdout or ""
                stderr = ((kill_why + "\n") if kill_why else "") + (werr or "")
        except OSError as e:  # Popen/communicate failure: count as a failed attempt
            timed_out = True
            if child is not None and child.poll() is None:
                child.kill()
                child.communicate()
            stdout, stderr = "", f"attempt infrastructure error: {e}"
        try:
            os.unlink(hb_path)
        except OSError:
            pass
        hb_live = None
        # a worker that hung at BACKEND INIT with no log output at all: two
        # in a row means the relay is unreachable, not merely degraded —
        # stop burning the budget and emit the outage sentinel below.
        # "[bench" in stderr means backend init demonstrably returned (the
        # first worker log line), so a lost heartbeat file (failed write)
        # alone must not count toward an unreachable verdict.
        if timed_out and "[bench" not in stderr:
            dead_timeouts += 1
            if dead_timeouts >= 2:
                log("two attempts hung before backend init — relay unreachable, stopping")
                break
        else:  # the worker made progress (or finished): hangs are not consecutive
            dead_timeouts = 0
        result = None
        for line in stdout.splitlines():
            if line.startswith("{"):
                result = json.loads(line)
        if result is None:
            print(f"[bench] attempt {attempt + 1}/{len(ladder)} ({extra}) failed:\n{stderr[-2000:]}",
                  file=sys.stderr, flush=True)
            time.sleep(min(fail_sleep, max(0.0, WALLTIME_BUDGET_S - (time.perf_counter() - T0))))
            continue
        try:  # running log of every successful measurement (committed; the
            # honest record across relay-health episodes)
            with open(history_path, "a") as f:
                f.write(json.dumps({"ts": time.time(), "args": extra, **result}) + "\n")
        except OSError:
            pass
        if best is None or result["value"] > best["value"]:
            best = result
            print(json.dumps(best), flush=True)  # best-so-far on stdout NOW — survives a later kill
        if is_headline and result["value"] >= degraded_thresh:
            break  # healthy reading at the reference batch: done
        if result["value"] < degraded_thresh:
            print(f"[bench] attempt {attempt + 1} measured {result['value']} rays/s — relay degraded",
                  file=sys.stderr, flush=True)
            time.sleep(degraded_sleep)
        # a healthy NON-headline reading (bank-first rung): escalate
        # immediately, no sleep — the next rung is the full-scale headline
    if best is None:
        # total outage (e.g. the relay hangs backend init for the whole
        # window): emit a PARSEABLE honest zero instead of dying with no
        # JSON — the note points at the committed measurement record
        print(json.dumps(outage_sentinel()), flush=True)
        return
    if best["value"] < degraded_thresh:
        # annotate with the best measurement actually on record — never a
        # constant baked into code (the committed BENCH_HISTORY.jsonl is the
        # honest record across relay-health episodes)
        hist_best = history_best()
        if hist_best > best["value"]:
            print(f"[bench] NOTE: all attempts ran on a degraded TPU relay (best recorded "
                  f"measurement: {hist_best:.0f} rays/s, BENCH_HISTORY.jsonl)", file=sys.stderr)
            best["note"] = (f"degraded TPU relay episode: best recorded measurement for this code path "
                            f"is {hist_best:.0f} rays/s (vs_baseline {hist_best / BASELINE_RAYS_PER_SEC:.2f}; "
                            "see committed BENCH_HISTORY.jsonl)")
    print(json.dumps(best), flush=True)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        fake = os.environ.get("NEURADAR_BENCH_FAKE_VALUES")
        if fake:
            # CI harness (tests/test_bench_ladder.py): consume one scripted
            # outcome per worker invocation ("crash" or a rays/s value) via a
            # file-backed counter, exercising the REAL ladder/subprocess path
            state = os.environ.get("NEURADAR_BENCH_FAKE_STATE", "/tmp/bench_fake_state")
            try:
                n = int(open(state).read())
            except (OSError, ValueError):
                n = 0
            with open(state, "w") as f:
                f.write(str(n + 1))
            values = fake.split(",")
            v = values[min(n, len(values) - 1)].strip()
            if v.startswith("beat:"):
                # "beat:<seconds>:<outcome>": simulate a worker alive in a
                # long cold-cache compile — create + touch the heartbeat file
                # for <seconds>, then apply <outcome> (a rays/s value, or
                # "hang" to simulate a frozen post-init worker whose
                # heartbeat stops advancing)
                _, secs, v = v.split(":")
                hbp = os.environ.get("NEURADAR_BENCH_HEARTBEAT")
                end = time.time() + float(secs)
                while time.time() < end:
                    if hbp:
                        open(hbp, "w").close()
                    time.sleep(0.3)
            if v == "crash":
                raise SystemExit("fake worker: scripted crash")
            if v == "hang":  # simulates a backend-init hang (no output at all)
                time.sleep(3600)
            print(json.dumps({"metric": "train_rays_per_sec", "value": float(v),
                              "unit": "rays/s", "vs_baseline": float(v) / BASELINE_RAYS_PER_SEC}))
            raise SystemExit(0)
        a = sys.argv
        chunks = int(a[a.index("--chunks") + 1]) if "--chunks" in a else 8
        scale = a[a.index("--scale") + 1] if "--scale" in a else "full"
        scan_steps = int(a[a.index("--scan-steps") + 1]) if "--scan-steps" in a else 4
        radar_chunks = int(a[a.index("--radar-chunks") + 1]) if "--radar-chunks" in a else 0
        remat_policy = a[a.index("--remat-policy") + 1] if "--remat-policy" in a else "save_grid"
        tmd = a[a.index("--table-moments-dtype") + 1] if "--table-moments-dtype" in a else None
        main(chunks=chunks, scale=scale, scan_steps=scan_steps, radar_chunks=radar_chunks,
             remat_policy=remat_policy, hoist="--no-hoist" not in a, table_moments_dtype=tmd,
             packed_cells="--packed-cells" in a)
    else:
        main_with_retries()
