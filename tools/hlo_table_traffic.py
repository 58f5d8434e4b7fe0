"""Attribute the train step's HBM traffic to HLO ops (VERDICT r2 item 3).

`tools/roofline_fullstep.py` showed the step is HBM-bound (149 GB accessed
at full scale, 38 GB at micro) — and the micro number is nearly
ray-independent, pointing at per-chunk traffic on the 537 MB static hash
table (cast, remat recompute, dense gradient accumulation) inside the
nff_chunks scan. This tool compiles the exact step on CPU, walks the
OPTIMIZED HLO, and tallies result-buffer bytes by opcode for every
computation, flagging while-loop bodies (executed once per chunk) so
loop-resident table traffic can be multiplied out and attacked.

Run: python tools/hlo_table_traffic.py [--scale micro] [--chunks 8]
     [--min-mb 16]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
from neuradar_tpu.utils.cache_dirs import jax_cache_dir

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", jax_cache_dir("cpu"))

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "c64": 8, "c128": 16,
}
_SHAPE_RE = re.compile(r"\b(" + "|".join(_DTYPE_BYTES) + r")\[([\d,]*)\]")


def shape_bytes(text: str) -> int:
    """Total bytes of every typed shape literally present in `text`."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def compiled_train_step(scale: str, chunks: int, packed_cells: bool = False):
    import jax.numpy as jnp
    import optax

    from neuradar_tpu.configs.bench_program import bench_pipeline
    from neuradar_tpu.engine.optimizers import build_optimizer, default_optimizer_groups

    # exact bench.py configuration — shared single definition
    pipeline = bench_pipeline(scale=scale, chunks=chunks, packed_cells=packed_cells)

    variables = pipeline.init_variables(0)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = build_optimizer(params, default_optimizer_groups(20001))
    opt_state = tx.init(params)
    loss_fn = pipeline.make_train_loss_fn()

    def train_step(params, opt_state, batch_stats, batch, rng):
        (total, (_, _, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, batch, rng
        )
        updates, new_opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt_state, new_bs, total

    batch = jax.tree.map(jnp.asarray, pipeline.datamanager.sample_train_batch())
    print("[hlo] compiling train step on CPU...", file=sys.stderr, flush=True)
    return jax.jit(train_step).lower(params, opt_state, batch_stats, batch,
                                     jax.random.PRNGKey(0)).compile()


def main(scale: str, chunks: int, min_mb: float, packed_cells: bool = False) -> None:
    compiled = compiled_train_step(scale, chunks, packed_cells)
    hlo = compiled.as_text()

    # split into computations
    comps: dict[str, list[str]] = {}
    cur = None
    for line in hlo.splitlines():
        m = re.match(r"(?:ENTRY )?%?([\w\.\-]+) \(.*\) -> ", line)
        if m and line.rstrip().endswith("{"):
            cur = m.group(1)
            comps[cur] = []
        elif cur is not None and line.strip() == "}":
            cur = None
        elif cur is not None:
            comps[cur].append(line)

    # mark every computation reachable from a while body as LOOP-resident —
    # its static instruction costs execute once per iteration, and XLA's
    # cost_analysis counts them ONCE (the rolled-loop caveat,
    # tools/roofline_fullstep.py docstring)
    call_re = re.compile(r"(?:calls|to_apply|condition|body|branch_computations=\{)[=%]*%?([\w\.\-]+)")
    calls = {name: set(call_re.findall("\n".join(lines))) for name, lines in comps.items()}
    stack = [b for lines in comps.values() for line in lines
             for b in re.findall(r"body=%?([\w\.\-]+)", line)]
    loop_resident: set[str] = set()
    while stack:
        c = stack.pop()
        if c in loop_resident:
            continue
        loop_resident.add(c)
        stack.extend(calls.get(c, ()))

    min_bytes = min_mb * 1e6
    print(f"computations: {len(comps)}  (loop-resident: {len(loop_resident & set(comps))})")
    for name, lines in comps.items():
        tally: dict[str, tuple[int, int]] = defaultdict(lambda: (0, 0))
        for line in lines:
            # result type may be a tuple "(f32[...], bf16[...])" (multi-output
            # fusions, variadic scatter) — match greedily up to " opcode("
            m = re.match(r"\s*(?:ROOT )?%?[\w\.\-]+ = (\(.*?\)|\S+) (\w+)\(", line)
            if not m:
                continue
            result_shape, opcode = m.groups()
            b = shape_bytes(result_shape)
            if b >= min_bytes:
                n, tot = tally[opcode]
                tally[opcode] = (n + 1, tot + b)
        if not tally:
            continue
        kind = "LOOP-RESIDENT (counted once, executes per iteration)" if name in loop_resident else "once"
        total = sum(t for _, t in tally.values())
        print(f"\n== {name} [{kind}] big-result bytes: {total / 1e9:.2f} GB")
        for opcode, (n, tot) in sorted(tally.items(), key=lambda kv: -kv[1][1]):
            print(f"   {opcode:<22} x{n:<4} {tot / 1e9:7.2f} GB")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=("full", "micro"), default="micro")
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--min-mb", type=float, default=16.0)
    ap.add_argument("--packed-cells", action="store_true")
    a = ap.parse_args()
    main(a.scale, a.chunks, a.min_mb, a.packed_cells)
