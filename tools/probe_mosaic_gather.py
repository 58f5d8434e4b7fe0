"""Probe: which gather forms lower in Pallas/Mosaic on this relay's toolchain.

The round-3 VMEM-resident dense-level hashgrid kernel (docs/PERFORMANCE.md
"Fused hashgrid kernel: roofline verdict") hinges on ONE question: can a
kernel gather `table[idx]` for a vector of arbitrary indices from a
VMEM-resident table? This script tries the candidate lowerings on the real
backend and prints one JSON line per form (ok / error). Run when the relay
is healthy; CPU `--interpret` mode checks semantics only.

Usage: python tools/probe_mosaic_gather.py [--interpret]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

INTERPRET = "--interpret" in sys.argv

import jax  # noqa: E402

if INTERPRET:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

T, N, F = 4096, 1024, 8  # table rows, gather count, features


def run(name, kernel, out_shape, *args):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            interpret=INTERPRET,
        )
        out = np.asarray(fn(*args))
        ok = bool(np.isfinite(out).all())
        print(json.dumps({"form": name, "ok": ok}), flush=True)
        return out
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"form": name, "ok": False, "error": str(e)[:300]}), flush=True)
        return None


def main():
    key = jax.random.PRNGKey(0)
    table2d = jax.random.normal(key, (T, F), jnp.float32)  # [T, F] VMEM candidate
    table1d = table2d.reshape(-1)  # flat, like encodings.py
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, T, jnp.int32)
    idx2d = idx.reshape(N, 1)

    # 1. row gather from a 2-D VMEM table: out[i, :] = table[idx[i], :]
    def k_row(table_ref, idx_ref, out_ref):
        out_ref[:] = table_ref[idx_ref[:, 0]]  # advanced indexing on sublanes

    run("row_gather_2d", k_row, (N, F), table2d, idx2d)

    # 2. jnp.take along axis 0
    def k_take(table_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], idx_ref[:, 0], axis=0)

    run("jnp_take_axis0", k_take, (N, F), table2d, idx2d)

    # (a flat-1-D-table variant is only needed if both row-gather forms fail
    # — TPU VMEM wants >=2-D anyway, so the kernel would keep [T, F] rows)

    # 3. one-hot matmul fallback (always lowers; MXU cost T x N):
    def k_onehot(table_ref, idx_ref, out_ref):
        oh = (idx_ref[:, 0][:, None] == jax.lax.broadcasted_iota(jnp.int32, (N, T), 1)).astype(jnp.float32)
        out_ref[:] = jax.lax.dot(oh, table_ref[:], precision=jax.lax.Precision.HIGHEST)

    ref = np.asarray(table2d)[np.asarray(idx)]
    out = run("onehot_matmul", k_onehot, (N, F), table2d, idx2d)
    if out is not None:
        print(json.dumps({"form": "onehot_matmul_correct", "ok": bool(np.allclose(out, ref, atol=1e-5))}),
              flush=True)

    # 4. dynamic-slice loop via fori (scalar row loads; slow but a lowering
    #    datapoint):
    def k_loop(table_ref, idx_ref, out_ref):
        def body(i, _):
            out_ref[i, :] = table_ref[idx_ref[i, 0], :]
            return 0

        jax.lax.fori_loop(0, N, body, 0)

    out = run("fori_row_loads", k_loop, (N, F), table2d, idx2d)
    if out is not None:
        print(json.dumps({"form": "fori_row_loads_correct", "ok": bool(np.allclose(out, ref, atol=1e-5))}),
              flush=True)


if __name__ == "__main__":
    main()
