"""Probe the real scoped-VMEM ceiling on the v5e via vmem_limit_bytes.

Round-2 kernels assumed the ~16 MB Mosaic DEFAULT scoped-vmem limit was the
hardware budget; the v5e TensorCore physically has 128 MiB of VMEM and
pltpu.CompilerParams(vmem_limit_bytes=...) raises the cap.  This probe
compiles a trivial copy kernel with an N-MiB VMEM scratch at increasing N
to find the largest usable residency (feeds the multi-iteration
VMEM-resident BP kernel design).

Run: timeout 1800 python scripts/probe_vmem.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(mib: int) -> str:
    rows = mib * (2**20) // (128 * 4)  # f32 [rows, 128] scratch = mib MiB

    def kernel(x_ref, o_ref, scratch):
        scratch[0:8, :] = x_ref[:] * 2.0
        # touch the far end so the allocation is real
        scratch[rows - 8 : rows, :] = x_ref[:] + 1.0
        o_ref[:] = scratch[0:8, :] + scratch[rows - 8 : rows, :]

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(mib + 8) * 2**20
        ),
    )
    x = jnp.ones((8, 128), jnp.float32)
    t0 = time.time()
    try:
        out = np.asarray(jax.jit(fn)(x))
        dt = time.time() - t0
        ok = bool(np.allclose(out, 5.0))
        return f"{mib} MiB scratch: OK value={ok} compile+run {dt:.1f}s"
    except Exception as e:  # noqa: BLE001
        return f"{mib} MiB scratch: FAIL {type(e).__name__}: {str(e)[:200]}"


if __name__ == "__main__":
    print("devices:", jax.devices(), file=sys.stderr)
    # untimed warmup op (first op through the tunnel costs ~2 min)
    np.asarray(jnp.zeros((8, 8)) + 1)
    print("warmup done", file=sys.stderr)
    for mib in (32, 64, 96, 110, 120):
        print(probe(mib), flush=True)
