"""Synthetic VPU ceiling vs the megakernel's achieved rate (1x v5e).

The stencil is elementwise+rolls (no matmul), so its speed-of-light is
the VPU's elementwise throughput, not MXU FLOPs.  Two synthetic probes
at the flagship padded shape (104 x 4160 f32):

1. XLA fori_loop: K=64 distinct fused FMAs per element per iteration,
   REPS iterations inside one dispatch — pays an HBM read+write and the
   While-loop turn per iteration (the best a non-pallas elementwise
   pipeline can do).
2. Pallas VMEM-resident: the same FMA chain with the array held in VMEM
   across all iterations — the true elementwise ceiling, architecturally
   identical to how the megakernel holds its state.

Run ON THE CHIP: python tests/perf/vpu_roofline.py
Results are recorded in docs/PERF.md (roofline section).
"""


import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NHP, MP = 104, 4160          # flagship padded shape (N=100, M=4000)
K = 64                       # fused FMAs per element per loop turn
REPS = 2000


def make_coeffs():
    rng = np.random.default_rng(0)
    coef = rng.uniform(0.99, 1.01, size=(K,)).astype(np.float32)
    bias = rng.uniform(-1e-6, 1e-6, size=(K,)).astype(np.float32)
    x = rng.standard_normal((NHP, MP)).astype(np.float32)
    return coef, bias, x


def bench_xla(coef, bias, x):
    def body(_, y):
        for i in range(K):
            y = y * coef[i] + bias[i]
        return y

    @jax.jit
    def chain(y):
        return jax.lax.fori_loop(0, REPS, body, y)

    y = chain(jnp.asarray(x))
    np.asarray(y)                       # compile + axon barrier
    t0 = time.time()
    y = chain(y)
    np.asarray(y)
    return NHP * MP * K * REPS / (time.time() - t0)


def bench_pallas(coef, bias, x):
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:]

        def turn(_, carry):
            y = o_ref[:]
            for i in range(K):
                y = y * coef[i] + bias[i]
            o_ref[:] = y
            return carry

        jax.lax.fori_loop(0, np.int32(REPS), turn, np.int32(0))

    # whole-array default BlockSpec = VMEM-resident across the fori loop
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NHP, MP), jnp.float32),
    )
    run = jax.jit(call)
    y = run(jnp.asarray(x))
    np.asarray(y)
    t0 = time.time()
    y = run(jnp.asarray(x))
    np.asarray(y)
    return NHP * MP * K * REPS / (time.time() - t0)


def main():
    coef, bias, x = make_coeffs()
    r_x = bench_xla(coef, bias, x)
    print(f"XLA fori ceiling:   {r_x:.3e} FMA/s "
          f"(HBM round-trip + loop turn per {K} FMAs)")
    r_p = bench_pallas(coef, bias, x)
    print(f"pallas VMEM ceiling: {r_p:.3e} FMA/s (resident)")
    # flagship megakernel number for comparison (padded element rate)
    ups = 4.57e10
    padded = ups * (NHP * MP) / (101 * 4001)
    print(f"megakernel at {ups:.2e} updates/s = {padded:.3e} padded "
          f"site-half-steps/s; ceiling/rate = "
          f"{r_p / padded:.1f} VMEM-chain FMAs per site-half-step")


if __name__ == "__main__":
    main()
