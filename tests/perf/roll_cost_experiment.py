"""Roll-cost microbenchmark: is pltpu.roll bandwidth-bound or per-op-bound?

Decides whether a stacked [a; b] kernel layout (one (2*NHP, MP) array,
HALVING the roll count at the SAME data volume) could beat the production
megakernel, whose step is roll-dominated (16 rolls/step, docs/PERF.md).
If roll cost is purely proportional to data volume, stacking is neutral
and not worth a kernel rewrite; if each roll carries fixed overhead,
halving the count wins.

Measures, per configuration, K repeated roll+add passes inside one
pallas kernel (the add prevents fusion/elision):
  A. 2 rolls over two (NHP, MP) arrays        (production shape, 2 ops)
  B. 1 roll over one (2*NHP, MP) array        (stacked shape, 1 op)
both moving identical bytes.  Lane rolls (axis 1) and sublane rolls
(axis 0) timed separately.

Run on TPU:  python tests/perf/roll_cost_experiment.py
(not a pytest test; one-off measurement recorded in docs/PERF.md)
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NH, MP = 104, 4096
K = 2000          # roll+add passes per kernel launch


def _kernel_two(x_ref, y_ref, xo, yo, *, axis, K):
    xo[:] = x_ref[:]
    yo[:] = y_ref[:]

    def body(i, _):
        xo[:] = xo[:] + pltpu.roll(xo[:], np.int32(1), axis)
        yo[:] = yo[:] + pltpu.roll(yo[:], np.int32(1), axis)
        return 0

    jax.lax.fori_loop(np.int32(0), np.int32(K), body, 0)


def _kernel_one(x_ref, xo, *, axis, K):
    xo[:] = x_ref[:]

    def body(i, _):
        xo[:] = xo[:] + pltpu.roll(xo[:], np.int32(1), axis)
        return 0

    jax.lax.fori_loop(np.int32(0), np.int32(K), body, 0)


def bench(fn, args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])       # compile + barrier
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / reps


def main():
    D = np.float32
    x = jnp.asarray(np.random.RandomState(0).rand(NH, MP).astype(D))
    y = jnp.asarray(np.random.RandomState(1).rand(NH, MP).astype(D))
    xs = jnp.concatenate([x, y], axis=0)      # (2*NH, MP)

    for axis, name in ((1, "lane"), (0, "sublane")):
        two = jax.jit(lambda a, b: pl.pallas_call(
            functools.partial(_kernel_two, axis=axis, K=K),
            out_shape=[jax.ShapeDtypeStruct((NH, MP), D)] * 2,
        )(a, b))
        one = jax.jit(lambda a: pl.pallas_call(
            functools.partial(_kernel_one, axis=axis, K=K),
            out_shape=jax.ShapeDtypeStruct((2 * NH, MP), D),
        )(a))
        t2 = bench(two, (x, y))
        t1 = bench(one, (xs,))
        per2 = t2 / K * 1e6
        per1 = t1 / K * 1e6
        print(f"{name:8s} rolls: two ({NH},{MP}) ops {per2:7.3f} us/pass | "
              f"one ({2*NH},{MP}) op {per1:7.3f} us/pass | "
              f"stacked/split = {per1/per2:.3f}")


if __name__ == "__main__":
    main()
