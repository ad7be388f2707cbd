"""Round-4 dispatch-overhead probe.

Question: when k independent salted dispatches are issued back-to-back and
only then forced, does the tunnel RTT amortize (async pipeline) or pay per
dispatch?  Determines whether the round-3 per-phase numbers (which put the
whole first-phase RTT on the histogram/resolve kernels) were misattributed,
and what batch size the drivers need for dispatch overhead to vanish.

Two kernel weights: 'light' (~0.4 ms device) and 'heavy' (~10+ ms device).
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])


def mk(iters):
    def kernel(s_ref, x_ref, o_ref):
        def body(i, w):
            return (w * 5 + 1) ^ (w >> 3)
        o_ref[0, 0] = jnp.sum(jax.lax.fori_loop(
            0, iters, body, x_ref[:] ^ s_ref[0]))

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )

    @jax.jit
    def run(s, x):
        return f(s, x)

    return run


def probe(name, iters, ks=(1, 2, 4, 8)):
    run = mk(iters)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 30, (256, 128)).astype(np.int32))
    np.asarray(run(jnp.full((1,), 0, jnp.int32), x))  # compile
    salt = 100
    for k in ks:
        best = float("inf")
        for rep in range(3):
            ss = [jnp.full((1,), salt + rep * 100 + i, jnp.int32)
                  for i in range(k)]
            t0 = time.perf_counter()
            accs = [run(s, x) for s in ss]
            _ = [np.asarray(a) for a in accs]
            best = min(best, time.perf_counter() - t0)
        print(f"  {name} k={k}: {best*1e3:8.2f} ms total, "
              f"{best/k*1e3:7.2f} ms/dispatch", flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    # calibrate weights: 256*128 lanes, ~1 op/iter
    probe("light(2^10 it)", 1 << 10)
    probe("heavy(2^17 it)", 1 << 17)
