"""TPU primitive cost model: the measurements the codec design is built on.

Run on the target chip:  python bench/probe_primitives.py

Timing discipline (IMPORTANT): this environment reaches the TPU through a
network tunnel whose runtime COALESCES identical dispatches — re-executing
the same executable on the same buffers returns the cached result in ~0 ms,
so naive `block_until_ready` micro-timing reports physically impossible
rates (we measured "2000 G lookups/s", i.e. 7 TB/s of output).  The only
trustworthy harness is N iterations of a self-dependent body inside ONE
jitted `fori_loop`, comparing an N-iteration run against a 1-iteration run.

Measured on TPU v5 lite (this harness, 2026-08, round 2), per second:

  elementwise u32 chain              ~0.2-1 T ops      (fast; fusion-bound)
  cumsum (B, 65536) axis=1           ~10 G el
  one-hot 2-level gather T=4096 K=1  ~6.2 G lookups    (MXU contraction)
  bf16 matmul 2048^3                 ~66 TFLOP
  take_along_axis minor T=256..16K   ~0.07-0.10 G      (scalar-loop lowering)
  flat jnp.take 4MB table            ~0.11 G
  jnp.take rows axis=0 (8-32 u32)    ~0.08-0.20 G rows
  scatter-add / scatter-set          ~0.09-0.13 G
  sort_key_val i32                   ~0.32 G keys
  host->device (network tunnel)      ~0.04 GB/s sustained, ~45 ms latency
  device->host (network tunnel)      ~0.04 GB/s

Design rules that follow (applied across libhuffman_tpu/ops):
  * never put a per-lane gather/scatter/sort on a hot path;
  * small-table lookups ride the MXU as two-level one-hot contractions
    (ops/mxu_gather) at ~6 G lookups/s;
  * data movement that depends on runtime values is expressed as merge
    trees of shifts (ops/pack_tree) or equality-matmul compactions
    (the round-2 one-hot escape compaction (superseded by decode_v3));
  * sequential chains run in Pallas with VMEM-register state
    (ops/decode_v3.chain_emit) — an XLA fori_loop round-trips its carry
    through HBM every iteration;
  * host<->device traffic is bucketed and sliced to the payload
    (tunnel-bound end-to-end; see PERF.md).
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax import random


def timed_loop(label, body, state0, n_ops, iters=16):
    """Per-iteration time of ``body`` chained inside one jitted fori_loop."""

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(state, n):
        return jax.lax.fori_loop(0, n, body, state)

    jax.block_until_ready(run(state0, 1))
    jax.block_until_ready(run(state0, iters))
    t0 = time.perf_counter()
    jax.block_until_ready(run(state0, 1))
    t1 = time.perf_counter()
    jax.block_until_ready(run(state0, iters))
    t2 = time.perf_counter()
    per = ((t2 - t1) - (t1 - t0)) / (iters - 1)
    print(f"{label:56s} {per*1e3:9.3f} ms/iter -> {n_ops/max(per,1e-12)/1e9:9.2f} G/s")
    return per


def main():
    k = random.PRNGKey(0)
    N = 1 << 27

    x0 = random.randint(k, (N,), 1, 2**30).astype(jnp.uint32)

    def body_elem(i, x):
        for _ in range(10):
            x = (x ^ (x >> 3)) + jnp.uint32(0x9E3779B9)
        return x

    timed_loop("elementwise 20-op chain 134M u32", body_elem, x0, N * 20, 64)

    B, NP = 64, 1 << 18
    tabs = random.randint(k, (B, 4096), 0, 255).astype(jnp.uint8)
    tperm = tabs.reshape(B, 64, 64).swapaxes(1, 2).astype(jnp.bfloat16)
    idx0 = random.randint(k, (B, NP), 0, 4096).astype(jnp.int32)

    def body_onehot(i, idx):
        lo = idx & 63
        hi = idx >> 6
        oh = (lo[:, :, None] == jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, 64), 2)).astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            oh, tperm, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        hi_i = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 64), 2)
        g = jnp.sum(jnp.where(hi[:, :, None] == hi_i, part, 0.0),
                    axis=2).astype(jnp.int32)
        return (g * 17 + i) & 4095

    timed_loop("one-hot 2-level gather T=4096 16.7M", body_onehot, idx0,
               B * NP, 8)

    for T in (256, 4096):
        tabs2 = random.randint(k, (64, T), 0, T).astype(jnp.int32)
        i0 = random.randint(k, (64, 1 << 18), 0, T).astype(jnp.int32)

        def body_taa(i, idx, tabs2=tabs2, T=T):
            return (jnp.take_along_axis(tabs2, idx, axis=1) + i) & (T - 1)

        timed_loop(f"take_along_axis minor T={T} 16.7M", body_taa, i0,
                   64 * (1 << 18), 4)

    kk = random.randint(k, (1 << 24,), 0, 2**30).astype(jnp.int32)
    vv = random.randint(k, (1 << 24,), 0, 255).astype(jnp.int32)

    def body_sort(i, st):
        kx, vx = st
        ks, vs = jax.lax.sort_key_val(kx, vx)
        return (ks ^ i, vs)

    timed_loop("sort_key_val 16.7M i32", body_sort, (kk, vv), 1 << 24, 4)

    c0 = random.randint(k, (1600, 65536), 0, 3).astype(jnp.int32)

    def body_cumsum(i, x):
        return jnp.cumsum(x, axis=1) & 3

    timed_loop("cumsum (1600,65536) axis=1", body_cumsum, c0, 1600 * 65536, 8)

    w0 = jnp.sort(random.randint(k, (1 << 24,), 0, 256 * 16384 - 2)
                  .astype(jnp.int32))

    def body_scatter(i, w):
        out = jnp.zeros((256 * 16384,), jnp.uint32).at[w].add(jnp.uint32(1))
        return (w + out[: 1 << 24].astype(jnp.int32)) & (256 * 16384 - 2)

    timed_loop("scatter-add 16M monotone", body_scatter, w0, 1 << 24, 4)


if __name__ == "__main__":
    main()
