"""Round-5 probe: full encode_blocks vs the prefix-5 ablation.

The prefix ablation's pack stage runs the UNCLAMPED packer and omits the
epilogue (total_bits, words_to_bytes) — so phase-table pack was
overstated and the epilogue + glue (level0 prep, bitrev copies) never
appeared.  Measure, R-differenced: prefix-5 as-is, and the complete
production encode_blocks, on both corpus families.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libhuffman_tpu.ops import device as dev  # noqa: E402

B, N = 128, 65536
W, CAPW = 24576, 24


def full_rep(salt, blocks, nv, R):
    acc = jnp.uint32(0)
    for i in range(R):
        payload, total_bits, left, right, root, ovf = \
            dev.encode_blocks.__wrapped__(blocks ^ (salt + jnp.uint8(i)),
                                          nv, W, CAPW)
        acc = (acc + jnp.sum(payload[:, ::512].astype(jnp.uint32))
               + jnp.sum(total_bits.astype(jnp.uint32))
               + jnp.sum(left[:, ::64].astype(jnp.uint32))
               + jnp.sum(ovf.astype(jnp.uint32)))
    return acc


def prefix_rep(salt, blocks, nv, R):
    return dev.encode_blocks_prefix_rep.__wrapped__(
        blocks ^ salt, nv, W, CAPW, 5, R)


def timed(tag, fn, blocks, nv):
    times = {}
    for R in (1, 9):
        f = jax.jit(fn, static_argnums=(3,))
        np.asarray(f(jnp.uint8(0), blocks, nv, R))
        best = float("inf")
        for s in (1, 2, 3):
            t0 = time.perf_counter()
            np.asarray(f(jnp.uint8(s * 16), blocks, nv, R))
            best = min(best, time.perf_counter() - t0)
        times[R] = best
    per = (times[9] - times[1]) / 8
    print(f"  {tag:28s} {per*1e3:7.2f} ms/batch "
          f"({B*N/per/1e9:5.2f} GB/s)", flush=True)
    return per


def main():
    print("device:", jax.devices()[0], flush=True)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_corpora",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "corpora.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    nv = jax.device_put(jnp.full(B, N, jnp.int32))
    for fam, gen in (("text", mod.text), ("mixed", mod.mixed)):
        blocks = jax.device_put(
            jnp.asarray(np.frombuffer(gen(B * N), np.uint8).reshape(B, N)))
        print(f"{fam}:", flush=True)
        timed("prefix-5 (unclamped pack)", prefix_rep, blocks, nv)
        timed("full encode_blocks", full_rep, blocks, nv)


if __name__ == "__main__":
    main()
