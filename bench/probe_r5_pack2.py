"""Round-5 probe: packer grid stacking (GB) sweep + encode stage table.

Round 4 measured ~60% of the single-block concat kernel's cycles as
per-instruction issue overhead at GB=1; GB=8 reclaimed most of it.  Does
GB=16 reclaim the rest?  Also re-derive the stage table with the CLAMPED
packer (the prefix-5 ablation runs the unclamped one, overstating pack).
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

from libhuffman_tpu.ops import concat_kernel, device as dev  # noqa: E402

B, N = 128, 65536
W, CAPW = 24576, 24


def timed(tag, fn, *arrs):
    times = {}
    for R in (1, 9):
        f = jax.jit(fn, static_argnums=(len(arrs) + 1,))
        np.asarray(f(jnp.uint32(0), *arrs, R))
        best = float("inf")
        for s in (1, 2, 3):
            t0 = time.perf_counter()
            np.asarray(f(jnp.uint32(s << 8), *arrs, R))
            best = min(best, time.perf_counter() - t0)
        times[R] = best
    per = (times[9] - times[1]) / 8
    print(f"  {tag:30s} {per*1e3:7.2f} ms/batch "
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

    data = np.frombuffer(mod.text(B * N), np.uint8).reshape(B, N)
    blocks = jax.device_put(jnp.asarray(data))
    nv = jax.device_put(jnp.full(B, N, jnp.int32))

    # Stage table (R-differenced, CLAMPED pack not reachable via prefix;
    # stages 1..4 are exact).
    for upto in (1, 2, 3, 4):
        def pre(salt, blocks, nv, R, upto=upto):
            return dev.encode_blocks_prefix_rep.__wrapped__(
                blocks ^ salt.astype(jnp.uint8), nv, W, CAPW, upto, R)
        timed(f"prefix upto={upto}", pre, blocks, nv)

    # Packer inputs from the real phases.
    @jax.jit
    def lay(blocks, nv):
        freqs = dev.histogram_pallas(blocks, nv)
        left, right, parent, pbit, root = dev.build_trees(freqs)
        codes, lens, _ = dev.extract_codes(parent, pbit)
        return dev.symbol_layout_pallas(blocks, codes, lens, nv)

    C, L = lay(blocks, nv)
    ln = L.astype(jnp.uint32)
    lv = jax.device_put(jnp.where(ln > 0, C << ((jnp.uint32(32) - ln) & 31),
                                  jnp.uint32(0)))
    L = jax.device_put(L)

    for gb in (8, 16, 32):
        concat_kernel.GB = gb

        def pk(salt, lv, L, R):
            acc = jnp.uint32(0)
            for i in range(R):
                w, ovf = concat_kernel.concat_words_ovf.__wrapped__(
                    lv ^ (salt + jnp.uint32(i)), L, W, CAPW)
                acc = acc + jnp.sum(w[:, ::512]) + jnp.sum(
                    ovf.astype(jnp.uint32))
            return acc

        try:
            timed(f"pack clamped GB={gb}", pk, lv, L)
        except Exception as e:
            print(f"  pack GB={gb} failed: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
    concat_kernel.GB = 8


if __name__ == "__main__":
    main()
