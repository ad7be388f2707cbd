"""Round-5 pack probe: early-level clamp (eguard) sweep.

The merge-tree packer's clamped levels (>= 64 base strings) carry
0.375 N words each, but the EXACT early levels carry the full N words
per level — ~61% of the canvas despite fewer barrel passes.  Sweep
``eguard`` (levels below it stay exact; [eguard, 64) clamp to the
mean-based cap with a half-capacity variance floor) and measure both
kernel time (R-replication differenced, PERF.md hazard 1) and the
overflow rate on both corpus families — an overflowed block re-encodes
on the host, so the clamp only pays if overflows stay ~zero.
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


def layout(data):
    """(C, L) planes for a corpus batch via the real encode phases."""
    @jax.jit
    def f(blocks, nv):
        freqs = dev.histogram_pallas(blocks, nv)
        left, right, parent, pbit, root = dev.build_trees(freqs)
        codes, lens, _ = dev.extract_codes(parent, pbit)
        return dev.symbol_layout_pallas(blocks, codes, lens, nv)

    nv = jnp.full(data.shape[0], N, jnp.int32)
    C, L = f(jnp.asarray(data), nv)
    ln = L.astype(jnp.uint32)
    level0 = jnp.where(ln > 0, C << ((jnp.uint32(32) - ln) & 31),
                       jnp.uint32(0))
    return jax.device_put(level0), jax.device_put(L)


def timed_pack(tag, level0, lens, eguard):
    def rep(salt, level0, lens, R):
        acc = jnp.uint32(0)
        for i in range(R):
            w, ovf = concat_kernel.concat_words_ovf.__wrapped__(
                level0 ^ (salt + jnp.uint32(i)), lens, W, CAPW, eguard)
            acc = acc + jnp.sum(w[:, ::512]) + jnp.sum(
                ovf.astype(jnp.uint32))
        return acc

    times = {}
    for R in (1, 9):
        f = jax.jit(rep, static_argnums=(3,))
        np.asarray(f(jnp.uint32(0), level0, lens, R))
        best = float("inf")
        for s in (1, 2, 3):
            t0 = time.perf_counter()
            np.asarray(f(jnp.uint32(s << 8), level0, lens, R))
            best = min(best, time.perf_counter() - t0)
        times[R] = best
    per = (times[9] - times[1]) / 8
    print(f"  {tag:28s} {per*1e3:7.2f} ms/batch "
          f"({B*N/per/1e9:5.2f} GB/s)", flush=True)
    return per


def overflow_rate(level0, lens, eguard):
    w, ovf = jax.jit(concat_kernel.concat_words_ovf.__wrapped__,
                     static_argnums=(2, 3, 4))(level0, lens, W, CAPW, eguard)
    return int(np.asarray(ovf).sum())


def main():
    print("device:", jax.devices()[0], flush=True)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_corpora",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "corpora.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fams = {
        "text": np.frombuffer(mod.text(B * N), np.uint8).reshape(B, N),
        "mixed": np.frombuffer(mod.mixed(B * N), np.uint8).reshape(B, N),
    }
    planes = {k: layout(v) for k, v in fams.items()}

    for eguard in (64, 32, 16, 8):
        print(f"eguard={eguard}", flush=True)
        for fam, (lv, ln) in planes.items():
            t = timed_pack(f"{fam}", lv, ln, eguard)
            novf = overflow_rate(lv, ln, eguard)
            print(f"    {fam} overflow blocks: {novf}/{B}", flush=True)


if __name__ == "__main__":
    main()
