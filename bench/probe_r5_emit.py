"""Round-5 emission probe: where do the decode-emit 26 ms go?

_emit_groups at bench shape (B=512, NG=65536 strings, OUTW=16384, ECW=32)
= XLA glue (grank.T, gc diff, live mask, left-align) + bitrev_permute of
gw/lens + the VMEM merge-tree kernel + the byte unpack.  Components timed
separately to target the round-5 work.
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

from libhuffman_tpu.ops import concat_kernel, decode_v3 as ddec  # noqa: E402

B, NG, OUTW = 512, 65536, 16384


def timed(name, fn, *args):
    f = jax.jit(fn)
    np.asarray(f(jnp.uint32(0), *args))
    best = float("inf")
    for s in (1, 2, 3):
        t0 = time.perf_counter()
        np.asarray(f(jnp.uint32(s), *args))
        best = min(best, time.perf_counter() - t0)
    print(f"  {name:40s} {best*1e3:8.2f} ms", flush=True)
    return best


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    # Plausible decode emission: ~1.34 symbols per 8 positions on average.
    gc_h = rng.binomial(4, 0.33, (B, NG)).astype(np.int32)
    gw_h = rng.integers(0, 1 << 32, (B, NG), dtype=np.uint64).astype(np.uint32)
    gw_h &= (1 << (8 * gc_h)).astype(np.uint32) - 1  # right-aligned content
    gc = jnp.asarray(gc_h)
    gwr = jnp.asarray(gw_h)

    def base(s, a, b):
        return jnp.sum(a[:, ::512] ^ s) + jnp.sum(b[:, ::512].astype(jnp.uint32))

    tb = timed("baseline slice sum", base, gwr, gc)

    def full(s, gwr, gc):
        gw = (gwr ^ s) << ((jnp.uint32(32) - (gc.astype(jnp.uint32) << 3)) & 31)
        out, ovf = ddec._emit_groups(gw, gc, OUTW, 32)
        return jnp.sum(out.astype(jnp.uint32)) + jnp.sum(ovf.astype(jnp.uint32))

    t_full = timed("full _emit_groups ECW=32", full, gwr, gc)

    def align_only(s, gwr, gc):
        gw = (gwr ^ s) << ((jnp.uint32(32) - (gc.astype(jnp.uint32) << 3)) & 31)
        return jnp.sum(gw[:, ::512])

    timed("left-align only", align_only, gwr, gc)

    def brev_only(s, gwr, gc):
        w = concat_kernel.bitrev_permute(gwr ^ s)
        l = concat_kernel.bitrev_permute(gc * 8)
        return jnp.sum(w[:, ::512]) + jnp.sum(l[:, ::512].astype(jnp.uint32))

    timed("bitrev gw+lens only", brev_only, gwr, gc)

    for ecw in (24, 32, 48, None):
        def fe(s, gwr, gc, ecw=ecw):
            gw = (gwr ^ s) << ((jnp.uint32(32) - (gc.astype(jnp.uint32) << 3)) & 31)
            words, ovf = concat_kernel.concat_words_ovf(gw, gc * 8, OUTW, ecw)
            return jnp.sum(words[:, ::512]) + jnp.sum(ovf.astype(jnp.uint32))

        timed(f"align+concat ECW={ecw}", fe, gwr, gc)

    # byte unpack cost (words -> u8 plane)
    w_h = rng.integers(0, 1 << 32, (B, OUTW), dtype=np.uint64).astype(np.uint32)
    wd = jnp.asarray(w_h)

    def unpack(s, words):
        words = words ^ s
        out = jnp.stack(
            [(words >> 24), (words >> 16), (words >> 8), words], axis=-1
        ).astype(jnp.uint8).reshape(B, 4 * OUTW)
        return jnp.sum(out[:, ::512].astype(jnp.uint32))

    timed("byte unpack only", unpack, wd)
    print("baseline to subtract:", round(tb * 1e3, 2), "ms", flush=True)


if __name__ == "__main__":
    main()
