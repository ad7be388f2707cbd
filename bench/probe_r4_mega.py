"""Round-4: real device-side pipeline cost via batch-size differencing.

Per-dispatch tunnel RTT is ~23.5 ms and does not pipeline
(probe_r4_dispatch), so t(B=1024) - t(B=256) = 3 batches of real device
work — the dispatch latency cancels.  Also smoke-checks that big-B
compiles and stays within HBM.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libhuffman_tpu.ops import device as dev  # noqa: E402

bs = 65536
capw = 24
W = min(bs, capw * (bs // 64))


@jax.jit
def checksum(res):
    payload, total_bits, left, right, root, overflow = res
    return (jnp.sum(payload.astype(jnp.uint32)) + jnp.sum(total_bits)
            + jnp.sum(root) + jnp.sum(overflow.astype(jnp.uint32)))


def enc_time(B, reps=3):
    rng = np.random.default_rng(1)
    # text-ish bytes so trees are realistic
    arr = rng.integers(32, 127, (B, bs), dtype=np.uint8)
    x = jax.device_put(jnp.asarray(arr))
    nv = jax.device_put(jnp.full(B, bs, jnp.int32))
    t0 = time.perf_counter()
    np.asarray(checksum(dev.encode_blocks(x, nv, W, capw)))
    tc = time.perf_counter() - t0
    best = float("inf")
    for rep in range(reps):
        s = jnp.uint8(rep + 1)
        t0 = time.perf_counter()
        np.asarray(checksum(dev.encode_blocks(x ^ s, nv, W, capw)))
        best = min(best, time.perf_counter() - t0)
    print(f"  encode B={B}: compile+1st={tc:.1f}s best={best*1e3:.2f} ms",
          flush=True)
    return best


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    t256 = enc_time(256)
    t1024 = enc_time(1024)
    t1536 = enc_time(1536)
    per = (t1024 - t256) / 3
    print(f"real device encode work: {per*1e3:.2f} ms / 16.8 MB batch "
          f"-> {256*bs/per/1e9:.2f} GB/s device-only", flush=True)
    print(f"B=1536 (100.7 MB in one dispatch): {t1536*1e3:.1f} ms total "
          f"-> {1536*bs/t1536/1e9:.2f} GB/s incl one RTT", flush=True)
