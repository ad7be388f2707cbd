"""One-off profiling of the TPU encode/decode path (not part of the package)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

dev = jax.devices()[0]
print("device:", dev)

def t(label, fn, repeat=3):
    fn()  # warm
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:50s} {best*1e3:10.2f} ms")
    return best

# 1. dispatch latency
f = jax.jit(lambda x: x + 1)
x = jnp.zeros((8, 8), jnp.float32)
t("dispatch x+1 (incl block_until_ready)", lambda: f(x).block_until_ready())

# 2. transfer bandwidth
h = np.random.randint(0, 255, (16 << 20,), np.uint8)
bw = t("host->device 16MB", lambda: jax.device_put(h).block_until_ready())
print(f"    h2d {16/1024/bw:.2f} GB/s")
d = jax.device_put(h)
bw = t("device->host 16MB", lambda: np.asarray(d))
print(f"    d2h {16/1024/bw:.2f} GB/s")

# 3. encode_blocks at bench shape
from libhuffman_tpu.ops import device as devops
B, N = 256, 65536
rng = np.random.default_rng(0)
blocks = jnp.asarray(rng.integers(97, 123, (B, N), np.uint8))
n_valid = jnp.full((B,), N, jnp.int32)
W = min(N, 24 * (N // 64))
def run_enc():
    r = devops.encode_blocks(blocks, n_valid, W, 24)
    jax.block_until_ready(r)
sec = t("encode_blocks B=256 N=64KiB (16MB)", run_enc)
print(f"    encode kernel {16/1024/sec:.2f} GB/s")

# 3b. phases
hist_j = jax.jit(devops.histogram)
t("  histogram only", lambda: jax.block_until_ready(hist_j(blocks, n_valid)))
freqs = hist_j(blocks, n_valid)
trees_j = jax.jit(devops.build_trees)
t("  build_trees only", lambda: jax.block_until_ready(trees_j(freqs)))
left, right, parent, pbit, root = trees_j(freqs)
codes_j = jax.jit(devops.extract_codes)
t("  extract_codes only", lambda: jax.block_until_ready(codes_j(parent, pbit)))
codes, lens, ovf = codes_j(parent, pbit)
layout_j = jax.jit(devops.symbol_layout)
t("  symbol_layout only", lambda: jax.block_until_ready(layout_j(blocks, codes, lens, n_valid)))
C, L = layout_j(blocks, codes, lens, n_valid)
from libhuffman_tpu.ops import pack_tree
pack_j = jax.jit(lambda C, L: pack_tree.pack_words_chunked(C, L, W, 24))
t("  pack_words_chunked only", lambda: jax.block_until_ready(pack_j(C, L)))

# 4. full encode() incl host assembly
from libhuffman_tpu import encode as enc_mod
data = rng.integers(97, 123, 16 << 20, np.uint8).tobytes()
sec = t("encode() end-to-end 16MB", lambda: enc_mod.encode(data, 65536), repeat=2)
print(f"    e2e {16/1024/sec:.2f} GB/s")

# 5. decode
from libhuffman_tpu import decode as dec_mod
enc = enc_mod.encode(data, 65536)
sec = t("decode() end-to-end", lambda: dec_mod.decode(enc), repeat=2)
print(f"    e2e decode {16/1024/sec:.2f} GB/s")
