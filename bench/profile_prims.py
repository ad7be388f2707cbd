"""Microbenchmark of candidate TPU primitives (not part of the package).

block_until_ready is unreliable through the axon tunnel — every op measured
0.07-0.11 ms (below the HBM floor).  Force a real sync by reducing the
result to a scalar inside jit and fetching it to the host.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
print("device:", jax.devices()[0], flush=True)

def t(label, fn, *a, repeat=3):
    # Reduce to a tiny checksum inside jit; fetching it forces execution.
    f = jax.jit(lambda *a: jax.tree.map(lambda x: x.ravel()[::4097].astype(jnp.float32).sum(), fn(*a)))
    np.asarray(jax.tree.leaves(f(*a))[0])
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        r = f(*a)
        np.asarray(jax.tree.leaves(r)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{label:55s} {best*1e3:9.2f} ms", flush=True)
    return best

rng = np.random.default_rng(0)
B, N = 256, 65536  # 16M elements

val = jnp.asarray(rng.integers(0, 1 << 30, (B, N), np.int32))
idx = jnp.asarray(rng.integers(0, N, (B, N), np.int32))
sec = t("take_along_axis (B,N) from (B,N)", lambda v, i: jnp.take_along_axis(v, i, axis=1), val, idx)
print(f"    {B*N/sec/1e6:.0f} M gathers/s", flush=True)

idx8 = jnp.asarray(rng.integers(0, 256, (B, N), np.int32))
tab = jnp.asarray(rng.integers(0, 1 << 24, (B, 256), np.int32))
sec = t("take_along_axis (B,N) from (B,256)", lambda v, i: jnp.take_along_axis(v, i, axis=1), tab, idx8)
print(f"    {B*N/sec/1e6:.0f} M gathers/s", flush=True)

a = jnp.asarray(rng.integers(0, 1 << 30, (B, N), np.uint32))
b = jnp.asarray(rng.integers(0, 1 << 30, (B, N), np.uint32))
s = jnp.asarray(rng.integers(1, 31, (B, N), np.uint32))
sec = t("elementwise shift|or|select (B,N)", lambda a, b, s: jnp.where(s > 16, (a << s) | (b >> (32 - s)), a | b), a, b, s)
print(f"    {B*N/sec/1e9:.2f} G elem-ops/s", flush=True)

sec = t("cumsum i32 (B,N) axis=1", lambda v: jnp.cumsum(v, axis=1), val)
print(f"    {B*N/sec/1e9:.2f} G elems/s", flush=True)

# searchsorted as used by pack_words today
ends = jnp.cumsum(jnp.asarray(rng.integers(1, 9, (B, N), np.int32)), axis=1)
wst = jnp.arange(N, dtype=jnp.int32) * 32

def ss(e):
    return jax.vmap(lambda e1: jnp.searchsorted(e1, wst, side="right"))(e)
sec = t("vmapped searchsorted N->N", ss, ends)
print(f"    {B*N/sec/1e6:.0f} M lookups/s", flush=True)

# pack_words bisect: the fori gather loop alone (no searchsorted)
from libhuffman_tpu.ops import device as devops
C = jnp.asarray(rng.integers(0, 1 << 8, (B, N), np.uint32))
L = jnp.asarray(rng.integers(1, 9, (B, N), np.int32))

def pack_loop_only(C, L, ends, j0):
    offsets = ends - L
    W = N
    wstart_b = (jax.lax.broadcasted_iota(jnp.int32, (W,), 0) * 32)[None, :]
    def cand(k, word):
        j = jnp.clip(j0 + k, 0, N - 1)
        off = jnp.take_along_axis(offsets, j, axis=1)
        ln = jnp.take_along_axis(L, j, axis=1)
        cd = jnp.take_along_axis(C, j, axis=1)
        srel = off - wstart_b
        ok = (ln > 0) & (srel < 32) & (srel + ln > 0)
        sft = 32 - ln - srel
        lsh = jnp.clip(sft, 0, 31).astype(jnp.uint32)
        rsh = jnp.clip(-sft, 0, 31).astype(jnp.uint32)
        v = jnp.where(sft >= 0, cd << lsh, cd >> rsh)
        return word | jnp.where(ok, v, jnp.uint32(0))
    word = jnp.zeros((B, N), jnp.uint32)
    return jax.lax.fori_loop(0, 33, cand, word)

j0 = jnp.asarray(rng.integers(0, N, (B, N), np.int32))
sec = t("pack fori-33 gather loop only", pack_loop_only, C, L, ends, j0)
print(f"    whole pack loop at {B*N*4/sec/1e9:.2f} GB/s-of-words", flush=True)

sec = t("pack_words full (incl searchsorted)", lambda C, L, e: devops.pack_words(C, L, e, N), C, L, ends)
print(f"    full pack at {B*N*4/sec/1e9:.2f} GB/s-of-words", flush=True)
