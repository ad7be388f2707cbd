"""Round 2: amortize the ~30ms sync floor by iterating K times inside jit
with a data dependency between iterations."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
print("device:", jax.devices()[0], flush=True)

K = 16

def t(label, step, x0, *consts, n_items):
    """step: (carry, *consts) -> carry. Times K chained applications."""
    def body(i, c):
        return step(c, *consts)
    f = jax.jit(lambda x0, *cs: jax.lax.fori_loop(0, K, lambda i, c: step(c, *cs), x0))
    r = f(x0, *consts)
    np.asarray(jax.tree.leaves(r)[0].ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(x0, *consts)
        np.asarray(jax.tree.leaves(r)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    per = best / K
    print(f"{label:55s} {per*1e3:9.2f} ms/iter  {n_items/per/1e6:10.0f} M items/s", flush=True)
    return per

rng = np.random.default_rng(0)
B, N = 256, 65536
nit = B * N

# elementwise chain
a = jnp.asarray(rng.integers(0, 1 << 30, (B, N), np.uint32))
s = jnp.asarray(rng.integers(1, 31, (B, N), np.uint32))
t("elementwise shift|or|select", lambda c, s: jnp.where(s > 16, (c << (s & 15)) | (c >> 3), c | s), a, s, n_items=nit)

# gather along lanes, carry-dependent
idx = jnp.asarray(rng.integers(0, N, (B, N), np.int32))
t("take_along_axis (B,N)<-(B,N)", lambda c, i: jnp.take_along_axis(c, (i ^ (c & 1)).astype(jnp.int32) % N, axis=1), idx, idx, n_items=nit)

# small-table gather along lanes
tab = jnp.asarray(rng.integers(0, 255, (B, 256), np.int32))
idx8 = jnp.asarray(rng.integers(0, 256, (B, N), np.int32))
t("take_along_axis (B,N)<-(B,256)", lambda c, tab: jnp.take_along_axis(tab, c & 255, axis=1) ^ c, idx8, tab, n_items=nit)

# one-hot MXU gather from per-block 256-table
tabf = jnp.asarray(rng.integers(0, 250, (B, 16, 16)).astype(np.float32))  # [hi][lo]
nib = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 16), 2)
def oh_gather(c, T):
    sym = c & 255
    hi = sym >> 4
    lo = sym & 15
    oh_lo = (lo[:, :, None] == nib).astype(jnp.bfloat16)
    part = jax.lax.dot_general(oh_lo, T.astype(jnp.bfloat16).swapaxes(1, 2),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)  # (B,N,16hi)
    oh_hi = (hi[:, :, None] == nib)
    out = jnp.sum(jnp.where(oh_hi, part, 0.0), axis=2).astype(jnp.int32)
    return out ^ c
t("onehot-MXU gather (B,N)<-(B,256)", oh_gather, idx8, tabf, n_items=nit)

# shifted select D=32 (local gather)
d32 = jnp.asarray(rng.integers(0, 32, (B, N), np.int32))
def shifted_select(c, d):
    Ap = jnp.pad(c, ((0, 0), (0, 32)))
    out = jnp.zeros_like(c)
    for delta in range(32):
        out = out | jnp.where(d == delta, Ap[:, delta : delta + N], 0)
    return out
t("shifted-select D=32", shifted_select, idx, d32, n_items=nit)

# cumsum
t("cumsum i32 axis=1", lambda c, _: jnp.cumsum(c, axis=1) & 0xFFFF, idx, idx, n_items=nit)

# batched 32x32 matmul: (B*W/8, 8grp?, ...) — model compose cost per word
W = N // 32  # 2048 words/block
f1 = jnp.asarray(rng.random((B * W // 64, 64, 32, 32)).astype(np.float32))
t("batched 32x32 matmul (0.5M mats)", lambda c, _: jnp.einsum("bwij,bwjk->bwik", c, c, preferred_element_type=jnp.float32) % 7.0, f1, f1, n_items=B * W, )

# dynamic_slice-free roll composition: compose maps f:(B,W,32)->idx into next word via onehot 32
mp = jnp.asarray(rng.integers(0, 32, (B * W // 64, 64, 32), np.int32))
io32 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 32, 32), 3)
def compose_oh(c, _):
    # c[..., e] in [0,32): compose c∘c via one-hot matmul in bf16
    oh = (c[..., None] == io32[0]).astype(jnp.bfloat16)  # (G,64,32in,32out)? careful
    # g[e] = c[c[e]] -> onehot(c) @ c_as_float
    cf = c.astype(jnp.bfloat16)
    out = jax.lax.dot_general(oh, cf[..., None],
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))), preferred_element_type=jnp.float32)
    return out[..., 0].astype(jnp.int32)
t("compose 32-maps onehot (0.5M maps)", compose_oh, mp, mp, n_items=B * W)
