"""Per-phase throughput accounting (SURVEY.md §5.5, BENCH_PHASES=1).

Ablation timing: compile the pipeline truncated after each stage (the
``*_prefix`` functions in ops/device.py and ops/decode_v3.py, outputs reduced
to a device-resident checksum) and difference the walls.  This sidesteps the
two measurement hazards documented in PERF.md §1: no stage boundary ever
crosses the jit boundary (so no pathological inter-executable layouts), and
nothing big crosses the ~0.04 GB/s host tunnel.  Inputs are salted per
repetition to defeat dispatch coalescing.

Run standalone (``python bench/phases.py``) or via ``BENCH_PHASES=1
python bench.py``.  Prints a phase table to stderr and returns/prints the
dict {phase: seconds}.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ENC_PHASES = ["histogram", "tree", "codes", "layout", "pack"]
DEC_PHASES = ["resolve", "chain+groups", "emit", "bookkeeping"]


def _np_force(r):
    """Force a host transfer: block_until_ready can return before device
    execution completes on the axon tunnel (measured, PERF.md section 1)."""
    import numpy as np

    if isinstance(r, (list, tuple)):
        return [np.asarray(x) for x in r]
    return np.asarray(r)


def _time(fn, salts, repeat=3):
    _np_force(fn(salts[0]))  # warm/compile
    best = float("inf")
    for rep in range(repeat):
        s = salts[rep % len(salts)]
        t0 = time.perf_counter()
        _np_force(fn(s))
        best = min(best, time.perf_counter() - t0)
    return best


def _dispatch_baseline(args, repeat=3):
    """Wall of a trivial dispatch over the same inputs: the flat ~23.5 ms
    tunnel RTT (does not pipeline, bench/probe_r4_dispatch.py).  Subtracted
    from every cumulative phase wall so phase 1 is not misattributed the
    RTT (the round-3 tables were — PERF.md §4 note)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def trivial(s, xs):
        return sum(jnp.sum(x[..., :1].astype(jnp.uint32) ^ s) for x in xs)

    def run(s):
        return trivial(s, args)

    return _time(run, [jnp.uint32(i) for i in range(1, 4)], repeat)


def profile_encode(data: np.ndarray, bs: int, repeat=3):
    """Cumulative then differenced per-phase encode walls on one batch."""
    import jax
    import jax.numpy as jnp

    from libhuffman_tpu.ops import device as dev
    from libhuffman_tpu import encode as enc_mod

    BB = enc_mod.DEFAULT_BATCH_BLOCKS
    n = min(len(data), BB * bs)
    arr = np.zeros((BB, bs), np.uint8)
    arr.reshape(-1)[:n] = data[:n]
    nv = np.full(BB, bs, np.int32)
    blocks = jax.device_put(jnp.asarray(arr))
    nvd = jax.device_put(jnp.asarray(nv))
    capw = 24
    P = 1
    while P < bs:
        P *= 2
    W = min(P, capw * max(P // 64, 1))

    # In-dispatch replication (R=9 vs R=1, differenced) cancels the flat
    # RTT and the max(RTT, device) hiding of sub-RTT stages.
    R_HI, R_LO = 9, 1
    cum = []
    for k in range(1, 6):
        ts = {}
        for R in (R_LO, R_HI):
            ts[R] = _time(
                lambda s, k=k, R=R: dev.encode_blocks_prefix_rep(
                    blocks ^ jnp.uint8(s), nvd, W, capw, k, R),
                [jnp.uint32(i) for i in range(11, 14)], repeat,
            )
        cum.append(max((ts[R_HI] - ts[R_LO]) / (R_HI - R_LO), 0.0))
    phases = {}
    prev = 0.0
    for name, t in zip(ENC_PHASES, cum):
        phases[name] = max(t - prev, 0.0)
        prev = max(t, prev)
    phases["_total_prefix"] = cum[-1]
    phases["_batch_bytes"] = n
    return phases


def profile_decode(enc: bytes, repeat=3):
    """Per-phase decode walls over the dominant-shape device plans."""
    import jax
    import jax.numpy as jnp

    import bench as bench_mod
    from libhuffman_tpu.ops import decode_v3 as ddec

    plans, n_out = bench_mod.decode_plans(enc)
    covered = sum(int(p.n_sym.sum()) for p in plans)
    arrays = tuple(
        (jax.device_put(jnp.asarray(p.words)),
         jax.device_put(jnp.asarray(p.tables)),
         jax.device_put(jnp.asarray(p.n_sym)),
         jax.device_put(jnp.asarray(p.caps)))
        for p in plans
    )
    shapes = tuple((p.NP, p.OUTW, p.ns, p.ecw, p.narrow)
                   for p in plans)

    # ONE fused dispatch per ablation level; subtract one trivial-dispatch
    # RTT.  Per-plan dispatching cannot be decomposed honestly: serialized
    # dispatches cost max(RTT, device) each, hiding sub-RTT stages.
    base = _dispatch_baseline(tuple(w for (w, *_r) in arrays), repeat)
    cum = []
    for k in range(1, 5):
        def run(s, k=k):
            salted = tuple((w ^ s, t, n, nc) for (w, t, n, nc) in arrays)
            return ddec.decode_blocks_prefix_many(salted, shapes, k)
        t = _time(run, [jnp.uint32(i) for i in range(1, 4)], repeat)
        cum.append(max(t - base, 0.0))
    phases = {}
    prev = 0.0
    for name, t in zip(DEC_PHASES, cum):
        phases[name] = max(t - prev, 0.0)
        prev = max(t, prev)
    phases["_total_prefix"] = cum[-1]
    phases["_dispatch_rtt"] = base
    phases["_covered_bytes"] = covered
    phases["_covered_plans"] = f"{len(plans)}/{len(plans)}"
    phases["_shape"] = str(sorted(set(
        (p.words.shape[0],) + s[:3] for p, s in zip(plans, shapes))))
    return phases


def run(data: np.ndarray, enc: bytes, bs: int):
    ep = profile_encode(data, bs)
    dp = profile_decode(enc)
    eb, db = ep["_batch_bytes"], dp["_covered_bytes"]

    def fmt(d, total_bytes, names):
        rows = []
        for k in names:
            gbps = total_bytes / d[k] / 1e9 if d[k] > 0 else float("inf")
            rows.append(f"  {k:<12} {d[k]*1e3:9.2f} ms   {gbps:8.3f} GB/s-eq")
        return "\n".join(rows)

    print("== encode phases (one %.1f MB batch) ==" % (eb / 1e6),
          file=sys.stderr)
    print(fmt(ep, eb, ENC_PHASES), file=sys.stderr)
    print("== decode phases (%s plans, %.1f MB out, shape %s) ==" %
          (dp["_covered_plans"], db / 1e6, dp["_shape"]), file=sys.stderr)
    print(fmt(dp, db, DEC_PHASES), file=sys.stderr)
    return {"encode": ep, "decode": dp}


if __name__ == "__main__":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import json

    import bench as bench_mod
    from libhuffman_tpu import encode as enc_mod

    mb = int(os.environ.get("BENCH_MB", "64"))
    bs = int(os.environ.get("BENCH_BLOCK", "65536"))
    data = np.frombuffer(bench_mod.corpus(mb << 20), np.uint8)
    enc = enc_mod.encode(data, bs)
    out = run(data, enc, bs)
    print(json.dumps(out))
