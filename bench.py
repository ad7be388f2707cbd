"""Benchmark harness: per-chip codec throughput + wire exactness.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N, "detail": ...}

Two families of numbers (PERF.md records why both exist):

  * device-resident — input blocks / compressed batches already in HBM,
    outputs left in HBM: the per-chip codec throughput.  This is the
    deployment-relevant number: production hosts feed TPUs over PCIe/DMA at
    tens of GB/s, while this harness reaches its chip through a ~0.04 GB/s
    network tunnel (measured, bench/probe_primitives.py) that would
    otherwise be the only thing measured.
  * end-to-end — bytes-in/bytes-out through the full Python API including
    host work and tunnel transfers (reported in detail fields).

``value`` is the combined device-resident throughput
(n / (t_enc + t_dec)); ``vs_baseline`` compares it against the compiled C
reference (single core, this machine, same corpus sample) since the
reference publishes no numbers (BASELINE.md).

Timing discipline: the runtime COALESCES identical dispatches (same
executable + same buffers return the cached result instantly — measured,
see PERF.md), so every repetition salts its inputs and timing uses distinct
batches chained with block_until_ready.

Wire exactness: every run byte-compares this framework's compressed stream
against the compiled reference oracle on a corpus prefix, and round-trips
the full corpus.

Environment knobs: BENCH_MB (corpus size cap, default 400 — sized so the
flat ~23.5 ms dispatch RTT is amortized the way a production stream would;
PERF.md section 1), BENCH_BLOCK (blocksize, default 65536),
BENCH_SKIP_REF=1 (skip the C baseline), BENCH_ORACLE_MB (exactness
prefix, default 16).
"""

import functools
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _corpora():
    """Load bench/corpora.py (the bench/ dir is shadowed by this module's
    name, so spec-load it by path)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_corpora",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench", "corpora.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def corpus(n_bytes: int) -> bytes:
    for cand in (os.environ.get("ENWIK8"), "enwik8", "/root/enwik8",
                 "/tmp/enwik8"):
        if cand and os.path.exists(cand):
            with open(cand, "rb") as f:
                return f.read(n_bytes)
    # Deterministic enwik-like text (bench/corpora.py): Zipf-weighted word
    # vocabulary over a full-width byte alphabet.  enwik8 blocks have ~205
    # distinct bytes producing Huffman trees 12-16 deep; a letters-only
    # corpus gives 27 symbols and depth ~7, which understates decode work
    # (measured round 3: tree-shape analysis in bench/probe_r3 notes).
    # Generation costs ~9 s per 100 MB, so cache the deterministic bytes.
    cache = f"/tmp/libhuffman_bench_text_{n_bytes}.bin"
    try:
        if os.path.exists(cache) and os.path.getsize(cache) == n_bytes:
            with open(cache, "rb") as f:
                return f.read()
    except OSError:
        pass
    data = _corpora().text(n_bytes)
    try:
        with open(cache + ".tmp", "wb") as f:
            f.write(data)
        os.replace(cache + ".tmp", cache)
    except OSError:
        pass
    return data


def mixed_corpus(n_bytes: int) -> bytes:
    """Silesia-like composite (bench/corpora.py): near-incompressible
    sensor data + text + zero-heavy binary records, 256 KiB segments."""
    for cand in (os.environ.get("SILESIA"), "silesia.tar",
                 "/root/silesia.tar"):
        if cand and os.path.exists(cand):
            with open(cand, "rb") as f:
                return f.read(n_bytes)
    return _corpora().mixed(n_bytes)


def time_call(fn, *args, repeat=2):
    best = float("inf")
    r = None
    for _ in range(repeat):
        t0 = time.perf_counter()
        r = fn(*args)
        best = min(best, time.perf_counter() - t0)
    return r, best


def bench_encode_device(data: np.ndarray, bs: int, repeat=3):
    """Device-resident encode throughput: batches pre-staged in HBM.

    Dispatch latency is a flat ~23.5 ms that does not pipeline on this
    platform (bench/probe_r4_dispatch.py), so the whole corpus goes through
    as few dispatches as possible — the driver's batch bucketing."""
    from libhuffman_tpu import encode as enc_mod
    from libhuffman_tpu.ops import device as dev

    n = len(data)
    nblk = -(-n // bs)
    BB = enc_mod.DEFAULT_BATCH_BLOCKS
    batches = []
    for s in range(0, nblk, BB):
        nb = min(BB, nblk - s)
        B = enc_mod._bucket_blocks(nb)
        arr = np.zeros((B, bs), np.uint8)
        seg = data[s * bs : min(n, (s + nb) * bs)]
        arr.reshape(-1)[: len(seg)] = seg
        nv = np.full(B, bs, np.int32)
        full = len(seg) // bs
        rem = len(seg) - full * bs
        nv[full:] = 0
        if rem:
            nv[full] = rem
        batches.append((jax.device_put(jnp.asarray(arr)),
                        jax.device_put(jnp.asarray(nv))))
    capw = 24
    P = 1
    while P < bs:
        P *= 2
    W = min(P, capw * max(P // 64, 1))

    # ONE dispatch per fused group: encode + checksum nested under a
    # single jit (a separate jitted checksum call, or one dispatch per
    # sub-batch, costs an extra flat ~23.5 ms RTT each).
    @functools.partial(jax.jit, static_argnums=())
    def enc_check(bs_nv, salt):
        acc = jnp.uint32(0)
        for payload, total_bits, left, right, root, overflow in (
                dev.encode_blocks_many(
                    tuple((b ^ salt, nv) for b, nv in bs_nv), W, capw)):
            acc = (acc + jnp.sum(payload.astype(jnp.uint32))
                   + jnp.sum(total_bits.astype(jnp.uint32))
                   + jnp.sum(root.astype(jnp.uint32))
                   + jnp.sum(overflow.astype(jnp.uint32)))
        return acc

    FB = enc_mod.FUSE_BATCHES
    groups = [tuple(batches[g : g + FB])
              for g in range(0, len(batches), FB)]
    # Warm/compile; every timed repetition transfers a scalar checksum —
    # block_until_ready can return early on the axon tunnel (PERF.md §1).
    for grp in groups:
        np.asarray(enc_check(grp, jnp.uint8(0)))
    best = float("inf")
    for rep in range(repeat):
        salt = jnp.uint8(rep + 1)  # defeat dispatch coalescing
        t0 = time.perf_counter()
        acc = [enc_check(grp, salt) for grp in groups]
        _ = [np.asarray(a) for a in acc]
        best = min(best, time.perf_counter() - t0)
    return n / best / 1e9


def decode_plans(enc: bytes):
    """Host-side decode plan building (scan, parse, table build, batching).

    Returns (plans, n_out); shared by the throughput bench and the
    per-phase profiler (BENCH_PHASES=1)."""
    from libhuffman_tpu import decode as dec_mod

    return dec_mod.build_device_plans(enc)


def bench_decode_device(enc: bytes, repeat=3):
    """Device-resident decode throughput on the real compressed stream.

    Timing forces a host transfer of a scalar checksum per repetition —
    block_until_ready can return before execution completes on the axon
    tunnel (measured; PERF.md section 1).

    Returns (dev_gbps, n_out, hostdev_gbps): the last number also counts
    the host-side plan building (candidate scan, header parse, native
    table build, batch layout) and the final output-byte assembly — i.e.
    everything a production host would do except the PCIe transfers, which
    this environment cannot measure honestly (the tunnel is ~0.04 GB/s).
    """
    t0 = time.perf_counter()
    plans, n_out = decode_plans(enc)
    t_plan = time.perf_counter() - t0
    arrays = tuple(
        (jax.device_put(jnp.asarray(p.words)),
         jax.device_put(jnp.asarray(p.tables)),
         jax.device_put(jnp.asarray(p.n_sym)),
         jax.device_put(jnp.asarray(p.caps)))
        for p in plans
    )
    shapes = tuple((p.NP, p.OUTW, p.ns, p.ecw, p.narrow)
                   for p in plans)
    from libhuffman_tpu.ops import decode_v3 as ddec

    # One fused dispatch for the whole stream, checksum included (dispatch
    # latency is a flat ~23.5 ms that does not pipeline, and a separate
    # jitted checksum call would pay it twice; bench/probe_r4_dispatch.py).
    import functools as _ft

    @_ft.partial(jax.jit, static_argnums=(2,))
    def dec_check(arrs, salt, shp):
        salted = tuple((w ^ salt, t, ns, nc) for (w, t, ns, nc) in arrs)
        acc = jnp.uint32(0)
        for out, end_bit, corrupt, bad_bit, _eovf in ddec.decode_blocks_many(
                salted, shp):
            acc = (acc + jnp.sum(out.astype(jnp.uint32))
                   + jnp.sum(end_bit.astype(jnp.uint32))
                   + jnp.sum(bad_bit.astype(jnp.uint32)))
        return acc

    np.asarray(dec_check(arrays, jnp.uint32(0), shapes))
    best = float("inf")
    for rep in range(repeat):
        t0 = time.perf_counter()
        np.asarray(dec_check(arrays, jnp.uint32(rep + 1), shapes))
        best = min(best, time.perf_counter() - t0)

    # Host-side output assembly, timed on pre-transferred results so only
    # the tunnel is excluded: apply per-block results + ordered join.
    import libhuffman_tpu.decode as dec_mod

    host_res = []
    for res in ddec.decode_blocks_many(arrays, shapes):
        out, end_bit, corrupt, bad_bit, eovf = res
        host_res.append((np.asarray(out), np.asarray(end_bit),
                         np.asarray(corrupt), np.asarray(bad_bit),
                         np.asarray(eovf)))
    t0 = time.perf_counter()
    pieces = []
    for p, (out_h, end_h, cor_h, bad_h, eovf_h) in zip(plans, host_res):
        dec_mod._apply_plan_results(p, out_h, end_h, cor_h, bad_h, eovf_h)
        for c, *_rest in p.batch:
            if c.result is not None:
                pieces.append(c.result[0])
    _ = b"".join(pieces)
    t_asm = time.perf_counter() - t0
    hostdev = n_out / (best + t_plan + t_asm) / 1e9
    return n_out / best / 1e9, n_out, hostdev


def main():
    mb = int(os.environ.get("BENCH_MB", "400"))
    bs = int(os.environ.get("BENCH_BLOCK", "65536"))
    data = corpus(mb << 20)
    n = len(data)

    from libhuffman_tpu import decode as dec_mod
    from libhuffman_tpu import encode as enc_mod

    # Correctness first: full round-trip + oracle wire exactness.
    enc = enc_mod.encode(data, bs)
    dec = dec_mod.decode(enc)
    assert dec == data, "roundtrip failure in bench"
    wire_exact = None
    if os.environ.get("BENCH_SKIP_REF") != "1":
        try:
            from oracle import ref_compress

            om = int(os.environ.get("BENCH_ORACLE_MB", "16")) << 20
            om = (min(om, n) // bs) * bs or min(om, n)
            ref_bytes = ref_compress(data[:om], bs)
            ours = enc_mod.encode(data[:om], bs)
            wire_exact = ref_bytes == ours
            assert wire_exact, "compressed bytes differ from the C reference"
        except AssertionError:
            raise
        except Exception:
            wire_exact = None  # no toolchain for the oracle

    # End-to-end walls (includes the host<->device tunnel, PERF.md).
    _, t_enc = time_call(enc_mod.encode, data, bs, repeat=2)
    _, t_dec = time_call(dec_mod.decode, enc, repeat=2)

    # Device-resident throughput.
    dbuf = np.frombuffer(data, np.uint8)
    enc_dev_gbps = bench_encode_device(dbuf, bs)
    dec_dev_gbps, dec_dev_bytes, dec_hostdev_gbps = bench_decode_device(enc)
    t_enc_dev = n / enc_dev_gbps / 1e9
    t_dec_dev = n / dec_dev_gbps / 1e9 if dec_dev_bytes else float("inf")
    gbps = n / (t_enc_dev + t_dec_dev) / 1e9

    # Second corpus family: Silesia-like mixed binary (near-incompressible
    # + text + zero-heavy records) — different tree-shape regime than the
    # enwik-like headline corpus (VERDICT r3 item 7).
    corpora_rows = {}
    mix_mb = int(os.environ.get("BENCH_MIX_MB", "96"))
    if mix_mb:
        mdata = mixed_corpus(mix_mb << 20)
        menc = enc_mod.encode(mdata, bs)
        assert dec_mod.decode(menc) == mdata, "mixed-corpus roundtrip"
        m_exact = None
        if os.environ.get("BENCH_SKIP_REF") != "1":
            try:
                from oracle import ref_compress as _rc

                om = (min(4 << 20, len(mdata)) // bs) * bs
                m_exact = _rc(mdata[:om], bs) == enc_mod.encode(
                    mdata[:om], bs)
                assert m_exact, "mixed-corpus wire mismatch vs reference"
            except AssertionError:
                raise
            except Exception:
                m_exact = None
        mbuf = np.frombuffer(mdata, np.uint8)
        m_enc = bench_encode_device(mbuf, bs, repeat=2)
        m_dec, m_bytes, m_hostdev = bench_decode_device(menc, repeat=2)
        corpora_rows["silesia-mixed"] = {
            "bytes": len(mdata),
            "encode_gbps": round(m_enc, 4),
            "decode_gbps": round(m_dec, 4),
            "decode_hostdev_gbps": round(m_hostdev, 4),
            "ratio": round(len(menc) / len(mdata), 4),
            "wire_exact_vs_oracle": m_exact,
            "decode_device_out_bytes": m_bytes,
        }

    scaling = None
    if os.environ.get("BENCH_SCALING") != "0":
        import subprocess

        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)  # CPU-only subprocess
        env["JAX_PLATFORMS"] = "cpu"
        # XLA:CPU cache entries are machine code and this environment
        # migrates across heterogeneous hosts (loading foreign-feature
        # AOT code SIGILLs — see tests/conftest.py); keep the CPU
        # subprocess's cache in a host-fingerprinted subdir, away from
        # the TPU entries (which are remote-compiled and portable).
        try:
            import hashlib

            with open("/proc/cpuinfo", "rb") as f:
                blob = f.read()
            flags = b"\n".join(l for l in blob.splitlines()
                               if l.startswith((b"flags", b"model name")))
            fp = hashlib.md5(flags).hexdigest()[:10]
        except OSError:
            fp = "unknown"
        env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
            os.environ["JAX_COMPILATION_CACHE_DIR"], "cpu-" + fp)
        try:
            r = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench", "scaling.py")],
                env=env, capture_output=True, timeout=900,
            )
            scaling = json.loads(r.stdout.decode().strip().splitlines()[-1])
        except Exception:
            scaling = None

    phases = None
    if os.environ.get("BENCH_PHASES") == "1":
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "bench_phases",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench", "phases.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        phases = mod.run(dbuf, enc, bs)

    vs = None
    if os.environ.get("BENCH_SKIP_REF") != "1":
        try:
            from oracle import ref_compress, ref_decompress

            sub = data[: min(n, 16 << 20)]  # reference is slow; sample
            r_enc, rt_enc = time_call(ref_compress, sub, bs, repeat=1)
            _, rt_dec = time_call(ref_decompress, r_enc, repeat=1)
            ref_gbps = len(sub) / (rt_enc + rt_dec) / 1e9
            vs = gbps / ref_gbps
        except Exception:
            vs = None

    print(json.dumps({
        "metric": "enwik-corpus combined encode+decode throughput"
                  " (1 chip, device-resident)",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "detail": {
            "bytes": n, "blocksize": bs,
            "encode_gbps": round(enc_dev_gbps, 4),
            "decode_gbps": round(dec_dev_gbps, 4),
            "decode_hostdev_gbps": round(dec_hostdev_gbps, 4),
            "e2e_encode_gbps": round(n / t_enc / 1e9, 4),
            "e2e_decode_gbps": round(n / t_dec / 1e9, 4),
            "wire_exact_vs_oracle": wire_exact,
            "decode_device_out_bytes": dec_dev_bytes,
            "ratio": round(len(enc) / n, 4),
            "decode_jit_keys": len(dec_mod.compile_keys()),
            "device": str(jax.devices()[0]),
            "note": "host<->device link here is a ~0.04 GB/s network tunnel"
                    " (PERF.md); e2e_* include it, device numbers do not",
            **({"corpora": corpora_rows} if corpora_rows else {}),
            **({"scaling": scaling} if scaling else {}),
            **({"phases": phases} if phases else {}),
        },
    }))


if __name__ == "__main__":
    main()
