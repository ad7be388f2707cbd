"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
    ge.dryrun_multichip(4)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def test_sharded_encode_matches_unsharded():
    from libhuffman_tpu.parallel import block_mesh, encode_sharded
    from libhuffman_tpu.parallel.shard import assemble_stream
    from libhuffman_tpu.ops import hostref

    rng = np.random.default_rng(7)
    B, N = 16, 1000
    data = rng.choice(
        np.frombuffer(b"abcdefgh \n", np.uint8), B * N
    ).astype(np.uint8)
    batch = data.reshape(B, N)
    n_valid = np.full(B, N, np.int32)
    mesh = block_mesh()
    payload, total_bits, left, right, root, overflow = encode_sharded(
        batch, n_valid, mesh, words_per_block=N
    )
    stream = assemble_stream(
        n_valid, total_bits, payload, left, right, root, overflow, batch
    )
    assert stream == hostref.encode(data.tobytes(), N)
