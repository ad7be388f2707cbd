"""shard_map / sharded-jit encode over the block axis.

Design (SURVEY.md §5.7-5.8):

  * 1-D mesh ``('blocks',)`` over all devices; a stream of n bytes becomes
    ceil(n / blocksize) independent blocks, padded to a multiple of the mesh
    size and laid out ``P('blocks', None)``.
  * The whole encode pipeline (histogram -> tree -> codes -> pack) is
    batched elementwise over the block axis, so XLA partitions it with zero
    communication; the only collective is the all-reduce that sizes the
    shared word buffer (max over per-block bit totals) and the final gather
    of ragged (payload, size) pairs for ordered assembly.
  * Multi-host: each host feeds its local shard of blocks;
    per-block compressed sizes are all-gathered (tiny), an exclusive scan
    gives every block its byte offset in the final stream, and payloads are
    assembled in block order.  On a single host the gather is a device->host
    copy.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..format import ASCII_COUNT
from ..ops import device as dev
from ..ops import decode_v3 as ddec


def block_mesh(devices=None) -> Mesh:
    """1-D mesh over ``devices`` (default: all) with axis ``'blocks'``."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), ("blocks",))


# The fused single-dispatch encode program (ops/device.encode_blocks) is
# also the per-shard step under sharded jit.
_encode_step = dev.encode_blocks


def encode_sharded(batch: np.ndarray, n_valid: np.ndarray, mesh: Mesh,
                   words_per_block: int | None = None):
    """Encode a (B, N) block batch sharded over ``mesh``.

    B must be a multiple of the mesh size (pad with n_valid == 0 blocks).
    Returns host numpy (payload, total_bits, left, right, root, overflow).

    ``words_per_block``: static word budget; defaults to the worst case
    (N words = 32 bits/byte) — callers with size knowledge pass less.
    """
    B, N = batch.shape
    assert B % mesh.devices.size == 0, (B, mesh.devices.size)
    W = words_per_block or N
    spec = NamedSharding(mesh, P("blocks", None))
    vspec = NamedSharding(mesh, P("blocks"))
    blocks = jax.device_put(jnp.asarray(batch), spec)
    nv = jax.device_put(jnp.asarray(n_valid), vspec)
    out_shardings = (spec, vspec, spec, spec, vspec, vspec)
    fn = jax.jit(
        functools.partial(_encode_step.__wrapped__, W=W),
        in_shardings=(spec, vspec),
        out_shardings=out_shardings,
        static_argnames=(),
    )
    res = fn(blocks, nv)
    return tuple(np.asarray(r) for r in res)


def decode_blocks_sharded(words, tables, n_sym, n_cap, NP: int, OUTW: int,
                          NS: int, mesh: Mesh):
    """Sharded batch decode: the v3 kernels (ops/decode_v3.decode_blocks)
    run per shard under shard_map over the block axis — blocks are fully
    independent, so there are no collectives at all."""
    from jax.experimental.shard_map import shard_map

    spec3 = P("blocks", None, None)
    vspec = P("blocks")
    dspec3 = NamedSharding(mesh, spec3)
    dvspec = NamedSharding(mesh, vspec)

    def per_shard(w, t, n, nc):
        return ddec.decode_blocks.__wrapped__(w, t, n, nc, NP, OUTW, NS,
                                              None)

    fn = jax.jit(
        shard_map(
            per_shard, mesh=mesh,
            in_specs=(spec3, spec3, vspec, vspec),
            out_specs=(P("blocks", None), vspec, vspec, vspec, vspec),
            check_rep=False,  # pallas_call out_shapes carry no replication info
        )
    )
    res = fn(
        jax.device_put(jnp.asarray(words), dspec3),
        jax.device_put(jnp.asarray(tables), dspec3),
        jax.device_put(jnp.asarray(n_sym), dvspec),
        jax.device_put(jnp.asarray(n_cap), dvspec),
    )
    return tuple(np.asarray(r) for r in res)


def encode_stream_sharded(buf: np.ndarray, blocksize: int, mesh: Mesh) -> bytes:
    """Whole-stream encode over a device mesh: split into blocks, pad to a
    mesh multiple, shard the batch, assemble in block order."""
    n = len(buf)
    if n == 0:
        return b""
    if blocksize <= 0:
        blocksize = n
    nblocks = -(-n // blocksize)
    nd = mesh.devices.size
    B = -(-nblocks // nd) * nd
    batch = np.zeros((B, blocksize), np.uint8)
    n_valid = np.zeros(B, np.int32)
    flat = batch.reshape(-1)
    flat[:n] = buf
    n_valid[:nblocks] = blocksize
    if n % blocksize:
        n_valid[nblocks - 1] = n % blocksize
    res = encode_sharded(batch, n_valid, mesh)
    payload, total_bits, left, right, root, overflow = res
    return assemble_stream(n_valid, total_bits, payload, left, right, root,
                           overflow, batch)


def assemble_stream(n_valid, total_bits, payload, left, right, root,
                    overflow, batch=None) -> bytes:
    """Ordered host assembly of a sharded encode's outputs.

    The per-block compressed size is header + ceil(total_bits/8); an
    exclusive scan of sizes gives each block its offset (the multi-host
    contract: sizes are what crosses hosts, payload bytes stay local until
    this final ordered concatenation).
    """
    from ..format import ArrayTree, pack_block, serialize_tree
    from ..ops import hostref
    from .. import native

    if native.available() and not np.asarray(overflow).any():
        # Whole-batch native assembly (one pass; encode.py's fast path).
        trees, lens_t = native.serialize_trees(
            np.ascontiguousarray(left, np.int32),
            np.ascontiguousarray(right, np.int32),
            np.ascontiguousarray(root, np.int32))
        plens = (np.asarray(total_bits).astype(np.int64) + 7) // 8
        return native.assemble_blocks(
            np.asarray(n_valid).astype(np.uint64), trees, lens_t,
            np.ascontiguousarray(payload, np.uint8), plens)

    out = []
    for b in range(len(n_valid)):
        nv = int(n_valid[b])
        if nv == 0:
            continue
        if overflow[b]:
            assert batch is not None, "overflow block needs raw input"
            out.append(hostref.encode_block(batch[b, :nv]))
            continue
        tree = serialize_tree(ArrayTree(left[b], right[b], int(root[b])))
        nbytes = (int(total_bits[b]) + 7) // 8
        out.append(pack_block(nv, tree, payload[b, :nbytes].tobytes()))
    return b"".join(out)
