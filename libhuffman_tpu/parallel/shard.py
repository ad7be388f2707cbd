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
                   words_per_block: int | None = None,
                   capw: int = 64):
    """Encode a (B, N) block batch sharded over ``mesh``.

    B must be a multiple of the mesh size (pad with n_valid == 0 blocks).
    Returns host numpy (payload, total_bits, left, right, root, overflow).

    ``words_per_block``: static word budget; defaults to the worst case
    (N words = 32 bits/byte) — callers with size knowledge pass less.
    ``capw`` clamps the packer's merge-tree capacities exactly like the
    local path (overflowing blocks are flagged and host re-encoded).
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
        functools.partial(_encode_step.__wrapped__, W=W, capw=capw),
        in_shardings=(spec, vspec),
        out_shardings=out_shardings,
        static_argnames=(),
    )
    res = fn(blocks, nv)
    return tuple(np.asarray(r) for r in res)


def _decode_shard_mapped(mesh: Mesh, NP: int, OUTW: int, NS: int, ECW,
                         NARROW: bool = False):
    """shard_map-wrapped decode_blocks over the block axis — blocks are
    fully independent, so there are no collectives at all."""
    spec3 = P("blocks", None, None)
    vspec = P("blocks")

    def per_shard(w, t, n, nc):
        return ddec.decode_blocks.__wrapped__(w, t, n, nc, NP, OUTW, NS,
                                              ECW, NARROW)

    return jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(spec3, spec3, vspec, vspec),
        out_specs=(P("blocks", None), vspec, vspec, vspec, vspec),
        check_vma=False,  # pallas_call out_shapes carry no replication info
    )


def decode_blocks_sharded(words, tables, n_sym, n_cap, NP: int, OUTW: int,
                          NS: int, mesh: Mesh):
    """Sharded batch decode of one homogeneous block batch (v3 kernels)."""
    dspec3 = NamedSharding(mesh, P("blocks", None, None))
    dvspec = NamedSharding(mesh, P("blocks"))
    fn = jax.jit(_decode_shard_mapped(mesh, NP, OUTW, NS, None))
    res = fn(
        jax.device_put(jnp.asarray(words), dspec3),
        jax.device_put(jnp.asarray(tables), dspec3),
        jax.device_put(jnp.asarray(n_sym), dvspec),
        jax.device_put(jnp.asarray(n_cap), dvspec),
    )
    return tuple(np.asarray(r) for r in res)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _decode_plans_sharded_step(arrays, shapes, mesh):
    return tuple(
        _decode_shard_mapped(mesh, *shp)(w, t, n, nc)
        for (w, t, n, nc), shp in zip(arrays, shapes)
    )


def decode_plans_sharded(plans, mesh: Mesh):
    """All device plans of a stream through shard_map, ONE dispatch.

    The sharded twin of ops/decode_v3.decode_blocks_many for the public
    ``DecodeConfig(mesh=...)`` path (reference outer loop being
    parallelized: src/decoder.c:218-275).  Plan lane counts are padded to
    a mesh multiple by the driver (decode._build_plans lane_mult)."""
    dspec3 = NamedSharding(mesh, P("blocks", None, None))
    dvspec = NamedSharding(mesh, P("blocks"))
    arrays = tuple(
        (jax.device_put(jnp.asarray(p.words), dspec3),
         jax.device_put(jnp.asarray(p.tables), dspec3),
         jax.device_put(jnp.asarray(p.n_sym), dvspec),
         jax.device_put(jnp.asarray(p.caps), dvspec))
        for p in plans
    )
    shapes = tuple((p.NP, p.OUTW, p.ns, p.ecw, p.narrow) for p in plans)
    return _decode_plans_sharded_step(arrays, shapes, mesh)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _encode_many_step(args, W: int, capw: int):
    """Several sharded sub-batches in ONE dispatch (the sharded twin of
    ops/device.encode_blocks_many; input shardings committed by the
    caller's device_put propagate through GSPMD)."""
    return tuple(_encode_step.__wrapped__(b, nv, W, capw) for b, nv in args)


def encode_stream_sharded(buf: np.ndarray, blocksize: int, mesh: Mesh) -> bytes:
    """Whole-stream encode over a device mesh.

    Runs the round-4 local pipeline shape under sharding: the stream splits
    into sub-batches of 256 blocks PER DEVICE (the measured XLA scheduling
    optimum for the fused kernels), every sub-batch uses the
    ``_pack_params`` word budget + capw clamp instead of the worst-case
    W = N, all sub-batches fuse into one dispatch, and the payload
    transfer is bucketed to the longest real payload (the worst-case
    buffer is 4N bytes/row but typical payloads are ~0.6N).  Clamp
    overflows fall back to exact host re-encode per block, identical to
    the local driver.
    """
    from ..encode import _assemble_batch, _pack_params

    n = len(buf)
    if n == 0:
        return b""
    if blocksize <= 0:
        blocksize = n
    if blocksize > (1 << 21):
        # Oversized single blocks: same host-exact route as encode.encode.
        from ..ops import hostref

        return b"".join(hostref.encode_block(buf[off : off + blocksize])
                        for off in range(0, n, blocksize))
    nblocks = -(-n // blocksize)
    nd = mesh.devices.size
    W, capw = _pack_params(blocksize)
    group = 256 * nd
    spec = NamedSharding(mesh, P("blocks", None))
    vspec = NamedSharding(mesh, P("blocks"))
    host_batches = []
    staged = []
    for s in range(0, nblocks, group):
        nb = min(group, nblocks - s)
        B = -(-nb // nd) * nd
        batch = np.zeros((B, blocksize), np.uint8)
        n_valid = np.zeros(B, np.int32)
        seg = buf[s * blocksize : min(n, (s + nb) * blocksize)]
        batch.reshape(-1)[: len(seg)] = seg
        n_valid[:nb] = blocksize
        if s + nb == nblocks and n % blocksize:
            n_valid[nb - 1] = n % blocksize
        host_batches.append((batch, n_valid))
        staged.append((jax.device_put(jnp.asarray(batch), spec),
                       jax.device_put(jnp.asarray(n_valid), vspec)))
    results = _encode_many_step(tuple(staged), W, capw)
    chunks: list[bytes] = []
    for (batch, n_valid), res in zip(host_batches, results):
        chunks.extend(_assemble_batch(batch, n_valid, res))
    return b"".join(chunks)


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
