"""ctypes binding for the native host runtime (native/huffman_native.cpp).

The native library owns host-side per-block work at stream scale: batch tree
(de)serialization and the exact sequential walk (fallback + boundary scan +
incremental progress measurement).  Compiled on first use into a cache dir;
every entry point has a pure-Python equivalent, so absence of a toolchain
degrades performance, never correctness (``available()`` gates callers).
"""

from __future__ import annotations

import ctypes
import functools
import os
import pathlib
import subprocess
import tempfile
from concurrent.futures import ThreadPoolExecutor

import numpy as np

# ctypes calls with declared argtypes release the GIL, so stream-scale
# native passes (header scan, table build, plan staging) parallelize
# across host cores with plain threads.
_POOL_WORKERS = min(8, os.cpu_count() or 1)

_SRC = pathlib.Path(__file__).resolve().parent.parent / "native" / "huffman_native.cpp"
NT = 1027


@functools.lru_cache(maxsize=1)
def _lib():
    cache = pathlib.Path(
        os.environ.get("LIBHUFFMAN_TPU_NATIVE_DIR",
                       pathlib.Path(tempfile.gettempdir()) / "libhuffman_tpu_native")
    )
    cache.mkdir(parents=True, exist_ok=True)
    so = cache / "libhuffman_native.so"
    extra = os.environ.get("LIBHUFFMAN_TPU_NATIVE_FLAGS", "").split()
    if not so.exists() or so.stat().st_mtime < _SRC.stat().st_mtime:
        subprocess.run(
            ["g++", "-std=c++17", "-O3", "-fPIC", "-shared", *extra,
             str(_SRC), "-o", str(so)],
            check=True, capture_output=True,
        )
    lib = ctypes.CDLL(str(so))
    i8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
    i16p = np.ctypeslib.ndpointer(np.int16, flags="C")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C")
    lib.serialize_trees.argtypes = [i32p, i32p, i32p, ctypes.c_int32, i16p, i32p]
    lib.deserialize_trees.argtypes = [
        i16p, i64p, i32p, ctypes.c_int32, u32p, ctypes.c_int32, i32p, i32p]
    lib.scan_stream.argtypes = [
        i8p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
    lib.scan_stream.restype = ctypes.c_int32
    lib.walk_progress.argtypes = [
        i16p, ctypes.c_int32, i8p, ctypes.c_int64, ctypes.c_uint64]
    lib.walk_progress.restype = ctypes.c_uint64
    lib.walk_progress_resume.argtypes = [
        i16p, ctypes.c_int32, i8p, ctypes.c_int64, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint64)]
    lib.walk_progress_resume.restype = ctypes.c_int32
    lib.build_decode_tables_batch.argtypes = [
        i16p, i64p, i32p, ctypes.c_int32, u32p, i32p, i32p, i32p]
    lib.find_headers.argtypes = [i8p, ctypes.c_int64, i64p, ctypes.c_int64]
    lib.find_headers.restype = ctypes.c_int64
    lib.stage_plan.argtypes = [
        i8p, ctypes.c_int64, i64p, i64p, ctypes.c_int32,
        ctypes.c_int64, u32p]
    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C")
    lib.assemble_blocks.argtypes = [
        u64p, i16p, i32p, ctypes.c_int64, i8p, ctypes.c_int64, i64p,
        ctypes.c_int32, i8p]
    lib.assemble_blocks.restype = ctypes.c_int64
    return lib


def available() -> bool:
    try:
        _lib()
        return True
    except Exception:
        return False


def serialize_trees(left: np.ndarray, right: np.ndarray, root: np.ndarray):
    """(B,512)x2 + (B,) array trees -> (out[B,1025] int16, lens[B] int32)."""
    B = len(root)
    out = np.empty((B, 1025), np.int16)
    lens = np.empty(B, np.int32)
    _lib().serialize_trees(
        np.ascontiguousarray(left, np.int32),
        np.ascontiguousarray(right, np.int32),
        np.ascontiguousarray(root, np.int32),
        B, out, lens,
    )
    return out, lens


def deserialize_trees(bufs: np.ndarray, offs: np.ndarray, lens: np.ndarray):
    """Concatenated int16 trees -> (packed[B,NT] uint32, counts, depths)."""
    B = len(offs)
    nodes = np.empty((B, NT), np.uint32)
    counts = np.empty(B, np.int32)
    depths = np.empty(B, np.int32)
    _lib().deserialize_trees(
        np.ascontiguousarray(bufs, np.int16),
        np.ascontiguousarray(offs, np.int64),
        np.ascontiguousarray(lens, np.int32),
        B, nodes, NT, counts, depths,
    )
    return nodes, counts, depths


def scan_stream(data: np.ndarray, decode: bool = False, out_cap: int = 0,
                max_blocks: int = -1):
    """Sequential chain scan (optionally decoding, optionally bounded).

    Returns (err, consumed, produced, blocks, out_bytes_or_None) with
    huf_error_t-compatible err codes (0/3/5/6).
    """
    data = np.ascontiguousarray(data, np.uint8)
    out = np.empty(out_cap, np.uint8) if decode else None
    consumed = ctypes.c_int64()
    produced = ctypes.c_int64()
    blocks = ctypes.c_int64()
    err = _lib().scan_stream(
        data, len(data),
        out.ctypes.data_as(ctypes.c_void_p) if out is not None else None,
        out_cap, ctypes.byref(consumed), ctypes.byref(produced),
        ctypes.byref(blocks), max_blocks,
    )
    return err, consumed.value, produced.value, blocks.value, out


# Packed: 4 rows LUT10 + 4 rows stage 1 (128st x 3b) + 2 rows tail 1
# (64st x 3b) + 3 rows tails 2-4 (32st x 3b); two 16-bit entries per u32
# lane cell (native build_decode_tables).
TAB_ROWS = 13
MAX_TABLE_DEPTH = 25  # 10 + 5*3; deeper codes -> host-exact fallback


def build_decode_tables(bufs: np.ndarray, offs: np.ndarray, lens: np.ndarray):
    """Concatenated int16 wire trees -> per-block resolve tables.

    Returns (tables[B, TAB_ROWS, 128] uint32, nstages[B], mindepth[B],
    maxdepth[B]); nstages -1 marks host-fallback blocks (bad root, 1-bit
    codes, over-capacity state cuts, or depth > MAX_TABLE_DEPTH)."""
    B = len(offs)
    tables = np.empty((B, TAB_ROWS, 128), np.uint32)
    nstages = np.empty(B, np.int32)
    mindep = np.empty(B, np.int32)
    maxdep = np.empty(B, np.int32)
    bufs = np.ascontiguousarray(bufs, np.int16)
    offs = np.ascontiguousarray(offs, np.int64)
    lens = np.ascontiguousarray(lens, np.int32)
    nw = _POOL_WORKERS
    if B < 256 or nw <= 1:
        _lib().build_decode_tables_batch(
            bufs, offs, lens, B, tables, nstages, mindep, maxdep)
        return tables, nstages, mindep, maxdep

    def chunk(i):
        lo, hi = B * i // nw, B * (i + 1) // nw
        if lo == hi:
            return
        # Per-chunk bases: the batch entry point indexes outputs from 0.
        _lib().build_decode_tables_batch(
            bufs, np.ascontiguousarray(offs[lo:hi]),
            np.ascontiguousarray(lens[lo:hi]), hi - lo,
            tables[lo:hi], nstages[lo:hi], mindep[lo:hi], maxdep[lo:hi])

    with ThreadPoolExecutor(nw) as ex:
        list(ex.map(chunk, range(nw)))
    return tables, nstages, mindep, maxdep


def _find_headers_seg(data: np.ndarray) -> np.ndarray:
    cap = max(1024, len(data) // 4096)
    out = np.empty(cap, np.int64)
    k = int(_lib().find_headers(data, len(data), out, cap))
    if k > cap:
        out = np.empty(k, np.int64)
        k = int(_lib().find_headers(data, len(data), out, k))
    return out[:k].copy()


def find_headers(data: np.ndarray) -> np.ndarray:
    """Offsets of plausible block headers (native scan, threaded at
    stream scale: segments overlap by the 10-byte header window and each
    segment keeps only offsets starting inside its half-open range)."""
    data = np.ascontiguousarray(data, np.uint8)
    n = len(data)
    nw = _POOL_WORKERS
    if n < (8 << 20) or nw <= 1:
        return _find_headers_seg(data)
    bounds = [n * i // nw for i in range(nw + 1)]

    def seg(i):
        lo, hi = bounds[i], min(bounds[i + 1] + 9, n)
        offs = _find_headers_seg(data[lo:hi])
        offs = offs[offs < bounds[i + 1] - lo] + lo
        return offs

    with ThreadPoolExecutor(nw) as ex:
        parts = list(ex.map(seg, range(nw)))
    return np.concatenate(parts) if parts else np.empty(0, np.int64)


def stage_plan(data: np.ndarray, offs: np.ndarray, caps: np.ndarray,
               row_words: int) -> np.ndarray:
    """Per-block zero-padded big-endian u32 word rows for the resolve
    kernel (single native pass; replaces numpy zeros + per-block copies +
    byteswap-view staging)."""
    B = len(offs)
    out = np.empty((B, row_words), np.uint32)
    _lib().stage_plan(
        np.ascontiguousarray(data, np.uint8), len(data),
        np.ascontiguousarray(offs, np.int64),
        np.ascontiguousarray(caps, np.int64), B, row_words, out)
    return out


def assemble_blocks(n_sym: np.ndarray, trees: np.ndarray,
                    tree_lens: np.ndarray, payloads: np.ndarray,
                    payload_lens: np.ndarray) -> bytes:
    """Ordered (header, tree, payload) concatenation for a whole batch
    (reference src/encoder.c:325-351); n_sym == 0 rows are padding."""
    n_sym = np.ascontiguousarray(n_sym, np.uint64)
    tree_lens = np.ascontiguousarray(tree_lens, np.int32)
    payload_lens = np.ascontiguousarray(payload_lens, np.int64)
    total = int(np.sum(
        np.where(n_sym > 0, 10 + 2 * tree_lens.astype(np.int64)
                 + payload_lens, 0)))
    out = np.empty(total, np.uint8)
    n = int(_lib().assemble_blocks(
        n_sym, np.ascontiguousarray(trees, np.int16), tree_lens,
        trees.shape[1], np.ascontiguousarray(payloads, np.uint8),
        payloads.shape[1], payload_lens, len(n_sym), out))
    assert n == total, (n, total)
    return out.tobytes()


def walk_progress(tree: np.ndarray, payload: np.ndarray, n_sym: int) -> int:
    return int(_lib().walk_progress(
        np.ascontiguousarray(tree, np.int16), len(tree),
        np.ascontiguousarray(payload, np.uint8), len(payload), n_sym,
    ))


def walk_progress_resume(tree: np.ndarray, payload: np.ndarray, n_sym: int,
                         state: tuple[int, int, int] | None = None
                         ) -> tuple[int, tuple[int, int, int]]:
    """Resumable measurement walk: state = (node, restored, pos) carries the
    walk across incremental feeds so each payload byte is visited once.

    Returns (restored, new_state); node -1 in the state marks a walk frozen
    on corruption (the caller's decode attempt classifies it)."""
    node, restored, pos = state if state is not None else (0, 0, 0)
    c_pos = ctypes.c_int64(pos)
    c_state = ctypes.c_int32(node)
    c_restored = ctypes.c_uint64(restored)
    _lib().walk_progress_resume(
        np.ascontiguousarray(tree, np.int16), len(tree),
        np.ascontiguousarray(payload, np.uint8), len(payload), n_sym,
        ctypes.byref(c_pos), ctypes.byref(c_state), ctypes.byref(c_restored),
    )
    return int(c_restored.value), (c_state.value, int(c_restored.value),
                                   c_pos.value)
