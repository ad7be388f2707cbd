"""Worker process for the multihost integration test.

Launched N times by tests/test_multihost.py with argv:
    multihost_worker.py <coordinator> <num_processes> <process_id> <outdir>

Each process runs the same program (the SURVEY.md §5.8 contract): encode a
shared deterministic corpus with encode_stream_multihost, decode it back
with decode_stream_multihost, and write both digests + the stream length to
<outdir>/out_<pid>.json.  The test asserts every process produced the same
stream as a single-process run.
"""

import hashlib
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2",
)

import numpy as np


def main():
    coordinator, nproc, pid, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_platforms", "cpu")
    from libhuffman_tpu.parallel import multihost

    multihost.initialize(coordinator, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()

    rng = np.random.default_rng(11)
    data = rng.choice(
        np.frombuffer(b"abcdefgh \n", np.uint8), 40_000
    ).astype(np.uint8).tobytes()

    # Sizes-only path first (SURVEY.md §5.8 option (b)): cross-host
    # traffic for the split itself is 8 bytes/process; record DCN bytes.
    seg, off, total = multihost.encode_stream_multihost_local(data, 4096)
    dcn_local = multihost.DCN_BYTES

    stream = multihost.encode_stream_multihost(data, 4096)

    # Decode sizes-only path: only candidate offsets + (off, consumed,
    # produced) tables cross hosts; decoded bytes stay rank-local.
    dcn_before_dec = multihost.DCN_BYTES
    dseg, doff, dtotal = multihost.decode_stream_multihost_local(stream)
    dcn_decode_local = multihost.DCN_BYTES - dcn_before_dec

    plain = multihost.decode_stream_multihost(stream)

    # The local segments must be exactly the slices at their offsets.
    seg_ok = stream[off : off + len(seg)] == seg and total == len(stream)
    dseg_ok = (plain[doff : doff + len(dseg)] == dseg
               and dtotal == len(plain))

    with open(os.path.join(outdir, f"out_{pid}.json"), "w") as f:
        json.dump({
            "stream_len": len(stream),
            "stream_sha": hashlib.sha256(stream).hexdigest(),
            "plain_ok": plain == data,
            "seg_ok": seg_ok,
            "dseg_ok": dseg_ok,
            "dseg_len": len(dseg),
            "dcn_sizes_only": dcn_local,
            "dcn_decode_local": dcn_decode_local,
            "dcn_total": multihost.DCN_BYTES,
        }, f)


if __name__ == "__main__":
    main()
