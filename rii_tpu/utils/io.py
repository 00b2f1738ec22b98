"""TexMex dataset readers (fvecs / ivecs / bvecs).

Format (same as the reference benchmarks read via Faiss-style utilities,
/root/reference/examples/benchmark/util.py:5-58): every vector is stored as a
little-endian int32 dimension d followed by d payload elements (f32 / i32 / u8).

A zero-copy mmap path here; the C++ native loader (rii_tpu.native) accelerates
the SIFT1B-scale streaming case.
"""

import numpy as np

from rii_tpu import native as _native


def fvecs_read(fname, count=None, offset=0):
    """Read (N, D) float32 from an .fvecs file."""
    if _native.available():
        return _native.texmex_read(fname, "f", offset=offset, count=count)
    x = np.memmap(fname, dtype=np.int32, mode="r")
    d = int(x[0])
    rec = d + 1
    total = x.shape[0] // rec
    n = total - offset if count is None else min(count, total - offset)
    out = x[offset * rec : (offset + n) * rec].reshape(n, rec)[:, 1:]
    return out.view(np.float32).copy()


def ivecs_read(fname, count=None, offset=0):
    """Read (N, D) int32 from an .ivecs file (ground-truth neighbor lists)."""
    if _native.available():
        return _native.texmex_read(fname, "i", offset=offset, count=count)
    x = np.memmap(fname, dtype=np.int32, mode="r")
    d = int(x[0])
    rec = d + 1
    total = x.shape[0] // rec
    n = total - offset if count is None else min(count, total - offset)
    return x[offset * rec : (offset + n) * rec].reshape(n, rec)[:, 1:].copy()


def bvecs_read_batches(fname, batch_size, count=None):
    """Stream (B, D) uint8 batches from a .bvecs file (SIFT1B-scale ingestion,
    parity with /root/reference/examples/benchmark/run_sift1b.py:89-94)."""
    if _native.available():
        _, total = _native.texmex_probe(fname, "b")
        n = total if count is None else min(count, total)
        for s in range(0, n, batch_size):
            yield _native.texmex_read(fname, "b", offset=s,
                                      count=min(batch_size, n - s))
        return
    raw = np.memmap(fname, dtype=np.uint8, mode="r")
    d = int(np.frombuffer(raw[:4].tobytes(), dtype=np.int32)[0])
    rec = 4 + d
    total = raw.shape[0] // rec
    n = total if count is None else min(count, total)
    for s in range(0, n, batch_size):
        ln = min(batch_size, n - s)
        chunk = raw[s * rec : (s + ln) * rec].reshape(ln, rec)[:, 4:]
        yield np.ascontiguousarray(chunk)
