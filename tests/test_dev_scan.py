"""On-device minimizer scan == native scan (align/dev_scan.py).

The jitted XLA scan must reproduce the native per-read emission set —
same positions, hashes, strands, in the same (read-major, position-
sorted) order — including the bitmap prefilter, N invalidation,
palindrome drops, and read-boundary isolation. Reads shorter than
k+w-1 are merged from the host fallback inside fetch_minimizers.
"""

import numpy as np
import pytest

from svjedi_tpu.align import dev_scan
from svjedi_tpu.align import device as dev
from svjedi_tpu.utils.native import load_native


def _encode(seq: str) -> np.ndarray:
    lut = {b: i for i, b in enumerate("ACGT")}
    return np.array([lut.get(c, 4) for c in seq], dtype=np.int8)


class _FakePanel:
    paths = []


def _device_scan(reads, k, w, bitmap, bitmap_log2, native):
    import jax.numpy as jnp

    codes = np.concatenate(reads) if reads else np.zeros(0, np.int8)
    offsets = np.concatenate(
        [[0], np.cumsum([len(r) for r in reads])]
    ).astype(np.int64)
    dd = dev.upload(codes, _FakePanel(), {}, offsets=offsets)
    bm = bitmap if bitmap is not None else np.full(
        1 << (bitmap_log2 - 3), 0xFF, np.uint8
    )
    out = dev_scan.dispatch_scan(dd, jnp.asarray(bm), k, w, bitmap_log2)
    return dev_scan.fetch_minimizers(
        out, codes, offsets, k, w, bitmap, bitmap_log2, native=native
    )


@pytest.mark.parametrize("k,w", [(15, 10), (11, 5)])
def test_device_scan_matches_native(k, w):
    native = load_native()
    if native is None:
        pytest.skip("native library not built")
    rng = np.random.default_rng(11)
    reads = []
    for ln in [5, k - 1, k, k + 1, k + w - 2, k + w - 1, 200, 1999, 7777]:
        reads.append(rng.integers(0, 4, ln).astype(np.int8))
    nread = rng.integers(0, 4, 500).astype(np.int8)
    nread[:25] = 4
    nread[200:260] = 4
    nread[-3:] = 4
    reads.append(nread)
    reads.append(np.full(60, 4, dtype=np.int8))
    reads.append(_encode("AT" * 200))
    reads.append(_encode("ACGT" * 300))

    codes = np.concatenate(reads)
    offsets = np.concatenate(
        [[0], np.cumsum([len(r) for r in reads])]
    ).astype(np.int64)
    exp = native.minimizers(codes, offsets, k, w, n_threads=2)
    got = _device_scan(reads, k, w, None, 20, native)
    assert got is not None
    for name, g, e in zip(("read", "pos", "hash", "strand"), got, exp):
        np.testing.assert_array_equal(g, e, err_msg=name)


def test_device_scan_bitmap_filter_matches_native():
    native = load_native()
    if native is None:
        pytest.skip("native library not built")
    k, w, log2 = 15, 10, 20
    rng = np.random.default_rng(3)
    reads = [rng.integers(0, 4, 3000).astype(np.int8) for _ in range(8)]
    codes = np.concatenate(reads)
    offsets = np.concatenate(
        [[0], np.cumsum([len(r) for r in reads])]
    ).astype(np.int64)
    # Bitmap keeping ~1/16 of hash space.
    bitmap = np.zeros(1 << (log2 - 3), np.uint8)
    bitmap[rng.integers(0, len(bitmap), len(bitmap) // 16)] = 0xFF
    exp = native.minimizers(
        codes, offsets, k, w, bitmap=bitmap, bitmap_log2=log2, n_threads=2
    )
    got = _device_scan(reads, k, w, bitmap, log2, native)
    assert got is not None
    for name, g, e in zip(("read", "pos", "hash", "strand"), got, exp):
        np.testing.assert_array_equal(g, e, err_msg=name)


def test_device_scan_testdir_reads_full_parity(tmp_path):
    """Production shapes: the reference test-dir read set, merged-index
    bitmap, against the native scan the pipeline used before."""
    from pathlib import Path

    from svjedi_tpu.io.fastq import read_reads

    native = load_native()
    if native is None:
        pytest.skip("native library not built")
    fq = Path("/root/reference/test-dir/simulated_reads.fastq.gz")
    if not fq.exists():
        pytest.skip("reference test-dir not available")
    reads = read_reads(str(fq))
    k, w, log2 = 15, 10, 24
    rng = np.random.default_rng(5)
    bitmap = np.zeros(1 << (log2 - 3), np.uint8)
    bitmap[rng.integers(0, len(bitmap), len(bitmap) // 8)] = rng.integers(
        1, 256, len(bitmap) // 8
    ).astype(np.uint8)
    exp = native.minimizers(
        reads.codes, reads.offsets, k, w, bitmap=bitmap, bitmap_log2=log2,
        n_threads=2,
    )
    per_read = [
        reads.codes[reads.offsets[i]: reads.offsets[i + 1]]
        for i in range(reads.n_reads)
    ]
    got = _device_scan(per_read, k, w, bitmap, log2, native)
    assert got is not None
    for name, g, e in zip(("read", "pos", "hash", "strand"), got, exp):
        np.testing.assert_array_equal(g, e, err_msg=name)
