"""Device-resident alignment engine: fused window fetch + DP.

HBM-bandwidth-first design: the flat read codes (forward ++ whole-array
reverse complement) and the sentinel-padded flat panel sequence are uploaded
to the device once per read chunk; each DP batch is described by five int32
metadata vectors, and windows are fetched on the device — via async DMA
inside the Pallas kernel on TPU (kernels/band_dp_dma.py), or an XLA gather
on CPU. Host↔device traffic per batch is kilobytes.

Layout invariants (shared by both engines):
- ``reads2`` = fwd codes ++ revcomp codes ++ sentinel bases; reverse-strand
  windows are addressed inside the rc half with positive stride (rc of read
  r with offsets [o_r, o_r+1) starts at 2N - o_{r+1}). N is the forward-half
  length *after* padding the codes up to a coarse shape class (so chunk-size
  jitter does not mint new compiled shapes); the A-padding tail is masked by
  the per-problem window length ``m``.
- ``panel_padded`` = pad ++ panel ++ pad with pad >= max_window + 2*ALIGN,
  so window fetches (including the DMA kernel's tile-aligned coarse spans)
  are always in range; per-path validity is enforced from absolute
  [t_lo, t_hi) bounds.
- both buffers' total lengths are multiples of the Mosaic 1-D int8 tile
  (kernels/band_dp_dma.ALIGN).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .extend import DPParams, band_dp_batch


@dataclass
class DeviceData:
    reads2: jnp.ndarray  # int8 (2N + pad,)
    panel_padded: jnp.ndarray  # int8 (pad + total + pad,)
    panel_start: np.ndarray  # int64 per-path start into panel_padded (host)
    panel_len: np.ndarray  # int64 per-path length (host)
    n_bases: int  # N (forward half length)
    pad: int
    #: 2-bit-packed (words, rn, pw, pn) of reads2 and panel_padded, computed
    #: ONCE at upload: the v3 window prep needs packed buffers, and packing
    #: a ~100 MB chunk inside every per-batch prep jit re-did O(total bases)
    #: work per dispatch (fwd and rev) instead of per chunk.
    packed: tuple = None  # (rw, rn, pw, pn)
    #: Read-boundary offsets on device ((R+1,) int32) + true code count —
    #: set when upload() was given ``offsets`` (folded into the codes
    #: transfer: the tunnel charges per transfer, not per byte). Consumed
    #: by the on-device minimizer scan (align/dev_scan.py).
    offsets32: jnp.ndarray = None
    n_codes: int = 0

    def packed_words(self) -> tuple:
        """The (rw, rn, pw, pn) word buffers; raises if not built by upload()."""
        if self.packed is None:
            raise ValueError(
                "DeviceData.packed is unset: construct DeviceData via "
                "device.upload() (the v3 engine needs the 2-bit word "
                "buffers packed at upload time)"
            )
        return self.packed


@functools.partial(jax.jit, static_argnames=("n", "pad", "packed"))
def _expand_reads(payload: jnp.ndarray, n: int, pad: int, packed: bool):
    """Build the fwd ++ revcomp ++ sentinel read layout on device."""
    if packed:
        idx = jnp.arange(n, dtype=jnp.int32)
        byte = jnp.take(payload, idx >> 2)
        shift = ((idx & 3) * 2).astype(jnp.uint8)
        codes = ((byte >> shift) & 3).astype(jnp.int8)
    else:
        codes = payload
    flipped = jnp.flip(codes)
    rc = jnp.where(flipped < 4, 3 - flipped, flipped).astype(jnp.int8)
    sentinel = jnp.full((pad,), 4, jnp.int8)
    return jnp.concatenate([codes, rc, sentinel])


@functools.partial(jax.jit, static_argnames=("n_cap", "pad"))
def _expand_reads_raw(codes: jnp.ndarray, n_cap: int, pad: int):
    """fwd ++ revcomp ++ sentinel layout from raw (unpadded) codes.

    Shape-class padding happens ON DEVICE: host-side packing/padding of a
    ~100 MB chunk costs seconds of numpy, while the raw int8 transfer plus
    this trivially-fused expansion is tens of ms. The raw-length retrace is
    XLA-only (cheap); everything downstream sees only the n_cap class.
    """
    n = codes.shape[0]
    codes = jnp.concatenate(
        [codes, jnp.zeros((n_cap - n,), jnp.int8)]
    )
    flipped = jnp.flip(codes)
    rc = jnp.where(flipped < 4, 3 - flipped, flipped).astype(jnp.int8)
    sentinel = jnp.full((pad,), 4, jnp.int8)
    return jnp.concatenate([codes, rc, sentinel])


@functools.partial(jax.jit, static_argnames=("n_codes", "n_cap", "pad"))
def _expand_reads_payload(payload: jnp.ndarray, n_codes: int, n_cap: int,
                          pad: int):
    """fwd ++ revcomp ++ sentinel layout from a codes+offsets payload.

    ``payload`` = raw int8 codes (n_codes) followed by the read-offset
    table's little-endian int32 bytes; the offsets ride the same transfer
    (see :func:`upload`) and are unpacked by :func:`_payload_offsets`.
    """
    codes = payload[:n_codes]
    codes = jnp.concatenate([codes, jnp.zeros((n_cap - n_codes,), jnp.int8)])
    flipped = jnp.flip(codes)
    rc = jnp.where(flipped < 4, 3 - flipped, flipped).astype(jnp.int8)
    sentinel = jnp.full((pad,), 4, jnp.int8)
    return jnp.concatenate([codes, rc, sentinel])


@functools.partial(jax.jit, static_argnames=("n_codes", "n_off"))
def _payload_offsets(payload: jnp.ndarray, n_codes: int, n_off: int):
    """Bitcast the payload's offset-table tail back to (n_off,) int32."""
    raw = payload[n_codes : n_codes + 4 * n_off]
    return jax.lax.bitcast_convert_type(raw.reshape(n_off, 4), jnp.int32)


def _pack_2bit(codes: np.ndarray) -> np.ndarray:
    pad = (-len(codes)) % 4
    padded = np.concatenate([codes, np.zeros(pad, np.int8)]).astype(np.uint8)
    quads = padded.reshape(-1, 4)
    return (
        quads[:, 0]
        | (quads[:, 1] << 2)
        | (quads[:, 2] << 4)
        | (quads[:, 3] << 6)
    ).astype(np.uint8)


#: Mosaic 1-D int8 tile (see kernels/band_dp_dma.ALIGN): buffer lengths are
#: padded to multiples of this so tile-aligned DMA spans stay in range.
ALIGN = 1024
#: Reads-buffer shape-class granule: the forward-half length is rounded up
#: to a multiple of this, so per-chunk base-count jitter maps to a handful
#: of compiled shapes instead of one per chunk (compiles through the TPU
#: tunnel cost seconds each).
SHAPE_GRANULE = 1 << 19


def upload(
    reads_codes: np.ndarray,
    panel,
    panel_cache: dict = None,
    max_window: int = 30976,
    device=None,
    offsets: np.ndarray = None,
) -> DeviceData:
    """Upload a read chunk + panel to the device (panel cached across chunks).

    Reads are 2-bit packed before transfer (4x less tunnel/PCIe traffic)
    when N-free; the device unpacks and builds the fwd++rc layout.
    ``device`` pins the buffers to one chip of a multi-device mesh (the
    data-parallel chunk round-robin, align/pipeline.py); callers then keep
    one ``panel_cache`` per device. None = the default device.
    """
    import jax

    put = (lambda x: jax.device_put(x, device)) if device is not None else (
        jnp.asarray
    )
    pad = max_window + 4 * ALIGN
    if panel_cache is not None and "flat" in panel_cache:
        panel_padded = panel_cache["flat"]
        starts = panel_cache["starts"]
        lens = panel_cache["lens"]
        pw, pn = panel_cache["words"]
    else:
        lens = np.array([p.length for p in panel.paths], dtype=np.int64)
        starts = np.zeros(len(lens), dtype=np.int64)
        if len(lens):
            np.cumsum(lens[:-1], out=starts[1:])
        starts += pad
        total = pad + int(lens.sum()) + pad
        total += (-total) % ALIGN
        flat = np.full(total, 4, dtype=np.int8)
        pos = pad
        for p in panel.paths:
            flat[pos : pos + p.length] = p.seq
            pos += p.length
        panel_padded = put(flat)
        pw, pn = _pack_words_jit(panel_padded)
        if panel_cache is not None:
            panel_cache["flat"] = panel_padded
            panel_cache["starts"] = starts
            panel_cache["lens"] = lens
            panel_cache["words"] = (pw, pn)

    n = len(reads_codes)
    # Shape classes must be COARSE: every distinct reads2 length re-lowers
    # every jit that takes it (cheap XLA for the v3 prep, but a 20-60 s
    # Mosaic compile for kernels with reads2 in their signature). Powers of
    # two above a floor bound the class count logarithmically; <=2x buffer
    # waste is noise next to one avoided recompile.
    n_cap = 1 << max(12, (max(n, 1) - 1).bit_length())
    # Sentinel tail sized so the total is ALIGN-aligned (2*n_cap + pad_tot).
    pad_tot = pad + (-(2 * n_cap + pad)) % ALIGN
    offsets32 = None
    if offsets is not None:
        # Fold the read-boundary table into the codes transfer (one h2d
        # instead of two; the tunnel charges ~40 ms per transfer): payload
        # = codes ++ int32-LE offset bytes, split back apart on device.
        off32 = np.ascontiguousarray(offsets, dtype="<i4")
        payload = put(
            np.concatenate([reads_codes, off32.view(np.int8)])
        )
        reads2 = _expand_reads_payload(
            payload, n_codes=n, n_cap=n_cap, pad=pad_tot
        )
        offsets32 = _payload_offsets(payload, n_codes=n, n_off=len(off32))
    else:
        reads2 = _expand_reads_raw(
            put(reads_codes), n_cap=n_cap, pad=pad_tot
        )
    rw, rn = _pack_words_jit(reads2)
    return DeviceData(
        reads2=reads2,
        panel_padded=panel_padded,
        panel_start=starts,
        panel_len=lens,
        n_bases=n_cap,
        pad=pad,
        packed=(rw, rn, pw, pn),
        offsets32=offsets32,
        n_codes=n,
    )


def device_of(data: DeviceData):
    """The device a production upload is pinned to (None when uncommitted)."""
    return getattr(data.reads2, "device", None)


#: Row order of the packed metadata matrix consumed by
#: :func:`window_score_packed`.
META_ROWS = ("q_start", "m", "t_start", "t_lo", "t_hi")
#: Column order of its packed (P, 5) int32 result.
OUT_COLS = ("score", "qs", "ts", "qe", "te")


def _pack_words(codes: jnp.ndarray):
    """2-bit-pack a code array (length % 32 == 0) on device.

    Returns (words, nwords): ``words`` packs 16 bases per uint32 (sentinel
    bases packed as 0), ``nwords`` packs 32 sentinel flags per uint32.
    Gathering words instead of bytes makes window assembly a ~4 ms dense op
    instead of a ~70 ms byte gather (XLA gathers cost per element).
    """
    c = codes.astype(jnp.int32)
    base = jnp.where(c < 4, c, 0).astype(jnp.uint32).reshape(-1, 16)
    shifts16 = (jnp.arange(16, dtype=jnp.uint32) * 2)[None, :]
    words = jnp.sum(base << shifts16, axis=1, dtype=jnp.uint32)
    nbit = (c == 4).astype(jnp.uint32).reshape(-1, 32)
    shifts32 = jnp.arange(32, dtype=jnp.uint32)[None, :]
    nwords = jnp.sum(nbit << shifts32, axis=1, dtype=jnp.uint32)
    return words, nwords


#: Once-per-upload packing entry point (see DeviceData.packed).
_pack_words_jit = jax.jit(_pack_words)


def _gather_window_T(words, nwords, start, n_rows: int):
    """Gather (P,) windows of n_rows bases -> (n_rows, P) int8 transposed.

    ``start`` may be any byte offset; phase realignment combines adjacent
    words. Sentinel (N/pad) bases decode to 4 via the nwords bitmask.
    """
    start = start.astype(jnp.int32)
    P = start.shape[0]
    W = n_rows // 16
    word0 = start >> 4
    ph = (start & 15).astype(jnp.uint32) * 2
    cols = jnp.arange(W + 1, dtype=jnp.int32)[None, :]
    widx = jnp.clip(word0[:, None] + cols, 0, words.shape[0] - 1)
    wv = jnp.take(words, widx.reshape(-1)).reshape(P, W + 1)
    lo = wv[:, :-1] >> ph[:, None]
    hi = jnp.where(
        ph[:, None] == 0, jnp.uint32(0), wv[:, 1:] << (32 - ph[:, None])
    )
    aligned = lo | hi
    shifts = (jnp.arange(16, dtype=jnp.uint32) * 2)[None, None, :]
    bases = ((aligned[:, :, None] >> shifts) & 3).astype(jnp.int8)
    q = bases.reshape(P, n_rows)

    Wn = n_rows // 32
    nword0 = start >> 5
    phn = (start & 31).astype(jnp.uint32)
    ncols = jnp.arange(Wn + 1, dtype=jnp.int32)[None, :]
    nidx = jnp.clip(nword0[:, None] + ncols, 0, nwords.shape[0] - 1)
    nv = jnp.take(nwords, nidx.reshape(-1)).reshape(P, Wn + 1)
    nlo = nv[:, :-1] >> phn[:, None]
    nhi = jnp.where(
        phn[:, None] == 0, jnp.uint32(0), nv[:, 1:] << (32 - phn[:, None])
    )
    naligned = nlo | nhi
    nshifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    nmask = (((naligned[:, :, None] >> nshifts) & 1) == 1).reshape(P, n_rows)
    return jnp.where(nmask, jnp.int8(4), q).T


def _prep_v3_windows(reads2, panel_padded, meta, bucket: int, band: int):
    """Transposed, sentinel-masked window matrices (test/reference path).

    Production dispatch uses :func:`_prep_v3_windows_packed` with buffers
    packed once at upload; this variant packs inline."""
    rw, rn = _pack_words(reads2)
    pw, pn = _pack_words(panel_padded)
    return _prep_v3_windows_packed(rw, rn, pw, pn, meta, bucket, band)


def _prep_v3_windows_packed(rw, rn, pw, pn, meta, bucket: int, band: int):
    """Window matrices for the v3 kernel from pre-packed word buffers."""
    q_start, m, t_start, t_lo, t_hi = (meta[i] for i in range(5))
    qT = _gather_window_T(rw, rn, q_start, bucket)
    rows = jnp.arange(bucket, dtype=jnp.int32)[:, None]
    qT = jnp.where(rows < m[None, :], qT, jnp.int8(4))
    tT = _gather_window_T(pw, pn, t_start, bucket + band)
    trows = jnp.arange(bucket + band, dtype=jnp.int32)[:, None]
    t_pos = t_start[None, :] + trows
    tvalid = (t_pos >= t_lo[None, :]) & (t_pos < t_hi[None, :])
    return qT, jnp.where(tvalid, tT, jnp.int8(4))


#: The prep is jitted SEPARATELY from the Pallas kernel: the prep's
#: signature contains the packed read buffer (whose length varies by
#: chunk-size class — a cheap XLA re-lower), while the kernel jit sees only
#: the (bucket, P) window matrices whose shape classes are stable, so a new
#: chunk size never triggers a 20-60 s Mosaic recompile.
_prep_v3_windows_packed_jit = functools.partial(
    jax.jit, static_argnames=("bucket", "band")
)(_prep_v3_windows_packed)


def window_score_v3_fwd(
    data: DeviceData,
    meta: jnp.ndarray,  # (5, P) int32, rows per META_ROWS
    bucket: int,
    band: int,
    params: DPParams,
    n_valid=None,
) -> jnp.ndarray:
    """v3 forward pass: (P, 3) int32 [score, qe, te] in window coords."""
    from ..kernels.band_dp_v3 import band_dp_v3_fwd_jit

    rw, rn, pw, pn = data.packed_words()
    qT, tT = _prep_v3_windows_packed_jit(
        rw, rn, pw, pn, meta, bucket=bucket, band=band
    )
    return band_dp_v3_fwd_jit(qT, tT, bucket, band, params, n_valid)


def window_score_v3_rev(
    data: DeviceData,
    meta: jnp.ndarray,  # (5, P): q_start, m'=qe+1, t_start, t_lo, t_hi'
    bucket: int,
    band: int,
    params: DPParams,
    n_valid=None,
) -> jnp.ndarray:
    """v3 reverse pass on end-clamped windows: (P, 3) [score, qs, ts]."""
    from ..kernels.band_dp_v3 import band_dp_v3_rev_jit

    rw, rn, pw, pn = data.packed_words()
    qT, tT = _prep_v3_windows_packed_jit(
        rw, rn, pw, pn, meta, bucket=bucket, band=band
    )
    return band_dp_v3_rev_jit(qT, tT, bucket, band, params, n_valid)


# ---- flat-metadata dispatch (production path) ----
#
# The TPU tunnel charges ~30-50 ms PER host→device transfer regardless of
# size, and the per-batch dispatch path used two of them (the (5, Ppad)
# meta matrix and the n_valid scalar). The flat path ships ONE int32 buffer
# per dispatch round holding every batch's block ``[n_valid, meta(5*Ppad)]``
# back to back; each batch's prep slices its block at a STATIC offset (the
# block layout is deterministic, so offset variants are a handful of cheap
# XLA re-lowers, while the Mosaic kernel jit still sees only stable
# (bucket, P) shapes).


def _prep_v3_flat(rw, rn, pw, pn, flat, off, Ppad: int,
                  bucket: int, band: int):
    """Slice one batch block out of the flat buffer.

    ``off`` is a TRACED scalar (block offsets are running sums of preceding
    block lengths, which vary with the per-round bucket/Ppad mix — a static
    offset would re-lower this program once per distinct offset on
    heterogeneous workloads); only the shape-bearing Ppad/bucket/band stay
    static."""
    grid = Ppad // 128
    off = jnp.asarray(off, jnp.int32)
    nvb = jax.lax.dynamic_slice_in_dim(flat, off, 1 + grid)
    meta = jax.lax.dynamic_slice_in_dim(
        flat, off + 1 + grid, 5 * Ppad
    ).reshape(5, Ppad)
    qT, tT = _prep_v3_windows_packed(rw, rn, pw, pn, meta, bucket, band)
    return qT, tT, nvb


_prep_v3_flat_jit = functools.partial(
    jax.jit, static_argnames=("Ppad", "bucket", "band")
)(_prep_v3_flat)


def flat_block_len(Ppad: int) -> int:
    """Length of one flat block: [n_valid] ++ bounds ++ meta."""
    return 1 + Ppad // 128 + 5 * Ppad


def flat_meta_block(
    meta: np.ndarray, n_valid: int, row_bounds: np.ndarray = None
) -> np.ndarray:
    """Host-side block for one batch: [n_valid] ++ row_bounds ++ meta.

    ``row_bounds`` is the per-128-problem-group max window length (the
    kernel's per-step row loop bound); when None every step runs all rows
    (the m row of the meta is used as the bound source: max per group)."""
    Ppad = meta.shape[1]
    grid = Ppad // 128
    if row_bounds is None:
        row_bounds = meta[1].reshape(grid, 128).max(axis=1)
    return np.concatenate(
        [
            np.array([n_valid], np.int32),
            row_bounds.astype(np.int32),
            meta.ravel().astype(np.int32),
        ]
    )


def upload_flat_meta(blocks, device=None) -> "jnp.ndarray":
    """Concatenate batch blocks and upload with ONE transfer.

    The total length is padded to a power-of-two class so the flat buffer
    re-lowers the prep jit only O(log) times across workloads."""
    import jax

    flat = np.concatenate(blocks) if blocks else np.zeros(1, np.int32)
    cap = 1 << max(12, (len(flat) - 1).bit_length())
    if cap != len(flat):
        flat = np.concatenate([flat, np.zeros(cap - len(flat), np.int32)])
    if device is not None:
        return jax.device_put(flat, device)
    return jnp.asarray(flat)


def window_score_v3_fwd_flat(
    data: DeviceData,
    flat: jnp.ndarray,
    off: int,
    Ppad: int,
    bucket: int,
    band: int,
    params: DPParams,
) -> jnp.ndarray:
    """v3 forward pass reading its meta block from the flat buffer."""
    from ..kernels.band_dp_v3 import band_dp_v3_fwd_jit

    rw, rn, pw, pn = data.packed_words()
    qT, tT, nv = _prep_v3_flat_jit(
        rw, rn, pw, pn, flat, off=off, Ppad=Ppad, bucket=bucket, band=band
    )
    return band_dp_v3_fwd_jit(qT, tT, bucket, band, params, nv)


def window_score_v3_rev_flat(
    data: DeviceData,
    flat: jnp.ndarray,
    off: int,
    Ppad: int,
    bucket: int,
    band: int,
    params: DPParams,
) -> jnp.ndarray:
    """v3 reverse pass reading its meta block from the flat buffer."""
    from ..kernels.band_dp_v3 import band_dp_v3_rev_jit

    rw, rn, pw, pn = data.packed_words()
    qT, tT, nv = _prep_v3_flat_jit(
        rw, rn, pw, pn, flat, off=off, Ppad=Ppad, bucket=bucket, band=band
    )
    return band_dp_v3_rev_jit(qT, tT, bucket, band, params, nv)


@functools.partial(
    jax.jit, static_argnames=("bucket", "band", "params", "engine")
)
def window_score_packed(
    reads2: jnp.ndarray,
    panel_padded: jnp.ndarray,
    meta: jnp.ndarray,  # (5, P) int32, rows per META_ROWS
    bucket: int,
    band: int,
    params: DPParams,
    engine: str,
) -> jnp.ndarray:
    """Transfer-frugal variant of :func:`window_score`.

    One int32 matrix in, one (P, 5) int32 matrix out (columns per OUT_COLS)
    that the caller keeps on device and transfers in bulk: the TPU tunnel
    charges ~30-50 ms per host↔device array regardless of size, so the
    per-batch 5-vectors-in / 5-slices-out pattern costs ~0.4 s/batch.
    """
    q_start, m, t_start, t_lo, t_hi = (meta[i] for i in range(5))
    if engine == "dma":
        from ..kernels.band_dp_dma import band_dp_dma_raw

        out = band_dp_dma_raw(
            reads2, panel_padded, q_start, t_start, m, t_lo, t_hi,
            bucket=bucket, band=band, params=params,
        )
        return out[:, :5]
    res = window_score(
        reads2, panel_padded, q_start, m, t_start, t_lo, t_hi,
        bucket=bucket, band=band, params=params, engine=engine,
    )
    return jnp.stack([res[c] for c in OUT_COLS], axis=1)


@functools.partial(
    jax.jit, static_argnames=("bucket", "band", "params", "engine")
)
def window_score(
    reads2: jnp.ndarray,
    panel_padded: jnp.ndarray,
    q_start: jnp.ndarray,  # (P,) int32 window start in reads2
    m: jnp.ndarray,  # (P,) int32 read-window length
    t_start: jnp.ndarray,  # (P,) int32 target window lane-0 in panel_padded
    t_lo: jnp.ndarray,  # (P,) int32 first valid index of the path
    t_hi: jnp.ndarray,  # (P,) int32 one-past-last valid index
    bucket: int,
    band: int,
    params: DPParams,
    engine: str,  # "dma" (TPU) or "gather" (CPU/reference)
) -> Dict[str, jnp.ndarray]:
    """Fetch fixed-shape windows on device and run the banded DP."""
    if engine == "dma":
        from ..kernels.band_dp_dma import band_dp_dma

        return band_dp_dma(
            reads2, panel_padded, q_start, t_start, m, t_lo, t_hi,
            bucket=bucket, band=band, params=params,
        )

    cols = jnp.arange(bucket, dtype=jnp.int32)
    qidx = q_start[:, None] + cols[None, :]
    qv = jnp.take(reads2, jnp.clip(qidx, 0, reads2.size - 1))
    q = jnp.where(cols[None, :] < m[:, None], qv, 4).astype(jnp.int8)
    tcols = jnp.arange(bucket + band, dtype=jnp.int32)
    tidx = t_start[:, None] + tcols[None, :]
    tvalid = (tidx >= t_lo[:, None]) & (tidx < t_hi[:, None])
    tv = jnp.take(panel_padded, jnp.clip(tidx, 0, panel_padded.size - 1))
    t = jnp.where(tvalid, tv, 4).astype(jnp.int8)
    return band_dp_batch(q, t, band, params)
