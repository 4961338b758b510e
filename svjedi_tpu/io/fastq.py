"""FASTQ(.gz) reading.

The reference never reads FASTQ in Python — gzipped reads are decompressed
inside minigraph (SURVEY §2.1.2, svjedi-graph.py:104). Our aligner is
in-process, so we need a fast reader: the native C++ path
(``native/fastio.cpp``, zlib) is used when its shared library has been built,
else a pure-Python fallback. Both return identical results.

Multiple comma-separated FASTQ files are concatenated in order, matching the
orchestrator's sequential mapping into one GAF (svjedi-graph.py:95-105).
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass
from pathlib import Path
from typing import Iterable, List, Sequence, Union

import numpy as np

from ..utils.native import load_native


@dataclass
class ReadSet:
    """A batch of reads: names plus 2-bit-friendly int8 codes.

    ``codes`` is a flat ``int8`` array over all reads (A,C,G,T -> 0..3,
    anything else -> 4); ``offsets[i]:offsets[i+1]`` delimits read ``i``.
    """

    names: List[str]
    codes: np.ndarray  # int8, concatenated
    offsets: np.ndarray  # int64, len = n_reads + 1

    @property
    def n_reads(self) -> int:
        return len(self.names)

    @property
    def lengths(self) -> np.ndarray:
        return np.diff(self.offsets)

    def seq(self, i: int) -> np.ndarray:
        return self.codes[self.offsets[i] : self.offsets[i + 1]]

    def slice(self, start: int, stop: int) -> "ReadSet":
        """Zero-copy view of reads [start, stop) with rebased offsets."""
        lo, hi = self.offsets[start], self.offsets[stop]
        return ReadSet(
            names=self.names[start:stop],
            codes=self.codes[lo:hi],
            offsets=self.offsets[start : stop + 1] - lo,
        )


# ASCII -> code lookup: A/a=0 C/c=1 G/g=2 T/t=3, everything else 4.
_LUT = np.full(256, 4, dtype=np.int8)
for _i, _b in enumerate(b"ACGT"):
    _LUT[_b] = _i
    _LUT[_b + 32] = _i  # lowercase


def encode_ascii(seq: Union[bytes, str]) -> np.ndarray:
    """Encode an ASCII nucleotide string to int8 codes (N and others -> 4)."""
    if isinstance(seq, str):
        seq = seq.encode()
    return _LUT[np.frombuffer(seq, dtype=np.uint8)]


def _read_fastq_python(path: Path) -> Iterable[tuple]:
    opener = gzip.open if path.suffix == ".gz" else open
    with opener(path, "rb") as fh:
        while True:
            header = fh.readline()
            if not header:
                break
            seq = fh.readline().rstrip()
            fh.readline()  # '+'
            fh.readline()  # quals
            name = header[1:].split()[0].decode()
            yield name, seq


def _read_fasta_reads_python(path: Path) -> Iterable[tuple]:
    opener = gzip.open if path.suffix == ".gz" else open
    name, parts = None, []
    with opener(path, "rb") as fh:
        for line in fh:
            if line.startswith(b">"):
                if name is not None:
                    yield name, b"".join(parts)
                name = line[1:].split()[0].decode()
                parts = []
            else:
                parts.append(line.strip())
    if name is not None:
        yield name, b"".join(parts)


def _is_fasta(path: Path) -> bool:
    opener = gzip.open if path.suffix == ".gz" else open
    with opener(path, "rb") as fh:
        first = fh.read(1)
    return first == b">"


def read_reads(paths: Union[str, Sequence[Union[str, Path]]]) -> ReadSet:
    """Load long reads from FASTQ/FASTA(.gz) file(s).

    Accepts a single path, a comma-separated string (reference CLI contract,
    svjedi-graph.py:95-98), or a sequence of paths.
    """
    if isinstance(paths, (str, Path)):
        paths = [p for p in str(paths).split(",") if p]

    native = load_native()
    names: List[str] = []
    chunks: List[np.ndarray] = []
    lengths: List[int] = []

    for p in paths:
        p = Path(p)
        if native is not None:
            result = native.read_sequences(str(p))
            if result is not None:
                f_names, f_codes, f_offsets = result
                names.extend(f_names)
                chunks.append(f_codes)
                lengths.extend(np.diff(f_offsets).tolist())
                continue
        it = _read_fasta_reads_python(p) if _is_fasta(p) else _read_fastq_python(p)
        for name, seq in it:
            names.append(name)
            codes = encode_ascii(seq)
            chunks.append(codes)
            lengths.append(len(codes))

    codes = np.concatenate(chunks) if chunks else np.zeros(0, dtype=np.int8)
    offsets = np.zeros(len(names) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return ReadSet(names=names, codes=codes, offsets=offsets)
