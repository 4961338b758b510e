"""File-format layer: FASTA / FASTQ(.gz) / VCF / GFA / GAF.

Pure-Python/numpy on the host (SURVEY §7.1); the FASTQ hot path has a native
C++ (zlib) implementation in ``native/fastio.cpp`` with a Python fallback.
"""
