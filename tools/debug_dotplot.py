"""Coarse k-mer dot-plot of one read against a reference interval.

Prints matching (read_pos, ref_pos) anchor runs (collinear segments) so we
can see exactly which ref intervals a read covers, on which strand.
"""
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from svjedi_tpu.io.fasta import read_fasta

TESTDIR = "/root/reference/test-dir"
K = 16


def revcomp(s):
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


def main():
    rid = int(sys.argv[1])
    chrom = sys.argv[2]
    lo, hi = int(sys.argv[3]), int(sys.argv[4])
    ref = read_fasta(f"{TESTDIR}/reference_genome.fasta")[chrom][lo:hi]

    with gzip.open(f"{TESTDIR}/simulated_reads.fastq.gz", "rt") as fh:
        lines = fh.read().splitlines()
    seq = lines[rid * 4 + 1].upper()
    print(lines[rid * 4][:120])

    pos = {}
    for i in range(len(ref) - K + 1):
        pos.setdefault(ref[i : i + K], []).append(i)

    for orient, s in (("+", seq), ("-", revcomp(seq))):
        # collect anchors, then merge into collinear runs (same diag +-32)
        anchors = []
        for i in range(len(s) - K + 1):
            for j in pos.get(s[i : i + K], []):
                anchors.append((j - i, i, j))
        if not anchors:
            continue
        anchors.sort()
        runs = []
        for d, i, j in anchors:
            if runs and abs(d - runs[-1][0]) <= 64 and i >= runs[-1][2]:
                r = runs[-1]
                runs[-1] = (d, r[1], i, r[3], j, r[5] + 1)
            else:
                runs.append((d, i, i, j, j, 1))
        runs = [r for r in runs if r[5] >= 5]
        runs.sort(key=lambda r: r[1])
        for d, i0, i1, j0, j1, n in runs:
            print(
                f"  {orient} read[{i0}..{i1 + K}] ~ {chrom}:[{lo + j0}..{lo + j1 + K}]"
                f" diag={d} anchors={n}"
            )


if __name__ == "__main__":
    main()
