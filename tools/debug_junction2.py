"""Which reads span an arbitrary oriented junction? k-mer evidence.

Usage: debug_junction2.py CHROM LSTART LEND LSTRAND CHROM RSTART REND RSTRAND
Coords 1-based inclusive; strand +/-. The junction sequence is
left-window (oriented) followed by right-window (oriented). Reads with
>= MIN_HITS shared 13-mers against BOTH windows (same read orientation)
are listed.
"""
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from svjedi_tpu.io.fasta import read_fasta

TESTDIR = "/root/reference/test-dir"
K = 13
MIN_HITS = 6


def kmers(s):
    return {s[i : i + K] for i in range(len(s) - K + 1)}


def revcomp(s):
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


def main():
    a = sys.argv[1:]
    ref = read_fasta(f"{TESTDIR}/reference_genome.fasta")
    lw = ref[a[0]][int(a[1]) - 1 : int(a[2])]
    if a[3] == "-":
        lw = revcomp(lw)
    rw = ref[a[4]][int(a[5]) - 1 : int(a[6])]
    if a[7] == "-":
        rw = revcomp(rw)
    left, right = kmers(lw), kmers(rw)

    with gzip.open(f"{TESTDIR}/simulated_reads.fastq.gz", "rt") as fh:
        lines = fh.read().splitlines()
    n_cross = 0
    for rid in range(len(lines) // 4):
        name = lines[rid * 4][1:].split(" ")[0]
        meta = lines[rid * 4].split(" ", 1)[1]
        seq = lines[rid * 4 + 1].upper()
        best = None
        for orient, s in (("+", seq), ("-", revcomp(seq))):
            ks = kmers(s)
            l, r = len(left & ks), len(right & ks)
            if best is None or (l + r) > (best[1] + best[2]):
                best = (orient, l, r)
        o, l, r = best
        if l >= MIN_HITS and r >= MIN_HITS:
            n_cross += 1
            md = dict(kv.split("=", 1) for kv in meta.split(";"))
            print(
                f"  read {rid:>4} {name} {o} L={l} R={r} "
                f"truth={md['chromosome']}:{md['startpos']}+{md['length']}"
            )
    print(f"total crossing: {n_cross}")


if __name__ == "__main__":
    main()
