"""Which reads truly span a reference junction? k-mer evidence both sides.

For a (chrom, pos) junction, counts each read's exact shared 13-mers with
the 150bp windows left and right of the junction. Reads with hits on BOTH
sides (>= min_hits each) almost surely cross the junction (10% error rate
still leaves ~25% of 13-mers exact).
"""
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from svjedi_tpu.io.fasta import read_fasta

TESTDIR = "/root/reference/test-dir"
K = 13
WIN = 150
MIN_HITS = 6


def kmers(s):
    return {s[i : i + K] for i in range(len(s) - K + 1)}


def revcomp(s):
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


def main():
    chrom, pos = sys.argv[1], int(sys.argv[2])  # pos = 1-based junction POS
    ref = read_fasta(f"{TESTDIR}/reference_genome.fasta")[chrom]
    left = kmers(ref[pos - WIN : pos])
    right = kmers(ref[pos : pos + WIN])

    reads = []
    with gzip.open(f"{TESTDIR}/simulated_reads.fastq.gz", "rt") as fh:
        lines = fh.read().splitlines()
    for i in range(0, len(lines), 4):
        name = lines[i][1:].split(" ")[0]
        meta = lines[i].split(" ", 1)[1]
        seq = lines[i + 1].upper()
        reads.append((name, meta, seq))

    print(f"junction {chrom}:{pos} (0-based split at {pos})")
    n_cross = 0
    for rid, (name, meta, seq) in enumerate(reads):
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
