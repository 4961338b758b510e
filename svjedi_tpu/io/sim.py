"""Simulator: genomes, SV truth sets, and noisy long reads.

Self-contained test/bench data generation covering the BASELINE.md simulated
configs (single-chromosome DEL+INS sets up to whole-genome all-type sets with
long noisy reads). The golden end-to-end gate still runs on the reference's
bundled test-dir; this module exists so unit tests and benchmarks don't
depend on external data.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_BASES = "ACGT"


@dataclass
class SimSV:
    chrom: str
    pos: int  # 1-based VCF POS
    svtype: str  # DEL / INS / INV
    length: int
    genotype: str  # "0/0", "0/1", "1/1"
    ins_seq: str = ""

    @property
    def end(self) -> int:
        if self.svtype == "INS":
            return self.pos + 1
        return self.pos + self.length


@dataclass
class Simulation:
    chroms: Dict[str, str]
    svs: List[SimSV]
    #: two haplotype sequence dicts
    haplotypes: Tuple[Dict[str, str], Dict[str, str]]


def random_genome(rng: np.random.Generator, chrom_lengths: Dict[str, int]) -> Dict[str, str]:
    return {
        name: "".join(_BASES[i] for i in rng.integers(0, 4, size=length))
        for name, length in chrom_lengths.items()
    }


def simulate_svs(
    rng: np.random.Generator,
    chroms: Dict[str, str],
    n_svs: int,
    sv_types: Sequence[str] = ("DEL", "INS", "INV"),
    min_len: int = 50,
    max_len: int = 600,
    min_separation: int = 2500,
) -> List[SimSV]:
    """Place non-overlapping SVs with random genotypes."""
    svs: List[SimSV] = []
    names = list(chroms)
    genotypes = ["0/0", "0/1", "1/1"]
    attempts = 0
    occupied: Dict[str, List[Tuple[int, int]]] = {c: [] for c in names}
    while len(svs) < n_svs and attempts < n_svs * 50:
        attempts += 1
        chrom = names[int(rng.integers(len(names)))]
        clen = len(chroms[chrom])
        svtype = sv_types[int(rng.integers(len(sv_types)))]
        length = int(rng.integers(min_len, max_len + 1))
        pos = int(rng.integers(min_separation, max(min_separation + 1, clen - length - min_separation)))
        span = (pos - min_separation, pos + length + min_separation)
        if any(not (span[1] < a or span[0] > b) for a, b in occupied[chrom]):
            continue
        occupied[chrom].append(span)
        ins_seq = ""
        if svtype == "INS":
            ins_seq = "".join(
                _BASES[i] for i in rng.integers(0, 4, size=length)
            )
        svs.append(
            SimSV(
                chrom=chrom,
                pos=pos,
                svtype=svtype,
                length=length,
                genotype=genotypes[int(rng.integers(3))],
                ins_seq=ins_seq,
            )
        )
    svs.sort(key=lambda s: (s.chrom, s.pos))
    return svs


def apply_haplotype(
    chroms: Dict[str, str], svs: Sequence[SimSV], hap: int
) -> Dict[str, str]:
    """Apply the alt alleles carried by haplotype ``hap`` (0 or 1)."""
    out = {}
    for chrom, seq in chroms.items():
        edits = []
        for sv in svs:
            if sv.chrom != chrom:
                continue
            carried = (
                sv.genotype == "1/1"
                or (sv.genotype == "0/1" and hap == 1)
            )
            if carried:
                edits.append(sv)
        new = seq
        for sv in sorted(edits, key=lambda s: -s.pos):
            if sv.svtype == "DEL":
                new = new[: sv.pos] + new[sv.pos + sv.length :]
            elif sv.svtype == "INS":
                new = new[: sv.pos] + sv.ins_seq + new[sv.pos :]
            elif sv.svtype == "INV":
                segment = new[sv.pos : sv.pos + sv.length]
                rc = segment.translate(str.maketrans("ACGT", "TGCA"))[::-1]
                new = new[: sv.pos] + rc + new[sv.pos + sv.length :]
        out[chrom] = new
    return out


def simulate(
    seed: int,
    chrom_lengths: Dict[str, int],
    n_svs: int,
    sv_types: Sequence[str] = ("DEL", "INS", "INV"),
) -> Simulation:
    rng = np.random.default_rng(seed)
    chroms = random_genome(rng, chrom_lengths)
    svs = simulate_svs(rng, chroms, n_svs, sv_types)
    haps = (apply_haplotype(chroms, svs, 0), apply_haplotype(chroms, svs, 1))
    return Simulation(chroms=chroms, svs=svs, haplotypes=haps)


def write_truth_vcf(sim: Simulation, path) -> None:
    with open(path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write('##INFO=<ID=SVTYPE,Number=1,Type=String,Description="Type of structural variant">\n')
        fh.write('##INFO=<ID=END,Number=1,Type=Integer,Description="End position">\n')
        fh.write('##INFO=<ID=SVLEN,Number=1,Type=Integer,Description="SV length">\n')
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tTRUTH\n")
        for i, sv in enumerate(sim.svs):
            if sv.svtype == "DEL":
                alt, svlen = "<DEL>", -sv.length
            elif sv.svtype == "INV":
                alt, svlen = "<INV>", 0
            else:
                alt, svlen = sv.ins_seq, sv.length
            fh.write(
                f"{sv.chrom}\t{sv.pos}\tsim{i}\tN\t{alt}\t.\t.\t"
                f"SVTYPE={sv.svtype};END={sv.end};SVLEN={svlen}\tGT\t{sv.genotype}\n"
            )


def simulate_reads(
    rng: np.random.Generator,
    haplotypes: Tuple[Dict[str, str], Dict[str, str]],
    coverage: float,
    mean_len: int = 8000,
    sd_len: int = 3000,
    min_len: int = 300,
    sub_rate: float = 0.04,
    ins_rate: float = 0.03,
    del_rate: float = 0.03,
) -> Tuple[List[str], List[str]]:
    """Sample noisy reads uniformly over both haplotypes.

    Returns (names, sequences) as ASCII strings.
    """
    totals = [sum(len(s) for s in hap.values()) for hap in haplotypes]
    n_bases = int(coverage * sum(totals) / 2)
    names, seqs = [], []
    generated = 0
    i = 0
    trans = np.frombuffer(b"ACGT", dtype=np.uint8)
    while generated < n_bases:
        hap_i = int(rng.integers(2))
        hap = haplotypes[hap_i]
        chrom = list(hap)[int(rng.integers(len(hap)))]
        seq = hap[chrom]
        length = int(np.clip(rng.normal(mean_len, sd_len), min_len, len(seq)))
        start = int(rng.integers(0, max(1, len(seq) - length + 1)))
        fragment = seq[start : start + length]
        codes = np.frombuffer(fragment.encode(), dtype=np.uint8)
        # Apply errors, vectorized: per input base emit 0-2 output bases
        # (deletion; optional inserted base; substituted or original base).
        r = rng.random(len(codes))
        shift = rng.integers(1, 4, size=len(codes))
        base_idx = np.searchsorted(trans, codes)
        deleted = r < del_rate
        inserted = (r >= del_rate) & (r < del_rate + ins_rate)
        substituted = (
            (r >= del_rate) & (r < del_rate + ins_rate + sub_rate)
        )
        kept = trans[
            np.where(substituted, (base_idx + shift) % 4, base_idx)
        ]
        n_out = (~deleted).astype(np.int64) + inserted
        ends = np.cumsum(n_out)
        total = int(ends[-1]) if len(ends) else 0
        out = np.empty(total, dtype=np.uint8)
        keep_pos = ends - 1  # kept/sub base goes last in its slot
        ins_pos = ends - n_out  # inserted base (if any) goes first
        sel = ~deleted
        out[keep_pos[sel]] = kept[sel]
        if inserted.any():
            out[ins_pos[inserted]] = trans[
                rng.integers(0, 4, size=int(inserted.sum()))
            ]
        read = out.tobytes().decode()
        if rng.random() < 0.5:
            read = read.translate(str.maketrans("ACGT", "TGCA"))[::-1]
        names.append(f"sim_read_{i}_hap{hap_i}_{chrom}_{start}")
        seqs.append(read)
        generated += len(read)
        i += 1
    return names, seqs


def write_fastq(path, names: List[str], seqs: List[str]) -> None:
    with open(path, "w") as fh:
        for name, seq in zip(names, seqs):
            fh.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
