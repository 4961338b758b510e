"""Per-SV raw-count comparison against the expected golden VCF.

Runs the pipeline stages on test-dir (CPU) and prints, per SV, our raw
[ref, alt] support counts next to the expected raw counts reconstructed
from expected_genotype.vcf's AD field (un-doing predict-genotype.py's
in-place normalization: DEL halves ref, INS halves alt).
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from svjedi_tpu.config import PipelineConfig
from svjedi_tpu.graph.build import build_graph
from svjedi_tpu.graph.svparse import parse_vcf_svs
from svjedi_tpu.graph.cluster import build_panel
from svjedi_tpu.align.index import build_panel_index
from svjedi_tpu.align.pipeline import align_and_count
from svjedi_tpu.io.fasta import read_fasta
from svjedi_tpu.io.fastq import read_reads

TESTDIR = "/root/reference/test-dir"


def expected_raw_counts():
    """sv key (chrom_pos_type-ish) -> (raw_ref, raw_alt, gt) from golden VCF."""
    out = {}
    with open(f"{TESTDIR}/expected_genotype.vcf") as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            f = line.rstrip("\n").split("\t")
            info = dict(kv.split("=", 1) for kv in f[7].split(";") if "=" in kv)
            svtype = info.get("SVTYPE")
            sample = f[9].split(":")
            gt, dp, ad = sample[0], sample[1], sample[2]
            if ad == "0" or dp == "0":
                ref_n, alt_n = 0.0, 0.0
            else:
                ref_n, alt_n = (float(x) for x in ad.split(","))
            if svtype == "DEL":
                raw = (int(round(ref_n * 2)), int(round(alt_n)))
            elif svtype == "INS":
                raw = (int(round(ref_n)), int(round(alt_n * 2)))
            else:
                raw = (int(round(ref_n)), int(round(alt_n)))
            key = (f[0], int(f[1]), f[2], svtype)
            out[key] = (raw, gt)
    return out


def main():
    cfg = PipelineConfig(
        vcf=f"{TESTDIR}/test.vcf",
        ref=f"{TESTDIR}/reference_genome.fasta",
        reads=(f"{TESTDIR}/simulated_reads.fastq.gz",),
        prefix="/tmp/dbg",
    )
    chroms = read_fasta(cfg.ref)
    chrom_lengths = {c: len(s) for c, s in chroms.items()}
    parsed = parse_vcf_svs(cfg.vcf, chrom_lengths)
    graph = build_graph(chroms, parsed)
    panel = build_panel(
        graph,
        flank=cfg.align.flank,
        cluster_gap=cfg.align.cluster_gap,
        max_paths_per_cluster=cfg.align.max_paths_per_cluster,
        max_hops_per_path=cfg.align.max_hops_per_path,
    )
    index = build_panel_index(panel, k=cfg.align.kmer, w=cfg.align.window, max_hits_per_minimizer=cfg.align.max_hits_per_minimizer)
    reads = read_reads(list(cfg.reads))
    decoy = None
    if cfg.align.decoy:
        from svjedi_tpu.align.decoy import build_decoy

        decoy = build_decoy(
            panel, k=cfg.align.kmer, w=cfg.align.window,
            max_hits_per_minimizer=cfg.align.max_hits_per_minimizer,
        )
    counts, audit, winners = align_and_count(
        reads, panel, index, cfg.align, cfg.genotype, collect_audit=False,
        decoy=decoy,
    )

    # Map sv tag -> counts. Tags look like "chrom:sv_id".
    exp = expected_raw_counts()
    # Build tag per VCF record id via the same id derivation as the writer.
    from svjedi_tpu.genotype.vcf_writer import derive_record_key

    rec_keys = {}
    ins_mult = {}
    with open(cfg.vcf) as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            f = line.rstrip("\n").split("\t")
            _, key, _ = derive_record_key(f[0], f[1], f[4], f[7], ins_mult)
            rec_keys[(f[0], int(f[1]), f[2])] = key
    print(f"{'record':<28}{'type':<6}{'exp_raw':<12}{'ours':<12}{'d_ref':>6}{'d_alt':>6}  gt")
    tot_dref = tot_dalt = 0
    for (chrom, pos, rid, svtype), ((eref, ealt), gt) in exp.items():
        tag = rec_keys.get((chrom, pos, rid))
        ours = counts.get(tag, [0, 0]) if tag else [0, 0]
        dref, dalt = ours[0] - eref, ours[1] - ealt
        tot_dref += abs(dref)
        tot_dalt += abs(dalt)
        mark = "" if (dref == 0 and dalt == 0) else "  <-- "
        print(
            f"{chrom}:{pos} {rid:<14}{svtype:<6}"
            f"{str([eref, ealt]):<12}{str(list(ours)):<12}"
            f"{dref:>+6}{dalt:>+6}  {gt}{mark}"
        )
    print(f"\ntotal |d_ref|={tot_dref} |d_alt|={tot_dalt}")


if __name__ == "__main__":
    main()
