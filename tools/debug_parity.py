"""Count-level parity report: our raw per-(SV, allele) counts vs the golden
expected_genotype.vcf raw counts (normalization reversed), with per-read
geometry for the differing SVs.

Usage: python tools/debug_parity.py <prefix-dir-with-artifacts> [--geometry]
(expects <dir>/test_informative_aln.json from a keep-artifacts run)
"""
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from svjedi_tpu.genotype.vcf_writer import derive_record_key

GOLDEN = Path("/root/reference/test-dir/expected_genotype.vcf")


def golden_raw_counts():
    """tag -> (raw_ref, raw_alt) reversing predict-genotype normalization."""
    out = {}
    mult = {}
    for rec in open(GOLDEN):
        if rec.startswith("#"):
            continue
        f = rec.rstrip("\n").split("\t")
        svtype, tag, _len = derive_record_key(f[0], f[1], f[4], f[7], mult)
        sample = f[9].strip().split(":")
        if sample[0] == "./." and sample[1] == "0":
            out[tag] = (0, 0)
            continue
        ad = sample[2].split(",")
        ref, alt = float(ad[0]), float(ad[1])
        if svtype == "DEL":
            ref *= 2  # ref allele (2 junctions) was halved
        elif svtype == "INS":
            alt *= 2
        out[tag] = (int(round(ref)), int(round(alt)))
    return out


def main():
    d = Path(sys.argv[1])
    audit = json.loads((d / "test_informative_aln.json").read_text())
    ours = {
        tag: (len(pair[0]), len(pair[1])) for tag, pair in audit.items()
    }
    gold = golden_raw_counts()
    ndiff = 0
    tsv = None
    for arg in sys.argv[2:]:
        if arg.startswith("--tsv="):
            tsv = open(arg.split("=", 1)[1], "w")
            tsv.write(
                "tag\tgolden_ref\tgolden_alt\tours_ref\tours_alt\t"
                "delta_ref\tdelta_alt\n"
            )
    for tag in sorted(gold):
        g = gold[tag]
        o = ours.get(tag, (0, 0))
        mark = ""
        if g != o:
            ndiff += 1
            mark = f"  <-- ref {o[0]-g[0]:+d} alt {o[1]-g[1]:+d}"
            if tsv:
                tsv.write(
                    f"{tag}\t{g[0]}\t{g[1]}\t{o[0]}\t{o[1]}\t"
                    f"{o[0]-g[0]:+d}\t{o[1]-g[1]:+d}\n"
                )
        print(f"{tag:32s} golden={g} ours={o}{mark}")
    print(f"\n{ndiff} SVs differ")
    if tsv:
        tsv.close()
    if "--geometry" in sys.argv:
        for tag in sorted(gold):
            if gold[tag] == ours.get(tag, (0, 0)):
                continue
            print(f"\n=== {tag} golden={gold[tag]} ours={ours.get(tag)}")
            for allele in (0, 1):
                for line in audit.get(tag, [[], []])[allele]:
                    f = line.split("\t")
                    print(
                        f"  a{allele} {f[0][:46]:46s} q[{f[2]}:{f[3]}]/{f[1]} "
                        f"{f[4]} path={f[5][:40]} t[{f[7]}:{f[8]}]/{f[6]} "
                        f"id={f[12].split(':')[-1]}"
                    )


if __name__ == "__main__":
    main()
