"""Likelihood-model + VCF-writer byte parity against expected_genotype.vcf.

Raw allele counts are reconstructed from the golden file's AD field (the
normalization halves counts into x.5/x.0 floats, so the inverse is exact),
then pushed through our model/writer; the result must byte-match the golden
VCF body and its golden contingency evaluation.
"""

import pytest

from tests.conftest import TEST_DATA, require_reference

from svjedi_tpu.evals.contingency import contingency_report
from svjedi_tpu.genotype.likelihood import genotype_batch, genotype_one
from svjedi_tpu.genotype.vcf_writer import derive_record_key, write_genotyped_vcf

import numpy as np


def _expected_records():
    require_reference()
    records = []
    with open(TEST_DATA / "expected_genotype.vcf") as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            fields = line.rstrip("\n").split("\t")
            records.append(fields)
    return records


def _raw_counts_from_ad(svtype, ad):
    """Invert allele_normalization (predict-genotype.py:327-338)."""
    ref_s, alt_s = ad.split(",")

    def undo(value_s, halved):
        if not halved:
            return int(value_s) if "." not in value_s else float(value_s)
        value = float(value_s)
        raw = int(round(value * 2))
        return raw

    if svtype == "DEL":
        return [undo(ref_s, "." in ref_s), undo(alt_s, False)]
    if svtype == "INS":
        return [undo(ref_s, False), undo(alt_s, "." in alt_s)]
    return [int(float(ref_s)), int(float(alt_s))]


def _support_counts():
    counts = {}
    ins_multiplicity = {}
    svtypes = {}
    for fields in _expected_records():
        chrom, pos, alt, info = fields[0], fields[1], fields[4], fields[7]
        sample = fields[9]
        svtype, key, _ = derive_record_key(chrom, pos, alt, info, ins_multiplicity)
        gt, dp, ad, pl = sample.split(":")
        raw = _raw_counts_from_ad(svtype, ad)
        if sum(raw) > 0:
            counts[key] = raw
            svtypes[key] = svtype
    return counts, svtypes


def test_genotype_one_matches_golden():
    ins_multiplicity = {}
    for fields in _expected_records():
        chrom, pos, alt, info = fields[0], fields[1], fields[4], fields[7]
        sample = fields[9]
        svtype, key, length = derive_record_key(
            chrom, pos, alt, info, ins_multiplicity
        )
        gt, dp, ad, pl = sample.split(":")
        if gt == "./." and pl == ".,.,.":
            continue
        raw = _raw_counts_from_ad(svtype, ad)
        our_gt, our_pl, norm = genotype_one(raw, svtype, 3, 0.00005)
        assert our_gt == gt, (key, raw)
        assert ",".join(our_pl) == pl, (key, raw)
        assert ",".join(str(c) for c in norm) == ad, (key, raw)


def test_batch_matches_host_path():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 60, size=(500, 2)).astype(np.float64)
    types = rng.integers(0, 4, size=500).astype(np.int8)
    name = {0: "DEL", 1: "INS", 2: "INV", 3: "BND"}
    gt_b, pl_b, norm_b = genotype_batch(raw, types, 3, 0.00005)
    gt_map = {"0/0": 0, "0/1": 1, "1/1": 2, "./.": -1}
    for i in range(500):
        gt, pl, norm = genotype_one(list(raw[i]), name[int(types[i])], 3, 0.00005)
        assert gt_map[gt] == gt_b[i]
        assert [int(p) for p in pl] == list(pl_b[i])
        assert np.allclose(norm, norm_b[i])


def test_vcf_writer_byte_parity(tmp_path):
    counts, _ = _support_counts()
    out = tmp_path / "genotype.vcf"
    stats = write_genotyped_vcf(TEST_DATA / "test.vcf", out, counts)
    assert stats["genotyped_svs"] == 40

    ours = [
        l for l in out.read_text().splitlines() if not l.startswith("#")
    ]
    golden = [
        l
        for l in (TEST_DATA / "expected_genotype.vcf").read_text().splitlines()
        if not l.startswith("#")
    ]
    assert ours == golden

    # Headers: the golden file predates the current predict-genotype.py
    # header block (and run_test.sh diffs ignore '#' lines), so assert the
    # current reference behavior instead: our four FORMAT definitions plus
    # the fixed column header (predict-genotype.py:109-115).
    our_headers = [
        l for l in out.read_text().splitlines() if l.startswith("#")
    ]
    assert sum(1 for l in our_headers if l.startswith("##FORMAT")) == 4
    assert our_headers[-1] == (
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tSAMPLE"
    )
    assert not any("##FORMAT" in l and "Cumulated" in l for l in our_headers)


def test_contingency_matches_golden_eval(tmp_path):
    counts, _ = _support_counts()
    out = tmp_path / "genotype.vcf"
    write_genotyped_vcf(TEST_DATA / "test.vcf", out, counts)
    report = contingency_report(TEST_DATA / "test.vcf", out)
    golden = (TEST_DATA / "expected_genotype.vcf.eval").read_text()
    assert report == golden
