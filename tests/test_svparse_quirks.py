"""Reference-quirk parity tests for SV normalization (SURVEY §3.2)."""

import numpy as np
import pytest

from svjedi_tpu.graph.svparse import (
    corrected_bnd_breakpoints,
    format_bnd_id,
    get_info,
    parse_bnd_id,
    parse_vcf_svs,
)


def _write_vcf(path, records):
    with open(path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for rec in records:
            fh.write("\t".join(rec) + "\n")


CHROMS = {"1": 10000, "2": 8000}


def test_ins_multiplicity_counts_discarded_records(tmp_path):
    """The INS counter bumps before discard checks (construct-graph.py:134-159)."""
    vcf = tmp_path / "t.vcf"
    _write_vcf(
        vcf,
        [
            # Discarded: REF field longer than 1 — but still consumes count 1.
            ("1", "5000", "a", "NN", "ACGT" * 20, ".", ".", "SVTYPE=INS;END=5001"),
            # Gets count 2.
            ("1", "5000", "b", "N", "ACGT" * 20, ".", ".", "SVTYPE=INS;END=5001"),
        ],
    )
    parsed = parse_vcf_svs(vcf, CHROMS)
    assert len(parsed.discarded) == 1
    assert parsed.svs[0].sv_id == "INS-5000-2"


def test_ins_multiplicity_not_chrom_qualified(tmp_path):
    """Counter keyed by POS string only — cross-chromosome bleed preserved."""
    vcf = tmp_path / "t.vcf"
    _write_vcf(
        vcf,
        [
            ("1", "5000", "a", "N", "ACGT" * 15, ".", ".", "SVTYPE=INS;END=5001"),
            ("2", "5000", "b", "N", "TTTT" * 15, ".", ".", "SVTYPE=INS;END=5001"),
        ],
    )
    parsed = parse_vcf_svs(vcf, CHROMS)
    assert parsed.svs[0].sv_id == "INS-5000-1"
    assert parsed.svs[1].sv_id == "INS-5000-2"  # not reset per chrom


def test_symbolic_ins_seq_sources(tmp_path):
    vcf = tmp_path / "t.vcf"
    _write_vcf(
        vcf,
        [
            ("1", "4000", "a", "N", "<INS>", ".", ".", "SVTYPE=INS;SEQ=" + "ACGT" * 20),
            ("1", "4200", "b", "N", "<INS>", ".", ".", "SVTYPE=INS;LEFT_SVINSSEQ=AAA"),
            ("1", "4400", "c", "N", "<INS>", ".", ".", "SVTYPE=INS"),
        ],
    )
    parsed = parse_vcf_svs(vcf, CHROMS)
    assert [r.vcf_id for r in parsed.svs] == ["a"]
    assert parsed.svs[0].ins_seq == "ACGT" * 20
    assert len(parsed.discarded) == 2


def test_last_two_bases_discard(tmp_path):
    vcf = tmp_path / "t.vcf"
    _write_vcf(
        vcf,
        [
            ("1", "9999", "a", "N", "<DEL>", ".", ".", "SVTYPE=DEL;END=10000"),
            ("1", "100", "b", "N", "<DEL>", ".", ".", "SVTYPE=DEL;END=9999"),
        ],
    )
    parsed = parse_vcf_svs(vcf, CHROMS)
    # Both discarded: positions at >= len-1 (construct-graph.py:195-197).
    assert len(parsed.discarded) == 2
    assert parsed.svs == []


@pytest.mark.parametrize(
    "alt,expected_left,expected_right",
    [
        # t[p[ : both forward.
        ("N[2:100[", ("1", 50, "+"), ("2", 100, "+")),
        # t]p] : right reverse.
        ("N]2:100]", ("1", 50, "+"), ("2", 100, "-")),
        # ]p]t : both forward, mate leads.
        ("]2:100]N", ("2", 100, "+"), ("1", 50, "+")),
        # [p[t : left reverse, mate leads.
        ("[2:100[N", ("2", 100, "-"), ("1", 50, "+")),
    ],
)
def test_bnd_flavors(alt, expected_left, expected_right):
    sv_id = format_bnd_id("50", alt)
    left, right = parse_bnd_id("1", sv_id)
    assert tuple(left) == expected_left
    assert tuple(right) == expected_right


def test_bnd_breakpoint_corrections():
    # Both '+' → right -1 (covers t[p[ and ]p]t).
    assert corrected_bnd_breakpoints(["1", 50, "+"], ["2", 100, "+"]) == (
        ("1", 50), ("2", 99),
    )
    # Right '-' (t]p]) → unchanged.
    assert corrected_bnd_breakpoints(["1", 50, "+"], ["2", 100, "-"]) == (
        ("1", 50), ("2", 100),
    )
    # Left '-' ([p[t) → both -1.
    assert corrected_bnd_breakpoints(["2", 100, "-"], ["1", 50, "+"]) == (
        ("2", 99), ("1", 49),
    )


def test_bnd_id_substring_replace_quirk():
    # ALT "A[2:25000[" with REF token "A": every "A" occurrence replaced
    # (construct-graph.py:658) — quirk preserved verbatim.
    assert format_bnd_id("7", "A[2:25000[") == "BND-7[2:25000["


def test_get_info_positions():
    assert get_info("SVTYPE=DEL;END=3", "SVTYPE") == "DEL"
    assert get_info("SVTYPE=DEL;END=3", "END") == "3"
    assert get_info("A=1;END=3;B=2", "END") == "3"
    assert get_info("A=1;B=2", "END") is None
    # Prefix collision: 'CIEND=' must not satisfy 'END='.
    assert get_info("CIEND=5;END=3", "END") == "3"
