"""Multi-host data parallelism: sharded run + merge == unsharded run.

Each "host" processes a contiguous block of the read stream and emits its
audit table; the merge step concatenates per-(SV, allele) lists — the only
cross-read reduction in the pipeline — and genotypes once. The merged
genotype VCF must equal the single-host run byte for byte, proving the
reduction is exact and order-independent (SURVEY §2.2).
"""

import filecmp
import gzip
import os
import tempfile

from svjedi_tpu.cli import main as cli_main

TEST_DIR = os.environ.get("SVJT_TESTDIR", "/root/reference/test-dir")


def test_shards_merge_to_single_host_result():
    with tempfile.TemporaryDirectory() as tmp:
        # A 120-read subset keeps the 4 pipeline runs fast; byte-parity of
        # the merged VCF vs the single run is what's under test, not
        # genotype quality.
        subset = os.path.join(tmp, "reads.fq")
        with gzip.open(
            f"{TEST_DIR}/simulated_reads.fastq.gz", "rt"
        ) as src, open(subset, "w") as dst:
            for i, line in enumerate(src):
                if i >= 4 * 120:
                    break
                dst.write(line)
        base = [
            "-v", f"{TEST_DIR}/test.vcf",
            "-r", f"{TEST_DIR}/reference_genome.fasta",
            "-q", subset,
        ]
        single = os.path.join(tmp, "single")
        assert cli_main(["run", *base, "-p", single, "--no-artifacts"]) == 0

        sharded = os.path.join(tmp, "sharded")
        for i in range(2):
            assert (
                cli_main(
                    ["run", *base, "-p", sharded, "--shard", f"{i}/2"]
                )
                == 0
            )
        assert (
            cli_main(
                ["merge", "-v", base[1], "-p", sharded, "-n", "2"]
            )
            == 0
        )
        assert filecmp.cmp(
            f"{single}_genotype.vcf", f"{sharded}_genotype.vcf",
            shallow=False,
        )
