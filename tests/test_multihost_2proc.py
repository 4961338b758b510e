"""--multihost with process_count=2, for real (VERDICT r4 item 7).

Two localhost processes join a jax.distributed group over a TCP
coordinator (CPU backend), each runs the pipeline on its block of the
test-dir read stream (reads sharded by process index inside
run_pipeline), the count tables allreduce over the fabric, and process 0
genotypes. The merged output must equal the single-process run
byte-for-byte — the property every prior round could only test with
process_count=1 (tests/test_multihost.py).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

from conftest import REPO_ROOT, require_reference, TEST_DATA

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    addr, n, i, prefix, testdir = sys.argv[1:6]
    sys.path.insert(0, sys.argv[6])
    from svjedi_tpu.dist.multihost import initialize
    initialize(
        coordinator_address=addr, num_processes=int(n), process_id=int(i)
    )
    from svjedi_tpu.config import PipelineConfig
    from svjedi_tpu.pipeline import run_pipeline
    cfg = PipelineConfig(
        vcf=os.path.join(testdir, "test.vcf"),
        ref=os.path.join(testdir, "reference_genome.fasta"),
        reads=(os.path.join(testdir, "simulated_reads.fastq.gz"),),
        prefix=prefix,
        multihost=True,
    )
    run_pipeline(cfg)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_multihost_equals_single(tmp_path):
    require_reference()
    addr = f"127.0.0.1:{_free_port()}"
    prefix = str(tmp_path / "mh")
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": str(REPO_ROOT),
    }
    env.pop("XLA_FLAGS", None)  # no virtual device fan-out in the workers
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-c", WORKER, addr, "2", str(i), prefix,
                str(TEST_DATA), str(REPO_ROOT),
            ],
            env=env, cwd=str(tmp_path),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err}"

    # Single-process reference run, same inputs.
    from svjedi_tpu.config import PipelineConfig
    from svjedi_tpu.pipeline import run_pipeline

    ref_prefix = str(tmp_path / "single")
    run_pipeline(
        PipelineConfig(
            vcf=TEST_DATA / "test.vcf",
            ref=TEST_DATA / "reference_genome.fasta",
            reads=(str(TEST_DATA / "simulated_reads.fastq.gz"),),
            prefix=ref_prefix,
        )
    )
    merged = open(f"{prefix}_genotype.vcf").read()
    single = open(f"{ref_prefix}_genotype.vcf").read()
    assert merged == single
