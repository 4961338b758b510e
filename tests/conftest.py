"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths compile
and execute without TPU hardware (the driver separately dry-runs the real
multichip path via __graft_entry__.dryrun_multichip). Environment must be set
before jax is imported anywhere.
"""

import os
import subprocess
import sys
from pathlib import Path

# Force CPU: the ambient environment registers the axon TPU-tunnel PJRT
# plugin from sitecustomize at interpreter start and pins the default
# platform, ignoring the JAX_PLATFORMS env var. Overriding via jax.config
# *before any backend initialization* is the reliable switch; it must be
# paired with the host-device-count flag before that first initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
REFERENCE_DIR = Path("/root/reference")
TEST_DATA = REFERENCE_DIR / "test-dir"

sys.path.insert(0, str(REPO_ROOT))


def require_reference():
    if not TEST_DATA.exists():
        pytest.skip("reference test-dir not available")


@pytest.fixture(scope="session")
def ref_artifacts(tmp_path_factory):
    """GFA/JSON artifacts produced by the *reference* graph builder.

    Running the reference script (read-only mount) at test time gives a
    ground-truth target for byte-parity without copying its code or outputs
    into this repo.
    """
    require_reference()
    out = tmp_path_factory.mktemp("ref_artifacts")
    subprocess.run(
        [
            sys.executable,
            str(REFERENCE_DIR / "construct-graph.py"),
            "-v", str(TEST_DATA / "test.vcf"),
            "-r", str(TEST_DATA / "reference_genome.fasta"),
            "-o", str(out / "test.gfa"),
        ],
        check=True,
        cwd=out,
        capture_output=True,
    )
    return out
