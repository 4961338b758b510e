"""Compiled TPU kernels vs the XLA reference engine (r4 weak item 4).

The pytest suite pins JAX to CPU (conftest), so Pallas kernels normally
run only in interpret mode here; TPU-hardware correctness otherwise
rests on bench.py's golden gate alone. This test closes the loop: a
subprocess WITHOUT the CPU pin runs the production v3 engine COMPILED on
the real chip over the dryrun problem set and compares counts against
the XLA reference engine — skipped (not failed) when no TPU is
reachable.
"""

import subprocess
import sys
import textwrap

import pytest

from conftest import REPO_ROOT

SCRIPT = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, sys.argv[1])
    import numpy as np
    import jax
    if jax.devices()[0].platform.lower() not in ("tpu",):
        print("NO_TPU")
        raise SystemExit(0)
    from __graft_entry__ import _production_problem
    from svjedi_tpu.dist.engine import dp_filter_count_v3

    prob = _production_problem()
    rw, rn, pw, pn = prob["data"].packed_words()
    args = (rw, rn, pw, pn, prob["meta"], prob["path_start"],
            prob["group"], prob["cand_path"], prob["owned"])
    kw = dict(bucket=prob["bucket"], band=prob["band"],
              params=prob["params"], n_groups=prob["n_groups"],
              n_tags=prob["n_tags"])
    compiled = np.asarray(dp_filter_count_v3(*args, engine="v3", **kw)["counts"])
    ref = np.asarray(dp_filter_count_v3(*args, engine="xla", **kw)["counts"])
    np.testing.assert_array_equal(compiled, ref)
    assert compiled.sum() > 0
    print("TPU_EQ_OK")
    """
)


@pytest.mark.slow
def test_compiled_tpu_engine_equals_xla_reference():
    import os

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env.pop("JAX_PLATFORMS", None)  # let the image's TPU plugin win
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT, str(REPO_ROOT)],
        capture_output=True, text=True, timeout=900, env=env,
    )
    if "NO_TPU" in proc.stdout:
        pytest.skip("no TPU reachable in this environment")
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "TPU_EQ_OK" in proc.stdout
