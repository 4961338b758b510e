"""Micro-benchmark: band_dp_dma kernel steady-state time per dispatch."""
import os, sys, time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/svjt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from svjedi_tpu.kernels.band_dp_dma import band_dp_dma, ALIGN
from svjedi_tpu.align.extend import DPParams

rng = np.random.default_rng(0)
N = 1 << 20
reads = jnp.asarray(rng.integers(0, 4, N + 4 * ALIGN, dtype=np.int8))
panel = jnp.asarray(rng.integers(0, 4, N, dtype=np.int8))

P = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
bucket = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
band = 128

q_start = jnp.asarray(rng.integers(0, N - bucket, P, dtype=np.int32))
t_start = jnp.asarray(rng.integers(ALIGN, N - bucket - band - ALIGN, P, dtype=np.int32))
m = jnp.full(P, bucket, jnp.int32)
t_lo = jnp.zeros(P, jnp.int32)
t_hi = jnp.full(P, N, jnp.int32)
params = DPParams()

# trivial dispatch round-trip
f = jax.jit(lambda x: x + 1)
x = jnp.zeros(8, jnp.int32)
jax.block_until_ready(f(x))
t0 = time.perf_counter()
for _ in range(20):
    jax.block_until_ready(f(x))
rt = (time.perf_counter() - t0) / 20
print(f"trivial dispatch round-trip: {rt*1e3:.2f} ms")

out = band_dp_dma(reads, panel, q_start, t_start, m, t_lo, t_hi,
                  bucket=bucket, band=band, params=params)
jax.block_until_ready(out["score"])
t0 = time.perf_counter()
REPS = 5
for _ in range(REPS):
    out = band_dp_dma(reads, panel, q_start, t_start, m, t_lo, t_hi,
                      bucket=bucket, band=band, params=params)
    jax.block_until_ready(out["score"])
dt = (time.perf_counter() - t0) / REPS
cells = P * bucket * band
print(f"P={P} bucket={bucket} band={band}: {dt*1e3:.1f} ms/dispatch, "
      f"{cells/dt/1e9:.2f} Gcell/s")
