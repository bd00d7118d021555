#!/bin/bash
# One-shot TPU work queue for when the axon tunnel recovers (it was wedged
# for this whole session).  Run from the repo root:
#     bash tools/tpu_checklist.sh 2>&1 | tee /tmp/tpu_checklist.log
# Each stage is independently time-bounded; later stages still run if an
# earlier one fails.  Results land in LEDGER_TPU.json + stdout.
set -x
cd "$(dirname "$0")/.."

# 0. liveness
timeout 600 python -c "import jax,jax.numpy as jnp;print(jax.devices());print(float(jnp.sum(jnp.arange(8.))))" || exit 1

# 1. Pallas double-single kernels on hardware: compile + accuracy first
SIZES=small timeout 1800 python tools/pallas_probe.py
# 2. full timings at bench-like sizes (decides the IPDE_PALLAS default)
timeout 3600 python tools/pallas_probe.py

# 3. bench at the r02 configuration, with the AOT executable cache
IPDE_AOT_CACHE=/tmp/aotc BENCH_NB=2700 BENCH_M=20 timeout 5400 python bench.py
# 3b. rerun: compile_s should collapse to the cache-load time
IPDE_AOT_CACHE=/tmp/aotc BENCH_NB=2700 BENCH_M=20 timeout 3600 python bench.py
# 3c. pallas-kernel bench (compare solve_ms against 3)
IPDE_PALLAS=1 BENCH_NB=2700 BENCH_M=20 timeout 5400 python bench.py
# 3d. f32 FGMRES preconditioner (annular phase timing)
IPDE_PRECOND_F32=1 BENCH_NB=2700 BENCH_M=20 timeout 5400 python bench.py
# 3e. both
IPDE_PALLAS=1 IPDE_PRECOND_F32=1 BENCH_NB=2700 BENCH_M=20 timeout 5400 python bench.py

# 4. per-phase profile incl. the interp fine-FFT vs gather breakdown
BENCH_NB=2700 BENCH_M=14 timeout 5400 python tools/profile_solve.py

# 5. reference-ledger sweeps on TPU (overwrite the CPU rows)
timeout 10800 python examples/poisson_refinement.py
timeout 10800 python examples/stokes_refinement.py
timeout 7200 python examples/mh_neumann_refinement.py
timeout 3600 python examples/coupled_advection_diffusion.py

# 6. serialize-executable probe through the tunnel (AOT cache viability)
PROBE=serialize timeout 1800 python tools/compile_cache_probe.py
