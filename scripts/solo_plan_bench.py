"""On-chip A/B: mono (NC=1) vs forced-chunked fused-kernel plan for the
SOLO (non-vmapped) bench configuration.

The round-3 vmap calibration (scripts/vmap_kernel_calib.py) showed the
chunked layout at E=8 running ~0.9 ms/member vs mono's 2.2 ms at E=1 —
but that compares different vmap extents. This script isolates the plan
choice at E=1 on the exact bench.py shape (B=200, K=100, 50-50 nets,
prng dropout) using the same whole-epoch device program bench.py times.
If chunked wins solo, ``_plan``'s mono preference is wrong and the bench
headline rises by flipping it.

  python scripts/solo_plan_bench.py mono
  python scripts/solo_plan_bench.py chunk
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from njode_tpu.models import njode
from njode_tpu.ops import fused_scan
from njode_tpu.training.steps import make_optimizer, make_step_fns

MODE = sys.argv[1] if len(sys.argv) > 1 else "mono"
# first-class plan forcing (fused_scan._select_plan) — evaluated at trace
# time, unlike the retired module-global budget mutation idiom
FORCE = {"mono": "mono", "chunk": "chunk"}[MODE]

N, B, K = 16_000, 200, 100
dt = 1.0 / K
rs = np.random.RandomState(0)
x = np.ones((N, 1), dtype=np.float64)
out = [x]
for _ in range(K):
    dW = rs.normal(0.0, 1.0, x.shape) * np.sqrt(dt)
    x = x + 2.0 * x * dt + 0.3 * x * dW
    out.append(x)
paths = np.stack(out, axis=-1).astype(np.float32)
obs = (np.random.RandomState(1).random((N, K + 1)) < 0.1).astype(np.float32)
times = (np.arange(1, K + 1) * dt).astype(np.float32)
dts = np.full(K, dt, dtype=np.float32)

cfg = njode.NJODEConfig(input_size=1, hidden_size=10, output_size=1,
                        ode_nn=((50, "tanh"), (50, "tanh")),
                        readout_nn=((50, "tanh"), (50, "tanh")),
                        enc_nn=((50, "tanh"), (50, "tanh")),
                        dropout_rate=0.1)
spec = fused_scan._Spec(cfg, "prng")
print(f"{MODE}: plan={fused_scan._select_plan(spec, K, B, True, force=FORCE)}",
      flush=True)

params = njode.init_params(jax.random.PRNGKey(0), cfg)
optimizer = make_optimizer(1e-3)
opt_state = optimizer.init(params)
fns = make_step_fns(cfg, optimizer, times, dts, use_pallas=True,
                    pallas_force_plan=FORCE)

d_paths, d_obs = jnp.asarray(paths), jnp.asarray(obs)
key = jax.random.PRNGKey(2)
idx_mat = jnp.asarray(np.random.RandomState(3).permutation(N)
                      .astype(np.int32).reshape(N // B, B))

params, opt_state, losses = fns["train_epoch"](
    params, opt_state, d_paths, d_obs, idx_mat, jnp.float32(0.5),
    jax.random.fold_in(key, 0))
jax.block_until_ready(losses)

REPS = 10
t0 = time.perf_counter()
for r in range(REPS):
    params, opt_state, losses = fns["train_epoch"](
        params, opt_state, d_paths, d_obs, idx_mat, jnp.float32(0.5),
        jax.random.fold_in(key, 1 + r))
jax.block_until_ready(losses)
per_epoch = (time.perf_counter() - t0) / REPS
print(f"{MODE}: {per_epoch * 1e3:.1f} ms/epoch pipelined "
      f"({N / per_epoch:,.0f} paths/s) loss={float(losses[-1]):.5f}",
      flush=True)
