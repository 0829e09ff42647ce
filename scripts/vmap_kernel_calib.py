"""On-chip calibration: scoped-VMEM scaling of the fused NJODE kernel
under ``jax.vmap`` (the grouped-sweep ensemble axis, group_sweep.py).

Last session's grouped kernel bench failed remote compile with
"Scoped allocation with size 58.92M and limit 16.00M" at E=4 on the
bench config whose single-member plan (mono, NC=1) is ~14.7M — i.e. the
vmapped custom call's scoped accounting multiplied by exactly E. This
script measures the rule for BOTH kernel layouts (mono and chunked) so
``fused_scan._plan`` can budget the ensemble axis correctly:

  python scripts/vmap_kernel_calib.py mono  1 2 4
  python scripts/vmap_kernel_calib.py chunk 2 4 8
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from njode_tpu.data import grid
from njode_tpu.models import njode
from njode_tpu.ops import fused_scan

MODE = sys.argv[1] if len(sys.argv) > 1 else "mono"
ES = [int(a) for a in sys.argv[2:]] or [1, 2, 4]

NN = ((50, "tanh"), (50, "tanh"))
CFG = njode.NJODEConfig(input_size=1, hidden_size=10, output_size=1,
                        ode_nn=NN, readout_nn=NN, enc_nn=NN,
                        dropout_rate=0.1)
B, STEPS = 200, 100


def make_batch(seed=0):
    rs = np.random.RandomState(seed)
    dt = 1.0 / STEPS
    paths = rs.lognormal(0.0, 0.3, size=(B, 1, STEPS + 1))
    observed = (rs.random((B, STEPS + 1)) < 0.1).astype(np.int64)
    observed[0, STEPS] = 1
    observed[:, 0] = 0
    for i in range(B):
        if observed[i, 1:].sum() == 0:
            observed[i, 3] = 1
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, observed, dt))
    return jax.tree.map(jnp.asarray, b)


batch = make_batch()
# first-class plan forcing pins each arm's layout regardless of budgets
fused = fused_scan.make_fused_loss_fn(CFG, mask_mode="prng", force_plan=MODE)


def one_loss(p, k):
    return fused(p, batch, jnp.float32(0.5), k, True)


for E in ES:
    keys = jax.random.split(jax.random.PRNGKey(7), E)
    params_e = jax.vmap(lambda k: njode.init_params(k, CFG))(
        jax.random.split(jax.random.PRNGKey(1), E))
    fn = jax.jit(jax.vmap(jax.value_and_grad(one_loss)))
    try:
        t0 = time.time()
        losses, grads = fn(params_e, keys)
        jax.block_until_ready(losses)
        compile_s = time.time() - t0
        t0 = time.time()
        reps = 20
        for _ in range(reps):
            losses, grads = fn(params_e, keys)
        jax.block_until_ready(losses)
        steady = (time.time() - t0) / reps
        print(f"{MODE} E={E}: OK compile={compile_s:.1f}s "
              f"steady={steady * 1e3:.1f}ms loss[0]={float(losses[0]):.5f}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        cut = msg.find("Scoped allocation")
        print(f"{MODE} E={E}: FAIL "
              f"{msg[cut:cut + 120] if cut >= 0 else msg[:200]}", flush=True)
