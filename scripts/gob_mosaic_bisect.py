"""Bisect the round-5 gob-block Mosaic failure on chip.

The published GOB comparison block (configs.gru_ode_bayes_comparison,
B=20, D=1, H=50, impute=True, logvar=True, mixing=1e-4, euler,
dropout 0.1, BlackScholes) died at its FIRST kernel compile with

    Mosaic failed to compile TPU kernel: only constant accumulators
    supported
    %665 = vector.multi_reduction <add>, (vector<20x50xf32>,
           vector<20xf32>) -> vector<20xf32>, reduction_dims = [1]

i.e. somewhere the lowered kernel accumulates a per-row [B] vector with
a sum over a [B, H] array's lane axis. Interpret-mode parity covers
impute=True, so the semantics are right and only the lowering pattern is
at fault. This script compiles the fused GOB loss+grad at the failing
config, then toggles one flag at a time to isolate the trigger; each
arm is compile-only (~40 s when it fails, a few min when it compiles).

  python scripts/gob_mosaic_bisect.py            # all arms
  python scripts/gob_mosaic_bisect.py base       # just the failing one
"""
import sys
import traceback

import numpy as np
import jax
import jax.numpy as jnp

from njode_tpu.data import grid
from njode_tpu.models import gru_ode_bayes as gob
from njode_tpu.ops import fused_gob

ARMS = {
    # the failing published-block config (cov defaults as the trainer
    # builds them for synthetic data: cov_size=1 -> h0 map)
    "base": dict(),
    "no_impute": dict(impute=False),
    "no_logvar": dict(logvar=False),
    "no_mixing": dict(mixing=0.0),
    "no_dropout": dict(dropout_rate=0.0),
    "B50": dict(B=50),
    "D5": dict(D=5),
    "minimal_gru": dict(full_gru_ode=False),
    "prep10": dict(prep_hidden=10),
}


def run(name, over):
    B = over.pop("B", 20)
    D = over.pop("D", 1)
    # config_from_options defaults at the published comparison params:
    # p_hidden = prep_hidden = cov_hidden = hidden_size, full_gru_ode=True
    base = dict(input_size=D, hidden_size=50, p_hidden=50,
                prep_hidden=50, cov_size=D, cov_hidden=50,
                mixing=1e-4, dropout_rate=0.1, logvar=True,
                impute=True, solver="euler", full_gru_ode=True)
    base.update(over)
    cfg = gob.GOBConfig(**base)
    K = 50
    rs = np.random.RandomState(0)
    paths = rs.lognormal(0, 0.2, (B, D, K + 1)).astype(np.float32)
    observed = (rs.random((B, K + 1)) < 0.2).astype(np.int64)
    observed[:, 5] = 1
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, observed, 0.05))
    batch = jax.tree.map(jnp.asarray, b)
    params = gob.init_params(jax.random.PRNGKey(1), cfg)
    fused = fused_gob.make_fused_loss_fn(cfg)
    try:
        fn = jax.jit(jax.value_and_grad(
            lambda p: fused(p, batch, jax.random.PRNGKey(3), True)))
        l, g = fn(params)
        jax.block_until_ready(g)
        print(f"ARM {name}: OK loss={float(l):.5f}", flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"ARM {name}: FAIL {msg}", flush=True)
        if "--trace" in sys.argv:
            traceback.print_exc()
        return False


if __name__ == "__main__":
    want = [a for a in sys.argv[1:] if not a.startswith("-")]
    for name, over in ARMS.items():
        if want and name not in want:
            continue
        run(name, dict(over))
