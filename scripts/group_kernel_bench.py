"""On-chip measurement: vmap-grouped sweep with the fused kernel
(use_pallas=True, prng masks) vs the default grouped XLA scan, and
epoch_chunk composition — the round-3 grouped-path additions.

Config: conv-study-like shape (Heston, 50-wide nets, batch 20) and the
demo-parity shape (BlackScholes, batch 200), E=4 members each.
"""
import os
import time

DATA = "/tmp/group_kernel_data"
os.makedirs(DATA, exist_ok=True)
os.environ.setdefault("NJODE_DATA_PATH", DATA)

import numpy as np  # noqa: E402
import jax  # noqa: E402

from njode_tpu.data import datasets as du  # noqa: E402
from njode_tpu.training import sweeps  # noqa: E402

HP = dict(drift=2.0, volatility=0.3, mean=4, speed=2.0, correlation=0.5,
          nb_paths=5000, nb_steps=100, S0=1, maturity=1.0, dimension=1,
          obs_perc=0.1, scheme="euler", return_vol=False, v0=1)

if not os.path.isdir(os.path.join(DATA, "training_data", "BlackScholes")):
    du.create_dataset("BlackScholes", HP, seed=1, base_path=DATA)

NN = ((50, "tanh"), (50, "tanh"))
EPOCHS = 20


def run(tag, **kw):
    smp = os.path.join(DATA, f"sm_{tag}") + os.sep
    ps = [dict(epochs=EPOCHS, batch_size=200, save_every=1000,
               learning_rate=1e-3, test_size=0.2, seed=398 + s,
               hidden_size=10, dropout_rate=0.1, ode_nn=NN, readout_nn=NN,
               enc_nn=NN, dataset="BlackScholes", plot=False,
               evaluate=False, base_data_path=DATA, saved_models_path=smp,
               **kw) for s in range(4)]
    t0 = time.time()
    res = sweeps.parallel_training(params=ps, vmap_groups=True)
    wall = time.time() - t0
    # warm-rerun (fresh ids in a new dir) to split compile from steady state
    smp2 = os.path.join(DATA, f"sm_{tag}_warm") + os.sep
    ps2 = [dict(p, saved_models_path=smp2) for p in ps]
    t0 = time.time()
    sweeps.parallel_training(params=ps2, vmap_groups=True)
    warm = time.time() - t0
    per_me = warm / (EPOCHS * len(ps))
    print(f"{tag}: res={res} cold={wall:.1f}s warm={warm:.1f}s "
          f"-> {per_me * 1000:.1f} ms/model-epoch "
          f"({4 * 4000 * EPOCHS / warm:,.0f} paths/s aggregate)",
          flush=True)
    return warm


xla = run("xla")
kern = run("kernel", use_pallas=True)
kern_ck = run("kernel_chunk", use_pallas=True, epoch_chunk=EPOCHS)
xla_ck = run("xla_chunk", epoch_chunk=EPOCHS)
print(f"\nkernel vs xla: {xla / kern:.2f}x | +epoch_chunk: "
      f"{xla / kern_ck:.2f}x | xla+chunk: {xla / xla_ck:.2f}x", flush=True)
