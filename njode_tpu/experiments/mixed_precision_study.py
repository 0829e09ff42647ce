"""Mixed-precision (compute_dtype='bfloat16') throughput study on TPU.

Times the XLA-scan train step (value_and_grad + Adam update) fp32 vs
bf16-operand matmuls at the bench/demo shape and at scaled-up widths and
batch sizes where the MXU is actually fed.  Device-only timing: the batch
lives on device, each rep blocks on the updated params.

Run on the real chip:
    PYTHONPATH=/root/repo:/root/.axon_site \
        python -m njode_tpu.experiments.mixed_precision_study

No reference counterpart (the reference trains fp32/fp64,
/root/reference/NJODE/models.py); this probes the TPU-native option.
Results land in results/RESULTS.md ("Mixed precision" section).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from njode_tpu.data import grid
from njode_tpu.models import njode


def make_batch(B, K, D, seed=0, obs_perc=0.1):
    rs = np.random.RandomState(seed)
    dt = 1.0 / K
    paths = rs.lognormal(0.0, 0.3, size=(B, D, K + 1))
    obs = (rs.random((B, K + 1)) < obs_perc).astype(np.int64)
    obs[:, 0] = 0
    for i in range(B):
        if obs[i].sum() == 0:
            obs[i, 1 + rs.randint(K)] = 1
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, obs, dt))
    return jax.tree.map(jnp.asarray, b)


def model_macs_per_pathstep(params, cfg):
    """Matmul MACs per (path, grid-step): every Linear/GRU weight is
    applied once per scan step (readouts are stacked: 2 readout
    applications ride one doubled-batch matmul, already reflected by
    counting the readout weights twice)."""
    apps = {"ode": 1, "encoder": 1, "readout": 2, "gru": 1}
    total = 0
    for name, mult in apps.items():
        if name not in params:
            continue
        for leaf in jax.tree.leaves(params[name]):
            if leaf.ndim == 2:
                total += mult * leaf.shape[0] * leaf.shape[1]
    return total


def time_step(cfg, batch, seed=1, reps=10, warmup=3):
    params = njode.init_params(jax.random.PRNGKey(seed), cfg)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            return njode.forward(p, cfg, batch, train=True, rng=rng,
                                 get_loss=True)[1]
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    rngs = jax.random.split(jax.random.PRNGKey(seed + 1), warmup + 2 * reps)
    for i in range(warmup):
        params, opt_state, loss = step(params, opt_state, rngs[i])
    jax.block_until_ready(params)
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, rngs[warmup + i])
        jax.block_until_ready(params)
        ts.append(time.perf_counter() - t0)
    # back-to-back dispatch: amortizes the ~26 ms remote-tunnel round trip
    # so the per-step number approximates pure device time (cf. bench.py's
    # pipelined_paths_per_sec)
    t0 = time.perf_counter()
    for i in range(reps):
        params, opt_state, loss = step(params, opt_state,
                                       rngs[warmup + reps + i])
    jax.block_until_ready(params)
    piped = (time.perf_counter() - t0) / reps
    macs = model_macs_per_pathstep(params, cfg)
    return float(np.median(ts)), float(piped), float(loss), macs


SHAPES = [
    # (tag, B, K, D, width, hidden)
    ("bench-shape", 200, 100, 1, 50, 10),
    ("wide-512", 2048, 100, 1, 512, 256),
    ("wide-1024", 4096, 50, 1, 1024, 512),
]


def run(shapes=SHAPES, reps=10):
    rows = []
    for tag, B, K, D, W, H in shapes:
        batch = make_batch(B, K, D)
        row = {"tag": tag, "B": B, "K": K, "D": D, "width": W, "hidden": H}
        for cd in ("float32", "bfloat16"):
            cfg = njode.NJODEConfig(
                input_size=D, hidden_size=H, output_size=D,
                ode_nn=((W, "tanh"),), readout_nn=((W, "tanh"),),
                enc_nn=((W, "tanh"),), dropout_rate=0.1, compute_dtype=cd)
            med, piped, loss, macs = time_step(cfg, batch, reps=reps)
            # fwd 2*MACs, backward ~2x fwd => 6*MACs FLOPs per path-step
            tflops = 6.0 * macs * B * K / piped / 1e12
            row[cd] = {"step_s": round(med, 5),
                       "piped_step_s": round(piped, 5),
                       "paths_per_s": round(B / piped),
                       "approx_tflops": round(tflops, 2),
                       "loss": round(loss, 4)}
            print(json.dumps({**{k: row[k] for k in
                                 ("tag", "B", "K", "width")},
                              "dtype": cd, **row[cd]}), flush=True)
        row["speedup"] = round(row["float32"]["piped_step_s"] /
                               row["bfloat16"]["piped_step_s"], 3)
        rows.append(row)
    print(json.dumps({"summary": [{r["tag"]: r["speedup"]} for r in rows]}))
    return rows


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    run()
