"""Benchmark: NJODE training throughput (paths/sec/chip) on the demo-parity
configuration, vs the reference's ~200 paths/sec CPU baseline (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

BASELINE_PATHS_PER_SEC = 200.0  # reference: ~78-84 s/epoch for 16k paths

# v5e peak: 197 TFLOP/s bf16 (fp32 via MXU passes is lower; using the bf16
# figure keeps mfu_pct conservative and comparable across rounds).
PEAK_TFLOPS = 197.0


def train_flops_per_path(cfg, n_steps):
    """Matmul FLOPs one path costs per TRAINING step, from the config's
    net widths: per grid step the dense scan applies ode_f once, the
    encoder once (jump candidate), and the readout twice (pre- and
    post-jump, njode.forward); backward ~2x forward => 3x total. Makes
    perf regressions surface as MFU shifts, not only paths/s
    (VERDICT r3 item 8)."""
    from njode_tpu.models import njode

    fwd = 0
    for which, mult in (("ode_f", 1), ("encoder", 1), ("readout", 2)):
        ws = njode.net_widths(cfg, which)
        fwd += mult * sum(2 * a * b for a, b in zip(ws[:-1], ws[1:]))
    return 3 * n_steps * fwd


def simulate_bs_paths(n_paths, n_steps, dt, drift=2.0, vol=0.3, seed=0):
    """Host-side Black-Scholes Euler sim (vectorized numpy) — keeps bench
    startup free of an extra device compile; training is what we measure."""
    rs = np.random.RandomState(seed)
    x = np.ones((n_paths, 1), dtype=np.float64)
    out = [x]
    for _ in range(n_steps):
        dW = rs.normal(0.0, 1.0, x.shape) * np.sqrt(dt)
        x = x + drift * x * dt + vol * x * dW
        out.append(x)
    return np.stack(out, axis=-1).astype(np.float32)  # [N, 1, T+1]


def main():
    import jax
    import jax.numpy as jnp

    from njode_tpu.models import njode
    from njode_tpu.training.steps import make_optimizer, make_step_fns

    # demo-parity config (BASELINE.md): 16k train paths, batch 200,
    # hidden 10, 50-50 tanh nets, 100 grid steps, dropout 0.1
    N, B, K = 16_000, 200, 100
    dt = 1.0 / K
    paths = simulate_bs_paths(N, K, dt)
    rs = np.random.RandomState(1)
    obs = (rs.random((N, K + 1)) < 0.1).astype(np.float32)
    times = (np.arange(1, K + 1) * dt).astype(np.float32)
    dts = np.full(K, dt, dtype=np.float32)

    cfg = njode.NJODEConfig(
        input_size=1, hidden_size=10, output_size=1,
        ode_nn=((50, "tanh"), (50, "tanh")),
        readout_nn=((50, "tanh"), (50, "tanh")),
        enc_nn=((50, "tanh"), (50, "tanh")),
        dropout_rate=0.1)
    params = njode.init_params(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(params)
    # fused Pallas scan kernel on TPU; XLA scan elsewhere
    use_pallas = jax.default_backend() == "tpu"
    fns = make_step_fns(cfg, optimizer, times, dts, use_pallas=use_pallas)

    d_paths = jnp.asarray(paths)
    d_obs = jnp.asarray(obs)
    key = jax.random.PRNGKey(2)
    perm = np.random.RandomState(3).permutation(N).astype(np.int32)
    idx_mat = jnp.asarray(perm.reshape(N // B, B))

    # warmup / compile: one full fused epoch (80 batches in ONE device call)
    params, opt_state, losses = fns["train_epoch"](
        params, opt_state, d_paths, d_obs, idx_mat,
        jnp.float32(0.5), jax.random.fold_in(key, 0))
    jax.block_until_ready(losses)

    # timed: N_REP epochs (each 80 steps x 200 paths = 16k paths), each
    # individually blocked — wall time INCLUDING one remote-tunnel dispatch
    # round trip per epoch. The spread field makes run-to-run dispersion a
    # first-class part of the artifact (the historical 152-180k band).
    # NJODE_BENCH_REPS trims reps for the lane's --fast profile.
    N_REP = int(os.environ.get("NJODE_BENCH_REPS", "7"))
    reps = []
    for r in range(N_REP):
        t0 = time.perf_counter()
        params, opt_state, losses = fns["train_epoch"](
            params, opt_state, d_paths, d_obs, idx_mat,
            jnp.float32(0.5), jax.random.fold_in(key, 1 + r))
        jax.block_until_ready(losses)
        reps.append(time.perf_counter() - t0)
    elapsed = sorted(reps)[N_REP // 2]

    # dispersion diagnosis: dispatch N_REP epochs back-to-back and block
    # ONCE — the per-epoch cost then carries a single round trip for the
    # whole bundle, so (median_wall - pipelined) isolates the per-dispatch
    # tunnel/host component from true device time.
    t0 = time.perf_counter()
    for r in range(N_REP):
        params, opt_state, losses = fns["train_epoch"](
            params, opt_state, d_paths, d_obs, idx_mat,
            jnp.float32(0.5), jax.random.fold_in(key, 100 + r))
    jax.block_until_ready(losses)
    pipelined = (time.perf_counter() - t0) / N_REP

    # production default at scale: N epochs (+ in-program eval hooks) as
    # ONE device program (trainer option 'epoch_chunk'; steps.train_epochs,
    # per-epoch-loop parity tested) — amortizes the ~26 ms tunnel dispatch
    # round trip that dominates the per-epoch spread above.
    CH = 7
    val_idx = jnp.arange(8, dtype=jnp.int32)    # minimal in-program eval
    def chunk_args(r):
        mats = jnp.asarray(np.stack([
            np.random.RandomState(50 + r * CH + j).permutation(N).astype(
                np.int32).reshape(N // B, B) for j in range(CH)]))
        return (mats, jnp.full(CH, 0.5, jnp.float32),
                jnp.stack([jax.random.fold_in(key, 200 + r * CH + j)
                           for j in range(CH)]))
    mats, ws, rngs = chunk_args(0)
    params, opt_state, *_ = fns["train_epochs"](
        params, opt_state, d_paths, d_obs, mats, ws, rngs,
        d_paths, d_obs, val_idx, False)
    jax.block_until_ready(params)
    creps = []
    for r in range(1, 4):
        mats, ws, rngs = chunk_args(r)
        t0 = time.perf_counter()
        params, opt_state, *_ = fns["train_epochs"](
            params, opt_state, d_paths, d_obs, mats, ws, rngs,
            d_paths, d_obs, val_idx, False)
        jax.block_until_ready(params)
        creps.append((time.perf_counter() - t0) / CH)
    chunked = sorted(creps)[1]

    paths_per_sec = N / chunked
    per_epoch = N / elapsed
    flops_path = train_flops_per_path(cfg, K)
    tflops = paths_per_sec * flops_path / 1e12
    print(json.dumps({
        "metric": "train_throughput_paths_per_sec_per_chip",
        "value": round(paths_per_sec, 1),
        "unit": "paths/sec/chip",
        "vs_baseline": round(paths_per_sec / BASELINE_PATHS_PER_SEC, 2),
        "flops_per_path": flops_path,
        "device_tflops": round(tflops, 3),
        "mfu_pct": round(100.0 * tflops / PEAK_TFLOPS, 3),
        "epoch_chunk": CH,
        "per_epoch_dispatch": {
            "paths_per_sec": round(per_epoch, 1),
            "spread": {"n": N_REP,
                       "min": round(N / max(reps), 1),
                       "max": round(N / min(reps), 1)},
            "epoch_s": [round(t, 4) for t in reps]},
        "pipelined_paths_per_sec": round(N / pipelined, 1),
    }))


if __name__ == "__main__":
    main()
