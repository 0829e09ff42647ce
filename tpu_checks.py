"""One-command ON-CHIP verification lane (VERDICT r2 item 4).

Runs the TPU-only proofs that the CPU test suite cannot cover, each in its
OWN subprocess (only one process may hold the chip at a time), and writes a
single JSON artifact to ``results/tpu_checks.json``:

1. ``kernel_parity``   — fused NJODE kernel vs the XLA scan at a masked
   real-data-like shape, COMPILED on the chip (loss + gradients,
   'input'-mode dropout = exact stream parity), plus the shard_map-composed
   kernel on a 1-device mesh (must match the solo kernel bit-for-bit).
2. ``prng_proofs``     — the two in-kernel PRNG tests
   (``NJODE_TPU_TESTS=1 pytest tests/test_fused_scan.py -k prng``),
   including the mask-stream reconstruction grad proof.
3. ``fused_gob_parity``— fused GRU-ODE-Bayes kernel vs its XLA scan on the
   chip (loss + gradients).
4. ``grouped_sweep``   — vmap-grouped sweep epoch THROUGH the fused kernel
   ('input' masks) vs per-member solo XLA steps (loss curves + params).
5. ``blocked_kernel``  — batch-BLOCK plan at the climate-400 shape (no
   K-chunk plan exists there): compile + eval parity vs XLA + >=1.5x over
   the TRUE XLA remat fallback (``force_plan='xla'``, first-class — the
   round-3 budget-mutation A/B measured the kernel against itself).
6. ``grouped_climate`` — grouped real-data smoke: a 2-fold climate CV
   ensemble end-to-end through parallel_training(vmap_groups=True) with
   the fused kernel (the path both round-3 OOMs lived in).
7. ``grouped_physionet`` — grouped real-data smoke: 3 PhysioNet repeat
   seeds as one vmapped ensemble, fused kernel on.
8. ``bench``           — ``bench.py`` (throughput + spread + MFU fields).

Each check's artifact entry is stamped with the git SHA (``--dirty``
suffixed) and timestamp of the run that produced it; ``--only a,b``
re-runs a subset and merges, leaving carried-over entries' stamps intact.

``--fast`` (VERDICT r4 item 7) runs the SAME 8 checks with reduced
timing reps (blocked-kernel A/B 7->3, bench 7->3 via ``NJODE_BENCH_REPS``)
and writes to ``results/tpu_checks_fast.json`` so the full-profile
artifact is never clobbered by a reduced-rep run. Parity tolerances and
shapes are identical — only timing statistics get noisier. With a warm
XLA compile cache a fast run is dominated by the grouped smokes
(~10-15 min); use it mid-round, keep the full profile for round
boundaries.

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python tpu_checks.py
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
RESULT_FILE = os.path.join(REPO, "results", "tpu_checks.json")
FAST_RESULT_FILE = os.path.join(REPO, "results", "tpu_checks_fast.json")
MARK = "TPU_CHECK_RESULT "


def _fast():
    return bool(os.environ.get("NJODE_TPU_FAST"))


def _child_kernel_parity():
    import numpy as np
    import jax
    import jax.flatten_util
    import jax.numpy as jnp

    from njode_tpu.data import grid
    from njode_tpu.models import njode
    from njode_tpu.ops import fused_scan
    from njode_tpu.parallel import sharding

    assert jax.default_backend() == "tpu", jax.default_backend()
    # residual enc/dec needs hidden a multiple of input (mlp.residual_case)
    cfg = njode.NJODEConfig(
        input_size=5, hidden_size=40, output_size=5,
        ode_nn=((50, "tanh"), (50, "tanh")),
        readout_nn=((50, "tanh"), (50, "tanh")),
        enc_nn=((50, "tanh"), (50, "tanh")),
        dropout_rate=0.1, masked=True)
    rs = np.random.RandomState(0)
    B, D, K = 64, 5, 256
    dt = 1.0 / K
    paths = rs.lognormal(0, 0.2, (B, D, K + 1)).astype(np.float32)
    observed = (rs.random((B, K + 1)) < 0.2).astype(np.int64)
    observed[:, 10] = 1
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, observed, dt))
    m = (rs.random(b.M.shape) < 0.6).astype(np.float32)
    m[..., 0] = 1.0
    b = b._replace(M=b.M * m, X=b.X * b.M * m)
    batch = jax.tree.map(jnp.asarray, b)
    params = njode.init_params(jax.random.PRNGKey(1), cfg)
    rng = jax.random.PRNGKey(7)

    def loss_xla(p):
        _, loss = njode.forward(p, cfg, batch, weight=0.6, rng=rng,
                                train=True, get_loss=True, remat=True)
        return loss

    fused = fused_scan.make_fused_loss_fn(cfg, mask_mode="input")
    fused_m = fused_scan.make_fused_loss_fn(cfg, mask_mode="input",
                                            mesh=sharding.make_mesh(1))
    l_x, g_x = jax.jit(jax.value_and_grad(loss_xla))(params)
    l_f, g_f = jax.jit(jax.value_and_grad(
        lambda p: fused(p, batch, jnp.float32(0.6), rng, True)))(params)
    l_m, g_m = jax.jit(jax.value_and_grad(
        lambda p: fused_m(p, batch, jnp.float32(0.6), rng, True)))(params)
    fx = np.asarray(jax.flatten_util.ravel_pytree(g_x)[0])
    ff = np.asarray(jax.flatten_util.ravel_pytree(g_f)[0])
    fm = np.asarray(jax.flatten_util.ravel_pytree(g_m)[0])
    dl = abs(float(l_f) - float(l_x))
    dg = float(np.max(np.abs(ff - fx)))
    dl_mesh = abs(float(l_m) - float(l_f))
    dg_mesh = float(np.max(np.abs(fm - ff)))
    scale = float(np.max(np.abs(fx)))
    ok = (dl <= 1e-4 * max(1.0, abs(float(l_x)))
          and dg <= 2e-3 * max(1.0, scale)
          and dl_mesh <= 1e-6 and dg_mesh <= 1e-6 * max(1.0, scale))
    print(MARK + json.dumps({
        "ok": bool(ok), "loss_xla": float(l_x), "loss_fused": float(l_f),
        "dloss": dl, "max_dgrad": dg, "mesh1_dloss": dl_mesh,
        "mesh1_max_dgrad": dg_mesh, "shape": {"B": B, "D": D, "K": K}}))


def _child_gob_parity():
    import numpy as np
    import jax
    import jax.flatten_util
    import jax.numpy as jnp

    from njode_tpu.data import grid
    from njode_tpu.models import gru_ode_bayes as gob
    from njode_tpu.ops import fused_gob
    from njode_tpu.parallel import sharding

    assert jax.default_backend() == "tpu", jax.default_backend()
    cfg = gob.GOBConfig(input_size=5, hidden_size=50, p_hidden=25,
                        prep_hidden=10, cov_size=5, cov_hidden=50,
                        mixing=1e-4, dropout_rate=0.1, logvar=True,
                        impute=False, solver="euler", full_gru_ode=True)
    assert fused_gob.supported(cfg)
    rs = np.random.RandomState(0)
    B, D, K = 50, 5, 200
    dt = 0.1
    paths = rs.lognormal(0, 0.2, (B, D, K + 1)).astype(np.float32)
    observed = (rs.random((B, K + 1)) < 0.2).astype(np.int64)
    observed[:, 5] = 1
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, observed, dt))
    batch = jax.tree.map(jnp.asarray, b)
    params = gob.init_params(jax.random.PRNGKey(1), cfg)
    rng = jax.random.PRNGKey(3)

    def loss_xla(p):
        _, loss = gob.forward(p, cfg, batch, rng=rng, train=True,
                              get_loss=True, remat=True)
        return loss

    fused = fused_gob.make_fused_loss_fn(cfg)
    fused_m = fused_gob.make_fused_loss_fn(cfg, mesh=sharding.make_mesh(1))
    l_x, g_x = jax.jit(jax.value_and_grad(loss_xla))(params)
    l_f, g_f = jax.jit(jax.value_and_grad(
        lambda p: fused(p, batch, rng, True)))(params)
    l_m, g_m = jax.jit(jax.value_and_grad(
        lambda p: fused_m(p, batch, rng, True)))(params)
    fx = np.asarray(jax.flatten_util.ravel_pytree(g_x)[0])
    ff = np.asarray(jax.flatten_util.ravel_pytree(g_f)[0])
    fm = np.asarray(jax.flatten_util.ravel_pytree(g_m)[0])
    dl = abs(float(l_f) - float(l_x))
    dg = float(np.max(np.abs(ff - fx)))
    dl_mesh = abs(float(l_m) - float(l_f))
    dg_mesh = float(np.max(np.abs(fm - ff)))
    scale = float(np.max(np.abs(fx)))
    ok = (dl <= 1e-4 * max(1.0, abs(float(l_x)))
          and dg <= 2e-3 * max(1.0, scale)
          and dl_mesh <= 1e-5 * max(1.0, abs(float(l_f)))
          and dg_mesh <= 1e-5 * max(1.0, scale))
    print(MARK + json.dumps({
        "ok": bool(ok), "loss_xla": float(l_x), "loss_fused": float(l_f),
        "dloss": dl, "max_dgrad": dg, "mesh1_dloss": dl_mesh,
        "mesh1_max_dgrad": dg_mesh, "shape": {"B": B, "D": D, "K": K}}))


def _child_grouped_sweep():
    """Grouped-sweep training (vmapped ensemble THROUGH the fused kernel,
    'input' masks) vs per-member solo XLA steps, compiled on the chip:
    one epoch of E=3 members must reproduce each member's solo loss curve
    and updated params (the grouped path promises solo streams
    member-for-member — training/group_sweep.py)."""
    import numpy as np
    import jax
    import jax.flatten_util
    import jax.numpy as jnp
    import optax

    from njode_tpu.models import njode
    from njode_tpu.training import group_sweep
    from njode_tpu.training.steps import gather_dense_batch, make_optimizer

    assert jax.default_backend() == "tpu", jax.default_backend()
    # the bench/demo-parity shape: E=4 members of 50-50 nets at B=200,
    # K=100 is exactly the config whose MONO-plan kernel OOM'd scoped
    # VMEM under vmap (58.9M/16M, round 3) — the grouped path must plan
    # CHUNKED here (fused_scan._plan vmapped=True) and still reproduce
    # the solo streams
    cfg = njode.NJODEConfig(
        input_size=2, hidden_size=10, output_size=2,
        ode_nn=((50, "tanh"), (50, "tanh")),
        readout_nn=((50, "tanh"), (50, "tanh")),
        enc_nn=((50, "tanh"), (50, "tanh")), dropout_rate=0.1)
    E, B, K, NB = 4, 200, 100, 4
    dt = 1.0 / K
    rs = np.random.RandomState(0)
    N = NB * B
    paths = rs.lognormal(0, 0.2, (N, 2, K + 1)).astype(np.float32)
    obs = (rs.random((N, K + 1)) < 0.15).astype(np.float32)
    times = (np.arange(1, K + 1) * dt).astype(np.float32)
    dts = np.full(K, dt, dtype=np.float32)
    d_paths, d_obs = jnp.asarray(paths), jnp.asarray(obs)

    fns = group_sweep._make_group_step_fns(
        cfg, 1e-3, times, dts, None, False, ("tpu_check", 0),
        use_pallas=True, pallas_mask_mode="input")
    params_e = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[njode.init_params(jax.random.PRNGKey(50 + i), cfg)
          for i in range(E)])
    optimizer = make_optimizer(1e-3)
    opt_e = jax.vmap(optimizer.init)(params_e)
    idx_mat_e = np.stack([
        np.random.RandomState(60 + i).permutation(N).reshape(NB, B)
        for i in range(E)]).astype(np.int32)
    keys_e = jnp.stack([jax.random.split(jax.random.PRNGKey(70 + i), NB)
                        for i in range(E)])
    pe2, _, losses_g = fns["train_epoch"](
        params_e, opt_e, d_paths, d_obs, jnp.asarray(idx_mat_e),
        jnp.float32(0.5), keys_e, jnp.ones((NB,), jnp.float32))
    pg = jax.device_get(pe2)
    losses_g = np.asarray(losses_g)

    d_times, d_dts = jnp.asarray(times), jnp.asarray(dts)

    @jax.jit
    def solo_step(p, o, idx, key):
        def loss_fn(pp):
            b = gather_dense_batch(d_paths, d_obs, idx, d_times, d_dts)
            _, loss = njode.forward(pp, cfg, b, weight=jnp.float32(0.5),
                                    rng=key, train=True, get_loss=True)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(p)
        upd, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, upd), o, loss

    dl_max, dg_max, scale = 0.0, 0.0, 1.0
    for i in range(E):
        p = njode.init_params(jax.random.PRNGKey(50 + i), cfg)
        o = optimizer.init(p)
        for j in range(NB):
            p, o, loss = solo_step(p, o, jnp.asarray(idx_mat_e[i, j]),
                                   keys_e[i, j])
            dl_max = max(dl_max, abs(float(loss) -
                                     float(losses_g[j, i])))
        fs = np.asarray(jax.flatten_util.ravel_pytree(p)[0])
        fg = np.asarray(jax.flatten_util.ravel_pytree(
            jax.tree.map(lambda x: x[i], pg))[0])
        scale = max(scale, float(np.max(np.abs(fs))))
        dg_max = max(dg_max, float(np.max(np.abs(fs - fg))))
    ok = dl_max <= 1e-4 and dg_max <= 2e-3 * scale
    print(MARK + json.dumps({
        "ok": bool(ok), "max_dloss": dl_max, "max_dparam": dg_max,
        "shape": {"E": E, "B": B, "K": K, "n_batches": NB}}))


def _child_blocked_kernel():
    """Batch-BLOCK plan on the chip at the exact climate-400 shape (the
    400-wide wall: no K-chunk plan exists at B=100 — 17.02M scoped VMEM vs
    the 16M limit at CK=8). The blocked kernel must compile, match the XLA
    scan on the no-dropout eval loss, produce finite training gradients,
    and keep its measured edge over the XLA remat fallback (2.35-2.41x
    measured; gate at 1.5x to catch layout regressions)."""
    import time as _time

    import numpy as np
    import jax
    import jax.numpy as jnp

    from njode_tpu.data import grid
    from njode_tpu.models import njode
    from njode_tpu.ops import fused_scan

    assert jax.default_backend() == "tpu", jax.default_backend()
    D, H, B, K = 5, 50, 100, 2004
    W = ((400, "tanh"), (400, "tanh"))
    cfg = njode.NJODEConfig(input_size=D, hidden_size=H, output_size=D,
                            ode_nn=W, readout_nn=W, enc_nn=W,
                            dropout_rate=0.1, masked=True)
    rs = np.random.RandomState(0)
    paths = rs.lognormal(0.0, 0.2, size=(B, D, K + 1))
    observed = (rs.random((B, K + 1)) < 0.08).astype(np.int64)
    observed[:, 0] = 0
    for i in range(B):
        if observed[i, 1:].sum() == 0:
            observed[i, 3] = 1
    b = grid.batch_from_paths(paths, observed, 1.0 / K)
    m = (rs.random((K, B, D)) < 0.6).astype(np.float32)
    m[..., 0] = 1.0
    M = m * np.asarray(b.obs)[:, :, None]
    b = b._replace(M=jnp.asarray(M), X=b.X * jnp.asarray(M))
    batch = jax.tree.map(jnp.asarray, grid.recompute_n_obs(b))
    spec = fused_scan._Spec(cfg, "prng")
    assert fused_scan._plan(spec, K, B, True) is None
    bplan = fused_scan._block_plan(spec, K, B, True)
    params = njode.init_params(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(7)

    def timed(fn, reps=3 if _fast() else 7):
        out = fn(params)
        jax.block_until_ready(out)
        t0 = _time.time()
        for _ in range(reps):
            out = fn(params)
        jax.block_until_ready(out)
        return (_time.time() - t0) / reps, out

    fused = fused_scan.make_fused_loss_fn(cfg, mask_mode="prng")
    vg = jax.jit(jax.value_and_grad(
        lambda p: fused(p, batch, jnp.float32(0.5), key, True)))
    t_blk, (l_blk, g_blk) = timed(vg)
    finite = all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(g_blk))
    le_blk = fused(params, batch, jnp.float32(0.5), key, False)
    _, le_xla = njode.forward(params, cfg, batch, weight=0.5, train=False,
                              get_loss=True)
    rel = abs(float(le_blk) - float(le_xla)) / abs(float(le_xla))

    # first-class plan forcing (fused_scan._select_plan): the round-3
    # version of this A/B zeroed the module budgets at factory time and
    # restored them BEFORE the jit traced — plan selection happens at
    # trace time, so the "XLA" arm silently ran the blocked kernel too
    # and the check measured the kernel against itself (VERDICT r3 #1)
    xla = fused_scan.make_fused_loss_fn(cfg, mask_mode="prng",
                                        force_plan="xla")
    vg_x = jax.jit(jax.value_and_grad(
        lambda p: xla(p, batch, jnp.float32(0.5), key, True)))
    t_xla, _ = timed(vg_x)
    speedup = t_xla / t_blk
    ok = (bplan is not None and finite and rel <= 1e-5 and speedup >= 1.5)
    print(MARK + json.dumps({
        "ok": bool(ok), "block_plan": list(bplan) if bplan else None,
        "ms_step_blocked": round(t_blk * 1e3, 1),
        "ms_step_xla_remat": round(t_xla * 1e3, 1),
        "speedup": round(speedup, 2), "eval_rel_diff": rel,
        "grads_finite": bool(finite),
        "shape": {"B": B, "D": D, "K": K, "width": 400}}))


def _child_grouped_climate():
    """Grouped REAL-DATA on-chip smoke (VERDICT r3 item 7): a climate
    fold-ensemble (2 folds as one vmapped group over the shared prestacked
    bank) through sweeps.parallel_training(vmap_groups=True) with the
    fused kernel, at stand-in scale. Both round-3 OOMs (vmapped mono
    scoped VMEM, fused-draw HBM) lived exactly in this path and were
    caught only by ad-hoc study runs — this makes the lane own it. Passes
    iff the run actually GROUPED (no solo fallback), returned 0s, and
    every member's metric CSV is finite."""
    import contextlib
    import io
    import tempfile

    import numpy as np
    import pandas as pd
    import jax

    from njode_tpu.data import climate as cdu
    from njode_tpu.training import sweeps

    assert jax.default_backend() == "tpu", jax.default_backend()
    with tempfile.TemporaryDirectory() as d:
        csv = os.path.join(d, "small_chunked_sporadic.csv")
        cdu.make_synthetic_climate_csv(csv, n_series=40, n_vars=3, T=20.0,
                                       obs_perc=0.06, seed=3)
        cdu.make_fold_indices(d, n_series=40, n_folds=2, seed=1)
        smp = os.path.join(d, "saved_models")
        ps = [dict(dataset="climate", epochs=2, batch_size=16, save_every=1,
                   learning_rate=0.01, hidden_size=9, dropout_rate=0.1,
                   ode_nn=((12, "tanh"),), readout_nn=((12, "tanh"),),
                   enc_nn=((12, "tanh"),), data_index=f, climate_dir=d,
                   T=20.0, delta_t=0.1, T_val=15.0, max_val_samples=3,
                   use_pallas=True, saved_models_path=smp)
              for f in range(2)]
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rets = sweeps.parallel_training(params=ps, vmap_groups=True)
        grouped = "climate vmap group: 2 members" in buf.getvalue()
        finite, rows = True, {}
        for mid in (1, 2):
            df = pd.read_csv(os.path.join(smp, f"id-{mid}",
                                          f"metric_id-{mid}.csv"),
                             index_col=0)
            cols = ["train_loss", "eval_loss", "eval_metric",
                    "test_loss", "test_metric"]
            finite = finite and bool(np.isfinite(df[cols].values).all())
            rows[f"id{mid}_eval_metric"] = float(df["eval_metric"].iloc[-1])
        ok = rets == [0, 0] and grouped and finite
        print(MARK + json.dumps(dict(
            {"ok": bool(ok), "returns": rets, "grouped": bool(grouped),
             "metrics_finite": bool(finite)}, **rows)))


def _child_grouped_physionet():
    """Grouped PhysioNet repeat-ensemble on-chip smoke (VERDICT r3 item 7):
    3 repeat seeds as one vmapped group over the shared prestacked record
    bank, fused kernel on, stand-in records. Same pass criteria as the
    climate sibling, plus repeats must genuinely differ."""
    import contextlib
    import io
    import tempfile

    import numpy as np
    import pandas as pd
    import jax

    from njode_tpu.data import physionet as pdu
    from njode_tpu.training import sweeps

    assert jax.default_backend() == "tpu", jax.default_backend()
    records = pdu.make_synthetic_records(24, n_vars=4, max_hours=48.0,
                                         quantization=2.0, obs_perc=0.25,
                                         seed=23)
    with tempfile.TemporaryDirectory() as d:
        smp = os.path.join(d, "saved_models")
        ps = [dict(dataset="physionet", epochs=2, batch_size=10,
                   save_every=1, learning_rate=0.01, hidden_size=8,
                   dropout_rate=0.1, ode_nn=((12, "tanh"),),
                   readout_nn=((12, "tanh"),), enc_nn=((12, "tanh"),),
                   quantization=2.0, n_samples=24, records=records,
                   repeat_seed=r, use_pallas=True, saved_models_path=smp)
              for r in range(3)]
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rets = sweeps.parallel_training(params=ps, vmap_groups=True)
        grouped = "physionet vmap group: 3 members" in buf.getvalue()
        finite, curves = True, []
        for mid in (1, 2, 3):
            df = pd.read_csv(os.path.join(smp, f"id-{mid}",
                                          f"metric_id-{mid}.csv"),
                             index_col=0)
            cols = ["train_loss", "eval_loss", "eval_metric",
                    "eval_metric_2"]
            finite = finite and bool(np.isfinite(df[cols].values).all())
            curves.append(df["train_loss"].values)
        differ = not np.array_equal(curves[0], curves[1])
        ok = rets == [0, 0, 0] and grouped and finite and differ
        print(MARK + json.dumps(
            {"ok": bool(ok), "returns": rets, "grouped": bool(grouped),
             "metrics_finite": bool(finite), "repeats_differ": bool(differ),
             "final_train_loss": [float(c[-1]) for c in curves]}))


CHILDREN = {"kernel_parity": _child_kernel_parity,
            "gob_parity": _child_gob_parity,
            "grouped_sweep": _child_grouped_sweep,
            "blocked_kernel": _child_blocked_kernel,
            "grouped_climate": _child_grouped_climate,
            "grouped_physionet": _child_grouped_physionet}


def _run_child(name, timeout=1800):
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", name],
        capture_output=True, text=True, timeout=timeout, cwd=REPO)
    out = proc.stdout
    res = None
    for line in out.splitlines():
        if line.startswith(MARK):
            res = json.loads(line[len(MARK):])
    if res is None:
        res = {"ok": False, "error": (proc.stderr or out)[-2000:],
               "returncode": proc.returncode}
    res["seconds"] = round(time.time() - t0, 1)
    return res


def _run_prng_proofs(timeout=1800):
    t0 = time.time()
    env = dict(os.environ, NJODE_TPU_TESTS="1")
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_fused_scan.py",
         "-k", "prng", "-q", "--no-header"],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env)
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout else ""
    return {"ok": proc.returncode == 0 and "passed" in tail,
            "pytest_tail": tail, "seconds": round(time.time() - t0, 1)}


def _run_bench(timeout=1800):
    t0 = time.time()
    env = dict(os.environ)
    if _fast():
        env["NJODE_BENCH_REPS"] = "3"
    proc = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                          text=True, timeout=timeout, cwd=REPO, env=env)
    res = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                res = json.loads(line)
            except json.JSONDecodeError:
                pass
    if res is None:
        return {"ok": False, "error": (proc.stderr or "")[-2000:],
                "seconds": round(time.time() - t0, 1)}
    # driver target (>=20x) plus the MFU/arithmetic-intensity fields
    # (VERDICT r3 item 8) — regressions must surface as MFU shifts too
    res["ok"] = (res.get("vs_baseline", 0) >= 20.0
                 and all(k in res for k in ("flops_per_path",
                                            "device_tflops", "mfu_pct")))
    res["seconds"] = round(time.time() - t0, 1)
    return res


ALL_CHECKS = {
    "kernel_parity": lambda: _run_child("kernel_parity"),
    "prng_proofs": _run_prng_proofs,
    "fused_gob_parity": lambda: _run_child("gob_parity"),
    "grouped_sweep": lambda: _run_child("grouped_sweep"),
    "blocked_kernel": lambda: _run_child("blocked_kernel"),
    "grouped_climate": lambda: _run_child("grouped_climate"),
    "grouped_physionet": lambda: _run_child("grouped_physionet"),
    "bench": _run_bench,
}


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        CHILDREN[sys.argv[2]]()
        return
    args = sys.argv[1:]
    # --fast: same 8 checks, reduced timing reps, separate artifact file
    # (children inherit the env var; see module docstring)
    fast = "--fast" in args
    if fast:
        args.remove("--fast")
        os.environ["NJODE_TPU_FAST"] = "1"
    result_file = FAST_RESULT_FILE if fast else RESULT_FILE
    # --only a,b : re-run a subset, merging into the existing artifact
    selected = list(ALL_CHECKS)
    if len(args) > 1 and args[0] == "--only":
        selected = args[1].split(",")
        unknown = [n for n in selected if n not in ALL_CHECKS]
        if unknown:
            print(f"unknown check(s) {unknown}; "
                  f"valid: {','.join(ALL_CHECKS)}")
            sys.exit(2)
    try:
        sha = subprocess.run(
            ["git", "describe", "--always", "--dirty"], capture_output=True,
            text=True, cwd=os.path.dirname(os.path.abspath(__file__)),
            timeout=10).stdout.strip() or None
    except (OSError, subprocess.SubprocessError):
        sha = None
    results = {"timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
               "git": sha, "profile": "fast" if fast else "full",
               "checks": {}}
    if os.path.exists(result_file) and selected != list(ALL_CHECKS):
        # --only merge: checks carried over from the prior artifact keep
        # their OWN git/timestamp stamps — re-stamping them at the current
        # HEAD would claim they were verified at a commit where they never
        # ran (ADVICE r3). Each check's entry is stamped when it runs.
        with open(result_file) as f:
            results["checks"] = json.load(f).get("checks", {})
    for name in selected:
        print(f"== {name} ==")
        try:
            results["checks"][name] = ALL_CHECKS[name]()
        except subprocess.TimeoutExpired as e:
            # a hung check must not lose the completed checks' results —
            # record the failure and keep going so the artifact is written
            results["checks"][name] = {"ok": False,
                                       "error": f"timeout after {e.timeout}s"}
        results["checks"][name]["git"] = sha
        results["checks"][name]["timestamp"] = time.strftime(
            "%Y-%m-%dT%H:%M:%S")
        print(json.dumps(results["checks"][name]))
    results["ok"] = all(c.get("ok") for c in results["checks"].values())
    os.makedirs(os.path.dirname(result_file), exist_ok=True)
    with open(result_file, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"tpu_checks_ok": results["ok"],
                      "artifact": result_file}))
    sys.exit(0 if results["ok"] else 1)


if __name__ == "__main__":
    main()
