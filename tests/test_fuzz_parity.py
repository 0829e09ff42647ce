"""Randomized-config parity fuzz (seeded, deterministic).

The direct parity tests (tests/test_reference_parity.py) pin specific
option combos; these fuzz tests sweep RANDOM architectures and option
combinations through the same gold-standard comparisons:

1. our forward vs the reference torch NJODE (transplanted weights,
   identical inputs) — loss, terminal h, full predicted path;
2. the fused Pallas kernel (interpret mode, 'input' dropout) vs our XLA
   scan — loss AND parameter gradients.

A failure prints the config, and the draw is reproducible from the case
seed.
"""

import os

import numpy as np
import pytest

from conftest import add_reference_to_path, reference_available

import jax
import jax.flatten_util  # noqa: F401  (jax.flatten_util.ravel_pytree)
import jax.numpy as jnp

from njode_tpu.data import grid
from njode_tpu.models import njode

ACTS = ("tanh", "relu")


def _random_cfg(rs, for_kernel=False):
    D = int(rs.randint(1, 4))
    hidden = D * int(rs.randint(2, 8))

    def net():
        depth = int(rs.randint(1, 3))
        return tuple((int(rs.randint(6, 33)), ACTS[rs.randint(2)])
                     for _ in range(depth))

    return njode.NJODEConfig(
        input_size=D, hidden_size=hidden, output_size=D,
        ode_nn=net(), readout_nn=net(), enc_nn=net(),
        use_rnn=bool(rs.randint(2)), bias=True,
        dropout_rate=0.1 if for_kernel else 0.0,
        which_loss=("standard", "easy")[rs.randint(2)],
        residual_enc_dec=bool(rs.randint(2)),
        input_current_t=bool(rs.randint(2)),
        masked=bool(rs.randint(2)))


@pytest.mark.skipif(not reference_available(),
                    reason="reference not available")
@pytest.mark.parametrize("case", range(8))
def test_fuzz_forward_parity_vs_reference(case):
    from test_reference_parity import (build_pair, make_data,
                                       ref_ordered_path, run_reference)

    add_reference_to_path()
    rs = np.random.RandomState(1000 + case)
    cfg = _random_cfg(rs)
    weight = float(rs.uniform(0.3, 0.8))
    paths, observed, dt = make_data(seed=2000 + case, D=cfg.input_size)
    params, ref = build_pair(cfg, seed=case)

    ev = grid.events_from_paths(paths, observed, dt)
    M_ev = None
    if cfg.masked:
        M_ev = rs.randint(0, 2, size=ev["X"].shape).astype(np.float32)
        b = grid.batch_from_events(
            ev["times"], ev["time_ptr"], ev["X"], ev["obs_idx"], dt, 1.0,
            ev["start_X"], M=M_ev)
    else:
        b = grid.batch_from_paths(paths, observed, dt)
    b = grid.recompute_n_obs(b)
    bj = jax.tree.map(jnp.asarray, b)

    hT, loss, (y0, y_pre, y_post) = njode.forward(
        params, cfg, bj, weight=weight, train=False, get_loss=True,
        return_path=True)
    h_ref, loss_ref, _, path_y_ref = run_reference(
        ref, ev, dt, T=1.0, M=M_ev, weight=weight, n_obs=b.n_obs_ot)

    msg = f"case {case}: {cfg}"
    assert np.allclose(float(loss), loss_ref, rtol=5e-5, atol=1e-6), msg
    assert np.allclose(np.asarray(hT), h_ref, rtol=2e-4, atol=1e-5), msg
    ours = ref_ordered_path(y0, y_pre, y_post, b.obs, b.dt)
    assert ours.shape == path_y_ref.shape, msg
    assert np.allclose(ours, path_y_ref, rtol=2e-4, atol=1e-5), msg


@pytest.mark.skipif(not reference_available(),
                    reason="reference not available")
@pytest.mark.parametrize("case", range(8))
def test_fuzz_oracle_parity_vs_reference(case):
    """Random hyperparameters (drift/vol/mean/speed/correlation, random
    sine coefficient) through the conditional-expectation oracle of every
    model family vs the reference's numpy oracle on a random observation
    pattern."""
    from test_reference_parity import make_data

    from njode_tpu.data import oracle, sde

    add_reference_to_path()
    from NJODE import stock_model as ref_stock

    rs = np.random.RandomState(6000 + case)
    name = ("BlackScholes", "OrnsteinUhlenbeck", "Heston",
            "HestonWOFeller")[case % 4]
    hp = dict(drift=float(rs.uniform(-1.0, 3.0)),
              volatility=float(rs.uniform(0.1, 0.6)),
              mean=float(rs.uniform(0.5, 5.0)),
              speed=float(rs.uniform(0.5, 4.0)),
              correlation=float(rs.uniform(-0.8, 0.8)),
              nb_paths=6, nb_steps=20, S0=1.0, maturity=1.0, dimension=1,
              sine_coeff=(None if rs.randint(2) == 0
                          else float(2 * np.pi * rs.uniform(0.5, 2.0))))
    if name == "HestonWOFeller":
        hp.update(scheme="euler", return_vol=False, v0=float(
            rs.uniform(0.5, 2.0)))
    paths, observed, dt = make_data(seed=7000 + case, B=6, D=1, steps=20)
    ev = grid.events_from_paths(paths, observed, dt)
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, observed, dt))
    bj = jax.tree.map(jnp.asarray, b)

    ours = sde.make_model(name, hp)
    ref = ref_stock.STOCK_MODELS[name](**hp)
    loss_ref, _, path_y_ref = ref.compute_cond_exp(
        ev["times"], ev["time_ptr"], ev["X"].astype(np.float64),
        ev["obs_idx"], dt, 1.0, ev["start_X"].astype(np.float64),
        b.n_obs_ot.astype(np.float64), return_path=True, get_loss=True)

    msg = f"case {case}: {name} {hp}"
    y_pre, y_post = oracle.cond_exp_paths(ours.next_cond_exp, bj)
    ours_path = np.concatenate(
        [b.start_X[None],
         np.stack([x for k in range(b.num_steps)
                   for x in ([np.asarray(y_pre[k])] +
                             ([np.asarray(y_post[k])]
                              if b.obs[k].sum() > 0 else []))])])
    assert ours_path.shape == path_y_ref.shape, msg
    assert np.allclose(ours_path, path_y_ref, rtol=1e-4, atol=1e-6), msg
    opt = oracle.optimal_loss(ours.next_cond_exp, bj, weight=0.5)
    assert np.allclose(float(opt), float(loss_ref),
                       rtol=5e-5, atol=1e-7), msg


@pytest.mark.skipif(not reference_available(),
                    reason="reference not available")
@pytest.mark.parametrize("case", range(6))
def test_fuzz_gob_parity_vs_reference(case):
    from test_gru_ode_bayes import (build_pair, make_data, ref_ordered,
                                    run_reference)

    from njode_tpu.models import gru_ode_bayes as gob

    add_reference_to_path()
    rs = np.random.RandomState(4000 + case)
    D = int(rs.randint(1, 4))
    cfg = gob.GOBConfig(
        input_size=D, hidden_size=int(rs.randint(5, 24)),
        p_hidden=int(rs.randint(4, 20)), prep_hidden=int(rs.randint(2, 7)),
        cov_size=D, cov_hidden=int(rs.randint(2, 12)),
        logvar=bool(rs.randint(2)), mixing=float(rs.uniform(0.0, 2.0)),
        full_gru_ode=bool(rs.randint(2)),
        solver=("euler", "midpoint")[rs.randint(2)],
        impute=bool(rs.randint(2)))
    paths, observed, dt = make_data(seed=5000 + case, D=D)
    params, ref = build_pair(cfg, seed=case)
    ev = grid.events_from_paths(paths, observed, dt)
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, observed, dt))
    bj = jax.tree.map(jnp.asarray, b)

    hT, loss, (p0, p_pre, p_post) = gob.forward(
        params, cfg, bj, train=False, get_loss=True, return_path=True)
    h_ref, loss_ref, _, path_p_ref = run_reference(ref, ev, dt, T=1.0)

    msg = f"case {case}: {cfg}"
    assert np.allclose(float(loss), loss_ref, rtol=5e-5, atol=1e-5), msg
    assert np.allclose(np.asarray(hT), h_ref, rtol=2e-4, atol=1e-5), msg
    ours = ref_ordered(p0, p_pre, p_post, b.obs, b.dt)
    assert ours.shape == path_p_ref.shape, msg
    assert np.allclose(ours, path_p_ref, rtol=2e-4, atol=1e-5), msg


@pytest.mark.parametrize("case", range(5))
def test_fuzz_fused_kernel_parity(case):
    from njode_tpu.ops import fused_scan

    rs = np.random.RandomState(3000 + case)
    cfg = _random_cfg(rs, for_kernel=True)
    if not fused_scan.supported(cfg):
        pytest.skip(f"config not kernel-supported: {cfg}")
    B, steps = 6, 16
    dt = 1.0 / steps
    paths = rs.lognormal(0.0, 0.3,
                         (B, cfg.input_size, steps + 1)).astype(np.float64)
    observed = (rs.random((B, steps + 1)) < 0.35).astype(np.int64)
    observed[0, steps] = 1
    for i in range(B):
        if observed[i, 1:].sum() == 0:
            observed[i, 1 + rs.randint(steps)] = 1
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, observed, dt))
    if cfg.masked:
        m = (rs.random(b.M.shape) < 0.7).astype(np.float32)
        b = b._replace(M=b.M * m, X=b.X * b.M * m)
    bj = jax.tree.map(jnp.asarray, b)
    params = njode.init_params(jax.random.PRNGKey(100 + case), cfg)
    rng = jax.random.PRNGKey(200 + case)
    fused = fused_scan.make_fused_loss_fn(cfg, interpret=True,
                                          mask_mode="input")

    def loss_kernel(p):
        return fused(p, bj, jnp.float32(0.5), rng, True)

    def loss_xla(p):
        _, loss = njode.forward(p, cfg, bj, weight=0.5, rng=rng,
                                train=True, get_loss=True)
        return loss

    msg = f"case {case}: {cfg}"
    lk, gk = jax.value_and_grad(loss_kernel)(params)
    lx, gx = jax.value_and_grad(loss_xla)(params)
    assert np.allclose(float(lk), float(lx), rtol=2e-5, atol=1e-7), msg
    flat_k, _ = jax.flatten_util.ravel_pytree(gk)
    flat_x, _ = jax.flatten_util.ravel_pytree(gx)
    np.testing.assert_allclose(np.asarray(flat_k), np.asarray(flat_x),
                               rtol=5e-4, atol=5e-6, err_msg=msg)


@pytest.mark.skipif(not reference_available(),
                    reason="reference not available")
@pytest.mark.parametrize("case", range(5))
def test_fuzz_physionet_collate_parity(case):
    """Random record shapes / quantizations / data_type / eval_input_prob
    through the PhysioNet collate vs the reference's
    variable_time_collate_fn1 (same normalization of the reference's
    empty injected-tail time_ptr entries as the pinned test)."""
    from types import SimpleNamespace
    from test_physionet import _stub_torchvision

    add_reference_to_path()
    torch = pytest.importorskip("torch")
    _stub_torchvision()
    from latent_ODE import physionet_LODE as ref_pn
    from njode_tpu.data import physionet as pdu

    rs = np.random.RandomState(7000 + case)
    while True:
        records = pdu.make_synthetic_records(
            int(rs.randint(4, 11)), n_vars=int(rs.randint(2, 7)),
            max_hours=float(rs.choice([10.0, 24.0, 48.0])),
            quantization=float(rs.choice([0.5, 1.0, 2.0])),
            obs_perc=float(rs.uniform(0.1, 0.4)), seed=int(rs.randint(1e6)))
        dmin, dmax = pdu.get_data_min_max(records)
        # the REFERENCE normalize_masked_data raises "nans!" when a
        # variable's observed range is zero (<=1 observation in the draw)
        # — fuzz only over data the reference itself accepts
        if (np.asarray(dmax) > np.asarray(dmin)).all():
            break
    data_type = ("train", "test")[rs.randint(2)]
    eval_input_prob = (None, 0.3, 0.7)[rs.randint(3)] \
        if data_type == "test" else None
    eval_input_seed = int(rs.randint(1e6))
    args = SimpleNamespace(eval_input_prob=eval_input_prob,
                           eval_input_seed=eval_input_seed, classif=False)

    ref_records = [
        (rid, torch.tensor(tt, dtype=torch.float32),
         torch.tensor(vals), torch.tensor(mask), None)
        for rid, tt, vals, mask, _ in records]
    ref = ref_pn.variable_time_collate_fn1(
        ref_records, args, data_type=data_type,
        data_min=torch.tensor(dmin), data_max=torch.tensor(dmax))
    ours = pdu.collate_records(records, dmin, dmax, data_type=data_type,
                               eval_input_prob=eval_input_prob,
                               eval_input_seed=eval_input_seed)

    ref_ptr = np.asarray(ref["time_ptr"])
    if eval_input_prob:
        base = pdu.collate_records(records, dmin, dmax, data_type="test",
                                   eval_input_prob=None)
        n_base = len(base["times"])
        keep = np.ones(len(ref_ptr), bool)
        keep[n_base + 1:] = np.diff(ref_ptr)[n_base:] > 0
        ref_ptr = ref_ptr[keep]
    msg = dict(case=case, data_type=data_type, eip=eval_input_prob)
    assert np.allclose(ours["times"], np.asarray(ref["times"], np.float64),
                       atol=1e-6), msg
    assert np.array_equal(ours["time_ptr"], ref_ptr), msg
    assert np.array_equal(ours["obs_idx"], ref["obs_idx"].numpy()), msg
    assert np.allclose(ours["X"], ref["X"].numpy(), atol=1e-6), msg
    assert np.allclose(ours["M"], ref["M"].numpy()), msg
    if data_type == "test":
        assert np.allclose(ours["times_val"], ref["times_val"],
                           atol=1e-6), msg
        assert np.allclose(ours["vals_val"], ref["vals_val"],
                           atol=1e-6), msg
        assert np.allclose(ours["mask_val"], ref["mask_val"]), msg


@pytest.mark.skipif(not reference_available(),
                    reason="reference not available")
@pytest.mark.parametrize("case", range(4))
def test_fuzz_climate_collate_parity(case, tmp_path):
    """Random synthetic climate CSVs / id subsets / delta_t through our
    collate + dense bridge vs the reference ODE_Dataset +
    custom_collate_fn (identical dense grid batches)."""
    add_reference_to_path()
    pytest.importorskip("torch")
    from GRU_ODE_Bayes import data_utils_gru_ode_bayes as ref_du
    from njode_tpu.data import climate as cdu

    if not hasattr(np, "int"):
        np.int = int
    rs = np.random.RandomState(8000 + case)
    n_series = int(rs.randint(10, 31))
    T = float(rs.choice([10.0, 20.0, 30.0]))
    delta_t = float(rs.choice([0.25, 0.5, 1.0]))
    csv = str(tmp_path / "sporadic.csv")
    cdu.make_synthetic_climate_csv(csv, n_series=n_series,
                                   n_vars=int(rs.randint(2, 6)), T=T,
                                   obs_perc=float(rs.uniform(0.05, 0.2)),
                                   seed=int(rs.randint(1e6)))
    idx = np.sort(rs.choice(n_series, int(rs.randint(4, n_series)),
                            replace=False))

    ours = cdu.ClimateDataset(csv_file=csv, idx=idx)
    max_steps = ours.max_grid_steps(delta_t, T)
    ev = ours.collate(np.arange(len(ours)))
    b_ours = cdu.dense_batch_from_events(ev, delta_t, T,
                                         max_steps=max_steps)

    ref_ds = ref_du.ODE_Dataset(csv_file=os.path.basename(csv),
                                root_dir=os.path.dirname(csv), idx=idx)
    ref_batch = ref_du.custom_collate_fn(
        [ref_ds[i] for i in range(len(ref_ds))])
    b_ref = cdu.dense_batch_from_events(
        {"times": np.asarray(ref_batch["times"]),
         "time_ptr": np.asarray(ref_batch["time_ptr"]),
         "X": ref_batch["X"].numpy(),
         "M": ref_batch["M"].numpy(),
         "obs_idx": ref_batch["obs_idx"].numpy(),
         "batch_size": len(ref_batch["pat_idx"])},
        delta_t, T, max_steps=max_steps)

    msg = dict(case=case, n_series=n_series, T=T, delta_t=delta_t)
    assert np.allclose(b_ours.times, b_ref.times), msg
    assert np.allclose(b_ours.obs, b_ref.obs), msg
    assert np.allclose(b_ours.X, b_ref.X, atol=1e-6), msg
    assert np.allclose(b_ours.M, b_ref.M), msg
    assert np.allclose(b_ours.n_obs_ot, b_ref.n_obs_ot), msg
