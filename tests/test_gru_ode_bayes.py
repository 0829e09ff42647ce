"""Parity + training tests for the GRU-ODE-Bayes baseline family.

Transplants our parameters into the reference ``NNFOwithBayesianJumps``
(/root/reference/GRU_ODE_Bayes/models_gru_ode_bayes.py) and compares losses,
final hidden states, and predicted mean paths on identical inputs."""

import numpy as np
import pytest

from conftest import add_reference_to_path, reference_available

import jax
import jax.numpy as jnp

from njode_tpu.data import grid, sde
from njode_tpu.models import gru_ode_bayes as gob

if not reference_available():  # pragma: no cover
    pytest.skip("reference not available", allow_module_level=True)

add_reference_to_path()
torch = pytest.importorskip("torch")
from GRU_ODE_Bayes import models_gru_ode_bayes as ref_gob  # noqa: E402


def make_data(seed=0, B=6, D=2, steps=20, obs_perc=0.35):
    rs = np.random.RandomState(seed)
    dt = 1.0 / steps
    paths = rs.lognormal(0.0, 0.3, size=(B, D, steps + 1)).astype(np.float64)
    observed = (rs.random((B, steps + 1)) < obs_perc).astype(np.int64)
    observed[0, steps] = 1
    for i in range(B):
        if observed[i, 1:].sum() == 0:
            observed[i, 1 + rs.randint(steps)] = 1
    return paths, observed, dt


def _set_linear(lin, p):
    lin.weight.data = torch.tensor(np.asarray(p["w"]).T.copy())
    if "b" in p and lin.bias is not None:
        lin.bias.data = torch.tensor(np.asarray(p["b"]).copy())


def _set_seq(seq, jax_params):
    linears = [m for m in seq if isinstance(m, torch.nn.Linear)]
    assert len(linears) == len(jax_params)
    for lin, p in zip(linears, jax_params):
        _set_linear(lin, p)


def build_pair(cfg: gob.GOBConfig, seed=1):
    params = gob.init_params(jax.random.PRNGKey(seed), cfg)
    ref = ref_gob.NNFOwithBayesianJumps(
        input_size=cfg.input_size, hidden_size=cfg.hidden_size,
        p_hidden=cfg.p_hidden, prep_hidden=cfg.prep_hidden, bias=cfg.bias,
        cov_size=cfg.cov_size, cov_hidden=cfg.cov_hidden, logvar=cfg.logvar,
        mixing=cfg.mixing, dropout_rate=0.0, full_gru_ode=cfg.full_gru_ode,
        solver=cfg.solver, impute=cfg.impute)
    _set_seq(ref.p_model, params["p_model"])
    _set_seq(ref.covariates_map, params["cov_map"])
    _set_seq(ref.classification_model, params["class_model"])
    pg = params["gru_c"]
    for name in ("lin_x", "lin_xz", "lin_xn", "lin_hh", "lin_hz", "lin_hr",
                 "lin_hn"):
        if name in pg:
            _set_linear(getattr(ref.gru_c, name), pg[name])
    po = params["gru_obs"]
    ref.gru_obs.gru_d.weight_ih.data = torch.tensor(
        np.asarray(po["gru"]["w_ih"]).T.copy())
    ref.gru_obs.gru_d.weight_hh.data = torch.tensor(
        np.asarray(po["gru"]["w_hh"]).T.copy())
    if cfg.bias:
        ref.gru_obs.gru_d.bias_ih.data = torch.tensor(
            np.asarray(po["gru"]["b_ih"]).copy())
        ref.gru_obs.gru_d.bias_hh.data = torch.tensor(
            np.asarray(po["gru"]["b_hh"]).copy())
    ref.gru_obs.w_prep.data = torch.tensor(np.asarray(po["w_prep"]).copy())
    ref.gru_obs.bias_prep.data = torch.tensor(
        np.asarray(po["bias_prep"]).copy())
    ref.eval()
    return params, ref


def run_reference(ref, ev, dt, T):
    with torch.no_grad():
        h, loss, _, path_t, path_p, path_h, _, _ = ref.forward(
            ev["times"], ev["time_ptr"], torch.tensor(ev["X"]),
            torch.ones_like(torch.tensor(ev["X"])),
            torch.tensor(ev["obs_idx"]), dt, T,
            torch.tensor(ev["start_X"]), return_path=True, smoother=False)
    return h.numpy(), float(loss), np.asarray(path_t), path_p.numpy()


def ref_ordered(p0, p_pre, p_post, obs, dt_vec):
    out = [np.asarray(p0)]
    obs = np.asarray(obs)
    for k in range(len(dt_vec)):
        if dt_vec[k] <= 0:
            continue
        out.append(np.asarray(p_pre[k]))
        if obs[k].sum() > 0:
            out.append(np.asarray(p_post[k]))
    return np.stack(out)


CONFIGS = [
    # the synthetic-trainer default surface (train.py:354-392 defaults)
    dict(full_gru_ode=True, impute=False, logvar=True, solver="euler"),
    dict(full_gru_ode=True, impute=True, logvar=False, solver="euler"),
    dict(full_gru_ode=False, impute=True, logvar=True, solver="midpoint"),
    dict(full_gru_ode=False, impute=False, logvar=False, solver="midpoint"),
]


@pytest.mark.parametrize("kw", CONFIGS)
def test_forward_parity(kw):
    paths, observed, dt = make_data(seed=3)
    cfg = gob.GOBConfig(input_size=2, hidden_size=11, p_hidden=9,
                        prep_hidden=4, cov_size=2, cov_hidden=7,
                        mixing=0.3, **kw)
    params, ref = build_pair(cfg)
    ev = grid.events_from_paths(paths, observed, dt)
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, observed, dt))
    bj = jax.tree.map(jnp.asarray, b)

    hT, loss, (p0, p_pre, p_post) = gob.forward(
        params, cfg, bj, train=False, get_loss=True, return_path=True)
    h_ref, loss_ref, _, path_p_ref = run_reference(ref, ev, dt, T=1.0)

    assert np.allclose(float(loss), loss_ref, rtol=2e-5, atol=1e-5)
    assert np.allclose(np.asarray(hT), h_ref, rtol=1e-4, atol=1e-5)
    ours = ref_ordered(p0, p_pre, p_post, b.obs, b.dt)
    assert ours.shape == path_p_ref.shape
    assert np.allclose(ours, path_p_ref, rtol=1e-4, atol=1e-5)


def test_evaluate_matches_reference():
    paths, observed, dt = make_data(seed=9, B=5, D=1)
    hp = dict(drift=2.0, volatility=0.3, mean=4.0, speed=2.0,
              correlation=0.5, nb_paths=5, nb_steps=20, S0=1.0, maturity=1.0,
              dimension=1, sine_coeff=None)
    cfg = gob.GOBConfig(input_size=1, hidden_size=10, p_hidden=10,
                        prep_hidden=10, cov_size=1, cov_hidden=10,
                        mixing=0.0001, full_gru_ode=True, impute=False,
                        logvar=True, solver="euler")
    params, ref = build_pair(cfg)
    ev = grid.events_from_paths(paths, observed, dt)
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, observed, dt))
    bj = jax.tree.map(jnp.asarray, b)

    from conftest import REFERENCE_PATH  # noqa: F401
    import sys
    sys.path.insert(0, REFERENCE_PATH + "/NJODE")
    import stock_model as ref_stock
    ref_sm = ref_stock.STOCK_MODELS["BlackScholes"](**hp)
    with torch.no_grad():
        eval_ref = ref.evaluate(
            ev["times"], ev["time_ptr"], torch.tensor(ev["X"]),
            torch.tensor(ev["obs_idx"]), dt, 1.0,
            torch.tensor(ev["start_X"]),
            torch.tensor(b.n_obs_ot.astype(np.float64)), ref_sm)

    ours_sm = sde.make_model("BlackScholes", hp)
    eval_ours = gob.evaluate(params, cfg, bj, ours_sm.next_cond_exp)
    assert np.allclose(float(eval_ours), float(eval_ref), rtol=1e-4,
                       atol=1e-7)


def test_train_step_reduces_loss():
    paths, observed, dt = make_data(seed=21, B=16, D=1, steps=20)
    cfg = gob.GOBConfig(input_size=1, hidden_size=10, p_hidden=10,
                        prep_hidden=10, cov_size=1, cov_hidden=10,
                        mixing=0.0001, full_gru_ode=True, impute=False,
                        logvar=True, solver="euler")
    params = gob.init_params(jax.random.PRNGKey(0), cfg)
    from njode_tpu.training.steps import make_optimizer
    optimizer = make_optimizer(1e-2)
    opt_state = optimizer.init(params)
    times = (np.arange(1, 21) * dt).astype(np.float32)
    dts = np.full(20, dt, dtype=np.float32)
    fns = gob.make_step_fns(cfg, optimizer, times, dts)
    d_paths = jnp.asarray(paths.astype(np.float32))
    d_obs = jnp.asarray(observed.astype(np.float32))
    idx = jnp.arange(16, dtype=jnp.int32)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(15):
        params, opt_state, loss = fns["train_step"](
            params, opt_state, d_paths, d_obs, idx, jnp.float32(0.5),
            jax.random.fold_in(key, i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def build_discretized_pair(cfg: gob.GOBConfig, seed=1):
    """(our params, reference Discretized_GRU) with identical weights."""
    params = gob.init_params(jax.random.PRNGKey(seed), cfg)
    ref = ref_gob.Discretized_GRU(
        input_size=cfg.input_size, hidden_size=cfg.hidden_size,
        p_hidden=cfg.p_hidden, prep_hidden=cfg.prep_hidden, bias=cfg.bias,
        cov_size=cfg.cov_size, cov_hidden=cfg.cov_hidden, logvar=cfg.logvar,
        mixing=cfg.mixing, dropout_rate=0.0, impute=cfg.impute)
    _set_seq(ref.p_model, params["p_model"])
    _set_seq(ref.covariates_map, params["cov_map"])
    _set_seq(ref.classification_model, params["class_model"])
    cell = params["gru_c"]["cell"]
    ref.gru.weight_ih.data = torch.tensor(np.asarray(cell["w_ih"]).T.copy())
    ref.gru.weight_hh.data = torch.tensor(np.asarray(cell["w_hh"]).T.copy())
    if cfg.bias:
        ref.gru.bias_ih.data = torch.tensor(np.asarray(cell["b_ih"]).copy())
        ref.gru.bias_hh.data = torch.tensor(np.asarray(cell["b_hh"]).copy())
    po = params["gru_obs"]
    ref.gru_obs.gru_d.weight_ih.data = torch.tensor(
        np.asarray(po["gru"]["w_ih"]).T.copy())
    ref.gru_obs.gru_d.weight_hh.data = torch.tensor(
        np.asarray(po["gru"]["w_hh"]).T.copy())
    if cfg.bias:
        ref.gru_obs.gru_d.bias_ih.data = torch.tensor(
            np.asarray(po["gru"]["b_ih"]).copy())
        ref.gru_obs.gru_d.bias_hh.data = torch.tensor(
            np.asarray(po["gru"]["b_hh"]).copy())
    ref.gru_obs.w_prep.data = torch.tensor(np.asarray(po["w_prep"]).copy())
    ref.gru_obs.bias_prep.data = torch.tensor(
        np.asarray(po["bias_prep"]).copy())
    ref.eval()
    return params, ref


@pytest.mark.parametrize("impute", [True, False])
def test_discretized_gru_parity(impute):
    # binary-exact dt=1/16: the reference's counter-based clock and its
    # accumulated event times must agree bit-for-bit, else it ticks once
    # more than the grid during the final propagate-to-T loop
    paths, observed, dt = make_data(seed=31, steps=16)
    cfg = gob.GOBConfig(input_size=2, hidden_size=9, p_hidden=7,
                        prep_hidden=3, cov_size=2, cov_hidden=5,
                        mixing=0.2, logvar=True, impute=impute,
                        discretized=True)
    params, ref = build_discretized_pair(cfg)
    ev = grid.events_from_paths(paths, observed, dt)
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, observed, dt))
    bj = jax.tree.map(jnp.asarray, b)

    hT, loss = gob.forward(params, cfg, bj, train=False, get_loss=True)
    # the reference asserts times[-1] <= T on float-accumulated times
    T_ref = max(1.0, float(ev["times"][-1]))
    with torch.no_grad():
        h_ref, loss_ref, _ = ref.forward(
            ev["times"], ev["time_ptr"], torch.tensor(ev["X"]),
            torch.ones_like(torch.tensor(ev["X"])),
            torch.tensor(ev["obs_idx"]), dt, T_ref,
            torch.tensor(ev["start_X"]), return_path=False, smoother=False)
    assert np.allclose(float(loss), float(loss_ref), rtol=2e-5, atol=1e-5)
    assert np.allclose(np.asarray(hT), h_ref.numpy(), rtol=1e-4, atol=1e-5)


def _seq_dataset_df(seed=41, B=6, D=2):
    """Long-format df with times on the exact 0.25 grid (the reference's
    seq propagation has no fractional-step clipping, so parity needs
    exactly representable grid-aligned times)."""
    import pandas as pd
    rs = np.random.RandomState(seed)
    rows = []
    for i in range(B):
        times = np.sort(rs.choice(np.arange(1, 16), rs.randint(2, 6),
                                  replace=False)) * 0.25
        for t in times:
            mask = rs.randint(0, 2, D)
            if mask.sum() == 0:
                mask[rs.randint(D)] = 1
            vals = rs.normal(0, 1, D) * mask
            rows.append([i, t] + list(vals) + list(mask))
    cols = (["ID", "Time"] + [f"Value_{j}" for j in range(D)]
            + [f"Mask_{j}" for j in range(D)])
    return pd.DataFrame(rows, columns=cols).astype(np.float32)


def _seq_collate(df, D):
    """Library seq_collate (data/climate.py) wrapped into torch tensors for
    the reference model (the reference's own seq_collate_fn is incompatible
    with modern pandas)."""
    from njode_tpu.data.climate import seq_collate
    sb = seq_collate(df, D)
    return {"times": sb["times"], "time_ptr": sb["time_ptr"],
            "Xpadded": torch.tensor(sb["Xpadded"]),
            "Fpadded": torch.tensor(sb["Fpadded"]),
            "X": torch.tensor(sb["X"]), "M": torch.tensor(sb["M"]),
            "lengths": torch.tensor(sb["lengths"], dtype=torch.long),
            "obs_idx": torch.tensor(sb["obs_idx"])}


def test_seq_gru_bayes_parity():
    df = _seq_dataset_df()
    sb = _seq_collate(df, D=2)

    cfg = gob.SeqConfig(input_size=2, hidden_size=9, p_hidden=7,
                        prep_hidden=3, cov_size=1, cov_hidden=5,
                        mixing=0.3, full_gru_ode=False)
    params = gob.seq_init_params(jax.random.PRNGKey(2), cfg)
    ref = ref_gob.GRUODEBayesSeq(
        input_size=2, hidden_size=9, p_hidden=7, prep_hidden=3,
        cov_size=1, cov_hidden=5, mixing=0.3, dropout_rate=0.0,
        obs_noise_std=cfg.obs_noise_std, full_gru_ode=False)
    _set_seq(ref.covariates_map, params["cov_map"])
    _set_seq(ref.gru_bayes.p_model, params["p_model"])
    _set_seq(ref.classification_model, params["class_model"])
    for name in ("lin_xz", "lin_xn", "lin_hz", "lin_hn"):
        _set_linear(getattr(ref.gru_c, name), params["gru_c"][name])
    so = params["seq_obs"]
    ref.gru_bayes.gru.weight_ih.data = torch.tensor(
        np.asarray(so["gru"]["w_ih"]).T.copy())
    ref.gru_bayes.gru.weight_hh.data = torch.tensor(
        np.asarray(so["gru"]["w_hh"]).T.copy())
    ref.gru_bayes.gru.bias_ih.data = torch.tensor(
        np.asarray(so["gru"]["b_ih"]).copy())
    ref.gru_bayes.gru.bias_hh.data = torch.tensor(
        np.asarray(so["gru"]["b_hh"]).copy())
    ref.gru_bayes.w_prep.data = torch.tensor(np.asarray(so["w_prep"]).copy())
    ref.gru_bayes.bias_prep.data = torch.tensor(
        np.asarray(so["bias_prep"]).copy())
    ref.eval()

    dt, T = 0.25, 4.0
    n_pat = int(df["ID"].nunique())
    cov = np.zeros((n_pat, 1), np.float32)
    with torch.no_grad():
        h_ref, loss_ref, _ = ref.forward(
            sb["times"], sb["time_ptr"], sb["Xpadded"], sb["Fpadded"],
            sb["X"], sb["M"], sb["lengths"], sb["obs_idx"], dt, T,
            torch.tensor(cov), return_path=False)

    # start_X in the GridBatch carries the cov vector (cov_size may differ
    # from the observable dimension, so densify with a D-dim placeholder)
    b = grid.batch_from_events(
        np.asarray(sb["times"], np.float64), np.asarray(sb["time_ptr"]),
        sb["X"].numpy(), sb["obs_idx"].numpy(), dt, T,
        np.zeros((n_pat, 2), np.float32), M=sb["M"].numpy())
    b = grid.recompute_n_obs(b)._replace(start_X=cov)
    bj = jax.tree.map(jnp.asarray, b)
    hT, loss = gob.seq_forward(params, cfg, bj, get_loss=True)
    assert np.allclose(float(loss), float(loss_ref), rtol=2e-5, atol=1e-5)
    assert np.allclose(np.asarray(hT), h_ref.numpy(), rtol=1e-4, atol=1e-5)


def test_config_from_options_defaults():
    pd = {"input_size": 1, "hidden_size": 10, "bias": True,
          "dropout_rate": 0.1}
    cfg = gob.config_from_options(pd, {"other_model": "GRU_ODE_Bayes"})
    assert cfg.mixing == 0.0001 and cfg.solver == "euler"
    assert cfg.impute is False and cfg.logvar is True
    assert cfg.full_gru_ode is True and cfg.p_hidden == 10
    cfg2 = gob.config_from_options(pd, {
        "GRU_ODE_Bayes-mixing": 0.5, "GRU_ODE_Bayes-solver": "midpoint",
        "GRU_ODE_Bayes-impute": True, "GRU_ODE_Bayes-logvar": False})
    assert cfg2.mixing == 0.5 and cfg2.solver == "midpoint"
    assert cfg2.impute is True and cfg2.logvar is False
    with pytest.raises(ValueError):
        gob.GOBConfig(input_size=1, hidden_size=4, p_hidden=4, prep_hidden=4,
                      solver="rk4")


def test_dopri5_impute_warns_and_runs_midpoint():
    """solver='dopri5' with impute=True falls back to midpoint — loudly
    (VERDICT r1 #7; reference dead branch models_gru_ode_bayes.py:353-360)."""
    kw = dict(input_size=1, hidden_size=8, p_hidden=8, prep_hidden=8,
              cov_size=1, cov_hidden=8, full_gru_ode=False, logvar=True)
    with pytest.warns(UserWarning, match="midpoint"):
        cfg_d = gob.GOBConfig(solver="dopri5", impute=True, **kw)
    cfg_m = gob.GOBConfig(solver="midpoint", impute=True, **kw)
    paths, observed, dt = make_data(seed=41, B=4, D=1, steps=12)
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, observed, dt))
    bj = jax.tree.map(jnp.asarray, b)
    params = gob.init_params(jax.random.PRNGKey(0), cfg_m)
    _, l_d = gob.forward(params, cfg_d, bj, train=False)
    _, l_m = gob.forward(params, cfg_m, bj, train=False)
    assert np.allclose(float(l_d), float(l_m))


def test_dopri5_adaptive_eval_close_to_fixed_step():
    """Eval runs the ADAPTIVE dopri5 integrator per grid interval; on the
    smooth autonomous field it must agree closely with the single fixed
    DP step used in training (and handle dt==0 padding steps)."""
    kw = dict(input_size=1, hidden_size=8, p_hidden=8, prep_hidden=8,
              cov_size=1, cov_hidden=8, full_gru_ode=True, logvar=True,
              impute=False, solver="dopri5")
    cfg = gob.GOBConfig(**kw)
    paths, observed, dt = make_data(seed=42, B=4, D=1, steps=12)
    # append two dt==0 padding steps
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, observed, dt))
    pad = 2
    b = b._replace(
        times=np.concatenate([b.times, np.full(pad, b.times[-1],
                                               np.float32)]),
        dt=np.concatenate([b.dt, np.zeros(pad, np.float32)]),
        obs=np.concatenate([b.obs, np.zeros((pad,) + b.obs.shape[1:],
                                            np.float32)]),
        X=np.concatenate([b.X, np.zeros((pad,) + b.X.shape[1:],
                                        np.float32)]),
        M=np.concatenate([b.M, np.zeros((pad,) + b.M.shape[1:],
                                        np.float32)]))
    bj = jax.tree.map(jnp.asarray, b)
    params = gob.init_params(jax.random.PRNGKey(3), cfg)
    _, l_train = gob.forward(params, cfg, bj, train=True,
                             rng=jax.random.PRNGKey(0))
    _, l_eval = jax.jit(lambda p, bb: gob.forward(p, cfg, bb, train=False))(
        params, bj)
    assert np.isfinite(float(l_eval))
    # dropout_rate=0 so train/eval differ only by the integrator
    assert np.allclose(float(l_train), float(l_eval), rtol=2e-3, atol=1e-4)
