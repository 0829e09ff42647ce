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
