"""Gold-standard parity tests: transplant our parameters into the reference
PyTorch NJODE and compare forward outputs, losses, predicted paths, and the
conditional-expectation oracle on identical inputs.

These tests import the reference (read-only, /root/reference) as an oracle —
no reference code is vendored; we only call it."""

import numpy as np
import pytest

from conftest import add_reference_to_path, reference_available

import jax
import jax.numpy as jnp

from njode_tpu.data import grid, oracle, sde
from njode_tpu.models import njode

if not reference_available():  # pragma: no cover
    pytest.skip("reference not available", allow_module_level=True)

add_reference_to_path()
torch = pytest.importorskip("torch")
from NJODE import models as ref_models  # noqa: E402
from NJODE import stock_model as ref_stock  # noqa: E402

NN = ((13, "tanh"), (7, "relu"))


def make_data(seed=0, B=6, D=2, steps=20, obs_perc=0.35):
    rs = np.random.RandomState(seed)
    dt = 1.0 / steps
    paths = rs.lognormal(0.0, 0.3, size=(B, D, steps + 1)).astype(np.float64)
    observed = (rs.random((B, steps + 1)) < obs_perc).astype(np.int64)
    observed[0, steps] = 1  # ensure the union covers T (see SURVEY note)
    # ensure every path has >=1 observation so n_obs_ot>0 like reference data
    for i in range(B):
        if observed[i, 1:].sum() == 0:
            observed[i, 1 + rs.randint(steps)] = 1
    return paths, observed, dt


def transplant_ffnn(torch_seq, jax_params):
    """Copy our Linear params into a torch Sequential (in layer order)."""
    linears = [m for m in torch_seq if isinstance(m, torch.nn.Linear)]
    assert len(linears) == len(jax_params)
    for lin, p in zip(linears, jax_params):
        lin.weight.data = torch.tensor(np.asarray(p["w"]).T.copy())
        if "b" in p:
            lin.bias.data = torch.tensor(np.asarray(p["b"]).copy())


def build_pair(cfg, seed=1):
    """Build (jax params, reference torch model) with identical weights."""
    params = njode.init_params(jax.random.PRNGKey(seed), cfg)
    options = {"which_loss": cfg.which_loss,
               "residual_enc_dec": cfg.residual_enc_dec,
               "input_current_t": cfg.input_current_t,
               "masked": cfg.masked}
    ref = ref_models.NJODE(
        input_size=cfg.input_size, hidden_size=cfg.hidden_size,
        output_size=cfg.output_size, ode_nn=cfg.ode_nn,
        readout_nn=cfg.readout_nn, enc_nn=cfg.enc_nn, use_rnn=cfg.use_rnn,
        bias=cfg.bias, dropout_rate=0.0, solver="euler",
        weight=0.5, weight_decay=1.0, options=options)
    transplant_ffnn(ref.ode_f.f, params["ode_f"])
    transplant_ffnn(ref.encoder_map.ffnn, params["encoder"])
    transplant_ffnn(ref.readout_map.ffnn, params["readout"])
    if cfg.use_rnn:
        g = params["gru"]
        ref.obs_c.gru_d.weight_ih.data = torch.tensor(
            np.asarray(g["w_ih"]).T.copy())
        ref.obs_c.gru_d.weight_hh.data = torch.tensor(
            np.asarray(g["w_hh"]).T.copy())
        ref.obs_c.gru_d.bias_ih.data = torch.tensor(
            np.asarray(g["b_ih"]).copy())
        ref.obs_c.gru_d.bias_hh.data = torch.tensor(
            np.asarray(g["b_hh"]).copy())
    ref.eval()
    return params, ref


def run_reference(ref, ev, dt, T, M=None, weight=0.5, n_obs=None):
    ref.weight = weight
    n_obs_t = torch.tensor(ev["n_obs_ot"] if n_obs is None else n_obs)
    with torch.no_grad():
        h, loss, path_t, path_h, path_y = ref.forward(
            ev["times"], ev["time_ptr"],
            torch.tensor(ev["X"]), torch.tensor(ev["obs_idx"]),
            dt, T, torch.tensor(ev["start_X"]), n_obs_t,
            return_path=True, get_loss=True, until_T=True,
            M=None if M is None else torch.tensor(M))
    return (h.numpy(), float(loss), np.asarray(path_t), path_y.numpy())


def ref_ordered_path(y0, y_pre, y_post, obs, dt_vec):
    """Reconstruct the reference's duplicated path array from dense outputs."""
    out = [np.asarray(y0)]
    obs = np.asarray(obs)
    for k in range(len(dt_vec)):
        if dt_vec[k] <= 0:
            continue
        out.append(np.asarray(y_pre[k]))
        if obs[k].sum() > 0:
            out.append(np.asarray(y_post[k]))
    return np.stack(out)


@pytest.mark.parametrize("which_loss,weight", [("standard", 0.5),
                                               ("standard", 0.8),
                                               ("easy", 0.5)])
def test_forward_parity_unmasked(which_loss, weight):
    paths, observed, dt = make_data(seed=3)
    cfg = njode.NJODEConfig(input_size=2, hidden_size=10, output_size=2,
                            ode_nn=NN, readout_nn=NN, enc_nn=NN,
                            which_loss=which_loss)
    params, ref = build_pair(cfg)

    ev = grid.events_from_paths(paths, observed, dt)
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, observed, dt))
    bj = jax.tree.map(jnp.asarray, b)

    hT, loss, (y0, y_pre, y_post) = njode.forward(
        params, cfg, bj, weight=weight, train=False, get_loss=True,
        return_path=True)

    h_ref, loss_ref, path_t_ref, path_y_ref = run_reference(
        ref, ev, dt, T=1.0, weight=weight, n_obs=b.n_obs_ot)

    assert np.allclose(float(loss), loss_ref, rtol=2e-5, atol=1e-6)
    assert np.allclose(np.asarray(hT), h_ref, rtol=1e-4, atol=1e-5)
    ours = ref_ordered_path(y0, y_pre, y_post, b.obs, b.dt)
    assert ours.shape == path_y_ref.shape
    assert np.allclose(ours, path_y_ref, rtol=1e-4, atol=1e-5)


def test_forward_parity_masked():
    paths, observed, dt = make_data(seed=5, D=3)
    rs = np.random.RandomState(7)
    cfg = njode.NJODEConfig(input_size=3, hidden_size=12, output_size=3,
                            ode_nn=NN, readout_nn=NN, enc_nn=NN, masked=True)
    params, ref = build_pair(cfg)

    ev = grid.events_from_paths(paths, observed, dt)
    M_ev = rs.randint(0, 2, size=ev["X"].shape).astype(np.float32)
    b = grid.batch_from_events(
        ev["times"], ev["time_ptr"], ev["X"], ev["obs_idx"], dt, 1.0,
        ev["start_X"], M=M_ev)
    b = grid.recompute_n_obs(b)
    bj = jax.tree.map(jnp.asarray, b)

    hT, loss, (y0, y_pre, y_post) = njode.forward(
        params, cfg, bj, weight=0.5, train=False, get_loss=True,
        return_path=True)

    h_ref, loss_ref, _, path_y_ref = run_reference(
        ref, ev, dt, T=1.0, M=M_ev, n_obs=b.n_obs_ot)

    assert np.allclose(float(loss), loss_ref, rtol=2e-5, atol=1e-6)
    assert np.allclose(np.asarray(hT), h_ref, rtol=1e-4, atol=1e-5)
    ours = ref_ordered_path(y0, y_pre, y_post, b.obs, b.dt)
    assert np.allclose(ours, path_y_ref, rtol=1e-4, atol=1e-5)


def test_forward_parity_gru_jump():
    paths, observed, dt = make_data(seed=11)
    cfg = njode.NJODEConfig(input_size=2, hidden_size=10, output_size=2,
                            ode_nn=NN, readout_nn=NN, enc_nn=NN, use_rnn=True)
    params, ref = build_pair(cfg)
    ev = grid.events_from_paths(paths, observed, dt)
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, observed, dt))
    bj = jax.tree.map(jnp.asarray, b)
    hT, loss = njode.forward(params, cfg, bj, weight=0.5, train=False)
    h_ref, loss_ref, _, _ = run_reference(ref, ev, dt, T=1.0,
                                          n_obs=b.n_obs_ot)
    assert np.allclose(float(loss), loss_ref, rtol=2e-5, atol=1e-6)
    assert np.allclose(np.asarray(hT), h_ref, rtol=1e-4, atol=1e-5)


def test_forward_parity_input_current_t():
    paths, observed, dt = make_data(seed=13)
    cfg = njode.NJODEConfig(input_size=2, hidden_size=10, output_size=2,
                            ode_nn=NN, readout_nn=NN, enc_nn=NN,
                            input_current_t=True)
    params, ref = build_pair(cfg)
    ev = grid.events_from_paths(paths, observed, dt)
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, observed, dt))
    bj = jax.tree.map(jnp.asarray, b)
    _, loss = njode.forward(params, cfg, bj, weight=0.5, train=False)
    _, loss_ref, _, _ = run_reference(ref, ev, dt, T=1.0, n_obs=b.n_obs_ot)
    assert np.allclose(float(loss), loss_ref, rtol=2e-5, atol=1e-6)


def test_forward_parity_no_residual():
    paths, observed, dt = make_data(seed=17)
    cfg = njode.NJODEConfig(input_size=2, hidden_size=10, output_size=2,
                            ode_nn=NN, readout_nn=NN, enc_nn=NN,
                            residual_enc_dec=False)
    params, ref = build_pair(cfg)
    ev = grid.events_from_paths(paths, observed, dt)
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, observed, dt))
    bj = jax.tree.map(jnp.asarray, b)
    _, loss = njode.forward(params, cfg, bj, weight=0.5, train=False)
    _, loss_ref, _, _ = run_reference(ref, ev, dt, T=1.0, n_obs=b.n_obs_ot)
    assert np.allclose(float(loss), loss_ref, rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("name", ["BlackScholes", "OrnsteinUhlenbeck",
                                  "Heston"])
def test_oracle_parity(name):
    hp = dict(drift=2.0, volatility=0.3, mean=4.0, speed=2.0,
              correlation=0.5, nb_paths=6, nb_steps=20, S0=1.0, maturity=1.0,
              dimension=1, sine_coeff=None)
    paths, observed, dt = make_data(seed=23, B=6, D=1, steps=20)
    ev = grid.events_from_paths(paths, observed, dt)
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, observed, dt))
    bj = jax.tree.map(jnp.asarray, b)

    ours = sde.make_model(name, hp)
    ref = ref_stock.STOCK_MODELS[name](**hp)

    loss_ref, path_t_ref, path_y_ref = ref.compute_cond_exp(
        ev["times"], ev["time_ptr"], ev["X"].astype(np.float64),
        ev["obs_idx"], dt, 1.0, ev["start_X"].astype(np.float64),
        b.n_obs_ot.astype(np.float64), return_path=True, get_loss=True)

    y_pre, y_post = oracle.cond_exp_paths(ours.next_cond_exp, bj)
    ours_path = np.concatenate(
        [b.start_X[None],
         np.stack([x for k in range(b.num_steps)
                   for x in ([np.asarray(y_pre[k])] +
                             ([np.asarray(y_post[k])]
                              if b.obs[k].sum() > 0 else []))])])
    assert ours_path.shape == path_y_ref.shape
    assert np.allclose(ours_path, path_y_ref, rtol=1e-4, atol=1e-6)

    opt = oracle.optimal_loss(ours.next_cond_exp, bj, weight=0.5)
    assert np.allclose(float(opt), float(loss_ref), rtol=2e-5, atol=1e-7)


def test_union_grid_matches_reference_times():
    """Non-grid-aligned observation times: our union grid must reproduce the
    reference's drifting Euler time sequence exactly."""
    # note: the last observation must equal T — the reference's propagate-to-T
    # loop calls next_cond_exp with a missing argument (stock_model.py:139),
    # a latent TypeError that never fires in practice because the batch union
    # of observation times covers the last grid point almost surely.
    times = np.array([0.013, 0.25, 0.254, 0.777, 1.0])
    dt, T = 0.1, 1.0
    g_times, g_dts, obs_idx = grid.build_union_grid(times, dt, T)
    hp = dict(drift=2.0, volatility=0.3, nb_paths=2, nb_steps=10, S0=1.0,
              maturity=1.0, dimension=1, sine_coeff=None)
    ref = ref_stock.STOCK_MODELS["BlackScholes"](**hp)
    X = np.ones((5, 1))
    time_ptr = np.array([0, 1, 2, 3, 4, 5])
    obs_idx_ev = np.array([0, 0, 0, 0, 0])
    _, path_t_ref, _ = ref.compute_cond_exp(
        times, time_ptr, X, obs_idx_ev, dt, T, np.ones((1, 1)),
        np.array([5.0]), return_path=True, get_loss=False)
    # reconstruct duplicated times from our grid
    ours = [0.0]
    for k in range(len(g_times)):
        if g_dts[k] <= 0:
            continue
        ours.append(g_times[k])
        if k in set(obs_idx.tolist()):
            ours.append(g_times[k])
    assert np.allclose(np.array(ours), path_t_ref, atol=1e-12)


def test_evaluation_mean_diff_matches_reference():
    paths, observed, dt = make_data(seed=29, B=6, D=1, steps=20)
    hp = dict(drift=2.0, volatility=0.3, mean=4.0, speed=2.0,
              correlation=0.5, nb_paths=6, nb_steps=20, S0=1.0, maturity=1.0,
              dimension=1, sine_coeff=None)
    cfg = njode.NJODEConfig(input_size=1, hidden_size=10, output_size=1,
                            ode_nn=NN, readout_nn=NN, enc_nn=NN)
    params, ref = build_pair(cfg)
    ev = grid.events_from_paths(paths, observed, dt)
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, observed, dt))
    bj = jax.tree.map(jnp.asarray, b)

    ref_sm = ref_stock.STOCK_MODELS["BlackScholes"](**hp)
    with torch.no_grad():
        eval_ref = ref.evaluate(
            ev["times"], ev["time_ptr"], torch.tensor(ev["X"]),
            torch.tensor(ev["obs_idx"]), dt, 1.0,
            torch.tensor(ev["start_X"]),
            torch.tensor(b.n_obs_ot.astype(np.float64)), ref_sm)

    ours = sde.make_model("BlackScholes", hp)
    eval_ours = njode.evaluate(params, cfg, bj, ours.next_cond_exp)
    assert np.allclose(float(eval_ours), float(eval_ref), rtol=1e-4,
                       atol=1e-7)


def test_forward_parity_masked_with_rnn():
    """use_rnn takes precedence over masked in the jump (models.py:460-461):
    the GRU consumes raw X_obs even in masked mode."""
    paths, observed, dt = make_data(seed=19, D=2)
    rs = np.random.RandomState(23)
    cfg = njode.NJODEConfig(input_size=2, hidden_size=10, output_size=2,
                            ode_nn=NN, readout_nn=NN, enc_nn=NN,
                            masked=True, use_rnn=True)
    params, ref = build_pair(cfg)
    ev = grid.events_from_paths(paths, observed, dt)
    M_ev = rs.randint(0, 2, size=ev["X"].shape).astype(np.float32)
    b = grid.batch_from_events(
        ev["times"], ev["time_ptr"], ev["X"], ev["obs_idx"], dt, 1.0,
        ev["start_X"], M=M_ev)
    b = grid.recompute_n_obs(b)
    bj = jax.tree.map(jnp.asarray, b)
    hT, loss = njode.forward(params, cfg, bj, weight=0.5, train=False,
                             get_loss=True)
    h_ref, loss_ref, _, _ = run_reference(ref, ev, dt, T=1.0, M=M_ev,
                                          n_obs=b.n_obs_ot)
    assert np.allclose(float(loss), loss_ref, rtol=2e-5, atol=1e-6)
    assert np.allclose(np.asarray(hT), h_ref, rtol=1e-4, atol=1e-5)


def test_evaluate_pluggable_diff_fun():
    """The reference's pluggable diff_fun hook (models.py:521-562): the
    default MSE equals the duplicate-weighted on-device metric, and custom
    functions receive the reference-layout stacked path arrays."""
    import jax
    import jax.numpy as jnp
    from njode_tpu.data import grid, sde
    from njode_tpu.models import njode

    hp = dict(drift=2.0, volatility=0.3, nb_paths=6, nb_steps=12, S0=1.0,
              maturity=1.0, dimension=1)
    model = sde.make_model("BlackScholes", hp)
    rs = np.random.RandomState(0)
    paths = rs.lognormal(0, 0.2, (6, 1, 13))
    obs = (rs.random((6, 13)) < 0.3).astype(np.int64)
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, obs, 1.0 / 12))
    bj = jax.tree.map(jnp.asarray, b)
    cfg = njode.NJODEConfig(1, 6, 1, ((8, "tanh"),), ((8, "tanh"),),
                            ((8, "tanh"),))
    params = njode.init_params(jax.random.PRNGKey(0), cfg)

    default = float(njode.evaluate(params, cfg, bj, model.next_cond_exp))
    via_hook = njode.evaluate(params, cfg, bj, model.next_cond_exp,
                              diff_fun=lambda x, y: np.mean((x - y) ** 2))
    assert np.allclose(default, via_hook, rtol=1e-6)
    max_abs = njode.evaluate(params, cfg, bj, model.next_cond_exp,
                             diff_fun=lambda x, y: np.max(np.abs(x - y)))
    assert max_abs > 0 and max_abs != via_hook
