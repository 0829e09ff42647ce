"""The NJODE model as a single ``lax.scan`` over the dense union time grid.

Capability parity with class ``NJODE`` (``/root/reference/NJODE/models.py:280-584``),
re-designed TPU-first: the reference's data-dependent Python event loop
(``models.py:430-511``) — Euler micro-steps between observations, jump update
at observations, per-observation loss — becomes one scan whose per-step body
performs (1) an Euler step ``h += dt * f(last_X, h, tau, t-tau)``
(``models.py:369-377``), (2) a masked jump
``h <- where(obs, encoder(X or impute), h)`` (``models.py:459-470``),
(3) masked loss accumulation (``models.py:473-477``) and (4) masked
``last_X``/``tau`` updates (``models.py:481-489``). Semantics are exact for
observations on the grid; non-aligned observations are handled by the union
grid with clipped fractional steps (see data/grid.py).

Parameters are a plain pytree (dict of layer lists), so the model is
trivially shardable and the same apply runs under jit/vmap/scan.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from njode_tpu.data.grid import GridBatch
from njode_tpu.models import mlp
from njode_tpu.models.losses import step_loss


def _norm_desc(nn_desc):
    """Normalize a network description to a hashable tuple-of-tuples."""
    if nn_desc is None:
        return None
    return tuple((int(w), str(a)) for w, a in nn_desc)


@dataclasses.dataclass(frozen=True)
class NJODEConfig:
    """Static model configuration (hashable; used as a jit-static argument).

    Field semantics follow ``NJODE.__init__`` (``models.py:284-362``) and the
    options dict parsed there ('which_loss', 'residual_enc_dec', 'masked',
    'input_current_t', ``models.py:320-341``).
    """

    input_size: int
    hidden_size: int
    output_size: int
    ode_nn: Optional[Tuple[Tuple[int, str], ...]]
    readout_nn: Optional[Tuple[Tuple[int, str], ...]]
    enc_nn: Optional[Tuple[Tuple[int, str], ...]]
    use_rnn: bool = False
    bias: bool = True
    dropout_rate: float = 0.0
    solver: str = "euler"
    which_loss: str = "standard"
    residual_enc_dec: bool = True
    input_current_t: bool = False
    masked: bool = False

    def __post_init__(self):
        object.__setattr__(self, "ode_nn", _norm_desc(self.ode_nn))
        object.__setattr__(self, "readout_nn", _norm_desc(self.readout_nn))
        object.__setattr__(self, "enc_nn", _norm_desc(self.enc_nn))
        if self.solver != "euler":
            raise ValueError(f"Unknown solver '{self.solver}'.")

    @property
    def enc_case(self):
        return mlp.residual_case(self.input_size, self.hidden_size,
                                 self.residual_enc_dec)

    @property
    def readout_case(self):
        return mlp.residual_case(self.hidden_size, self.output_size,
                                 self.residual_enc_dec)


def init_params(key, cfg: NJODEConfig):
    """Initialize the NJODE parameter pytree (Xavier linears, zero biases)."""
    k_ode, k_enc, k_read, k_gru = jax.random.split(key, 4)
    time_feats = 3 if cfg.input_current_t else 2
    params = {
        "ode_f": mlp.ffnn_init(
            k_ode, cfg.input_size + cfg.hidden_size + time_feats,
            cfg.hidden_size, cfg.ode_nn, cfg.bias),
        "encoder": mlp.wrapped_ffnn_init(
            k_enc, cfg.input_size, cfg.hidden_size, cfg.enc_nn, cfg.bias,
            masked=cfg.masked),
        "readout": mlp.wrapped_ffnn_init(
            k_read, cfg.hidden_size, cfg.output_size, cfg.readout_nn,
            cfg.bias, masked=False),
    }
    if cfg.use_rnn:
        params["gru"] = mlp.gru_cell_init(k_gru, cfg.input_size,
                                          cfg.hidden_size, cfg.bias)
    return params


def _ode_apply(params, cfg, x, h, tau, tdiff, rng, train):
    """ODEFunc.forward (``models.py:188-198``): f(tanh(x), tanh(h), tau,
    t-tau[, t])."""
    feats = [jnp.tanh(x), jnp.tanh(h), tau, tdiff]
    if cfg.input_current_t:
        feats.append(tau + tdiff)
    inp = jnp.concatenate(feats, axis=-1)
    return mlp.ffnn_apply(params, inp, cfg.ode_nn, cfg.dropout_rate, rng,
                          train)


def _encoder_apply(params, cfg, x, mask, rng, train):
    case, mult = cfg.enc_case
    return mlp.wrapped_ffnn_apply(
        params, x, cfg.enc_nn, case=case, mult=mult, masked=cfg.masked,
        mask=mask, dropout_rate=cfg.dropout_rate, rng=rng, train=train)


def _readout_apply(params, cfg, h, rng, train):
    case, mult = cfg.readout_case
    return mlp.wrapped_ffnn_apply(
        params, h, cfg.readout_nn, case=case, mult=mult, masked=False,
        dropout_rate=cfg.dropout_rate, rng=rng, train=train)


def forward(params, cfg: NJODEConfig, batch: GridBatch, weight=0.5,
            rng=None, train: bool = False, get_loss: bool = True,
            return_path: bool = False):
    """Run the NJODE recursion over the grid.

    :returns: ``(h_final, loss)`` and, if ``return_path``,
        ``(y0, y_pre [K,B,out], y_post [K,B,out])`` — the prediction at t=0,
        before the jump at each step, and after it. The reference's path
        arrays (``models.py:423-426, 441-445, 491-494``) are recoverable from
        these (duplicate post-jump entries at observation times).
    """
    B = batch.start_X.shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    k0_enc, k0_read, k_scan = jax.random.split(rng, 3)

    zero_mask = jnp.zeros_like(batch.start_X) if cfg.masked else None
    h0 = _encoder_apply(params["encoder"], cfg, batch.start_X, zero_mask,
                        k0_enc, train)
    tau0 = jnp.zeros((B, 1), jnp.float32)
    n_obs = jnp.asarray(batch.n_obs_ot, jnp.float32)
    weight = jnp.asarray(weight, jnp.float32)

    def step(carry, inp):
        h, last_X, tau, loss, key = carry
        t, dt, obs, X, M = inp
        key, k_ode, k_enc, k_r1, k_r2 = jax.random.split(key, 5)
        t_prev = t - dt
        tdiff = t_prev - tau
        # (1) Euler step (models.py:369-377); dt==0 padding steps are no-ops
        df = _ode_apply(params["ode_f"], cfg, last_X, h, tau, tdiff, k_ode,
                        train)
        h = h + dt * df
        # (2) pre-jump prediction + jump at observed rows (models.py:459-470)
        y_bj = _readout_apply(params["readout"], cfg, h, k_r1, train)
        if cfg.use_rnn:
            h_jump = mlp.gru_cell_apply(params["gru"], jnp.tanh(X),
                                        jnp.tanh(h))
        elif cfg.masked:
            X_imp = X * M + (1.0 - M) * y_bj
            h_jump = _encoder_apply(params["encoder"], cfg, X_imp, M, k_enc,
                                    train)
        else:
            h_jump = _encoder_apply(params["encoder"], cfg, X, None, k_enc,
                                    train)
        obs_c = obs[:, None]
        h_new = obs_c * h_jump + (1.0 - obs_c) * h
        y = _readout_apply(params["readout"], cfg, h_new, k_r2, train)
        # (3) masked loss accumulation (models.py:473-477)
        if get_loss:
            loss = loss + step_loss(
                which=cfg.which_loss, X=X, Y=y, Y_bj=y_bj, obs=obs,
                n_obs_ot=n_obs, batch_size=B, weight=weight,
                M=M if cfg.masked else None)
        # (4) masked last_X / tau updates (models.py:481-489)
        new_last = y if cfg.masked else X
        last_X = jnp.where(obs_c > 0, new_last, last_X)
        tau = jnp.where(obs_c > 0, jnp.full_like(tau, t), tau)
        out = (y_bj, y) if return_path else None
        return (h_new, last_X, tau, loss, key), out

    carry0 = (h0, batch.start_X, tau0, jnp.float32(0.0), k_scan)
    xs = (batch.times, batch.dt, batch.obs, batch.X, batch.M)
    (hT, _, _, loss, _), path = jax.lax.scan(step, carry0, xs)

    if return_path:
        y0 = _readout_apply(params["readout"], cfg, h0, k0_read, train)
        y_pre, y_post = path
        return hT, loss, (y0, y_pre, y_post)
    return hT, loss


def get_pred(params, cfg: NJODEConfig, batch: GridBatch):
    """Predicted path on the grid (eval mode), cf. ``NJODE.get_pred``
    (``models.py:564-584``). Returns dict with 'pred_t' [K+1] and
    'pred' [K+1, B, out] (pre-jump convention at observation times is the
    post-jump value, matching the last-recorded entry per time)."""
    _, _, (y0, y_pre, y_post) = forward(
        params, cfg, batch, train=False, get_loss=False, return_path=True)
    ts = jnp.concatenate([jnp.zeros((1,), jnp.float32), batch.times])
    ys = jnp.concatenate([y0[None], y_post], axis=0)
    return {"pred_t": ts, "pred": ys, "pred_bj": y_pre}


def evaluate(params, cfg: NJODEConfig, batch: GridBatch, next_cond_exp):
    """Mean-squared difference between predicted and true conditional
    expectation paths, duplicate-weighted exactly as ``NJODE.evaluate``
    (``models.py:521-562``)."""
    from njode_tpu.data import oracle

    _, _, (y0, y_pre, y_post) = forward(
        params, cfg, batch, train=False, get_loss=False, return_path=True)
    true_pre, true_post = oracle.cond_exp_paths(next_cond_exp, batch)
    return oracle.evaluation_mean_diff(
        y_pre, y_post, true_pre, true_post, y0, batch.start_X,
        batch.obs, batch.dt)


def weight_decay_step(weight, weight_decay):
    """Decay the loss weight toward 0.5 (``models.py:364-367``)."""
    return 0.5 + (weight - 0.5) * weight_decay
