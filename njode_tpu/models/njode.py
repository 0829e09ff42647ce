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
    compute_dtype: str = "float32"

    def __post_init__(self):
        object.__setattr__(self, "ode_nn", _norm_desc(self.ode_nn))
        object.__setattr__(self, "readout_nn", _norm_desc(self.readout_nn))
        object.__setattr__(self, "enc_nn", _norm_desc(self.enc_nn))
        if self.solver != "euler":
            raise ValueError(f"Unknown solver '{self.solver}'.")
        if self.compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"Unknown compute_dtype '{self.compute_dtype}' "
                "(expected 'float32' or 'bfloat16').")

    @property
    def dot_dtype(self):
        """Matmul-operand dtype for mixed precision (None = full float32).

        'bfloat16' rounds the matmul INPUTS to the MXU's native dtype
        while keeping fp32 accumulation and fp32 everything-else (carries,
        activations, optimizer state) — see ``mlp._mm``. No reference
        counterpart (the reference trains fp32/fp64 on CPU/GPU); this is
        the TPU-native mixed-precision option."""
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else None

    @property
    def enc_case(self):
        return mlp.residual_case(self.input_size, self.hidden_size,
                                 self.residual_enc_dec)

    @property
    def readout_case(self):
        return mlp.residual_case(self.hidden_size, self.output_size,
                                 self.residual_enc_dec)


def net_widths(cfg: NJODEConfig, which: str):
    """Full layer-width chain ``(in, hidden..., out)`` of one of the three
    MLP stacks — THE single source of truth for the model's input layout
    (ode_f consumes ``[x, h, tau, t-tau(, t)]``, the encoder doubles its
    input under ``masked``). ``init_params`` and every consumer that
    reasons about layer shapes (ops/fused_scan._Spec, the hetero-width
    ensemble padding in training/vmap_sweep.py) derive from here so the
    layout can never silently diverge."""
    time_feats = 3 if cfg.input_current_t else 2
    ins = {"ode_f": cfg.input_size + cfg.hidden_size + time_feats,
           "encoder": (2 * cfg.input_size if cfg.masked
                       else cfg.input_size),
           "readout": cfg.hidden_size}[which]
    outs = {"ode_f": cfg.hidden_size, "encoder": cfg.hidden_size,
            "readout": cfg.output_size}[which]
    nn = {"ode_f": cfg.ode_nn, "encoder": cfg.enc_nn,
          "readout": cfg.readout_nn}[which]
    return (ins,) + tuple(w for (w, _) in (nn or ())) + (outs,)


def init_params(key, cfg: NJODEConfig):
    """Initialize the NJODE parameter pytree (Xavier linears, zero biases)."""
    k_ode, k_enc, k_read, k_gru = jax.random.split(key, 4)
    params = {
        "ode_f": mlp.ffnn_init(
            k_ode, net_widths(cfg, "ode_f")[0],
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


def _ode_apply(params, cfg, x, h, tau, tdiff, rng, train, drop_u=None):
    """ODEFunc.forward (``models.py:188-198``): f(tanh(x), tanh(h), tau,
    t-tau[, t])."""
    feats = [jnp.tanh(x), jnp.tanh(h), tau, tdiff]
    if cfg.input_current_t:
        feats.append(tau + tdiff)
    inp = jnp.concatenate(feats, axis=-1)
    return mlp.ffnn_apply(params, inp, cfg.ode_nn, cfg.dropout_rate, rng,
                          train, drop_u, dot_dtype=cfg.dot_dtype)


def _encoder_apply(params, cfg, x, mask, rng, train, drop_u=None):
    case, mult = cfg.enc_case
    return mlp.wrapped_ffnn_apply(
        params, x, cfg.enc_nn, case=case, mult=mult, masked=cfg.masked,
        mask=mask, dropout_rate=cfg.dropout_rate, rng=rng, train=train,
        drop_u=drop_u, dot_dtype=cfg.dot_dtype)


def _readout_apply(params, cfg, h, rng, train, drop_u=None):
    case, mult = cfg.readout_case
    return mlp.wrapped_ffnn_apply(
        params, h, cfg.readout_nn, case=case, mult=mult, masked=False,
        dropout_rate=cfg.dropout_rate, rng=rng, train=train, drop_u=drop_u,
        dot_dtype=cfg.dot_dtype)


def _dropout_slots(cfg):
    """(n_ode, n_enc, n_ro, Wmax): hidden-layer dropout-slot counts per
    sub-network and the max hidden width, for fused mask generation."""
    n_ode = len(cfg.ode_nn) if cfg.ode_nn else 0
    n_enc = len(cfg.enc_nn) if cfg.enc_nn else 0
    n_ro = len(cfg.readout_nn) if cfg.readout_nn else 0
    widths = [w for nn in (cfg.ode_nn, cfg.enc_nn, cfg.readout_nn) if nn
              for (w, _) in nn]
    return n_ode, n_enc, n_ro, (max(widths) if widths else 1)


# One fused uniform draw for the whole scan beats ~13 per-step threefry
# calls 4x at bench scale, but the [K, S, B, Wmax] tensor grows as
# grid-length x slot-count x width: at climate-400 scale (K~2000, S=8,
# B=100, W=400) it is ~1.3 GB bf16 PER MEMBER and its remat copies blew
# HBM (58G/15.75G) under a 5-member vmapped fold group. Above this
# per-member budget the scan draws each step's slots from a fold_in
# counter instead — a different (equally valid) dropout stream with an
# O(S*B*W) footprint. The gate depends only on per-member shapes, so a
# grouped (vmapped) run and the solo run of the same config stay
# stream-identical; ops/fused_scan.py 'input' mask mode matches forward's
# stream only in the fused-draw regime (its production 'prng' mode is
# in-kernel and unaffected).
FUSED_DRAW_BUDGET = 256 * 1024 * 1024


def forward(params, cfg: NJODEConfig, batch: GridBatch, weight=0.5,
            rng=None, train: bool = False, get_loss: bool = True,
            return_path: bool = False, remat: bool = False):
    """Run the NJODE recursion over the grid.

    :param remat: wrap the scan body in ``jax.checkpoint`` — the backward
        pass then stores only the per-step carries (h, last_X, tau: O(K*B*
        (H+D+1))) and recomputes the step's MLP activations, instead of
        storing every intermediate (O(K*B*sum(widths))). This is the
        scan-axis gradient checkpointing SURVEY §2.16 SP prescribes for the
        long real-data grids (climate K~2000, PhysioNet K~3000) — the
        XLA-scan counterpart of the Pallas kernel's step-granularity BPTT
        recompute (ops/fused_scan.py). Bitwise-identical results; only the
        backward's memory/compute trade changes.
    :returns: ``(h_final, loss)`` and, if ``return_path``,
        ``(y0, y_pre [K,B,out], y_post [K,B,out])`` — the prediction at t=0,
        before the jump at each step, and after it. The reference's path
        arrays (``models.py:423-426, 441-445, 491-494``) are recoverable from
        these (duplicate post-jump entries at observation times).
    """
    B = batch.start_X.shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    k0_enc, k_scan = jax.random.split(rng, 2)

    # fused dropout masks: ONE uniform draw for the whole scan instead of
    # ~13 tiny PRNG ops per step (those dominate step time on TPU, 4x)
    dropping = train and cfg.dropout_rate > 0.0
    n_ode, n_enc, n_ro, w_max = _dropout_slots(cfg)
    S = n_ode + n_enc + 2 * n_ro
    per_step_draws = False
    if dropping and S > 0:
        K = batch.times.shape[0]
        k_u0, k_u = jax.random.split(k_scan)
        per_step_draws = K * S * B * w_max * 2 > FUSED_DRAW_BUDGET
        if per_step_draws:
            # over-budget grids: the scan body draws its own slots from a
            # per-step fold_in key (see FUSED_DRAW_BUDGET above)
            u_scan = jnp.arange(K, dtype=jnp.uint32)
        else:
            # bf16 bits: the uniforms only feed a `< keep` comparison
            u_scan = jax.random.uniform(k_u, (K, S, B, w_max),
                                        dtype=jnp.bfloat16)
        u0 = jax.random.uniform(k_u0, (max(n_enc, 1), B, w_max),
                                dtype=jnp.bfloat16)
    else:
        u_scan = jnp.zeros((batch.times.shape[0], 0))
        u0 = None

    def _slots(u, a, b):
        return None if u is None or b == a else [u[i] for i in range(a, b)]

    zero_mask = jnp.zeros_like(batch.start_X) if cfg.masked else None
    h0 = _encoder_apply(params["encoder"], cfg, batch.start_X, zero_mask,
                        k0_enc, train,
                        drop_u=_slots(u0, 0, n_enc) if dropping else None)
    tau0 = jnp.zeros((B, 1), jnp.float32)
    n_obs = jnp.asarray(batch.n_obs_ot, jnp.float32)
    weight = jnp.asarray(weight, jnp.float32)

    def step(carry, inp):
        h, last_X, tau, loss = carry
        t, dt, obs, X, M, u = inp
        if dropping and S > 0:
            if per_step_draws:
                u = jax.random.uniform(jax.random.fold_in(k_u, u),
                                       (S, B, w_max), dtype=jnp.bfloat16)
            u_ode = _slots(u, 0, n_ode)
            u_enc = _slots(u, n_ode, n_ode + n_enc)
            u_r1 = _slots(u, n_ode + n_enc, n_ode + n_enc + n_ro)
            u_r2 = _slots(u, n_ode + n_enc + n_ro, S)
        else:
            u_ode = u_enc = u_r1 = u_r2 = None
        t_prev = t - dt
        tdiff = t_prev - tau
        # (1) Euler step (models.py:369-377); dt==0 padding steps are no-ops
        df = _ode_apply(params["ode_f"], cfg, last_X, h, tau, tdiff, None,
                        train, drop_u=u_ode)
        h = h + dt * df
        # (2) pre-jump prediction + jump at observed rows (models.py:459-470)
        # use_rnn takes precedence over masked (the reference GRU jump
        # consumes the raw X_obs even in masked mode, models.py:460-461)
        obs_c = obs[:, None]
        if cfg.masked and not cfg.use_rnn:
            # masked imputation needs y_bj before the jump -> sequential
            y_bj = _readout_apply(params["readout"], cfg, h, None, train,
                                  drop_u=u_r1)
            X_imp = X * M + (1.0 - M) * y_bj
            h_jump = _encoder_apply(params["encoder"], cfg, X_imp, M, None,
                                    train, drop_u=u_enc)
            h_new = obs_c * h_jump + (1.0 - obs_c) * h
            y = _readout_apply(params["readout"], cfg, h_new, None, train,
                               drop_u=u_r2)
        else:
            # no dependency between jump and pre-jump readout: run BOTH
            # readouts as one stacked matmul chain (half the op count)
            if cfg.use_rnn:
                h_jump = mlp.gru_cell_apply(params["gru"], jnp.tanh(X),
                                            jnp.tanh(h),
                                            dot_dtype=cfg.dot_dtype)
            else:
                h_jump = _encoder_apply(params["encoder"], cfg, X, None,
                                        None, train, drop_u=u_enc)
            h_new = obs_c * h_jump + (1.0 - obs_c) * h
            u_r = ([jnp.concatenate([a, b], axis=0)
                    for a, b in zip(u_r1, u_r2)]
                   if u_r1 is not None else None)
            y2 = _readout_apply(params["readout"], cfg,
                                jnp.concatenate([h, h_new], axis=0), None,
                                train, drop_u=u_r)
            y_bj, y = y2[:B], y2[B:]
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
        return (h_new, last_X, tau, loss), out

    carry0 = (h0, batch.start_X, tau0, jnp.float32(0.0))
    xs = (batch.times, batch.dt, batch.obs, batch.X, batch.M, u_scan)
    step_fn = jax.checkpoint(step) if remat else step
    (hT, _, _, loss), path = jax.lax.scan(step_fn, carry0, xs)

    if return_path:
        # the reference applies the same (train-mode) readout module
        # throughout the returned path (models.py:423-426) — honor `train`
        # at t=0 too, with dropout slots drawn from an independent key so
        # the scan's mask stream (shared with ops/fused_scan.py) is
        # untouched
        if dropping and n_ro > 0:
            u0_ro = jax.random.uniform(
                jax.random.fold_in(k0_enc, 13), (n_ro, B, w_max),
                dtype=jnp.bfloat16)
            y0 = _readout_apply(params["readout"], cfg, h0, None, train,
                                drop_u=[u0_ro[i] for i in range(n_ro)])
        else:
            y0 = _readout_apply(params["readout"], cfg, h0, None, train)
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


def evaluate(params, cfg: NJODEConfig, batch: GridBatch, next_cond_exp,
             diff_fun=None):
    """Difference between predicted and true conditional expectation paths.

    Default: duplicate-weighted MSE exactly as ``NJODE.evaluate``
    (``models.py:521-562``), fully on device. A custom ``diff_fun`` (the
    reference's pluggable hook, ``models.py:523``) receives the two
    duplicated path arrays ``[n_entries, B, D]`` as numpy — identical
    layout to the reference — and its result is returned as-is."""
    from njode_tpu.data import oracle

    _, _, (y0, y_pre, y_post) = forward(
        params, cfg, batch, train=False, get_loss=False, return_path=True)
    true_pre, true_post = oracle.cond_exp_paths(next_cond_exp, batch)
    if diff_fun is None:
        return oracle.evaluation_mean_diff(
            y_pre, y_post, true_pre, true_post, y0, batch.start_X,
            batch.obs, batch.dt)
    pred = oracle.stack_path_entries(y0, y_pre, y_post, batch.obs, batch.dt)
    true = oracle.stack_path_entries(batch.start_X, true_pre, true_post,
                                     batch.obs, batch.dt)
    return diff_fun(pred, true)


def weight_decay_step(weight, weight_decay):
    """Decay the loss weight toward 0.5 (``models.py:364-367``)."""
    return 0.5 + (weight - 0.5) * weight_decay
