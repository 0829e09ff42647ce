"""Fused Pallas TPU kernel for the NJODE training scan.

The hot loop (SURVEY §3.2; reference event loop ``NJODE/models.py:379-518``)
is K sequential steps of tiny matmuls ([B<=256, width<=128]) — far too small
to keep the MXU busy from HBM, and dominated by per-op overhead under a
plain XLA ``lax.scan``. This kernel runs the ENTIRE scan in one
``pallas_call``: all weights, the hidden state, and the per-step data live
in VMEM; a ``fori_loop`` walks the K steps; the matmuls hit the MXU with no
inter-op round trips. The backward pass is a second kernel implementing
hand-written BPTT: the forward stores only the small per-step carries
(``h``, ``last_X``, ``tau`` — O(K*B*H)), and the backward re-materializes
each step's activations from them in reverse order (gradient checkpointing
at step granularity), accumulating weight gradients in VMEM.

Scope: the unmasked NJODE configuration family (no ``use_rnn``, no
``masked``, no ``input_current_t``; both losses; arbitrary MLP depths/widths
and residual modes; dropout via the precomputed mask tensor from
models/njode.py). Other configurations fall back to the XLA scan —
``supported(cfg)`` reports eligibility.

Semantics match ``njode.forward(..., train=?, get_loss=True)`` exactly
(same dense-grid scan, same fused-dropout convention); verified in
interpret mode against the XLA path and ``jax.grad`` in
tests/test_fused_scan.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-10


def supported(cfg) -> bool:
    """Whether this kernel covers the given NJODEConfig."""
    return (not cfg.masked and not cfg.use_rnn and not cfg.input_current_t
            and cfg.solver == "euler"
            and cfg.which_loss in ("standard", "easy")
            and cfg.ode_nn is not None and cfg.readout_nn is not None
            and cfg.enc_nn is not None)


# ---------------------------------------------------------------------------
# static config plumbing
# ---------------------------------------------------------------------------

def _acts(nn_desc):
    return tuple(a for (_, a) in nn_desc)


def _widths(in_size, out_size, nn_desc):
    return (in_size,) + tuple(int(w) for (w, _) in nn_desc) + (out_size,)


def _flatten_params(params):
    """Deterministic leaf order: ode layers, enc layers, readout layers;
    per layer w then b."""
    flat = []
    for name in ("ode_f", "encoder", "readout"):
        for layer in params[name]:
            flat.append(layer["w"])
            if "b" in layer:
                # biases as [1, W]: Mosaic wants >=2-D VMEM tiles
                flat.append(layer["b"].reshape(1, -1))
    return flat


def vmem_estimate_bytes(spec, K: int, B: int, train: bool) -> int:
    """Rough VMEM footprint of the kernels: weights + per-step data +
    histories + dropout masks. Used to gate the fused path — Mosaic's
    scoped VMEM budget is ~16MB and oversubscription is a compile error."""
    n_w = sum((a * b + b) for a, b in zip(spec.ode_w[:-1], spec.ode_w[1:]))
    n_w += sum((a * b + b) for a, b in zip(spec.enc_w[:-1], spec.enc_w[1:]))
    n_w += sum((a * b + b) for a, b in zip(spec.ro_w[:-1], spec.ro_w[1:]))
    hists = K * B * (spec.H + spec.D + 1) * 4
    data = K * B * (spec.D + 1) * 4
    w_max = max(spec.ode_w + spec.enc_w + spec.ro_w)
    masks = (K * spec.S * B * w_max
             if (train and spec.rate > 0.0 and spec.mask_mode == "input")
             else 0)
    grads = n_w * 4
    return 2 * n_w * 4 + hists + data + masks + grads


class _Spec:
    """Static kernel specification derived from an NJODEConfig.

    ``mask_mode``: how training dropout masks reach the kernel —
    'input' (int8 tensor thresholded outside; bit-identical to the XLA
    path, used by the parity tests) or 'prng' (generated in-kernel with
    the TPU PRNG, re-seeded per step so the backward re-draws identical
    masks; no [K,S,B,W] tensor in VMEM — faster and lighter)."""

    def __init__(self, cfg, mask_mode: str = "input"):
        assert mask_mode in ("input", "prng")
        self.mask_mode = mask_mode
        from njode_tpu.models import mlp
        self.D = cfg.input_size
        self.H = cfg.hidden_size
        self.O = cfg.output_size
        self.ode_w = _widths(self.D + self.H + 2, self.H, cfg.ode_nn)
        self.enc_w = _widths(self.D, self.H, cfg.enc_nn)
        self.ro_w = _widths(self.H, self.O, cfg.readout_nn)
        self.ode_a = _acts(cfg.ode_nn)
        self.enc_a = _acts(cfg.enc_nn)
        self.ro_a = _acts(cfg.readout_nn)
        self.enc_case, self.enc_mult = mlp.residual_case(
            self.D, self.H, cfg.residual_enc_dec)
        self.ro_case, self.ro_mult = mlp.residual_case(
            self.H, self.O, cfg.residual_enc_dec)
        self.bias = cfg.bias
        self.rate = float(cfg.dropout_rate)
        self.easy = cfg.which_loss == "easy"
        self.n_ode = len(cfg.ode_nn)
        self.n_enc = len(cfg.enc_nn)
        self.n_ro = len(cfg.readout_nn)
        # dropout slot offsets, matching njode.forward's layout:
        # [ode..., enc..., readout_pre..., readout_post...]
        self.s_ode = 0
        self.s_enc = self.n_ode
        self.s_r1 = self.n_ode + self.n_enc
        self.s_r2 = self.n_ode + self.n_enc + self.n_ro
        self.S = self.s_r2 + self.n_ro
        widths = [w for nn in (cfg.ode_nn, cfg.enc_nn, cfg.readout_nn)
                  for (w, _) in nn]
        self.w_max = max(widths) if widths else 1

    def key(self):
        return (self.D, self.H, self.O, self.ode_w, self.enc_w, self.ro_w,
                self.ode_a, self.enc_a, self.ro_a, self.enc_case,
                self.enc_mult, self.ro_case, self.ro_mult, self.bias,
                self.rate, self.easy, self.mask_mode)


def _act(name, x):
    return jnp.tanh(x) if name == "tanh" else jax.nn.relu(x)


def _act_grad(name, pre):
    if name == "tanh":
        t = jnp.tanh(pre)
        return 1.0 - t * t
    return (pre > 0).astype(pre.dtype)


# ---------------------------------------------------------------------------
# shared per-step math (used inside both kernels)
# ---------------------------------------------------------------------------

def _ffnn_fwd(ws, acts, x, us, rate, train, save=False):
    """Forward through a get_ffnn MLP. ``ws`` = [(w, b), ...];
    ``us`` = precomputed int8 keep-masks per hidden layer (or None; VMEM
    economy: 1 byte per mask bit instead of an f32 uniform). Returns
    (out, pres) where pres are the pre-activation inputs per hidden layer
    (only filled when save=True, for the backward recompute)."""
    pres = []
    w, b = ws[0]
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    for i, name in enumerate(acts):
        if save:
            pres.append(y)
        a = _act(name, y)
        if train and rate > 0.0 and us is not None:
            keep = 1.0 - rate
            a = jnp.where(us[i][:, :a.shape[-1]], a / keep, 0.0)
        w, b = ws[i + 1]
        y = jnp.dot(a, w, preferred_element_type=jnp.float32)
        if b is not None:
            y = y + b
    return y, pres


def _ffnn_bwd(ws, acts, x, pres, us, rate, train, dy, acc, base):
    """Backward through a get_ffnn MLP; accumulates weight grads into the
    ``acc`` refs starting at slot ``base`` (layer-ordered w[,b]) and returns
    dx. Activations are recomputed from the saved pre-activations."""
    n_hidden = len(acts)
    keep = 1.0 - rate
    # recompute the post-dropout activations a_i
    a_list = []
    for i, name in enumerate(acts):
        a = _act(name, pres[i])
        if train and rate > 0.0 and us is not None:
            a = jnp.where(us[i][:, :a.shape[-1]], a / keep, 0.0)
        a_list.append(a)
    # walk layers in reverse: layer n_hidden..1 consume a_{i-1}
    d = dy
    for i in range(n_hidden, 0, -1):
        w, b = ws[i]
        a = a_list[i - 1]
        _acc_wb(acc, base, i, w, b, a, d)
        da = jnp.dot(d, w.T, preferred_element_type=jnp.float32)
        if train and rate > 0.0 and us is not None:
            da = jnp.where(us[i - 1][:, :da.shape[-1]], da / keep,
                           0.0)
        d = da * _act_grad(acts[i - 1], pres[i - 1])
    w, b = ws[0]
    _acc_wb(acc, base, 0, w, b, x, d)
    return jnp.dot(d, w.T, preferred_element_type=jnp.float32)


def _acc_wb(acc, base, layer, w, b, a_in, d):
    """acc layout: per layer, w grad ref then (if bias) b grad ref."""
    stride = 2 if b is not None else 1
    wi = base + layer * stride
    acc[wi][...] += jnp.dot(a_in.T, d, preferred_element_type=jnp.float32)
    if b is not None:
        acc[wi + 1][...] += jnp.sum(d, axis=0, keepdims=True)


def _residual_fwd(case, mult, x_raw, out):
    if case == 0:
        return out
    if case == 1:
        return jnp.concatenate([x_raw] * mult, axis=-1) + out
    # case 2: mean of `mult` chunks of the raw input — static slices, not a
    # 3-D reshape (Mosaic cannot lower (B, W) -> (B, mult, chunk) casts)
    chunk = x_raw.shape[-1] // mult
    ident = x_raw[:, :chunk]
    for i in range(1, mult):
        ident = ident + x_raw[:, i * chunk:(i + 1) * chunk]
    return ident / mult + out


def _residual_bwd(case, mult, dout):
    """Gradient of the identity branch wrt x_raw."""
    if case == 0:
        return 0.0
    if case == 1:
        chunk = dout.shape[-1] // mult
        acc = dout[:, :chunk]
        for i in range(1, mult):
            acc = acc + dout[:, i * chunk:(i + 1) * chunk]
        return acc
    return jnp.concatenate([dout / mult] * mult, axis=-1)


def _split_ws(refs, widths, bias, start):
    """Read (w, b) pairs for one MLP from the flat ref list."""
    ws = []
    i = start
    for _ in range(len(widths) - 1):
        w = refs[i][...]
        i += 1
        b = None
        if bias:
            b = refs[i][...]
            i += 1
        ws.append((w, b))
    return ws, i


def _loss_terms(spec, X, y, y_bj, obs, n_obs, weight, B_total):
    e1 = jnp.sum((X - y) ** 2, axis=-1)
    tgt = X if spec.easy else y
    e2 = jnp.sum((y_bj - tgt) ** 2, axis=-1)
    s1 = jnp.sqrt(e1 + EPS)
    s2 = jnp.sqrt(e2 + EPS)
    fac = 1.0 if spec.easy else 2.0
    g = fac * weight * s1 + fac * (1.0 - weight) * s2
    denom = jnp.maximum(n_obs, 1.0)
    return jnp.sum(obs * g * g / denom) / B_total, (s1, s2, g)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _step_masks(spec, K, B, train, u_ref, seed_ref, k):
    """Per-step boolean dropout masks, from the int8 input tensor ('input'
    mode) or the TPU PRNG ('prng' mode; re-seeded per step so the backward
    pass re-draws the identical sequence)."""
    if not (train and spec.rate > 0.0):
        return None
    if spec.mask_mode == "input":
        u = u_ref[k]
        return [u[s] != 0 for s in range(spec.S)]
    seed = seed_ref[0, 0].astype(jnp.int32)
    pltpu.prng_seed(seed + k)
    keep = 1.0 - spec.rate
    thresh = jnp.uint32(min(int(keep * 2.0 ** 32), 2 ** 32 - 1))
    out = []
    for _ in range(spec.S):
        bits = pltpu.bitcast(pltpu.prng_random_bits((B, spec.w_max)),
                             jnp.uint32)
        out.append(bits < thresh)
    return out


def _step_forward(spec, ws_ode, ws_enc, ws_ro, h, last_X, tau, t, dt, obs,
                  X, us, train, save=False):
    """One NJODE step; returns (h2, lastX', tau', y, y_bj, saved).
    ``us``: per-slot boolean dropout masks (or None)."""
    u_ode = us[spec.s_ode:spec.s_ode + spec.n_ode] if us else None
    u_enc = us[spec.s_enc:spec.s_enc + spec.n_enc] if us else None
    u_r1 = us[spec.s_r1:spec.s_r1 + spec.n_ro] if us else None
    u_r2 = us[spec.s_r2:spec.s_r2 + spec.n_ro] if us else None

    t_prev = t - dt
    tdiff = t_prev - tau                                   # [B, 1]
    ode_in = jnp.concatenate(
        [jnp.tanh(last_X), jnp.tanh(h), tau, tdiff], axis=-1)
    f, ode_pres = _ffnn_fwd(ws_ode, spec.ode_a, ode_in, u_ode, spec.rate,
                            train, save)
    h1 = h + dt * f
    # pre-jump readout
    r1_in = jnp.tanh(h1)
    y_bj_o, r1_pres = _ffnn_fwd(ws_ro, spec.ro_a, r1_in, u_r1, spec.rate,
                                train, save)
    y_bj = _residual_fwd(spec.ro_case, spec.ro_mult, h1, y_bj_o)
    # jump encoder
    e_in = jnp.tanh(X)
    enc_o, enc_pres = _ffnn_fwd(ws_enc, spec.enc_a, e_in, u_enc, spec.rate,
                                train, save)
    h_enc = _residual_fwd(spec.enc_case, spec.enc_mult, X, enc_o)
    obs_c = obs[:, None]
    h2 = obs_c * h_enc + (1.0 - obs_c) * h1
    # post-jump readout
    r2_in = jnp.tanh(h2)
    y_o, r2_pres = _ffnn_fwd(ws_ro, spec.ro_a, r2_in, u_r2, spec.rate,
                             train, save)
    y = _residual_fwd(spec.ro_case, spec.ro_mult, h2, y_o)
    last_X2 = jnp.where(obs_c > 0, X, last_X)
    tau2 = jnp.where(obs_c > 0, jnp.full_like(tau, t), tau)
    saved = (ode_pres, r1_pres, enc_pres, r2_pres, h1, h2, h_enc) \
        if save else None
    return h2, last_X2, tau2, y, y_bj, saved


def _make_fwd_kernel(spec, K, B, train, want_hists: bool = True):
    n_w = (2 if spec.bias else 1)
    n_refs = n_w * (len(spec.ode_w) + len(spec.enc_w) + len(spec.ro_w) - 3)

    def kernel(*refs):
        # inputs: weights..., times[K,1], dts[K,1], obs[K,B], X[K,B,D],
        #         u[K,S,B,Wmax] (or [K,1,1,1]), n_obs[B,1], weight[1,1],
        #         seed[1,1], h0[B,H], startX[B,D]
        (w_refs, t_ref, dt_ref, obs_ref, X_ref, u_ref, nobs_ref, wt_ref,
         seed_ref, h0_ref, sx_ref) = (refs[:n_refs],
                                      *refs[n_refs:n_refs + 10])
        if want_hists:
            loss_ref, hh_ref, lx_ref, tau_ref = refs[n_refs + 10:]
        else:
            (loss_ref,) = refs[n_refs + 10:]

        ws_ode, i = _split_ws(w_refs, spec.ode_w, spec.bias, 0)
        ws_enc, i = _split_ws(w_refs, spec.enc_w, spec.bias, i)
        ws_ro, _ = _split_ws(w_refs, spec.ro_w, spec.bias, i)
        n_obs = nobs_ref[...][:, 0]
        weight = wt_ref[0, 0]

        def body(k, carry):
            h, last_X, tau, loss = carry
            if want_hists:
                # record step-entry carries for the backward recompute
                hh_ref[k] = h
                lx_ref[k] = last_X
                tau_ref[k] = tau
            t = t_ref[k, 0]
            dt = dt_ref[k, 0]
            obs = obs_ref[k]
            X = X_ref[k]
            us = _step_masks(spec, K, B, train, u_ref, seed_ref, k)
            h2, lx2, tau2, y, y_bj, _ = _step_forward(
                spec, ws_ode, ws_enc, ws_ro, h, last_X, tau, t, dt, obs, X,
                us, train)
            l_step, _ = _loss_terms(spec, X, y, y_bj, obs, n_obs, weight,
                                    float(B))
            return (h2, lx2, tau2, loss + l_step)

        h0 = h0_ref[...]
        sx = sx_ref[...]
        tau0 = jnp.zeros((B, 1), jnp.float32)
        _, _, _, loss = jax.lax.fori_loop(
            0, K, body, (h0, sx, tau0, jnp.float32(0.0)))
        loss_ref[...] = loss * jnp.ones((1, 1), jnp.float32)

    return kernel, n_refs


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _make_bwd_kernel(spec, K, B, train):
    n_w = (2 if spec.bias else 1)
    n_ode_l = len(spec.ode_w) - 1
    n_enc_l = len(spec.enc_w) - 1
    n_ro_l = len(spec.ro_w) - 1
    n_refs = n_w * (n_ode_l + n_enc_l + n_ro_l)
    ode_base = 0
    enc_base = n_w * n_ode_l
    ro_base = n_w * (n_ode_l + n_enc_l)

    def kernel(*refs):
        (w_refs, t_ref, dt_ref, obs_ref, X_ref, u_ref, nobs_ref, wt_ref,
         seed_ref, sx_ref, hh_ref, lx_ref, tau_ref, dloss_ref) = (
            refs[:n_refs], *refs[n_refs:n_refs + 13])
        grad_refs = refs[n_refs + 13:]
        # grad_refs: one per weight leaf + dh0 output (last)
        g_acc = grad_refs[:n_refs]
        dh0_ref = grad_refs[n_refs]

        ws_ode, i = _split_ws(w_refs, spec.ode_w, spec.bias, 0)
        ws_enc, i = _split_ws(w_refs, spec.enc_w, spec.bias, i)
        ws_ro, _ = _split_ws(w_refs, spec.ro_w, spec.bias, i)
        n_obs = nobs_ref[...][:, 0]
        weight = wt_ref[0, 0]
        dloss = dloss_ref[0, 0]

        for r in g_acc:
            r[...] = jnp.zeros(r.shape, jnp.float32)

        def body(kk, carry):
            k = K - 1 - kk
            dh_next, dlx_next, dtau_next = carry
            h = hh_ref[k]
            last_X = lx_ref[k]
            tau = tau_ref[k]
            t = t_ref[k, 0]
            dt = dt_ref[k, 0]
            obs = obs_ref[k]
            X = X_ref[k]
            us = _step_masks(spec, K, B, train, u_ref, seed_ref, k)
            u_ode = us[spec.s_ode:spec.s_ode + spec.n_ode] if us else None
            u_enc = us[spec.s_enc:spec.s_enc + spec.n_enc] if us else None
            u_r1 = us[spec.s_r1:spec.s_r1 + spec.n_ro] if us else None
            u_r2 = us[spec.s_r2:spec.s_r2 + spec.n_ro] if us else None

            # ---- recompute the step forward (with saved pre-activations)
            h2, _, _, y, y_bj, saved = _step_forward(
                spec, ws_ode, ws_enc, ws_ro, h, last_X, tau, t, dt, obs, X,
                us, train, save=True)
            ode_pres, r1_pres, enc_pres, r2_pres, h1, h2, h_enc = saved
            obs_c = obs[:, None]

            # ---- loss gradients wrt y, y_bj
            _, (s1, s2, g) = _loss_terms(spec, X, y, y_bj, obs, n_obs,
                                         weight, float(B))
            denom = jnp.maximum(n_obs, 1.0)
            dinner = dloss * obs / denom / float(B)        # [B]
            fac = 1.0 if spec.easy else 2.0
            dg = 2.0 * g * dinner
            de1 = (fac * weight * dg) * (0.5 / s1)
            de2 = (fac * (1.0 - weight) * dg) * (0.5 / s2)
            dy = de1[:, None] * 2.0 * (y - X)
            tgt = X if spec.easy else y
            dybj = de2[:, None] * 2.0 * (y_bj - tgt)
            if not spec.easy:
                dy = dy + de2[:, None] * 2.0 * (y - y_bj)

            # ---- carries through the state updates
            dtau = (1.0 - obs_c) * dtau_next
            dlx = (1.0 - obs_c) * dlx_next

            # ---- post-jump readout backward (input h2)
            r2_in = jnp.tanh(h2)
            d_r2in = _ffnn_bwd(ws_ro, spec.ro_a, r2_in, r2_pres, u_r2,
                               spec.rate, train, dy, g_acc, ro_base)
            dh2 = dh_next + d_r2in * (1.0 - r2_in * r2_in) \
                + _residual_bwd(spec.ro_case, spec.ro_mult, dy)

            # ---- jump select h2 = obs*h_enc + (1-obs)*h1
            dh_enc = obs_c * dh2
            dh1 = (1.0 - obs_c) * dh2

            # ---- encoder backward (input X: constant, grads only to weights)
            e_in = jnp.tanh(X)
            _ffnn_bwd(ws_enc, spec.enc_a, e_in, enc_pres, u_enc, spec.rate,
                      train, dh_enc, g_acc, enc_base)

            # ---- pre-jump readout backward (input h1)
            r1_in = jnp.tanh(h1)
            d_r1in = _ffnn_bwd(ws_ro, spec.ro_a, r1_in, r1_pres, u_r1,
                               spec.rate, train, dybj, g_acc, ro_base)
            dh1 = dh1 + d_r1in * (1.0 - r1_in * r1_in) \
                + _residual_bwd(spec.ro_case, spec.ro_mult, dybj)

            # ---- Euler step backward: h1 = h + dt * f(ode_in)
            df = dt * dh1
            t_prev = t - dt
            tdiff = t_prev - tau
            ode_in = jnp.concatenate(
                [jnp.tanh(last_X), jnp.tanh(h), tau, tdiff], axis=-1)
            d_odein = _ffnn_bwd(ws_ode, spec.ode_a, ode_in, ode_pres, u_ode,
                                spec.rate, train, df, g_acc, ode_base)
            D, H = spec.D, spec.H
            d_tlx = d_odein[:, :D]
            d_th = d_odein[:, D:D + H]
            d_tau_f = d_odein[:, D + H:D + H + 1]
            d_tdiff = d_odein[:, D + H + 1:D + H + 2]
            tlx = jnp.tanh(last_X)
            th = jnp.tanh(h)
            dlx = dlx + d_tlx * (1.0 - tlx * tlx)
            dh = dh1 + d_th * (1.0 - th * th)
            dtau = dtau + d_tau_f - d_tdiff
            return (dh, dlx, dtau)

        zero_h = jnp.zeros((B, spec.H), jnp.float32)
        zero_x = jnp.zeros((B, spec.D), jnp.float32)
        zero_t = jnp.zeros((B, 1), jnp.float32)
        dh0, _, _ = jax.lax.fori_loop(0, K, body, (zero_h, zero_x, zero_t))
        dh0_ref[...] = dh0

    return kernel, n_refs


# ---------------------------------------------------------------------------
# public entry: custom-VJP fused loss
# ---------------------------------------------------------------------------

def _vmem_spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _smem_spec():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def fused_njode_loss(spec_key, shapes, interpret, flat_params, batch_arrays,
                     weight, u_scan, seed, h0):
    """Fused NJODE scan loss (see module docstring).

    :param spec_key: hashable static spec (from ``_Spec.key()``); the actual
        spec is rebuilt via the cfg registry in :func:`make_fused_loss_fn`
    :param shapes: (K, B, train) static tuple
    :param flat_params: leaf list from :func:`_flatten_params`
    :param batch_arrays: (times [K], dts [K], obs [K,B], X [K,B,D],
        n_obs [B], start_X [B,D])
    :param u_scan: int8 dropout keep-masks [K,S,B,Wmax] ('input' mode;
        dummy [K,1,1,1] otherwise)
    :param seed: f32 scalar holding the integer PRNG seed ('prng' mode;
        f32 so the cotangent machinery stays float — values < 2^24)
    :param h0: encoder output at t=0 [B,H] (computed outside, XLA — its
        VJP to the encoder weights is handled by jax around this op)
    """
    loss, _ = _fwd_impl(spec_key, shapes, interpret, flat_params,
                        batch_arrays, weight, u_scan, seed, h0)
    return loss


_SPECS = {}


def _fwd_impl(spec_key, shapes, interpret, flat_params, batch_arrays,
              weight, u_scan, seed, h0):
    spec = _SPECS[spec_key]
    K, B, train = shapes
    times, dts, obs, X, n_obs, start_X = batch_arrays
    kernel, n_refs = _make_fwd_kernel(spec, K, B, train)

    out_shape = (
        jax.ShapeDtypeStruct((1, 1), jnp.float32),              # loss
        jax.ShapeDtypeStruct((K, B, spec.H), jnp.float32),      # h history
        jax.ShapeDtypeStruct((K, B, spec.D), jnp.float32),      # lastX hist
        jax.ShapeDtypeStruct((K, B, 1), jnp.float32),           # tau hist
    )
    ins = (list(flat_params)
           + [times.reshape(K, 1), dts.reshape(K, 1), obs, X, u_scan,
              n_obs.reshape(B, 1),
              jnp.asarray(weight, jnp.float32).reshape(1, 1),
              jnp.asarray(seed, jnp.float32).reshape(1, 1), h0, start_X])
    n_p = len(flat_params)
    in_specs = ([_vmem_spec()] * n_p
                + [_smem_spec(), _smem_spec()]          # times, dts
                + [_vmem_spec()] * 3                    # obs, X, u
                + [_vmem_spec()]                        # n_obs
                + [_smem_spec(), _smem_spec()]          # weight, seed
                + [_vmem_spec()] * 2)                   # h0, start_X
    loss, hh, lx, tau = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=tuple(_vmem_spec() for _ in out_shape),
        interpret=interpret,
    )(*ins)
    return loss[0, 0], (hh, lx, tau)


def _fused_fwd(spec_key, shapes, interpret, flat_params, batch_arrays,
               weight, u_scan, seed, h0):
    loss, hists = _fwd_impl(spec_key, shapes, interpret, flat_params,
                            batch_arrays, weight, u_scan, seed, h0)
    return loss, (flat_params, batch_arrays, weight, u_scan, seed, hists)


def _fused_bwd(spec_key, shapes, interpret, res, dloss):
    spec = _SPECS[spec_key]
    K, B, train = shapes
    flat_params, batch_arrays, weight, u_scan, seed, (hh, lx, tau) = res
    times, dts, obs, X, n_obs, start_X = batch_arrays
    kernel, n_refs = _make_bwd_kernel(spec, K, B, train)

    out_shape = tuple(jax.ShapeDtypeStruct(p.shape, jnp.float32)
                      for p in flat_params) + (
        jax.ShapeDtypeStruct((B, spec.H), jnp.float32),)        # dh0
    ins = (list(flat_params)
           + [times.reshape(K, 1), dts.reshape(K, 1), obs, X, u_scan,
              n_obs.reshape(B, 1),
              jnp.asarray(weight, jnp.float32).reshape(1, 1),
              jnp.asarray(seed, jnp.float32).reshape(1, 1),
              start_X, hh, lx, tau,
              jnp.asarray(dloss, jnp.float32).reshape(1, 1)])
    n_p = len(flat_params)
    in_specs = ([_vmem_spec()] * n_p
                + [_smem_spec(), _smem_spec()]          # times, dts
                + [_vmem_spec()] * 3                    # obs, X, u
                + [_vmem_spec()]                        # n_obs
                + [_smem_spec(), _smem_spec()]          # weight, seed
                + [_vmem_spec()] * 4                    # sx, hh, lx, tau
                + [_smem_spec()])                       # dloss
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=tuple(_vmem_spec() for _ in out_shape),
        interpret=interpret,
    )(*ins)
    g_flat = list(outs[:-1])
    dh0 = outs[-1]
    zeros_batch = jax.tree.map(jnp.zeros_like, batch_arrays)
    return (g_flat, zeros_batch, jnp.zeros_like(weight),
            jnp.zeros_like(u_scan), jnp.zeros((), jnp.float32), dh0)


fused_njode_loss.defvjp(_fused_fwd, _fused_bwd)


def make_fused_eval_fn(cfg, interpret: bool = False):
    """Histogram-free fused forward for EVALUATION: one kernel computing
    the loss only (no backward-recompute carries are stored, so large eval
    batches fit VMEM). Returns ``eval_fn(params, batch, weight)``."""
    from njode_tpu.models import njode as njode_mod

    assert supported(cfg), "config not supported by the fused kernel"
    spec = _Spec(cfg, "input")

    def eval_fn(params, batch, weight):
        K = batch.times.shape[0]
        B = batch.start_X.shape[0]
        # Mosaic pads the trailing observable dim to 128 lanes, so the
        # [K, B, D] inputs cost K*B*ceil(D/128)*128*4 bytes each in VMEM —
        # large eval batches (e.g. the 4k-path validation split) overflow;
        # fall back to the XLA scan there
        lane_d = ((spec.D + 127) // 128) * 128
        est = 3 * K * B * lane_d * 4 + K * B * 4
        if est > 12 * 1024 * 1024:
            _, loss = njode_mod.forward(params, cfg, batch, weight=weight,
                                        train=False, get_loss=True)
            return loss
        h0 = njode_mod._encoder_apply(params["encoder"], cfg, batch.start_X,
                                      None, None, False)
        flat = _flatten_params(params)
        kernel, n_refs = _make_fwd_kernel(spec, K, B, train=False,
                                          want_hists=False)
        ins = (list(flat)
               + [batch.times.reshape(K, 1), batch.dt.reshape(K, 1),
                  batch.obs, batch.X, jnp.zeros((K, 1, 1, 1), jnp.int8),
                  jnp.asarray(batch.n_obs_ot,
                              jnp.float32).reshape(B, 1),
                  jnp.asarray(weight, jnp.float32).reshape(1, 1),
                  jnp.zeros((1, 1), jnp.float32), h0, batch.start_X])
        in_specs = ([_vmem_spec()] * len(flat)
                    + [_smem_spec(), _smem_spec()]
                    + [_vmem_spec()] * 4
                    + [_smem_spec(), _smem_spec()]
                    + [_vmem_spec()] * 2)
        loss = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((1, 1), jnp.float32),),
            in_specs=in_specs,
            out_specs=(_vmem_spec(),),
            interpret=interpret,
        )(*ins)[0]
        return loss[0, 0]

    return eval_fn


def make_fused_loss_fn(cfg, interpret: bool = False,
                       mask_mode: str = "input"):
    """Return ``loss_fn(params, batch, weight, rng, train)`` using the fused
    kernel; differentiable wrt params (the t=0 encoder runs in XLA so its
    weight gradients compose with the kernel's via the h0 cotangent).

    :param mask_mode: 'input' = exact mask parity with the XLA scan;
        'prng' = in-kernel TPU PRNG masks (no [K,S,B,W] tensor — faster;
        statistically equivalent dropout, different stream)."""
    from njode_tpu.models import njode as njode_mod

    assert supported(cfg), "config not supported by the fused kernel"
    spec = _Spec(cfg, mask_mode)
    key = spec.key()
    _SPECS[key] = spec

    def loss_fn(params, batch, weight, rng, train):
        K = batch.times.shape[0]
        B = batch.start_X.shape[0]
        # VMEM feasibility gate (trace-time python): large grids (e.g.
        # climate K~2000) overflow the kernel's resident buffers — fall
        # back to the XLA scan instead of failing in Mosaic
        if vmem_estimate_bytes(spec, K, B, train) > 12 * 1024 * 1024:
            _, loss = njode_mod.forward(params, cfg, batch, weight=weight,
                                        rng=rng, train=train, get_loss=True)
            return loss
        dropping = train and spec.rate > 0.0
        seed = jnp.float32(0.0)
        if dropping:
            n_ode, n_enc, n_ro, w_max = njode_mod._dropout_slots(cfg)
            k0_enc, k_scan = jax.random.split(rng, 2)
            k_u0, k_u = jax.random.split(k_scan)
            if spec.mask_mode == "input":
                # same bf16 draws as njode.forward, thresholded OUTSIDE
                # the kernel into int8 keep-masks (f32 compare => identical
                # masks; int8 keeps the tensor within the VMEM budget)
                keep = jnp.float32(1.0 - spec.rate)
                u_scan = (jax.random.uniform(
                    k_u, (K, spec.S, B, w_max),
                    dtype=jnp.bfloat16).astype(jnp.float32)
                    < keep).astype(jnp.int8)
            else:
                u_scan = jnp.zeros((K, 1, 1, 1), jnp.int8)
                seed = jax.random.randint(
                    k_u, (), 0, 1 << 24).astype(jnp.float32)
            u0 = jax.random.uniform(k_u0, (max(n_enc, 1), B, w_max),
                                    dtype=jnp.bfloat16)
        else:
            k0_enc = rng
            u_scan = jnp.zeros((K, 1, 1, 1), jnp.int8)
            u0 = None
        h0 = njode_mod._encoder_apply(
            params["encoder"], cfg, batch.start_X, None, k0_enc, train,
            drop_u=([u0[i] for i in range(spec.n_enc)] if dropping
                    else None))
        flat = _flatten_params(params)
        return fused_njode_loss(
            key, (K, B, train), interpret, flat,
            (batch.times, batch.dt, batch.obs, batch.X,
             jnp.asarray(batch.n_obs_ot, jnp.float32), batch.start_X),
            jnp.asarray(weight, jnp.float32), u_scan, seed, h0)

    return loss_fn
