"""Fused Pallas TPU kernel for the GRU-ODE-Bayes training scan.

The baseline family's hot loop (reference ``NNFOwithBayesianJumps.forward``,
``/root/reference/GRU_ODE_Bayes/models_gru_ode_bayes.py:366-494``) has the
same shape as NJODE's: K sequential steps of tiny matmuls. This kernel runs
the scan (forward AND a hand-written BPTT backward) in Pallas with the
weights and the ``(h, mean, var)`` state resident in VMEM, chunking long
grids exactly like ops/fused_scan.py (sequential grid over K, carries in
VMEM scratch, data/histories streamed HBM<->VMEM).

Layout rules learned from the NJODE kernel (results/RESULTS.md):

- NO lane-axis concat/slice inside the step. Every composite weight is
  split OUTSIDE the kernel (differentiable jax slicing, so cotangents
  compose automatically): GRU gates ride as separate [.., H] matrices, the
  p_model output head as separate mean/var heads, the ODE cell's
  ``lin_x* [2D, .]`` as separate mean-part/var-part matrices, and the
  observation cell's per-feature prep transform
  ``einsum('bdf,dfp->bdp', stacked, w_prep)`` (``:199-212``) as ONE packed
  block-sparse matmul [B,4D]x[4D,D*prep] plus four row-block matmuls —
  the stacked tensor never materializes.
- The per-feature mask expansion ``relu(.) * M[:, :, None]`` becomes a
  matmul with a constant 0/1 expander R [D, D*prep].
- times/dts ride SMEM as [1, K].

Scope: the full trainer-reachable GOB surface — minimal/full GRU-ODE
cells x impute x logvar/plain variance, euler and midpoint solvers, the
Discretized_GRU variant, p_model dropout ('input' exact-parity masks or
in-kernel PRNG). ``supported(cfg)`` reports eligibility (dopri5 falls back
to the XLA scan); loss/gradient parity vs jax.grad of
models/gru_ode_bayes.forward is pinned in tests/test_fused_gob.py.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from njode_tpu.ops import fused_scan as fs

LOG_LIK_C = float(np.log(np.sqrt(2.0 * np.pi)))
OBS_NOISE_STD = 1e-2


def supported(cfg) -> bool:
    return cfg.solver in ("euler", "midpoint")


class _Spec:
    def __init__(self, cfg, mask_mode: str = "input"):
        assert mask_mode in ("input", "prng")
        self.mask_mode = mask_mode
        self.D = cfg.input_size
        self.H = cfg.hidden_size
        self.P = cfg.p_hidden
        self.prep = cfg.prep_hidden
        self.bias = cfg.bias
        self.logvar = bool(cfg.logvar)
        self.mixing = float(cfg.mixing)
        self.full = bool(cfg.full_gru_ode)
        self.solver = cfg.solver
        self.impute = bool(cfg.impute)
        self.disc = bool(cfg.discretized)
        self.rate = float(cfg.dropout_rate)

    def key(self):
        return ("gob", self.D, self.H, self.P, self.prep, self.bias,
                self.logvar, self.mixing, self.full, self.solver,
                self.impute, self.disc, self.rate, self.mask_mode)


# ---------------------------------------------------------------------------
# parameter flattening (all splitting happens here, in differentiable jax)
# ---------------------------------------------------------------------------

def _gate_rows(w, D):
    """[2D, W] -> (mean rows, var rows)."""
    return w[:D], w[D:]


def _flatten_params(params, spec):
    """Deterministic leaf order; every leaf is lane-aligned in-kernel.

    Layout (sizes in brackets):
      p_model: W0 [H,P], b0 [1,P], Wm [P,D], bm [1,D], Wv [P,D], bv [1,D]
      gru_c (variant-dependent, see below)
      obs: Wp_X/Wp_m/Wp_f/Wp_e [D, D*prep], bias_prep [1, D*prep],
           gru w_ih gate-split [D*prep, H] x3, w_hh [H, H] x3,
           (b_ih [1,H] x3, b_hh [1,H] x3)
    """
    D, H, P, prep = spec.D, spec.H, spec.P, spec.prep
    flat = []
    pm = params["p_model"]
    W1 = pm[1]["w"]
    flat += [pm[0]["w"], pm[0].get("b", jnp.zeros(P)).reshape(1, -1),
             W1[:, :D], pm[1].get("b", jnp.zeros(2 * D))[:D].reshape(1, -1),
             W1[:, D:], pm[1].get("b", jnp.zeros(2 * D))[D:].reshape(1, -1)]
    g = params["gru_c"]
    if spec.disc:
        cell = g["cell"]
        for k in range(3):                       # gates r, z, n
            wm, wv = _gate_rows(cell["w_ih"][:, k * H:(k + 1) * H], D)
            flat += [wm, wv]
        for k in range(3):
            flat.append(cell["w_hh"][:, k * H:(k + 1) * H])
        if spec.bias:
            for k in range(3):
                flat.append(cell["b_ih"][k * H:(k + 1) * H].reshape(1, -1))
            for k in range(3):
                flat.append(cell["b_hh"][k * H:(k + 1) * H].reshape(1, -1))
    elif spec.full:
        if spec.impute:
            w = g["lin_x"]["w"]
            for k in range(3):                   # gates r, z, h
                wm, wv = _gate_rows(w[:, k * H:(k + 1) * H], D)
                flat += [wm, wv]
            if spec.bias:
                b = g["lin_x"]["b"]
                for k in range(3):
                    flat.append(b[k * H:(k + 1) * H].reshape(1, -1))
        flat += [g["lin_hr"]["w"], g["lin_hz"]["w"], g["lin_hh"]["w"]]
    else:
        if spec.impute:
            for name in ("lin_xz", "lin_xn"):
                wm, wv = _gate_rows(g[name]["w"], D)
                flat += [wm, wv]
                if spec.bias:
                    flat.append(g[name]["b"].reshape(1, -1))
        flat += [g["lin_hz"]["w"], g["lin_hn"]["w"]]
    ob = params["gru_obs"]
    # packed prep transform: four [D, D*prep] row blocks (features
    # X, mean, feat2, error), block-diagonal over d
    wp = ob["w_prep"]                            # [D, 4, prep]
    eye = jnp.eye(D, dtype=wp.dtype)             # expander via einsum
    for f in range(4):
        # Wf[d, d*prep + q] = wp[d, f, q]
        flat.append(jnp.einsum("de,dq->edq", eye, wp[:, f, :]
                               ).reshape(D, D * prep))
    flat.append(ob["bias_prep"].reshape(1, D * prep))
    cell = ob["gru"]
    for k in range(3):
        flat.append(cell["w_ih"][:, k * H:(k + 1) * H])
    for k in range(3):
        flat.append(cell["w_hh"][:, k * H:(k + 1) * H])
    if spec.bias:
        for k in range(3):
            flat.append(cell["b_ih"][k * H:(k + 1) * H].reshape(1, -1))
        for k in range(3):
            flat.append(cell["b_hh"][k * H:(k + 1) * H].reshape(1, -1))
    return flat


def _n_refs(spec):
    n = 6                                        # p_model
    if spec.disc:
        n += 6 + 3 + (6 if spec.bias else 0)
    elif spec.full:
        n += (6 + (3 if spec.bias else 0)) if spec.impute else 0
        n += 3
    else:
        n += (4 + (2 if spec.bias else 0)) if spec.impute else 0
        n += 2
    n += 5                                       # Wp x4 + bias_prep
    n += 6 + (6 if spec.bias else 0)             # obs gru
    return n


class _W:
    """Named view over the flat weight refs (values read once per kernel)."""

    def __init__(self, refs, spec):
        i = 0

        def take(n):
            nonlocal i
            out = tuple(refs[j][...] for j in range(i, i + n))
            i += n
            return out

        (self.pm_W0, self.pm_b0, self.pm_Wm, self.pm_bm, self.pm_Wv,
         self.pm_bv) = take(6)
        if spec.disc:
            ws = take(6)
            self.dc_ih = [(ws[2 * k], ws[2 * k + 1]) for k in range(3)]
            self.dc_hh = take(3)
            if spec.bias:
                self.dc_bih = take(3)
                self.dc_bhh = take(3)
            else:
                self.dc_bih = self.dc_bhh = (None, None, None)
        elif spec.full:
            if spec.impute:
                ws = take(6)
                self.x_w = [(ws[2 * k], ws[2 * k + 1]) for k in range(3)]
                self.x_b = take(3) if spec.bias else (None, None, None)
            self.Whr, self.Whz, self.Whh = take(3)
        else:
            if spec.impute:
                if spec.bias:
                    (self.xz_m, self.xz_v, self.xz_b, self.xn_m, self.xn_v,
                     self.xn_b) = take(6)
                else:
                    self.xz_m, self.xz_v, self.xn_m, self.xn_v = take(4)
                    self.xz_b = self.xn_b = None
            self.Whz, self.Whn = take(2)
        self.Wp = take(4)                        # X, mean, feat2, err blocks
        (self.bias_prep,) = take(1)
        self.og_ih = take(3)
        self.og_hh = take(3)
        if spec.bias:
            self.og_bih = take(3)
            self.og_bhh = take(3)
        else:
            self.og_bih = self.og_bhh = (None, None, None)
        self.n = i


# ---------------------------------------------------------------------------
# step math (shared fwd; bwd below)
# ---------------------------------------------------------------------------

def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_wT(d, w):
    """``d [B, W] @ w.T`` for a ``[D, W]`` weight — Mosaic-safe at small D.

    Every input-gradient dot in the hand BPTT contracts a [B, W] upstream
    gradient with a transposed [D, W] input weight. At the published GOB
    comparison shapes (D=1: scalar BlackScholes/Heston/OU series) the
    lowered N=1 matmul/matvec ends up as a lane ``vector.multi_reduction``,
    and Mosaic's canonicalizer then folds the surrounding accumulate
    (``dm = dm + <dot>``) into the reduction's init operand — which its
    apply-vector-layout pass rejects with "only constant accumulators
    supported" (the round-5 gob-block compile failure; see
    scripts/gob_mosaic_bisect.py). For D < 8 route through broadcast-
    multiply + keepdims row sums instead: the reduce keeps a constant
    init, the result stays rank-2, and the downstream add is a plain
    elementwise addf. D >= 8 keeps the MXU matmul path."""
    if w.shape[0] >= 8:
        return _dot(d, w.T)
    cols = [jnp.sum(d * w[i][None, :], axis=1, keepdims=True)
            for i in range(w.shape[0])]
    return cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=1)


def _maybe(y, b):
    return y if b is None else y + b


def _p_model_fwd(w, x, u, rate, train):
    """relu MLP head -> (mean, var); returns (m, v, a_pre, a_drop)."""
    pre = _maybe(_dot(x, w.pm_W0), w.pm_b0)
    a = jax.nn.relu(pre)
    if train and rate > 0.0 and u is not None:
        a = jnp.where(u, a / (1.0 - rate), 0.0)
    m = _maybe(_dot(a, w.pm_Wm), w.pm_bm)
    v = _maybe(_dot(a, w.pm_Wv), w.pm_bv)
    return m, v, pre, a


def _p_model_bwd(w, x, pre, a, u, rate, train, dm, dv, acc, base):
    """base indexes the flat slots of (W0 b0 Wm bm Wv bv)."""
    acc[base + 2][...] += _dot(a.T, dm)
    acc[base + 3][...] += jnp.sum(dm, axis=0, keepdims=True)
    acc[base + 4][...] += _dot(a.T, dv)
    acc[base + 5][...] += jnp.sum(dv, axis=0, keepdims=True)
    da = _dot(dm, w.pm_Wm.T) + _dot(dv, w.pm_Wv.T)
    if train and rate > 0.0 and u is not None:
        da = jnp.where(u, da / (1.0 - rate), 0.0)
    d0 = da * (pre > 0)
    acc[base][...] += _dot(x.T, d0)
    acc[base + 1][...] += jnp.sum(d0, axis=0, keepdims=True)
    return _dot(d0, w.pm_W0.T)


def _field_fwd(spec, w, m, v, h, save=False):
    """GRU-ODE vector field dh (gru_ode_bayes._gru_ode_field)."""
    if spec.full:
        if spec.impute:
            xr = _maybe(_dot(m, w.x_w[0][0]) + _dot(v, w.x_w[0][1]),
                        w.x_b[0])
            xz = _maybe(_dot(m, w.x_w[1][0]) + _dot(v, w.x_w[1][1]),
                        w.x_b[1])
            xh = _maybe(_dot(m, w.x_w[2][0]) + _dot(v, w.x_w[2][1]),
                        w.x_b[2])
        else:
            xr = xz = xh = 0.0
        r = jax.nn.sigmoid(xr + _dot(h, w.Whr))
        z = jax.nn.sigmoid(xz + _dot(h, w.Whz))
        u = jnp.tanh(xh + _dot(r * h, w.Whh))
        f = (1.0 - z) * (u - h)
        return f, ((r, z, u) if save else None)
    if spec.impute:
        az = _maybe(_dot(m, w.xz_m) + _dot(v, w.xz_v), w.xz_b) \
            + _dot(h, w.Whz)
        z = jax.nn.sigmoid(az)
        an = _maybe(_dot(m, w.xn_m) + _dot(v, w.xn_v), w.xn_b) \
            + _dot(z * h, w.Whn)
    else:
        z = jax.nn.sigmoid(_dot(h, w.Whz))
        an = _dot(z * h, w.Whn)
    n = jnp.tanh(an)
    f = (1.0 - z) * (n - h)
    return f, ((z, n) if save else None)


def _field_bwd(spec, w, acc, fbase, m, v, h, saved, df):
    """Accumulate field weight grads; return (dm, dv, dh)."""
    dm = jnp.zeros_like(m)
    dv = jnp.zeros_like(v)
    if spec.full:
        r, z, u = saved
        du = df * (1.0 - z)
        dz = -df * (u - h)
        dh = -df * (1.0 - z)
        da_u = du * (1.0 - u * u)
        # u = tanh(xh + (r h) Whh)
        rh = r * h
        i = fbase + (9 if spec.bias else 6) if spec.impute else fbase
        # layout: [x gates (6 [+3 bias])], Whr, Whz, Whh
        acc[i + 2][...] += _dot(rh.T, da_u)
        d_rh = _dot(da_u, w.Whh.T)
        dr = d_rh * h
        dh = dh + d_rh * r
        da_z = dz * z * (1.0 - z)
        acc[i + 1][...] += _dot(h.T, da_z)
        dh = dh + _dot(da_z, w.Whz.T)
        da_r = dr * r * (1.0 - r)
        acc[i][...] += _dot(h.T, da_r)
        dh = dh + _dot(da_r, w.Whr.T)
        if spec.impute:
            for k, da in ((0, da_r), (1, da_z), (2, da_u)):
                acc[fbase + 2 * k][...] += _dot(m.T, da)
                acc[fbase + 2 * k + 1][...] += _dot(v.T, da)
                dm = dm + _dot_wT(da, w.x_w[k][0])
                dv = dv + _dot_wT(da, w.x_w[k][1])
                if spec.bias:
                    acc[fbase + 6 + k][...] += jnp.sum(da, axis=0,
                                                       keepdims=True)
        return dm, dv, dh
    z, n = saved
    dn = df * (1.0 - z)
    dz = -df * (n - h)
    dh = -df * (1.0 - z)
    da_n = dn * (1.0 - n * n)
    zh = z * h
    if spec.impute:
        nb = (3 if spec.bias else 2)
        i_hz = fbase + 2 * nb
        i_hn = i_hz + 1
    else:
        i_hz = fbase
        i_hn = fbase + 1
    acc[i_hn][...] += _dot(zh.T, da_n)
    d_zh = _dot(da_n, w.Whn.T)
    dz = dz + d_zh * h
    dh = dh + d_zh * z
    da_z = dz * z * (1.0 - z)
    acc[i_hz][...] += _dot(h.T, da_z)
    dh = dh + _dot(da_z, w.Whz.T)
    if spec.impute:
        nb = 3 if spec.bias else 2
        acc[fbase][...] += _dot(m.T, da_z)
        acc[fbase + 1][...] += _dot(v.T, da_z)
        dm = dm + _dot_wT(da_z, w.xz_m)
        dv = dv + _dot_wT(da_z, w.xz_v)
        acc[fbase + nb][...] += _dot(m.T, da_n)
        acc[fbase + nb + 1][...] += _dot(v.T, da_n)
        dm = dm + _dot_wT(da_n, w.xn_m)
        dv = dv + _dot_wT(da_n, w.xn_v)
        if spec.bias:
            acc[fbase + 2][...] += jnp.sum(da_z, axis=0, keepdims=True)
            acc[fbase + nb + 2][...] += jnp.sum(da_n, axis=0, keepdims=True)
    return dm, dv, dh


def _gru2_fwd(ihs, hhs, bihs, bhhs, x, h):
    """GRUCell with already-projected input gate pre-activations ``x``
    (list of 3 [B,H]) — used by the obs cell and the discretized cell."""
    gi_r, gi_z, gi_n = x
    gh_r = _maybe(_dot(h, hhs[0]), bhhs[0])
    gh_z = _maybe(_dot(h, hhs[1]), bhhs[1])
    gh_n = _maybe(_dot(h, hhs[2]), bhhs[2])
    r = jax.nn.sigmoid(gi_r + gh_r)
    z = jax.nn.sigmoid(gi_z + gh_z)
    n = jnp.tanh(gi_n + r * gh_n)
    return (1.0 - z) * n + z * h, (r, z, n, gh_n)


def _gru2_bwd(hhs, h, saved, dh2):
    """Backward of _gru2_fwd core; returns (dgi[3], dgh[3], dh)."""
    r, z, n, gh_n = saved
    da_z = dh2 * (h - n) * z * (1.0 - z)
    dn = dh2 * (1.0 - z)
    dh = dh2 * z
    da_n = dn * (1.0 - n * n)
    dr = da_n * gh_n
    dgh_n = da_n * r
    da_r = dr * r * (1.0 - r)
    dgh = (da_r, da_z, dgh_n)
    for w, d in zip(hhs, dgh):
        dh = dh + _dot(d, w.T)
    return (da_r, da_z, da_n), dgh, dh


def _nll_feats(spec, X, M, m, v):
    """(nll_row [B], err, feat2, sigma-ish aux) for the obs cell."""
    if spec.logvar:
        sigma = jnp.exp(0.5 * v)
        err = (X - m) / sigma
        nll = 0.5 * ((err ** 2 + v + 2 * LOG_LIK_C) * M).sum(axis=-1)
        return nll, err, v, sigma
    a = jnp.abs(v) + 1e-6
    err = (X - m) / jnp.sqrt(a)
    nll = 0.5 * ((err ** 2 + jnp.log(a)) * M).sum(axis=-1)
    return nll, err, a, a


def _kl_row(spec, X, M, m, v):
    s2 = OBS_NOISE_STD
    if spec.logvar:
        log_std = 0.5 * v
        var = jnp.exp(v)
    else:
        a = jnp.abs(v) + 1e-5
        log_std = 0.5 * jnp.log(a)
        var = a
    kl = (math.log(s2) - log_std + (var + (m - X) ** 2) / (2.0 * s2 ** 2)
          - 0.5)
    return (kl * M).sum(axis=-1)


def _kl_grads(spec, X, M, m, v, scale):
    """d(scale * kl_row) / d(m, v) — scale is [B]."""
    s2 = OBS_NOISE_STD
    sc = scale[:, None] * M
    dm = sc * (m - X) / (s2 ** 2)
    if spec.logvar:
        dv = sc * (-0.5 + jnp.exp(v) / (2.0 * s2 ** 2))
    else:
        a = jnp.abs(v) + 1e-5
        dv = sc * jnp.sign(v) * (-0.5 / a + 1.0 / (2.0 * s2 ** 2))
    return dm, dv


# ---------------------------------------------------------------------------
# one scan step: forward (+ backward)
# ---------------------------------------------------------------------------

def _ode_fwd(spec, w, h, m, v, dt, us, train, save=False):
    """Propagation part of the step; returns (h1, m1, v1, saved)."""
    u_mid, u_fin = us
    mz = jnp.zeros_like(m)
    m_in, v_in = (m, v) if spec.impute else (mz, mz)
    if spec.disc:
        gi = [
            _maybe(_dot(m_in, w.dc_ih[k][0]) + _dot(v_in, w.dc_ih[k][1]),
                   w.dc_bih[k]) for k in range(3)]
        h1, g_saved = _gru2_fwd(None, w.dc_hh, None, w.dc_bhh, gi, h)
        m1, v1, pre1, a1 = _p_model_fwd(w, h1, u_fin, spec.rate, train)
        return h1, m1, v1, ((g_saved, pre1, a1) if save else None)
    if spec.solver == "euler":
        f, f_saved = _field_fwd(spec, w, m_in, v_in, h, save)
        h1 = h + dt * f
        m1, v1, pre1, a1 = _p_model_fwd(w, h1, u_fin, spec.rate, train)
        return h1, m1, v1, ((f_saved, pre1, a1) if save else None)
    # midpoint
    f1, f1_saved = _field_fwd(spec, w, m_in, v_in, h, save)
    kk = h + dt / 2.0 * f1
    if spec.impute:
        mk, vk, prek, ak = _p_model_fwd(w, kk, u_mid, spec.rate, train)
    else:
        mk = vk = mz
        prek = ak = None
    f2, f2_saved = _field_fwd(spec, w, mk, vk, kk, save)
    h1 = h + dt * f2
    m1, v1, pre1, a1 = _p_model_fwd(w, h1, u_fin, spec.rate, train)
    return h1, m1, v1, ((f1_saved, prek, ak, f2_saved, pre1, a1)
                        if save else None)


def _step_fwd(spec, w, R, h, m, v, t, dt, obs, X, M, us, train,
              save=False):
    """Full GOB step; returns (h2, m2, v2, loss_step, saved)."""
    u_mid, u_fin, u_post = us if us is not None else (None, None, None)
    live = (dt > 0).astype(h.dtype)
    h1p, m1p, v1p, ode_saved = _ode_fwd(spec, w, h, m, v, dt,
                                        (u_mid, u_fin), train, save)
    h1 = live * h1p + (1.0 - live) * h
    m1 = live * m1p + (1.0 - live) * m
    v1 = live * v1p + (1.0 - live) * v
    # observation update
    nll, err, feat2, _aux = _nll_feats(spec, X, M, m1, v1)
    pre = (_dot(X, w.Wp[0]) + _dot(m1, w.Wp[1]) + _dot(feat2, w.Wp[2])
           + _dot(err, w.Wp[3]) + w.bias_prep)
    Mexp = _dot(M, R)
    gin = jax.nn.relu(pre) * Mexp
    gi = [_maybe(_dot(gin, w.og_ih[k]), w.og_bih[k]) for k in range(3)]
    h_jump, og_saved = _gru2_fwd(None, w.og_hh, None, w.og_bhh, gi, h1)
    obs_c = obs[:, None]
    h2 = obs_c * h_jump + (1.0 - obs_c) * h1
    m2p, v2p, pre2, a2 = _p_model_fwd(w, h2, u_post, spec.rate, train)
    m2 = obs_c * m2p + (1.0 - obs_c) * m1
    v2 = obs_c * v2p + (1.0 - obs_c) * v1
    loss_step = jnp.sum(obs * nll) \
        + spec.mixing * jnp.sum(obs * _kl_row(spec, X, M, m2, v2))
    saved = ((ode_saved, h1, m1, v1, err, feat2, pre, Mexp, gin, og_saved,
              h2, m2p, v2p, pre2, a2, h_jump) if save else None)
    return h2, m2, v2, loss_step, saved


_EXPANDERS = {}


def _expander(spec, dtype):
    key = (spec.D, spec.prep)
    if key not in _EXPANDERS:
        R = np.zeros((spec.D, spec.D * spec.prep), np.float32)
        for d in range(spec.D):
            R[d, d * spec.prep:(d + 1) * spec.prep] = 1.0
        _EXPANDERS[key] = R
    return jnp.asarray(_EXPANDERS[key], dtype)


def _bases(spec):
    """Flat-slot bases: (p_model, field/disc-cell, obs)."""
    pm = 0
    fb = 6
    if spec.disc:
        ob = fb + 9 + (6 if spec.bias else 0)
    elif spec.full:
        ob = fb + ((6 + (3 if spec.bias else 0)) if spec.impute else 0) + 3
    else:
        ob = fb + ((4 + (2 if spec.bias else 0)) if spec.impute else 0) + 2
    return pm, fb, ob


def _step_bwd(spec, w, acc, R, h, m, v, t, dt, obs, X, M, us, train,
              dh_nx, dm_nx, dv_nx, dloss):
    """Hand-written BPTT for one GOB step; returns (dh, dm, dv)."""
    u_mid, u_fin, u_post = us if us is not None else (None, None, None)
    pm_b, f_b, o_b = _bases(spec)
    h2, m2, v2, _, saved = _step_fwd(spec, w, R, h, m, v, t, dt, obs, X,
                                     M, us, train, save=True)
    (ode_saved, h1, m1, v1, err, feat2, pre, Mexp, gin, og_saved,
     h2_, m2p, v2p, pre2, a2, h_jump) = saved
    obs_c = obs[:, None]
    live = (dt > 0).astype(h.dtype)

    # loss2 (KL) on (m2, v2); carry from next step
    dklm, dklv = _kl_grads(spec, X, M, m2, v2,
                           dloss * spec.mixing * obs)
    dm2 = dm_nx + dklm
    dv2 = dv_nx + dklv
    # m2 = obs*m2p + (1-obs)*m1
    dm2p = obs_c * dm2
    dv2p = obs_c * dv2
    dm1 = (1.0 - obs_c) * dm2
    dv1 = (1.0 - obs_c) * dv2
    dh2 = dh_nx + _p_model_bwd(w, h2_, pre2, a2, u_post, spec.rate, train,
                               dm2p, dv2p, acc, pm_b)
    # h2 = obs*h_jump + (1-obs)*h1
    dh_jump = obs_c * dh2
    dh1 = (1.0 - obs_c) * dh2
    # obs GRU backward
    dgi, dgh, dh1_g = _gru2_bwd(w.og_hh, h1, og_saved, dh_jump)
    dh1 = dh1 + dh1_g
    for k in range(3):
        acc[o_b + 5 + k][...] += _dot(gin.T, dgi[k])
        if spec.bias:
            acc[o_b + 11 + k][...] += jnp.sum(dgi[k], axis=0, keepdims=True)
        acc[o_b + 8 + k][...] += _dot(h1.T, dgh[k])
        if spec.bias:
            acc[o_b + 14 + k][...] += jnp.sum(dgh[k], axis=0, keepdims=True)
    dgin = 0.0
    for k in range(3):
        dgin = dgin + _dot(dgi[k], w.og_ih[k].T)
    dpre = dgin * Mexp * (pre > 0)
    acc[o_b + 0][...] += _dot(X.T, dpre)
    acc[o_b + 1][...] += _dot(m1.T, dpre)
    acc[o_b + 2][...] += _dot(feat2.T, dpre)
    acc[o_b + 3][...] += _dot(err.T, dpre)
    acc[o_b + 4][...] += jnp.sum(dpre, axis=0, keepdims=True)
    d_m_feat = _dot_wT(dpre, w.Wp[1])
    d_f_feat = _dot_wT(dpre, w.Wp[2])
    d_e_feat = _dot_wT(dpre, w.Wp[3])
    # nll gradient wrt (m1, v1), scaled
    sc = (dloss * obs)[:, None] * M
    if spec.logvar:
        sigma = jnp.exp(0.5 * v1)
        # nll terms
        dm1 = dm1 - sc * err / sigma
        dv1 = dv1 + sc * 0.5 * (1.0 - err * err)
        # err/feat2 features
        dm1 = dm1 - d_e_feat / sigma
        dv1 = dv1 - 0.5 * d_e_feat * err + d_f_feat
    else:
        a = feat2                                 # |v1| + 1e-6
        sq = jnp.sqrt(a)
        sgn = jnp.sign(v1)
        dm1 = dm1 - sc * err / sq
        dv1 = dv1 + sgn * sc * 0.5 * (1.0 - err * err) / a
        dm1 = dm1 - d_e_feat / sq
        dv1 = dv1 + sgn * (-0.5 * d_e_feat * err / a + d_f_feat)
    dm1 = dm1 + d_m_feat

    # live-select of the propagation
    dh1p = live * dh1
    dm1p = live * dm1
    dv1p = live * dv1
    dh = (1.0 - live) * dh1
    dm = (1.0 - live) * dm1
    dv = (1.0 - live) * dv1

    # ---- ODE propagation backward
    mz = jnp.zeros_like(m)
    m_in, v_in = (m, v) if spec.impute else (mz, mz)
    if spec.disc:
        g_saved, pre1, a1 = ode_saved
        # p_model consumed the cell's h1 output
        dh1p = dh1p + _p_model_bwd(w, _disc_h1(spec, w, g_saved, h, m_in,
                                               v_in), pre1, a1, u_fin,
                                   spec.rate, train, dm1p, dv1p, acc, pm_b)
        dgi, dgh, dhp = _gru2_bwd(w.dc_hh, h, g_saved, dh1p)
        for k in range(3):
            acc[f_b + 2 * k][...] += _dot(m_in.T, dgi[k])
            acc[f_b + 2 * k + 1][...] += _dot(v_in.T, dgi[k])
            acc[f_b + 6 + k][...] += _dot(h.T, dgh[k])
            if spec.bias:
                acc[f_b + 9 + k][...] += jnp.sum(dgi[k], axis=0,
                                                 keepdims=True)
                acc[f_b + 12 + k][...] += jnp.sum(dgh[k], axis=0,
                                                  keepdims=True)
        if spec.impute:
            for k in range(3):
                dm = dm + _dot_wT(dgi[k], w.dc_ih[k][0])
                dv = dv + _dot_wT(dgi[k], w.dc_ih[k][1])
        return dh + dhp, dm, dv
    if spec.solver == "euler":
        f_saved, pre1, a1 = ode_saved
        f, _ = _field_fwd(spec, w, m_in, v_in, h, False)
        h1p_v = h + dt * f
        dh1p = dh1p + _p_model_bwd(w, h1p_v, pre1, a1, u_fin, spec.rate,
                                   train, dm1p, dv1p, acc, pm_b)
        df = dt * dh1p
        dmf, dvf, dhf = _field_bwd(spec, w, acc, f_b, m_in, v_in, h,
                                   f_saved, df)
        dh = dh + dh1p + dhf
        if spec.impute:
            dm = dm + dmf
            dv = dv + dvf
        return dh, dm, dv
    # midpoint
    f1_saved, prek, ak, f2_saved, pre1, a1 = ode_saved
    f1, _ = _field_fwd(spec, w, m_in, v_in, h, False)
    kk = h + dt / 2.0 * f1
    if spec.impute:
        mk, vk, _, _ = _p_model_fwd(w, kk, u_mid, spec.rate, train)
    else:
        mk = vk = mz
    f2, _ = _field_fwd(spec, w, mk, vk, kk, False)
    h1p_v = h + dt * f2
    dh1p = dh1p + _p_model_bwd(w, h1p_v, pre1, a1, u_fin, spec.rate,
                               train, dm1p, dv1p, acc, pm_b)
    df2 = dt * dh1p
    dmk, dvk, dkk = _field_bwd(spec, w, acc, f_b, mk, vk, kk, f2_saved,
                               df2)
    dh = dh + dh1p
    if spec.impute:
        dkk = dkk + _p_model_bwd(w, kk, prek, ak, u_mid, spec.rate, train,
                                 dmk, dvk, acc, pm_b)
    df1 = dt / 2.0 * dkk
    dmf, dvf, dhf = _field_bwd(spec, w, acc, f_b, m_in, v_in, h, f1_saved,
                               df1)
    dh = dh + dkk + dhf
    if spec.impute:
        dm = dm + dmf
        dv = dv + dvf
    return dh, dm, dv


def _disc_h1(spec, w, g_saved, h, m_in, v_in):
    """Recompute the discretized cell's h1 (p_model input) from saved."""
    r, z, n, gh_n = g_saved
    return (1.0 - z) * n + z * h


# ---------------------------------------------------------------------------
# kernels (chunked sequential grid, mirroring ops/fused_scan.py)
# ---------------------------------------------------------------------------

def _step_masks(spec, B, train, u_ref, seed_ref, j, k):
    if not (train and spec.rate > 0.0):
        return None
    if spec.mask_mode == "input":
        u = u_ref[j]
        return [u[s] != 0 for s in range(3)]
    seed = seed_ref[0, 0].astype(jnp.int32)
    pltpu.prng_seed(seed + k)
    keep = 1.0 - spec.rate
    thresh = jnp.uint32(min(int(keep * 2.0 ** 32), 2 ** 32 - 1))
    out = []
    for _ in range(3):
        bits = pltpu.bitcast(pltpu.prng_random_bits((B, spec.P)),
                             jnp.uint32)
        out.append(bits < thresh)
    return out


def _make_fwd_kernel(spec, CK, NC, B, train, want_hists=True):
    n_refs = _n_refs(spec)

    def kernel(*refs):
        w = _W(refs, spec)
        assert w.n == n_refs
        (t_ref, dt_ref, obs_ref, X_ref, M_ref, u_ref, seed_ref, R_ref,
         h0_ref, m0_ref, v0_ref) = refs[n_refs:n_refs + 11]
        rest = refs[n_refs + 11:]
        if want_hists:
            loss_ref, hh_ref, mh_ref, vh_ref = rest[:4]
            h_s, m_s, v_s = rest[4:]
        else:
            loss_ref = rest[0]
            h_s, m_s, v_s = rest[1:]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            h_s[...] = h0_ref[...]
            m_s[...] = m0_ref[...]
            v_s[...] = v0_ref[...]
            loss_ref[...] = jnp.zeros_like(loss_ref)

        def body(j, carry):
            h, m, v, loss = carry
            if want_hists:
                hh_ref[j] = h
                mh_ref[j] = m
                vh_ref[j] = v
            k = i * CK + j
            us = _step_masks(spec, B, train, u_ref, seed_ref, j, k)
            h2, m2, v2, l_step, _ = _step_fwd(
                spec, w, R_ref[...], h, m, v, t_ref[0, k], dt_ref[0, k],
                obs_ref[j], X_ref[j], M_ref[j], us, train)
            return (h2, m2, v2, loss + l_step)

        h, m, v, dl = jax.lax.fori_loop(
            0, CK, body, (h_s[...], m_s[...], v_s[...], jnp.float32(0.0)))
        h_s[...] = h
        m_s[...] = m
        v_s[...] = v
        loss_ref[...] += dl * jnp.ones((1, 1), jnp.float32)

    return kernel, n_refs


def _make_bwd_kernel(spec, CK, NC, B, train):
    n_refs = _n_refs(spec)

    def kernel(*refs):
        w = _W(refs, spec)
        (t_ref, dt_ref, obs_ref, X_ref, M_ref, u_ref, seed_ref, R_ref,
         hh_ref, mh_ref, vh_ref, dloss_ref) = refs[n_refs:n_refs + 12]
        outs = refs[n_refs + 12:n_refs + 12 + n_refs + 3]
        g_acc = outs[:n_refs]
        dh0_ref, dm0_ref, dv0_ref = outs[n_refs:]
        dh_s, dm_s, dv_s = refs[n_refs + 15 + n_refs:]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            for r in g_acc:
                r[...] = jnp.zeros(r.shape, jnp.float32)
            dh_s[...] = jnp.zeros_like(dh_s)
            dm_s[...] = jnp.zeros_like(dm_s)
            dv_s[...] = jnp.zeros_like(dv_s)

        dloss = dloss_ref[0, 0]

        def body(jj, carry):
            j = CK - 1 - jj
            k = (NC - 1 - i) * CK + j
            dh_nx, dm_nx, dv_nx = carry
            us = _step_masks(spec, B, train, u_ref, seed_ref, j, k)
            return _step_bwd(
                spec, w, g_acc, R_ref[...], hh_ref[j], mh_ref[j], vh_ref[j],
                t_ref[0, k], dt_ref[0, k], obs_ref[j], X_ref[j], M_ref[j],
                us, train, dh_nx, dm_nx, dv_nx, dloss)

        dh, dm, dv = jax.lax.fori_loop(
            0, CK, body, (dh_s[...], dm_s[...], dv_s[...]))
        dh_s[...] = dh
        dm_s[...] = dm
        dv_s[...] = dv

        @pl.when(i == NC - 1)
        def _emit():
            dh0_ref[...] = dh
            dm0_ref[...] = dm
            dv0_ref[...] = dv

    return kernel, n_refs


# ---------------------------------------------------------------------------
# planning (reuse fused_scan's budget machinery shapes)
# ---------------------------------------------------------------------------

def _plan(spec, K, B, train, want_hists=True):
    Bp = fs._pad8(B)
    lane = fs._lane

    def chunk_bytes(CK, bwd):
        x_blk = CK * Bp * lane(spec.D) * 4
        obs_blk = fs._pad8(CK) * lane(B) * 4
        u_blk = (CK * 3 * Bp * lane(spec.P)
                 if (train and spec.rate > 0.0
                     and spec.mask_mode == "input") else 0)
        hist_blk = (CK * Bp * (lane(spec.H) + 2 * lane(spec.D)) * 4
                    if want_hists else 0)
        per_chunk = 2 * x_blk + obs_blk + u_blk + hist_blk
        n_w = _weight_bytes(spec)
        scr = Bp * (lane(spec.H) + 2 * lane(spec.D)) * 4
        const = 2 * n_w + scr + 3 * Bp * lane(spec.H) * 4
        if bwd:
            const += n_w + scr
        return const + 2 * per_chunk

    def max_buffer(K):
        # measured: the GOB mono forward's history OUTPUTS are accounted
        # together ("Scoped allocation with size 20.76M" for hh+mh at
        # 10.2MB each), unlike the NJODE kernel's — gate on their SUM
        cands = [K * Bp * lane(spec.D) * 4,
                 K * Bp * (lane(spec.H) + 2 * lane(spec.D)) * 4,
                 fs._pad8(K) * lane(B) * 4]
        if train and spec.rate > 0.0 and spec.mask_mode == "input":
            cands.append(K * 3 * Bp * lane(spec.P))
        return max(cands)

    K = int(K)
    mono_unpadded = (2 * _weight_bytes(spec)
                     + K * B * (spec.H + 4 * spec.D) * 4
                     + (K * 3 * B * spec.P
                        if (train and spec.rate > 0.0
                            and spec.mask_mode == "input") else 0))
    if mono_unpadded <= fs.MONO_BUDGET and max_buffer(K) <= fs.MONO_MAX_BUFFER:
        return K, 1, K
    lo, hi = 8, max(8, (K // 2) // 8 * 8)
    if max(chunk_bytes(lo, False), chunk_bytes(lo, True)) > fs.VMEM_BUDGET:
        return None
    while lo < hi:
        mid = (lo + hi + 8) // 16 * 8
        if max(chunk_bytes(mid, False), chunk_bytes(mid, True)) \
                <= fs.VMEM_BUDGET:
            lo = mid
        else:
            hi = mid - 8
    CK = lo
    NC = -(-K // CK)
    return CK, NC, NC * CK


def _weight_bytes(spec):
    D, H, P, prep = spec.D, spec.H, spec.P, spec.prep
    n = H * P + P + 2 * (P * D + D)                     # p_model
    n += 4 * D * D * prep + D * prep                    # obs prep (packed)
    n += 3 * (D * prep * H + H * H) + 6 * H             # obs gru
    n += 6 * D * H + 3 * H * H + 3 * H                  # field upper bound
    return n * 4


# ---------------------------------------------------------------------------
# custom-VJP loss
# ---------------------------------------------------------------------------

_SPECS = {}


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def fused_gob_loss(spec_key, shapes, interpret, flat_params, batch_arrays,
                   u_scan, seed, h0, m0, v0):
    loss, _ = _fwd_impl(spec_key, shapes, interpret, flat_params,
                        batch_arrays, u_scan, seed, h0, m0, v0)
    return loss


def _common_ins(spec, K, flat, times, dts, obs, X, M, u_scan, seed):
    return (list(flat)
            + [times.reshape(1, K), dts.reshape(1, K), obs, X, M, u_scan,
               jnp.asarray(seed, jnp.float32).reshape(1, 1),
               _expander(spec, jnp.float32)])


def _common_specs(spec, CK, B, train, fwd, NC, n_flat):
    ix = (lambda i: i) if fwd else (lambda i: NC - 1 - i)
    vm = fs._vmem
    specs = ([vm()] * n_flat
             + [fs._smem(), fs._smem()]
             + [vm((CK, B), lambda i: (ix(i), 0)),
                vm((CK, B, spec.D), lambda i: (ix(i), 0, 0)),
                vm((CK, B, spec.D), lambda i: (ix(i), 0, 0))])
    if train and spec.rate > 0.0 and spec.mask_mode == "input":
        specs.append(vm((CK, 3, B, spec.P), lambda i: (ix(i), 0, 0, 0)))
    else:
        specs.append(vm((1, 1, 1, 1), lambda i: (0, 0, 0, 0)))
    specs.append(fs._smem())                    # seed
    specs.append(fs._vmem())                    # mask expander R
    return specs


def _fwd_impl(spec_key, shapes, interpret, flat_params, batch_arrays,
              u_scan, seed, h0, m0, v0):
    spec = _SPECS[spec_key]
    K, CK, NC, B, train = shapes
    times, dts, obs, X, M = batch_arrays
    kernel, n_refs = _make_fwd_kernel(spec, CK, NC, B, train)
    out_shape = (
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
        jax.ShapeDtypeStruct((K, B, spec.H), jnp.float32),
        jax.ShapeDtypeStruct((K, B, spec.D), jnp.float32),
        jax.ShapeDtypeStruct((K, B, spec.D), jnp.float32),
    )
    ins = _common_ins(spec, K, flat_params, times, dts, obs, X, M, u_scan,
                      seed) + [h0, m0, v0]
    in_specs = (_common_specs(spec, CK, B, train, True, NC,
                              len(flat_params))
                + [fs._vmem()] * 3)
    out_specs = (
        fs._vmem((1, 1), lambda i: (0, 0)),
        fs._vmem((CK, B, spec.H), lambda i: (i, 0, 0)),
        fs._vmem((CK, B, spec.D), lambda i: (i, 0, 0)),
        fs._vmem((CK, B, spec.D), lambda i: (i, 0, 0)),
    )
    loss, hh, mh, vh = pl.pallas_call(
        kernel,
        grid=(NC,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((B, spec.H), jnp.float32),
                        pltpu.VMEM((B, spec.D), jnp.float32),
                        pltpu.VMEM((B, spec.D), jnp.float32)],
        interpret=interpret,
    )(*ins)
    return loss[0, 0], (hh, mh, vh)


def _fused_fwd(spec_key, shapes, interpret, flat_params, batch_arrays,
               u_scan, seed, h0, m0, v0):
    loss, hists = _fwd_impl(spec_key, shapes, interpret, flat_params,
                            batch_arrays, u_scan, seed, h0, m0, v0)
    return loss, (flat_params, batch_arrays, u_scan, seed, hists)


def _fused_bwd(spec_key, shapes, interpret, res, dloss):
    spec = _SPECS[spec_key]
    K, CK, NC, B, train = shapes
    flat_params, batch_arrays, u_scan, seed, (hh, mh, vh) = res
    times, dts, obs, X, M = batch_arrays
    kernel, n_refs = _make_bwd_kernel(spec, CK, NC, B, train)
    out_shape = tuple(jax.ShapeDtypeStruct(p.shape, jnp.float32)
                      for p in flat_params) + (
        jax.ShapeDtypeStruct((B, spec.H), jnp.float32),
        jax.ShapeDtypeStruct((B, spec.D), jnp.float32),
        jax.ShapeDtypeStruct((B, spec.D), jnp.float32))
    rev = lambda i: (NC - 1 - i, 0, 0)  # noqa: E731
    ins = _common_ins(spec, K, flat_params, times, dts, obs, X, M, u_scan,
                      seed) + [hh, mh, vh,
                               jnp.asarray(dloss,
                                           jnp.float32).reshape(1, 1)]
    in_specs = (_common_specs(spec, CK, B, train, False, NC,
                              len(flat_params))
                + [fs._vmem((CK, B, spec.H), rev),
                   fs._vmem((CK, B, spec.D), rev),
                   fs._vmem((CK, B, spec.D), rev),
                   fs._smem()])
    out_specs = tuple(
        fs._vmem(p.shape, lambda i, nd=p.ndim: (0,) * nd)
        for p in flat_params) + (
        fs._vmem((B, spec.H), lambda i: (0, 0)),
        fs._vmem((B, spec.D), lambda i: (0, 0)),
        fs._vmem((B, spec.D), lambda i: (0, 0)))
    outs = pl.pallas_call(
        kernel,
        grid=(NC,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((B, spec.H), jnp.float32),
                        pltpu.VMEM((B, spec.D), jnp.float32),
                        pltpu.VMEM((B, spec.D), jnp.float32)],
        interpret=interpret,
    )(*ins)
    g_flat = list(outs[:-3])
    dh0, dm0, dv0 = outs[-3:]
    zeros_batch = jax.tree.map(jnp.zeros_like, batch_arrays)
    return (g_flat, zeros_batch, jnp.zeros_like(u_scan),
            jnp.zeros((), jnp.float32), dh0, dm0, dv0)


fused_gob_loss.defvjp(_fused_fwd, _fused_bwd)


def make_fused_loss_fn(cfg, interpret: bool = False,
                       mask_mode: str = "input", u_override=None,
                       mesh=None, axis: str = "data"):
    """``loss_fn(params, batch, rng, train)`` through the fused GOB kernel;
    differentiable wrt params (the t=0 cov_map/p_model run in XLA and
    compose via the h0/m0/v0 cotangents). Falls back to
    ``gru_ode_bayes.forward`` when unsupported or no plan fits.

    ``mesh``: 1-D data-parallel mesh — same shard_map composition as
    ``fused_scan.make_fused_loss_fn``, except the GOB loss is an
    observation SUM (no 1/B), so shard losses psum (not pmean). The XLA
    prologue (cov_map/p_model at t=0, 'input'-mode dropout draws) runs on
    the global batch under GSPMD, keeping 'input' mode bit-identical
    across mesh sizes; 'prng' mode seeds each shard independently."""
    from njode_tpu.models import gru_ode_bayes as gob

    assert supported(cfg), "config not supported by the fused GOB kernel"
    spec = _Spec(cfg, mask_mode)
    key = spec.key()
    _SPECS[key] = spec
    n_shards = 1
    if mesh is not None:
        if tuple(mesh.axis_names) != (axis,):
            raise ValueError(
                f"fused kernel sharding needs a 1-D mesh over '{axis}'; "
                f"got axes {mesh.axis_names}")
        n_shards = int(mesh.shape[axis])

    def loss_fn(params, batch, rng, train):
        K = batch.times.shape[0]
        B = batch.start_X.shape[0]
        B_local = B // n_shards if B % n_shards == 0 else None
        plan = _plan(spec, K, B_local, train) if B_local else None
        if plan is None:
            _, loss = gob.forward(params, cfg, batch, rng=rng, train=train,
                                  get_loss=True)
            return loss
        CK, NC, K_pad = plan
        rate = spec.rate
        dropping = train and rate > 0.0
        k0, k_scan = jax.random.split(rng)
        seeds = jnp.zeros((n_shards,), jnp.float32)
        if dropping:
            k_u, k_u0c, k_u0p = jax.random.split(
                jax.random.fold_in(k_scan, 7), 3)
            u0_cov = jax.random.uniform(k_u0c, (B, cfg.cov_hidden),
                                        dtype=jnp.bfloat16)
            u0_p = jax.random.uniform(k_u0p, (B, cfg.p_hidden),
                                      dtype=jnp.bfloat16)
            if spec.mask_mode == "input":
                if u_override is not None:
                    u_scan = jnp.asarray(u_override, jnp.int8)
                else:
                    keep = jnp.float32(1.0 - rate)
                    u_scan = (jax.random.uniform(
                        k_u, (K, 3, B, cfg.p_hidden),
                        dtype=jnp.bfloat16).astype(jnp.float32)
                        < keep).astype(jnp.int8)
                u_scan = fs._pad_grid(u_scan, K_pad)
            else:
                u_scan = jnp.zeros((1, 1, 1, 1), jnp.int8)
                seeds = jax.random.randint(
                    k_u, (n_shards,), 0, 1 << 24).astype(jnp.float32)
        else:
            u0_cov = u0_p = None
            u_scan = jnp.zeros((1, 1, 1, 1), jnp.int8)
        h0 = gob._mlp2(params["cov_map"], batch.start_X, rate, k0, train,
                       final_act=jnp.tanh, u=u0_cov)
        p0 = gob._mlp2(params["p_model"], h0, rate,
                       jax.random.fold_in(k0, 1), train, u=u0_p)
        m0, v0 = p0[:, :spec.D], p0[:, spec.D:]
        flat = _flatten_params(params, spec)
        batch_arrays = (fs._pad_grid(batch.times, K_pad),
                        fs._pad_grid(batch.dt, K_pad),
                        fs._pad_grid(batch.obs, K_pad),
                        fs._pad_grid(batch.X, K_pad),
                        fs._pad_grid(batch.M, K_pad))
        if mesh is None:
            return fused_gob_loss(key, (K_pad, CK, NC, B, train),
                                  interpret, flat, batch_arrays, u_scan,
                                  seeds[0], h0, m0, v0)

        from jax.sharding import PartitionSpec as P
        P_rep = P()
        u_sharded = u_scan.ndim == 4 and u_scan.shape[2] == B
        ba_specs = (P_rep, P_rep, P(None, axis), P(None, axis, None),
                    P(None, axis, None))

        def local_loss(flat_l, ba_l, u_l, seeds_l, h0_l, m0_l, v0_l):
            loss = fused_gob_loss(
                key, (K_pad, CK, NC, B_local, train), interpret, flat_l,
                ba_l, u_l, seeds_l[0], h0_l, m0_l, v0_l)
            return jax.lax.psum(loss, axis)

        smapped = jax.shard_map(
            local_loss, mesh=mesh,
            in_specs=([P_rep] * len(flat), ba_specs,
                      P(None, None, axis, None) if u_sharded else P_rep,
                      P(axis), P(axis, None), P(axis, None), P(axis, None)),
            out_specs=P_rep, check_vma=False)
        return smapped(flat, batch_arrays, u_scan, seeds, h0, m0, v0)

    return loss_fn
