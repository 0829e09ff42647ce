"""Closed-form conditional-expectation oracle on the dense union grid.

Re-implements ``StockModel.compute_cond_exp`` / ``get_optimal_loss``
(``/root/reference/NJODE/stock_model.py:50-158``) as a masked ``lax.scan``
sharing the model's grid machinery: per step, propagate the conditional
expectation with the model's closed form, then overwrite observed rows with
the observed values (the "jump"). The optimal loss is the NJODE loss of this
optimal predictor.

Path recording matches the reference exactly: the pre-jump value is recorded
after every Euler step and the post-jump value is recorded *again* at each
observation time (duplicate time entries, ``stock_model.py:104-131``), which
matters because the evaluation metric ``np.mean((pred-true)**2)``
(``models.py:521-562``) averages over the duplicated array. We therefore
expose pre/post arrays plus the duplicate-aware mean in
:func:`evaluation_mean_diff`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from njode_tpu.data.grid import GridBatch
from njode_tpu.models.losses import step_loss


@partial(jax.jit, static_argnums=(0,))
def cond_exp_paths(next_cond_exp, batch: GridBatch):
    """Run the oracle recursion over the grid.

    :param next_cond_exp: callable ``(y, dt, t_prev) -> y`` (pure jnp),
        e.g. ``sde.make_model(...).next_cond_exp``
    :return: (y_pre [K, B, D], y_post [K, B, D]) — conditional expectation
        before and after the jump at each grid step. The t=0 entry
        (``start_X``) is *not* included; callers prepend it when needed.
    """
    def step(y, inp):
        t, dt, obs, X = inp
        t_prev = t - dt
        y_prop = next_cond_exp(y, dt, t_prev)
        # dt==0 marks padding steps: keep y unchanged
        y_pre = jnp.where(dt > 0, y_prop, y)
        y_post = jnp.where(obs[:, None] > 0, X, y_pre)
        return y_post, (y_pre, y_post)

    _, (y_pre, y_post) = jax.lax.scan(
        step, batch.start_X, (batch.times, batch.dt, batch.obs, batch.X))
    return y_pre, y_post


@partial(jax.jit, static_argnums=(0,))
def optimal_loss(next_cond_exp, batch: GridBatch, weight: float = 0.5):
    """Loss achieved by the true conditional expectation
    (``stock_model.py:123-127, 153-158``): per observation, ``Y`` is the
    post-jump value (== X at observed rows) and ``Y_bj`` the pre-jump one.
    """
    B = batch.start_X.shape[0]

    def step(carry, inp):
        y, loss = carry
        t, dt, obs, X = inp
        t_prev = t - dt
        y_pre = jnp.where(dt > 0, next_cond_exp(y, dt, t_prev), y)
        y_post = jnp.where(obs[:, None] > 0, X, y_pre)
        # oracle loss uses the unmasked numpy loss (stock_model.py:471-481)
        loss = loss + step_loss(
            which="standard", X=X, Y=y_post, Y_bj=y_pre, obs=obs,
            n_obs_ot=batch.n_obs_ot, batch_size=B, weight=weight, M=None)
        return (y_post, loss), None

    (_, loss), _ = jax.lax.scan(
        step, (batch.start_X, jnp.float32(0.0)),
        (batch.times, batch.dt, batch.obs, batch.X))
    return loss


def evaluation_mean_diff(pred_pre, pred_post, true_pre, true_post,
                         y0_pred, y0_true, obs, dt):
    """Duplicate-weighted MSE between predicted and true cond-exp paths.

    Equals ``np.mean((path_y_pred - path_y_true)**2)`` over the reference's
    path arrays (``models.py:556-558``), which contain: the t=0 entry, one
    entry per Euler step (pre-jump), and one extra entry per observation time
    with >=1 observation in the batch (post-jump).

    :param pred_pre/true_pre: [K, B, D] pre-jump values per grid step
    :param pred_post/true_post: [K, B, D] post-jump values per grid step
    :param y0_pred/y0_true: [B, D] values at t=0
    :param obs: [K, B] observation indicators
    :param dt: [K] step sizes (0 => padding step, excluded)
    """
    real = (dt > 0).astype(pred_pre.dtype)                        # [K]
    any_obs = (obs.sum(axis=1) > 0).astype(pred_pre.dtype) * real  # [K]
    B, D = y0_pred.shape
    sq0 = jnp.sum((y0_pred - y0_true) ** 2)
    sq_pre = jnp.sum(((pred_pre - true_pre) ** 2).sum(axis=(1, 2)) * real)
    sq_post = jnp.sum(((pred_post - true_post) ** 2).sum(axis=(1, 2)) * any_obs)
    n_entries = 1.0 + jnp.sum(real) + jnp.sum(any_obs)
    return (sq0 + sq_pre + sq_post) / (n_entries * B * D)


def stack_path_entries(y0, y_pre, y_post, obs, dt):
    """Assemble the reference's duplicated path array on the host.

    ``NJODE.forward`` records (``models.py:423-426, 441-445, 491-494``): the
    t=0 entry, one pre-jump entry per Euler step, and an extra post-jump
    entry at each observation time with >=1 observation in the batch.
    Returns ``[n_entries, B, D]`` numpy — the exact layout the reference's
    pluggable ``diff_fun`` receives (``models.py:521-562``).
    """
    import numpy as np

    y0 = np.asarray(y0)
    y_pre = np.asarray(y_pre)
    y_post = np.asarray(y_post)
    obs = np.asarray(obs)
    dt = np.asarray(dt)
    entries = [y0]
    for k in range(len(dt)):
        if dt[k] <= 0 and not (k == 0 and obs[k].sum() > 0):
            continue  # padding step
        if dt[k] > 0:
            entries.append(y_pre[k])
        if obs[k].sum() > 0:
            entries.append(y_post[k])
    return np.stack(entries, axis=0)
