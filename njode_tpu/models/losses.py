"""NJODE loss functions, in dense-masked (scan-step) and event forms.

Reference: ``/root/reference/NJODE/models.py:71-132`` — the 'standard' loss

    (2w*sqrt(sum_d M*(X-Y)^2 + eps) + 2(1-w)*sqrt(sum_d M*(Y_bj-Y)^2 + eps))^2

summed over observed rows weighted by ``1/n_obs_ot``, divided by batch size,
and the 'easy' variant comparing ``Y_bj`` to ``X`` without the factor 2.

The dense form multiplies each row's contribution by the per-step observation
indicator instead of gathering observed rows — bitwise identical for rows that
are observed, exactly zero otherwise (the eps guard keeps sqrt differentiable
everywhere, as in the reference).
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-10


def _inner(which: str, X, Y, Y_bj, weight, M):
    """Per-row inner term of the loss; sums over the feature axis."""
    if M is None:
        M = jnp.ones_like(X)
    e1 = jnp.sum(M * (X - Y) ** 2, axis=-1)
    if which == "standard":
        e2 = jnp.sum(M * (Y_bj - Y) ** 2, axis=-1)
        return (2.0 * weight * jnp.sqrt(e1 + EPS)
                + 2.0 * (1.0 - weight) * jnp.sqrt(e2 + EPS)) ** 2
    elif which == "easy":
        e2 = jnp.sum(M * (Y_bj - X) ** 2, axis=-1)
        return (weight * jnp.sqrt(e1 + EPS)
                + (1.0 - weight) * jnp.sqrt(e2 + EPS)) ** 2
    raise ValueError(f"unknown loss '{which}'")


def step_loss(which: str, X, Y, Y_bj, obs, n_obs_ot, batch_size,
              weight=0.5, M=None):
    """Dense per-step loss contribution.

    :param X: [B, D] observed values at this step (anything at unobserved rows)
    :param Y: [B, D] post-jump prediction
    :param Y_bj: [B, D] pre-jump prediction
    :param obs: [B] observation indicator for this step
    :param n_obs_ot: [B] total observations per row (0 allowed: masked out)
    :param batch_size: scalar
    :param M: optional [B, D] coordinate mask
    """
    inner = _inner(which, X, Y, Y_bj, weight, M)
    denom = jnp.maximum(n_obs_ot, 1.0)
    return jnp.sum(obs * inner / denom) / batch_size


def compute_loss(X_obs, Y_obs, Y_obs_bj, n_obs_ot, batch_size,
                 eps=EPS, weight=0.5, M_obs=None):
    """Event-format 'standard' loss, exactly ``models.py:71-106``.

    Operates on gathered observed rows ``[n_obs, D]`` — used by parity tests
    and by event-format tools; training uses :func:`step_loss`.
    """
    inner = _inner("standard", X_obs, Y_obs, Y_obs_bj, weight, M_obs)
    return jnp.sum(inner / n_obs_ot) / batch_size


def compute_loss_2(X_obs, Y_obs, Y_obs_bj, n_obs_ot, batch_size,
                   eps=EPS, weight=0.5, M_obs=None):
    """Event-format 'easy' loss, exactly ``models.py:109-126``."""
    inner = _inner("easy", X_obs, Y_obs, Y_obs_bj, weight, M_obs)
    return jnp.sum(inner / n_obs_ot) / batch_size


LOSS_FUN_DICT = {
    "standard": compute_loss,
    "easy": compute_loss_2,
}
