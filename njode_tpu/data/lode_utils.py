"""Latent-ODE library-surface utilities (dormant upstream, ported for parity).

Covers the remaining §2.15 surface of SURVEY.md beyond what
``data/physionet.py`` already uses in production:

- :func:`split_and_subsample_batch` family — the latent-ODE batch prep
  (``/root/reference/latent_ODE/utils_LODE.py:503-530`` and the helpers it
  calls: ``split_data_extrap`` ``:400-425``, ``split_data_interp``
  ``:430-450``, ``add_mask`` ``:455-463``, ``subsample_observed_data``
  ``:466-500``, ``subsample_timepoints`` ``:138-173``,
  ``cut_out_timepoints`` ``:177-196``),
- the likelihood / cross-entropy metric helpers
  (``/root/reference/latent_ODE/likelihood_eval_LODE.py:55-193``):
  :func:`gaussian_log_likelihood`, :func:`masked_gaussian_log_density`,
  :func:`poisson_log_likelihood`, :func:`compute_binary_CE_loss`,
  :func:`compute_multiclass_CE_loss`.

These are host-side numpy functions (they prepare / score host batches, not
device computations). Where the reference loops per (sample, trajectory,
dim) — ``compute_masked_likelihood``, ``likelihood_eval_LODE.py:171-193`` —
this port vectorizes over the whole array; results are numerically identical
(parity-tested in tests/test_lode_utils.py).

Provenance note: this module is a deliberate TRANSLATION of the reference's
dormant latent-ODE library surface — the dict-key protocol
(``observed_data``/``data_to_predict``/... ) IS the component, so the keys
and control flow match the reference by necessity while the code is
rewritten (vectorized likelihoods, injected ``rng``, numpy idioms). It is
the closest file in this repo to the reference and is intentionally kept
frozen at this surface: do NOT extend it with further translated code —
any future latent-ODE functionality should be redesigned TPU-first the way
``data/physionet.py`` was.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "split_and_subsample_batch",
    "split_data_extrap",
    "split_data_interp",
    "subsample_timepoints",
    "cut_out_timepoints",
    "gaussian_log_likelihood",
    "masked_gaussian_log_density",
    "poisson_log_likelihood",
    "compute_binary_CE_loss",
    "compute_multiclass_CE_loss",
]


def _asarray(x):
    return None if x is None else np.asarray(x)


# ---------------------------------------------------------------------------
# batch splitting (interp/extrap) + subsampling
# ---------------------------------------------------------------------------

def split_data_extrap(data_dict, dataset: str = ""):
    """First half of the timeline observed, second half to predict
    (``utils_LODE.py:400-425``; hopper uses a third)."""
    data = _asarray(data_dict["data"])
    ts = _asarray(data_dict["time_steps"])
    n_observed_tp = data.shape[1] // 2
    if dataset == "hopper":
        n_observed_tp = data.shape[1] // 3
    out = {
        "observed_data": data[:, :n_observed_tp, :].copy(),
        "observed_tp": ts[:n_observed_tp].copy(),
        "data_to_predict": data[:, n_observed_tp:, :].copy(),
        "tp_to_predict": ts[n_observed_tp:].copy(),
        "observed_mask": None,
        "mask_predicted_data": None,
        "labels": None,
    }
    mask = _asarray(data_dict.get("mask"))
    if mask is not None:
        out["observed_mask"] = mask[:, :n_observed_tp].copy()
        out["mask_predicted_data"] = mask[:, n_observed_tp:].copy()
    if data_dict.get("labels") is not None:
        out["labels"] = _asarray(data_dict["labels"]).copy()
    out["mode"] = "extrap"
    return out


def split_data_interp(data_dict):
    """Observed == to-predict == the full timeline (``utils_LODE.py:430-450``)."""
    data = _asarray(data_dict["data"])
    ts = _asarray(data_dict["time_steps"])
    out = {
        "observed_data": data.copy(),
        "observed_tp": ts.copy(),
        "data_to_predict": data.copy(),
        "tp_to_predict": ts.copy(),
        "observed_mask": None,
        "mask_predicted_data": None,
        "labels": None,
    }
    mask = _asarray(data_dict.get("mask"))
    if mask is not None:
        out["observed_mask"] = mask.copy()
        out["mask_predicted_data"] = mask.copy()
    if data_dict.get("labels") is not None:
        out["labels"] = _asarray(data_dict["labels"]).copy()
    out["mode"] = "interp"
    return out


def subsample_timepoints(data, time_steps, mask, n_tp_to_sample=None,
                         rng=None):
    """Zero out all but ``n_tp_to_sample`` time points per trajectory
    (``utils_LODE.py:138-173``). ``n_tp_to_sample > 1``: keep exactly that
    many grid points; ``0 < n <= 1``: keep that fraction of each
    trajectory's *non-empty* points. Data/mask are modified as copies."""
    if n_tp_to_sample is None:
        return data, time_steps, mask
    rng = rng or np.random
    data = np.array(data, copy=True)
    mask = None if mask is None else np.array(mask, copy=True)
    n_tp_in_batch = len(time_steps)
    if n_tp_to_sample > 1:
        assert n_tp_to_sample <= n_tp_in_batch
        n_tp_to_sample = int(n_tp_to_sample)
        for i in range(data.shape[0]):
            missing_idx = sorted(rng.choice(
                np.arange(n_tp_in_batch), n_tp_in_batch - n_tp_to_sample,
                replace=False))
            data[i, missing_idx] = 0.0
            if mask is not None:
                mask[i, missing_idx] = 0.0
    elif n_tp_to_sample > 0:
        frac = n_tp_to_sample
        for i in range(data.shape[0]):
            current_mask = mask[i].sum(-1)
            non_missing_tp = np.where(current_mask > 0)[0]
            n_to_sample = int(len(non_missing_tp) * frac)
            kept = sorted(rng.choice(non_missing_tp, n_to_sample,
                                     replace=False))
            drop = np.setdiff1d(non_missing_tp, kept)
            data[i, drop] = 0.0
            if mask is not None:
                mask[i, drop] = 0.0
    return data, time_steps, mask


def cut_out_timepoints(data, time_steps, mask, n_points_to_cut=None,
                       rng=None):
    """Zero out a random consecutive window of ``n_points_to_cut`` points per
    trajectory (``utils_LODE.py:177-196``); the window start is drawn from
    [5, T - n - 5) as in the reference."""
    if n_points_to_cut is None:
        return data, time_steps, mask
    rng = rng or np.random
    data = np.array(data, copy=True)
    mask = None if mask is None else np.array(mask, copy=True)
    n_tp_in_batch = len(time_steps)
    if n_points_to_cut < 1:
        raise ValueError("Number of time points to cut out must be > 1")
    assert n_points_to_cut <= n_tp_in_batch
    n_points_to_cut = int(n_points_to_cut)
    for i in range(data.shape[0]):
        start = rng.choice(np.arange(5, n_tp_in_batch - n_points_to_cut - 5))
        data[i, start:start + n_points_to_cut] = 0.0
        if mask is not None:
            mask[i, start:start + n_points_to_cut] = 0.0
    return data, time_steps, mask


def split_and_subsample_batch(data_dict, args, data_type: str = "train"):
    """The latent-ODE batch-prep entry point (``utils_LODE.py:503-530``):
    split interp/extrap per ``args.extrap``, materialize a ones mask when
    absent, then optionally subsample (``args.sample_tp``) or cut a window
    (``args.cut_tp``)."""
    if getattr(args, "extrap", False):
        processed = split_data_extrap(data_dict,
                                      dataset=getattr(args, "dataset", ""))
    else:
        processed = split_data_interp(data_dict)
    if processed["observed_mask"] is None:
        processed["observed_mask"] = np.ones_like(processed["observed_data"])
    sample_tp = getattr(args, "sample_tp", None)
    cut_tp = getattr(args, "cut_tp", None)
    if sample_tp is not None or cut_tp is not None:
        if sample_tp is not None:
            data, ts, mask = subsample_timepoints(
                processed["observed_data"], processed["observed_tp"],
                processed["observed_mask"], n_tp_to_sample=sample_tp)
        if cut_tp is not None:
            data, ts, mask = cut_out_timepoints(
                processed["observed_data"], processed["observed_tp"],
                processed["observed_mask"], n_points_to_cut=cut_tp)
        processed = dict(processed)
        processed["observed_data"] = data
        processed["observed_tp"] = ts
        processed["observed_mask"] = mask
        if cut_tp is not None:
            # the cut is applied to the prediction targets as well
            # (utils_LODE.py:494-498)
            processed["data_to_predict"] = data.copy()
            processed["tp_to_predict"] = ts
            processed["mask_predicted_data"] = mask.copy()
    return processed


# ---------------------------------------------------------------------------
# likelihood / CE metric helpers
# ---------------------------------------------------------------------------

_LOG_2PI = math.log(2.0 * math.pi)


def _normal_logpdf(x, mu, std):
    return -0.5 * ((x - mu) / std) ** 2 - np.log(std) - 0.5 * _LOG_2PI


def gaussian_log_likelihood(mu_2d, data_2d, obsrv_std):
    """Mean Gaussian log-density over the last axis
    (``likelihood_eval_LODE.py:55-64``: an ``Independent(Normal, 1)``
    log-prob divided by the point count); 0 for empty inputs."""
    mu_2d = np.asarray(mu_2d)
    data_2d = np.asarray(data_2d)
    n = mu_2d.shape[-1]
    if n == 0:
        return np.zeros(())
    lp = _normal_logpdf(data_2d, mu_2d, float(obsrv_std)).sum(-1)
    return lp / n


def masked_gaussian_log_density(mu, data, obsrv_std, mask=None):
    """Per-(trajectory, sample) masked Gaussian log-density
    (``likelihood_eval_LODE.py:196-225``). With a mask this is the
    reference's ``compute_masked_likelihood`` (``:171-193``): the mean
    log-density over each (sample, traj, dim)'s observed time points,
    averaged over dims — vectorized here instead of the reference's triple
    Python loop. Returns ``[n_traj, n_traj_samples]``."""
    mu = np.asarray(mu)
    data = np.asarray(data)
    std = float(obsrv_std)
    if mu.ndim == 3:
        mu = mu[None]
    if data.ndim == 2:
        data = data[None, :, None, :]
    elif data.ndim == 3:
        data = data[None]
    S, B, T, D = mu.shape
    if mask is None:
        lp = _normal_logpdf(data, mu, std).reshape(S, B, -1)
        res = lp.sum(-1) / (T * D)
        return res.T
    mask = np.asarray(mask)
    lp = (_normal_logpdf(data, mu, std) * mask).sum(axis=2)   # [S,B,D]
    cnt = mask.sum(axis=2)                                    # [S,B,D]
    per_dim = np.where(cnt > 0, lp / np.maximum(cnt, 1.0), 0.0)
    res = per_dim.mean(-1)                                    # [S,B]
    return res.T


def poisson_log_likelihood(masked_log_lambdas, masked_data, indices,
                           int_lambdas):
    """``sum(log λ) − Λ[idx]`` (``likelihood_eval_LODE.py:67-77``); 0 for
    empty inputs."""
    masked_data = np.asarray(masked_data)
    if masked_data.shape[-1] == 0:
        return np.zeros(())
    return np.sum(masked_log_lambdas) - np.asarray(int_lambdas)[indices]


def _bce_with_logits(x, y):
    # numerically stable BCEWithLogits: max(x,0) - x*y + log1p(exp(-|x|))
    return np.maximum(x, 0.0) - x * y + np.log1p(np.exp(-np.abs(x)))


def compute_binary_CE_loss(label_predictions, mortality_label):
    """Binary mortality CE over non-NaN labels, replicated across the z0
    samples axis and divided by it (``likelihood_eval_LODE.py:80-112``)."""
    label_predictions = np.asarray(label_predictions)
    mortality_label = np.asarray(mortality_label).reshape(-1)
    if label_predictions.ndim == 1:
        label_predictions = label_predictions[None]
    n_traj_samples = label_predictions.shape[0]
    label_predictions = label_predictions.reshape(n_traj_samples, -1)
    ok = ~np.isnan(mortality_label)
    label_predictions = label_predictions[:, ok]
    mortality_label = mortality_label[ok]
    labels = np.broadcast_to(mortality_label,
                             label_predictions.shape)
    ce = _bce_with_logits(label_predictions, labels).mean()
    return ce / n_traj_samples


def _log_softmax(x):
    m = x.max(-1, keepdims=True)
    z = x - m
    return z - np.log(np.exp(z).sum(-1, keepdims=True))


def compute_multiclass_CE_loss(label_predictions, true_label, mask):
    """Per-time-point multiclass CE at time points with >=1 measurement,
    averaged (``likelihood_eval_LODE.py:114-166``). The reference loops a
    ``CrossEntropyLoss`` per flattened row; since each row holds exactly one
    prediction the loop collapses to a masked mean of
    ``-log_softmax(pred)[label]``."""
    label_predictions = np.asarray(label_predictions)
    true_label = np.asarray(true_label)
    mask = np.asarray(mask)
    if label_predictions.ndim == 3:
        label_predictions = label_predictions[None]
    S, B, T, C = label_predictions.shape
    labels = np.broadcast_to(true_label, (S,) + true_label.shape)
    if C > 1 and true_label.shape[-1] > 1:
        labels = labels.argmax(-1)                       # [S,B,T]
    tp_mask = np.broadcast_to(mask.sum(-1) > 0, (S, B, T))
    lsm = _log_softmax(label_predictions)                # [S,B,T,C]
    ce = -np.take_along_axis(lsm, labels[..., None],
                             axis=-1)[..., 0]            # [S,B,T]
    sel = ce[tp_mask]
    return sel.mean() if sel.size else np.zeros(())
