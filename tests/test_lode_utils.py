"""Latent-ODE dormant-surface parity: split/subsample batch prep and the
likelihood/CE metric helpers vs the reference torch implementations."""

import numpy as np
import pytest

from conftest import add_reference_to_path, reference_available

from njode_tpu.data import lode_utils as lu

if reference_available():
    add_reference_to_path()
    torch = pytest.importorskip("torch")
    from latent_ODE import likelihood_eval_LODE as ref_lik
    from latent_ODE import utils_LODE as ref_utils
else:  # pragma: no cover
    pytest.skip("no reference", allow_module_level=True)


def _batch(B=5, T=12, D=3, seed=0, with_mask=True):
    rs = np.random.RandomState(seed)
    d = {"data": rs.normal(0, 1, (B, T, D)).astype(np.float32),
         "time_steps": np.linspace(0.0, 1.0, T).astype(np.float32),
         "mask": ((rs.random((B, T, D)) < 0.5).astype(np.float32)
                  if with_mask else None),
         "labels": rs.randint(0, 2, (B,)).astype(np.float32)}
    return d


def _tb(d):
    return {k: (torch.tensor(v) if isinstance(v, np.ndarray) else v)
            for k, v in d.items()}


@pytest.mark.parametrize("extrap", [False, True])
@pytest.mark.parametrize("with_mask", [True, False])
def test_split_and_subsample_parity(extrap, with_mask):
    d = _batch(with_mask=with_mask)

    class Args:
        pass

    args = Args()
    args.extrap = extrap
    args.dataset = "physionet"
    args.sample_tp = None
    args.cut_tp = None

    ours = lu.split_and_subsample_batch(dict(d), args)
    ref = ref_utils.split_and_subsample_batch(_tb(d), args)
    for k in ("observed_data", "observed_tp", "data_to_predict",
              "tp_to_predict", "observed_mask"):
        assert np.allclose(np.asarray(ours[k]), ref[k].numpy()), k
    if with_mask:
        assert np.allclose(ours["mask_predicted_data"],
                           ref["mask_predicted_data"].numpy())
    assert ours["mode"] == ref["mode"]


def test_subsample_timepoints_semantics():
    d = _batch(seed=3)
    rng = np.random.RandomState(7)
    data, ts, mask = lu.subsample_timepoints(
        d["data"], d["time_steps"], d["mask"], n_tp_to_sample=5, rng=rng)
    # exactly 5 potentially-nonzero tps per trajectory remain
    for i in range(data.shape[0]):
        alive = (np.abs(data[i]).sum(-1) > 0) | (mask[i].sum(-1) > 0)
        assert alive.sum() <= 5
    # fraction mode keeps ~half of the non-empty points
    data2, _, mask2 = lu.subsample_timepoints(
        d["data"], d["time_steps"], d["mask"], n_tp_to_sample=0.5, rng=rng)
    assert mask2.sum() < d["mask"].sum()


def test_cut_out_timepoints_semantics():
    d = _batch(T=30, seed=4)
    rng = np.random.RandomState(1)
    data, ts, mask = lu.cut_out_timepoints(
        d["data"], d["time_steps"], d["mask"], n_points_to_cut=6, rng=rng)
    for i in range(data.shape[0]):
        dead = np.where((mask[i].sum(-1) == 0)
                        & (d["mask"][i].sum(-1) > 0))[0]
        if len(dead):
            assert dead.max() - dead.min() < 6


def test_masked_gaussian_log_density_parity():
    rs = np.random.RandomState(5)
    S, B, T, D = 2, 4, 8, 3
    mu = rs.normal(0, 1, (S, B, T, D)).astype(np.float32)
    data = rs.normal(0, 1, (S, B, T, D)).astype(np.float32)
    mask = (rs.random((S, B, T, D)) < 0.6).astype(np.float32)
    ref = ref_lik.masked_gaussian_log_density(
        torch.tensor(mu), torch.tensor(data),
        obsrv_std=torch.tensor([0.3]), mask=torch.tensor(mask))
    ours = lu.masked_gaussian_log_density(mu, data, 0.3, mask)
    assert ours.shape == tuple(ref.shape)
    assert np.allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-6)


def test_gaussian_log_likelihood_parity():
    rs = np.random.RandomState(6)
    mu = rs.normal(0, 1, 17).astype(np.float32)
    x = rs.normal(0, 1, 17).astype(np.float32)
    ref = ref_lik.gaussian_log_likelihood(
        torch.tensor(mu), torch.tensor(x), torch.tensor([0.5]))
    assert np.allclose(lu.gaussian_log_likelihood(mu, x, 0.5),
                       float(ref), rtol=1e-6)


def test_binary_ce_parity():
    rs = np.random.RandomState(7)
    logits = rs.normal(0, 2, (2, 6)).astype(np.float32)
    labels = rs.randint(0, 2, 6).astype(np.float32)
    labels[2] = np.nan
    ref = ref_lik.compute_binary_CE_loss(torch.tensor(logits),
                                         torch.tensor(labels))
    ours = lu.compute_binary_CE_loss(logits, labels)
    assert np.allclose(ours, float(ref), rtol=1e-5)


def test_multiclass_ce_parity():
    rs = np.random.RandomState(8)
    S, B, T, C = 1, 3, 5, 4
    logits = rs.normal(0, 1, (S, B, T, C)).astype(np.float32)
    onehot = np.eye(C, dtype=np.float32)[rs.randint(0, C, (B, T))]
    mask = (rs.random((B, T, 2)) < 0.7).astype(np.float32)
    ref = ref_lik.compute_multiclass_CE_loss(
        torch.tensor(logits), torch.tensor(onehot), torch.tensor(mask))
    ours = lu.compute_multiclass_CE_loss(logits, onehot, mask)
    assert np.allclose(ours, float(ref), rtol=1e-5)


def test_poisson_log_likelihood():
    ll = lu.poisson_log_likelihood(np.array([0.1, 0.2]), np.array([1., 2.]),
                                   1, np.array([5.0, 7.0]))
    assert np.allclose(ll, 0.3 - 7.0)
    assert lu.poisson_log_likelihood(np.zeros(0), np.zeros(0), 0,
                                     np.array([5.0])) == 0.0
