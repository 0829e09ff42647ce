"""Torch-checkpoint import tests: load the reference's shipped pretrained
models and check forward parity between the imported weights (our scan) and
the reference model restored from the same checkpoint."""

import os

import numpy as np
import pytest

from conftest import add_reference_to_path, reference_available

import jax
import jax.numpy as jnp

from njode_tpu.data import grid
from njode_tpu.models import njode
from njode_tpu.training import torch_compat

REF_CKPT = ("/root/reference/data/saved_models/id-1/last_checkpoint")

if not reference_available() or not os.path.exists(REF_CKPT):
    pytest.skip("reference pretrained checkpoints not available",
                allow_module_level=True)

add_reference_to_path()
torch = pytest.importorskip("torch")
from NJODE import models as ref_models  # noqa: E402

CFG = njode.NJODEConfig(
    input_size=1, hidden_size=10, output_size=1,
    ode_nn=((50, "tanh"), (50, "tanh")),
    readout_nn=((50, "tanh"), (50, "tanh")),
    enc_nn=((50, "tanh"), (50, "tanh")))


def test_load_torch_checkpoint_metadata():
    ck = torch_compat.load_torch_checkpoint(REF_CKPT)
    assert ck["epoch"] == 200
    assert ck["weight"] == 0.5
    assert "ode_f.f.0.weight" in ck["state"]


def test_pretrained_forward_parity():
    """Imported pretrained weights reproduce the reference model's loss and
    prediction path on identical inputs."""
    ck = torch_compat.load_torch_checkpoint(REF_CKPT)
    params = jax.tree.map(
        jnp.asarray, torch_compat.njode_params_from_torch_state(ck["state"]))

    ref = ref_models.NJODE(
        input_size=1, hidden_size=10, output_size=1,
        ode_nn=CFG.ode_nn, readout_nn=CFG.readout_nn, enc_nn=CFG.enc_nn,
        use_rnn=False, bias=True, dropout_rate=0.0, solver="euler",
        weight=0.5, weight_decay=1.0,
        options={"which_loss": "standard", "residual_enc_dec": True})
    sd = {k: torch.tensor(v) for k, v in ck["state"].items()}
    ref.load_state_dict(sd)
    ref.eval()

    rs = np.random.RandomState(5)
    B, K = 8, 20
    dt = 1.0 / K
    paths = np.exp(rs.normal(0.0, 0.2, (B, 1, K + 1)).cumsum(-1))
    observed = (rs.random((B, K + 1)) < 0.3).astype(np.int64)
    observed[0, K] = 1
    for i in range(B):
        if observed[i, 1:].sum() == 0:
            observed[i, 3] = 1
    ev = grid.events_from_paths(paths, observed, dt)
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, observed, dt))
    bj = jax.tree.map(jnp.asarray, b)

    hT, loss = njode.forward(params, CFG, bj, weight=0.5, train=False)
    with torch.no_grad():
        h_ref, loss_ref = ref.forward(
            ev["times"], ev["time_ptr"], torch.tensor(ev["X"]),
            torch.tensor(ev["obs_idx"]), dt, 1.0,
            torch.tensor(ev["start_X"]),
            torch.tensor(b.n_obs_ot.astype(np.float64)),
            return_path=False, get_loss=True)
    assert np.allclose(float(loss), float(loss_ref), rtol=2e-5, atol=1e-6)
    assert np.allclose(np.asarray(hT), h_ref.numpy(), rtol=1e-4, atol=1e-5)


def test_import_roundtrip(tmp_path):
    from njode_tpu.training import checkpoints
    from njode_tpu.training.steps import make_optimizer
    optimizer = make_optimizer(0.001)
    out = str(tmp_path / "imported")
    params, epoch, weight = torch_compat.import_torch_checkpoint(
        REF_CKPT, out, optimizer)
    assert epoch == 200 and weight == 0.5
    p2 = njode.init_params(jax.random.PRNGKey(0), CFG)
    o2 = optimizer.init(p2)
    p_loaded, _, ep, w = checkpoints.load_checkpoint(out, p2, o2)
    chk = jax.tree.map(lambda a, b: np.allclose(a, b), params, p_loaded)
    assert all(jax.tree.leaves(chk))


def test_export_roundtrip_via_reference_model(tmp_path):
    """Export our params to a reference checkpt.tar, restore it with the
    reference's own get_ckpt_model, and check forward parity."""
    params = njode.init_params(jax.random.PRNGKey(3), CFG)
    out_dir = str(tmp_path / "export")
    torch_compat.export_torch_checkpoint(params, out_dir, epoch=42,
                                         weight=0.6)

    ref = ref_models.NJODE(
        input_size=1, hidden_size=10, output_size=1,
        ode_nn=CFG.ode_nn, readout_nn=CFG.readout_nn, enc_nn=CFG.enc_nn,
        use_rnn=False, bias=True, dropout_rate=0.0, solver="euler",
        weight=0.5, weight_decay=1.0,
        options={"which_loss": "standard", "residual_enc_dec": True})
    opt = torch.optim.Adam(ref.parameters(), lr=1e-3)
    from NJODE.models import get_ckpt_model
    get_ckpt_model(out_dir + "/", ref, opt, torch.device("cpu"))
    assert ref.epoch == 42 and ref.weight == 0.6
    ref.eval()

    rs = np.random.RandomState(11)
    B, K = 6, 15
    dt = 1.0 / K
    paths = np.exp(rs.normal(0.0, 0.2, (B, 1, K + 1)).cumsum(-1))
    observed = (rs.random((B, K + 1)) < 0.4).astype(np.int64)
    observed[0, K] = 1
    for i in range(B):
        if observed[i, 1:].sum() == 0:
            observed[i, 3] = 1
    ev = grid.events_from_paths(paths, observed, dt)
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, observed, dt))
    bj = jax.tree.map(jnp.asarray, b)
    # get_ckpt_model restores the loss-weight (0.6) into the model
    _, loss = njode.forward(params, CFG, bj, weight=0.6, train=False)
    with torch.no_grad():
        _, loss_ref = ref.forward(
            ev["times"], ev["time_ptr"], torch.tensor(ev["X"]),
            torch.tensor(ev["obs_idx"]), dt, 1.0,
            torch.tensor(ev["start_X"]),
            torch.tensor(b.n_obs_ot.astype(np.float64)),
            return_path=False, get_loss=True)
    assert np.allclose(float(loss), float(loss_ref), rtol=2e-5, atol=1e-6)


def test_dataset_files_readable_by_reference(tmp_path):
    """Datasets we persist load through the reference's own data_utils."""
    import sys
    sys.path.insert(0, "/root/reference/NJODE")
    import data_utils as ref_du
    from njode_tpu.data import datasets as du

    base = str(tmp_path / "td")
    hp = dict(du.hyperparam_default)
    hp.update(nb_paths=12, nb_steps=8)
    path, time_id = du.create_dataset("BlackScholes", hp, seed=1,
                                      base_path=base)
    # reference loader is hardwired to its training_data path; point it at
    # ours for the test
    old = ref_du.training_data_path
    ref_du.training_data_path = base + "/"
    try:
        sp, od, nb, meta = ref_du.load_dataset("BlackScholes",
                                               time_id=time_id)
    finally:
        ref_du.training_data_path = old
    assert sp.shape == (12, 1, 9)
    assert od.shape == (12, 9)
    assert np.all(nb == od[:, 1:].sum(axis=1))
    assert meta["model_name"] == "BlackScholes"
