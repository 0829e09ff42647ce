"""PhysioNet pipeline tests: record parsing, collate parity vs the reference
latent-ODE collate, metric parity, and end-to-end training."""

import os
from types import SimpleNamespace

import numpy as np
import pytest

from conftest import add_reference_to_path, reference_available

from njode_tpu.data import physionet as pdu


def _stub_torchvision():
    """The reference imports torchvision (absent here) only for its
    download_url helper, which these tests never exercise."""
    import sys
    import types
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    ds = types.ModuleType("torchvision.datasets")
    ut = types.ModuleType("torchvision.datasets.utils")
    ut.download_url = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("no network"))
    tv.datasets = ds
    ds.utils = ut
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.datasets"] = ds
    sys.modules["torchvision.datasets.utils"] = ut

RAW_RECORD = """Time,Parameter,Value
00:00,RecordID,132539
00:07,HR,73
00:07,Temp,35.1
00:37,HR,77
00:37,HR,79
01:08,Urine,250
"""


def test_parse_record_lines_quantization_and_averaging():
    rid, tt, vals, mask = pdu.parse_record_lines(
        "132539", RAW_RECORD.strip().split("\n"), quantization=0.5,
        reduce="average")
    # 00:07 -> 0.0 bin, 00:37 -> 0.5, 01:08 -> 1.0
    assert np.allclose(tt, [0.0, 0.5, 1.0])
    hr = pdu.PARAMS_DICT["HR"]
    # two HR readings in the 0.5 bin are averaged
    assert np.isclose(vals[1, hr], (77 + 79) / 2)
    assert mask[1, hr] == 1
    assert np.isclose(vals[0, hr], 73)
    t_i = pdu.PARAMS_DICT["Temp"]
    assert np.isclose(vals[0, t_i], 35.1)
    assert mask[2, pdu.PARAMS_DICT["Urine"]] == 1


def test_data_min_max_and_normalize():
    records = pdu.make_synthetic_records(8, n_vars=5, obs_perc=0.3, seed=1)
    dmin, dmax = pdu.get_data_min_max(records)
    # observed feature mins/maxs bracket all observed values
    for _, _, vals, mask, _ in records:
        obs = mask > 0
        for j in range(5):
            v = vals[:, j][obs[:, j]]
            if len(v):
                assert v.min() >= dmin[j] - 1e-6
                assert v.max() <= dmax[j] + 1e-6
    data = records[0][2][None]
    m = records[0][3][None]
    norm = pdu.normalize_masked_data(data, m, dmin, dmax)
    assert (norm[m[..., :] == 0] == 0).all()


@pytest.mark.skipif(not reference_available(), reason="no reference")
@pytest.mark.parametrize("data_type,eval_input_prob",
                         [("train", None), ("test", None), ("test", 0.5)])
def test_collate_parity_with_reference(data_type, eval_input_prob):
    add_reference_to_path()
    torch = pytest.importorskip("torch")
    _stub_torchvision()
    from latent_ODE import physionet_LODE as ref_pn

    records = pdu.make_synthetic_records(6, n_vars=4, max_hours=10.0,
                                         quantization=0.5, obs_perc=0.25,
                                         seed=7)
    dmin, dmax = pdu.get_data_min_max(records)
    args = SimpleNamespace(eval_input_prob=eval_input_prob,
                           eval_input_seed=123, classif=False)

    ref_records = [
        (rid, torch.tensor(tt, dtype=torch.float32),
         torch.tensor(vals), torch.tensor(mask), None)
        for rid, tt, vals, mask, _ in records]
    ref = ref_pn.variable_time_collate_fn1(
        ref_records, args, data_type=data_type,
        data_min=torch.tensor(dmin), data_max=torch.tensor(dmax))

    ours = pdu.collate_records(records, dmin, dmax, data_type=data_type,
                               eval_input_prob=eval_input_prob,
                               eval_input_seed=123)

    ref_times = np.asarray(ref["times"], np.float64)
    ref_ptr = np.asarray(ref["time_ptr"])
    if eval_input_prob:
        # conscious fix vs the reference: it appends a time_ptr entry for
        # every held-out time even when nothing was selected, violating its
        # own `len(times)+1 == len(time_ptr)` invariant (models.py:428);
        # normalize by dropping empty entries in the INJECTED tail only
        # (base times keep their boundaries even when they carry no events)
        base = pdu.collate_records(records, dmin, dmax, data_type="test",
                                   eval_input_prob=None)
        n_base = len(base["times"])
        keep = np.ones(len(ref_ptr), bool)
        keep[n_base + 1:] = np.diff(ref_ptr)[n_base:] > 0
        ref_ptr = ref_ptr[keep]
    assert np.allclose(ours["times"], ref_times, atol=1e-6)
    assert np.array_equal(ours["time_ptr"], ref_ptr)
    assert np.array_equal(ours["obs_idx"], ref["obs_idx"].numpy())
    assert np.allclose(ours["X"], ref["X"].numpy(), atol=1e-6)
    assert np.allclose(ours["M"], ref["M"].numpy())
    if data_type == "test":
        assert np.allclose(ours["times_val"], ref["times_val"], atol=1e-6)
        assert np.allclose(ours["vals_val"], ref["vals_val"], atol=1e-6)
        assert np.allclose(ours["mask_val"], ref["mask_val"])


@pytest.mark.skipif(not reference_available(), reason="no reference")
def test_masked_likelihood_mse_parity():
    add_reference_to_path()
    torch = pytest.importorskip("torch")
    _stub_torchvision()
    from latent_ODE import likelihood_eval_LODE as ref_le

    rs = np.random.RandomState(3)
    B, T, D = 4, 7, 3
    mu = rs.normal(size=(B, T, D)).astype(np.float32)
    data = rs.normal(size=(B, T, D)).astype(np.float32)
    mask = (rs.random((B, T, D)) < 0.4).astype(np.float32)
    ref = float(torch.mean(ref_le.compute_masked_likelihood(
        torch.tensor(mu).unsqueeze(0), torch.tensor(data).unsqueeze(0),
        torch.tensor(mask).unsqueeze(0), ref_le.mse)))
    ours = pdu.compute_masked_likelihood_mse(mu, data, mask)
    assert np.allclose(ours, ref, rtol=1e-5)


def test_parse_datasets_split():
    records = pdu.make_synthetic_records(20, n_vars=4, seed=2)
    data = pdu.parse_datasets("/nonexistent", records=records)
    assert len(data["train_records"]) == 16
    assert len(data["test_records"]) == 4
    assert data["input_dim"] == 4


def test_download_gating(tmp_path):
    with pytest.raises(RuntimeError, match="download"):
        pdu.PhysioNetData(str(tmp_path), train=True, download=False)


def test_physionet_train_end_to_end(tmp_path):
    from njode_tpu.training import physionet_trainer
    records = pdu.make_synthetic_records(24, n_vars=4, max_hours=48.0,
                                         quantization=2.0, obs_perc=0.2,
                                         seed=11)
    smp = str(tmp_path / "saved_models_physionet")
    ret = physionet_trainer.train(
        model_id=None, epochs=2, batch_size=8, save_every=1,
        learning_rate=0.01, hidden_size=8, dropout_rate=0.1,
        ode_nn=((12, "tanh"),), readout_nn=((12, "tanh"),),
        enc_nn=((12, "tanh"),),
        quantization=2.0, n_samples=24,
        saved_models_path=smp, records=records)
    assert ret == 0
    import pandas as pd
    dfm = pd.read_csv(os.path.join(smp, "id-1", "metric_id-1.csv"),
                      index_col=0)
    assert list(dfm.columns) == physionet_trainer.METR_COLUMNS
    assert len(dfm) == 2
    for c in ("train_loss", "eval_loss", "eval_metric", "eval_metric_2"):
        assert np.all(np.isfinite(dfm[c].values)), c
    assert os.path.exists(os.path.join(smp, "id-1", "best_checkpoint",
                                       "checkpt.msgpack"))


def test_physionet_train_eval_input_prob(tmp_path):
    from njode_tpu.training import physionet_trainer
    records = pdu.make_synthetic_records(16, n_vars=4, max_hours=48.0,
                                         quantization=2.0, obs_perc=0.2,
                                         seed=13)
    smp = str(tmp_path / "saved_models_physionet_eip")
    ret = physionet_trainer.train(
        model_id=None, epochs=1, batch_size=8, save_every=1,
        learning_rate=0.01, hidden_size=8, dropout_rate=0.0,
        ode_nn=((12, "tanh"),), readout_nn=((12, "tanh"),),
        enc_nn=((12, "tanh"),),
        quantization=2.0, n_samples=16, eval_input_prob=0.5,
        saved_models_path=smp, records=records)
    assert ret == 0


def test_prestack_matches_legacy_collate(tmp_path):
    """The round-3 pre-stacked device-batching path must reproduce the
    per-epoch host-collation path: same grids (aligned times), same batch
    rng/scale streams => same metric CSV (dropout 0 for exactness: the
    canonical grid's always-present leading t=0 step shifts the fused
    dropout-mask slots for batches without a t=0 observation)."""
    from njode_tpu.training import physionet_trainer
    records = pdu.make_synthetic_records(24, n_vars=4, max_hours=48.0,
                                         quantization=2.0, obs_perc=0.25,
                                         seed=17)

    def run(tag, prestack):
        smp = str(tmp_path / tag)
        ret = physionet_trainer.train(
            model_id=None, epochs=2, batch_size=10, save_every=1,
            learning_rate=0.01, hidden_size=8, dropout_rate=0.0,
            ode_nn=((12, "tanh"),), readout_nn=((12, "tanh"),),
            enc_nn=((12, "tanh"),),
            quantization=2.0, n_samples=24,
            saved_models_path=smp, records=records, prestack=prestack)
        assert ret == 0
        import pandas as pd
        return pd.read_csv(os.path.join(smp, "id-1", "metric_id-1.csv"),
                           index_col=0)

    d_pre = run("pre", True)
    d_leg = run("leg", False)
    for col in ("train_loss", "eval_loss", "eval_metric", "eval_metric_2"):
        np.testing.assert_allclose(d_pre[col].values, d_leg[col].values,
                                   rtol=1e-5, atol=1e-7, err_msg=col)


def test_prestack_alignment_gate():
    """Off-grid record times must disable the prestack (returns None)."""
    records = pdu.make_synthetic_records(6, n_vars=3, max_hours=48.0,
                                         quantization=2.0, obs_perc=0.3,
                                         seed=5)
    dmin, dmax = pdu.get_data_min_max(records)
    T, dt = 1 + 1e-12, 2.0 / 48.0
    from njode_tpu.data.grid import build_union_grid  # noqa: F401
    pre = pdu.prestack_train_records(records, dmin, dmax, dt, T, 60)
    assert pre is not None
    assert pre["k"].max() <= pre["times"].shape[0]
    # shift one record's times off the quantization grid
    r0 = records[0]
    records[0] = (r0[0], r0[1] + 0.3) + tuple(r0[2:])
    assert pdu.prestack_train_records(records, dmin, dmax, dt, T, 60) is None


def test_prestacked_mesh_kernel_equivalence():
    """Prestacked device batching x data-parallel mesh x fused kernel
    (interpret): a full train step on 8 virtual devices must equal the
    single-device step — the production PhysioNet multi-chip path."""
    import jax
    import jax.flatten_util
    import jax.numpy as jnp
    from njode_tpu.models import njode
    from njode_tpu.parallel import sharding
    from njode_tpu.training.steps import (make_optimizer,
                                          make_prestacked_step_fns)

    records = pdu.make_synthetic_records(16, n_vars=3, max_hours=48.0,
                                         quantization=2.0, obs_perc=0.3,
                                         seed=3)
    dmin, dmax = pdu.get_data_min_max(records)
    T, dt = 1 + 1e-12, 2.0 / 48.0
    ms = pdu.max_union_grid_steps(records, dt, T)
    pre = pdu.prestack_train_records(records, dmin, dmax, dt, T, ms)
    assert pre is not None
    cfg = njode.NJODEConfig(3, 9, 3, ((12, "tanh"),), ((12, "tanh"),),
                            ((12, "tanh"),), dropout_rate=0.1, masked=True)
    params = njode.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-3)
    idx = jnp.arange(16, dtype=jnp.int32)
    args = (jnp.asarray(pre["k"]), jnp.asarray(pre["X"]),
            jnp.asarray(pre["M"]), idx, jnp.float32(0.5),
            jax.random.PRNGKey(5), jnp.float32(1.0))

    def run(mesh, use_pallas):
        fns = make_prestacked_step_fns(
            cfg, opt, pre["times"], pre["dt"], mesh=mesh,
            use_pallas=use_pallas, pallas_mask_mode="input",
            pallas_interpret=True)
        p, _, loss = fns["train_step"](jax.tree.map(jnp.array, params),
                                       opt.init(params), *args)
        return float(loss), jax.flatten_util.ravel_pytree(p)[0]

    l_solo, p_solo = run(None, True)
    l_mesh, p_mesh = run(sharding.make_mesh(8), True)
    l_xla, p_xla = run(sharding.make_mesh(8), False)
    assert np.allclose(l_mesh, l_solo, rtol=1e-6, atol=1e-7)
    assert np.allclose(np.asarray(p_mesh), np.asarray(p_solo),
                       rtol=1e-4, atol=1e-6)
    assert np.allclose(np.asarray(p_mesh), np.asarray(p_xla),
                       rtol=1e-3, atol=1e-5)


def test_physionet_repeat_seed_distinct(tmp_path):
    """'repeat_seed' varies the PhysioNet trainer's init/shuffle/dropout
    streams; the rs=42 record split is untouched. repeat_seed=0 equals the
    default stream exactly."""
    from njode_tpu.training import physionet_trainer
    import pandas as pd
    records = pdu.make_synthetic_records(24, n_vars=4, max_hours=48.0,
                                         quantization=2.0, obs_perc=0.2,
                                         seed=11)

    def run(tag, **kw):
        smp = str(tmp_path / tag)
        ret = physionet_trainer.train(
            model_id=None, epochs=2, batch_size=8, save_every=1,
            learning_rate=0.01, hidden_size=8, dropout_rate=0.1,
            ode_nn=((12, "tanh"),), readout_nn=((12, "tanh"),),
            enc_nn=((12, "tanh"),),
            quantization=2.0, n_samples=24,
            saved_models_path=smp, records=records, **kw)
        assert ret == 0
        return pd.read_csv(os.path.join(smp, "id-1", "metric_id-1.csv"),
                           index_col=0)

    d_abs = run("rs_absent")
    d_0 = run("rs0", repeat_seed=0)
    d_1 = run("rs1", repeat_seed=1)
    for c in ("train_loss", "eval_loss", "eval_metric"):
        np.testing.assert_array_equal(d_abs[c].values, d_0[c].values, c)
    assert not np.array_equal(d_abs["train_loss"].values,
                              d_1["train_loss"].values)
    assert np.all(np.isfinite(d_1["eval_metric"].values))


def test_physionet_group_planner():
    """Repeat entries group; anything off the grouped surface stays
    sequential (never silently dropped)."""
    from njode_tpu.training import physionet_group
    base = dict(dataset="physionet", epochs=2, batch_size=8,
                quantization=2.0, n_samples=24, hidden_size=8,
                ode_nn=((12, "tanh"),), readout_nn=((12, "tanh"),),
                enc_nn=((12, "tanh"),))
    # the registry round trip inside parallel_training adds these keys to
    # every entry — they must not break grouping
    ps = [dict(base, repeat_seed=r, model_id=r + 1, parallel=True,
               resume_training=False) for r in range(3)]
    ps += [dict(base, prestack=False),              # legacy collate path
           dict(base, ema_decay=0.99),              # unknown option
           dict(base, epochs=5),                    # different constant
           dict(base, dataset="climate")]           # wrong dataset
    groups, singles = physionet_group.plan_groups(ps)
    assert groups == [[0, 1, 2]]
    assert singles == [3, 4, 5, 6]
    # two entries differing only in epochs do not merge
    g2, s2 = physionet_group.plan_groups([dict(base), dict(base, epochs=5)])
    assert g2 == [] and s2 == [0, 1]


def test_physionet_group_matches_sequential(tmp_path, capsys):
    """Grouped PhysioNet repeats (one vmapped ensemble over the shared
    prestacked bank) must reproduce the solo trainer member-for-member:
    same metric CSVs (columns + values), same checkpoint artifacts. The
    grouped run must ACTUALLY group (the registry JSON round trip inside
    parallel_training adds keys like 'resume_training' — a group_key that
    rejects them silently degrades to solo-vs-solo)."""
    import pandas as pd
    from njode_tpu.training import physionet_trainer, sweeps

    records = pdu.make_synthetic_records(24, n_vars=4, max_hours=48.0,
                                         quantization=2.0, obs_perc=0.25,
                                         seed=23)

    def mk(smp):
        return [dict(dataset="physionet", epochs=2, batch_size=10,
                     save_every=1, learning_rate=0.01, hidden_size=8,
                     dropout_rate=0.1, ode_nn=((12, "tanh"),),
                     readout_nn=((12, "tanh"),), enc_nn=((12, "tanh"),),
                     quantization=2.0, n_samples=24, records=records,
                     repeat_seed=r, saved_models_path=str(tmp_path / smp))
                for r in range(3)]

    assert sweeps.parallel_training(params=mk("grouped"),
                                    vmap_groups=True) == [0, 0, 0]
    assert "physionet vmap group: 3 members" in capsys.readouterr().out
    assert sweeps.parallel_training(params=mk("solo")) == [0, 0, 0]
    for mid in (1, 2, 3):
        dg = pd.read_csv(os.path.join(str(tmp_path / "grouped"),
                                      f"id-{mid}", f"metric_id-{mid}.csv"),
                         index_col=0)
        ds = pd.read_csv(os.path.join(str(tmp_path / "solo"),
                                      f"id-{mid}", f"metric_id-{mid}.csv"),
                         index_col=0)
        assert list(dg.columns) == physionet_trainer.METR_COLUMNS
        assert dg["epoch"].tolist() == ds["epoch"].tolist() == [1, 2]
        for col in ("train_loss", "eval_loss", "eval_metric",
                    "eval_metric_2"):
            np.testing.assert_allclose(dg[col].values, ds[col].values,
                                       rtol=2e-4, atol=1e-7,
                                       err_msg=(mid, col))
        for slot in ("last_checkpoint", "best_checkpoint"):
            assert os.path.exists(os.path.join(
                str(tmp_path / "grouped"), f"id-{mid}", slot,
                "checkpt.msgpack")), (mid, slot)
    # the repeats genuinely differ from each other
    d1 = pd.read_csv(os.path.join(str(tmp_path / "grouped"), "id-1",
                                  "metric_id-1.csv"), index_col=0)
    d2 = pd.read_csv(os.path.join(str(tmp_path / "grouped"), "id-2",
                                  "metric_id-2.csv"), index_col=0)
    assert not np.array_equal(d1["train_loss"].values,
                              d2["train_loss"].values)


def test_physionet_group_mesh_matches_single_device(tmp_path, capsys):
    """group_mesh shards the PhysioNet ensemble axis (ghost-padded 3->4);
    member numerics must match the single-device grouped run."""
    import pandas as pd
    from njode_tpu.parallel import sharding
    from njode_tpu.training import sweeps

    records = pdu.make_synthetic_records(24, n_vars=4, max_hours=48.0,
                                         quantization=2.0, obs_perc=0.25,
                                         seed=29)

    def mk(smp):
        return [dict(dataset="physionet", epochs=2, batch_size=10,
                     save_every=1, learning_rate=0.01, hidden_size=8,
                     dropout_rate=0.1, ode_nn=((12, "tanh"),),
                     readout_nn=((12, "tanh"),), enc_nn=((12, "tanh"),),
                     quantization=2.0, n_samples=24, records=records,
                     repeat_seed=r, saved_models_path=str(tmp_path / smp))
                for r in range(3)]

    mesh = sharding.make_mesh(4)
    assert sweeps.parallel_training(params=mk("mesh"), vmap_groups=True,
                                    group_mesh=mesh) == [0, 0, 0]
    assert "physionet vmap group: 3 members" in capsys.readouterr().out
    assert sweeps.parallel_training(params=mk("one"),
                                    vmap_groups=True) == [0, 0, 0]
    for mid in (1, 2, 3):
        dm = pd.read_csv(os.path.join(str(tmp_path / "mesh"), f"id-{mid}",
                                      f"metric_id-{mid}.csv"), index_col=0)
        d1 = pd.read_csv(os.path.join(str(tmp_path / "one"), f"id-{mid}",
                                      f"metric_id-{mid}.csv"), index_col=0)
        for col in ("train_loss", "eval_loss", "eval_metric",
                    "eval_metric_2"):
            np.testing.assert_allclose(dm[col].values, d1[col].values,
                                       rtol=2e-5, atol=1e-7,
                                       err_msg=(mid, col))
    assert not os.path.exists(os.path.join(str(tmp_path / "mesh"), "id-4"))


def test_physionet_group_kernel_matches_group_xla(tmp_path, capsys):
    """use_pallas=True grouped PhysioNet entries route member losses
    through the fused kernel ('input' masks, interpret mode on CPU) —
    the training trajectory must match the grouped XLA run."""
    import pandas as pd
    from njode_tpu.training import sweeps

    records = pdu.make_synthetic_records(24, n_vars=4, max_hours=48.0,
                                         quantization=2.0, obs_perc=0.25,
                                         seed=31)

    def mk(smp, **kw):
        return [dict(dataset="physionet", epochs=2, batch_size=10,
                     save_every=1, learning_rate=0.01, hidden_size=8,
                     dropout_rate=0.1, ode_nn=((12, "tanh"),),
                     readout_nn=((12, "tanh"),), enc_nn=((12, "tanh"),),
                     quantization=2.0, n_samples=24, records=records,
                     repeat_seed=r, saved_models_path=str(tmp_path / smp),
                     **kw) for r in range(2)]

    kern = dict(use_pallas=True, pallas_mask_mode="input",
                pallas_interpret=True)
    assert sweeps.parallel_training(params=mk("kern", **kern),
                                    vmap_groups=True) == [0, 0]
    assert "physionet vmap group: 2 members" in capsys.readouterr().out
    assert sweeps.parallel_training(params=mk("xla"),
                                    vmap_groups=True) == [0, 0]
    for mid in (1, 2):
        dk = pd.read_csv(os.path.join(str(tmp_path / "kern"), f"id-{mid}",
                                      f"metric_id-{mid}.csv"), index_col=0)
        dx = pd.read_csv(os.path.join(str(tmp_path / "xla"), f"id-{mid}",
                                      f"metric_id-{mid}.csv"), index_col=0)
        for col in ("train_loss", "eval_loss", "eval_metric",
                    "eval_metric_2"):
            np.testing.assert_allclose(dk[col].values, dx[col].values,
                                       rtol=1e-4, atol=1e-7,
                                       err_msg=(mid, col))
