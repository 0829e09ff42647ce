"""Climate (USHCN-style) pipeline tests: dataset/collate parity vs the
reference ODE_Dataset, held-out extraction, and end-to-end training."""

import os

import numpy as np
import pytest

from conftest import add_reference_to_path, reference_available

import jax

from njode_tpu.data import climate as cdu
from njode_tpu.data import grid


@pytest.fixture(scope="module")
def climate_data(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("climate"))
    csv = os.path.join(d, "small_chunked_sporadic.csv")
    cdu.make_synthetic_climate_csv(csv, n_series=40, n_vars=3, T=20.0,
                                   obs_perc=0.06, seed=3)
    cdu.make_fold_indices(d, n_series=40, n_folds=2, seed=1)
    return d, csv


def test_synthetic_csv_schema(climate_data):
    import pandas as pd
    _, csv = climate_data
    df = pd.read_csv(csv)
    assert list(df.columns[:2]) == ["ID", "Time"]
    assert sum(c.startswith("Value") for c in df.columns) == 3
    assert sum(c.startswith("Mask") for c in df.columns) == 3
    # each row has >=1 observation; times on the 0.1 grid
    m = df[[c for c in df.columns if c.startswith("Mask")]].values
    assert (m.sum(axis=1) >= 1).all()
    assert np.allclose(df["Time"] * 10, np.round(df["Time"] * 10), atol=1e-6)


def test_validation_split_semantics(climate_data):
    _, csv = climate_data
    vo = {"T_val": 15.0, "max_val_samples": 3}
    ds = cdu.ClimateDataset(csv_file=csv, validation=True, val_options=vo)
    # inputs truncated at T_val; <=3 held-out rows per series, all after T_val
    assert (ds.df["Time"] <= vo["T_val"]).all()
    assert (ds.df_after["Time"] > vo["T_val"]).all()
    counts = ds.df_after.groupby("ID")["Time"].count()
    assert (counts <= 3).all()
    # every kept series has data on both sides
    for sid in ds.ids:
        assert (ds.df["ID"] == sid).any()
        assert (ds.df_after["ID"] == sid).any()


@pytest.mark.skipif(not reference_available(), reason="no reference")
def test_collate_parity_with_reference(climate_data):
    """Dense grid batches built from our collate and from the reference
    ODE_Dataset+custom_collate_fn must be identical."""
    add_reference_to_path()
    torch = pytest.importorskip("torch")  # noqa: F841
    from GRU_ODE_Bayes import data_utils_gru_ode_bayes as ref_du

    _, csv = climate_data
    idx = np.arange(1, 25)
    delta_t, T = 0.5, 20.0
    if not hasattr(np, "int"):  # reference uses the removed np.int alias
        np.int = int

    ours = cdu.ClimateDataset(csv_file=csv, idx=idx)
    max_steps = ours.max_grid_steps(delta_t, T)
    ev = ours.collate(np.arange(len(ours)))
    b_ours = cdu.dense_batch_from_events(ev, delta_t, T, max_steps=max_steps)

    ref_ds = ref_du.ODE_Dataset(csv_file=os.path.basename(csv),
                                root_dir=os.path.dirname(csv), idx=idx)
    ref_batch = ref_du.custom_collate_fn(
        [ref_ds[i] for i in range(len(ref_ds))])
    b_ref = cdu.dense_batch_from_events(
        {"times": np.asarray(ref_batch["times"]),
         "time_ptr": np.asarray(ref_batch["time_ptr"]),
         "X": ref_batch["X"].numpy(),
         "M": ref_batch["M"].numpy(),
         "obs_idx": ref_batch["obs_idx"].numpy(),
         "batch_size": len(ref_batch["pat_idx"])},
        delta_t, T, max_steps=max_steps)

    assert np.allclose(b_ours.times, b_ref.times)
    assert np.allclose(b_ours.obs, b_ref.obs)
    assert np.allclose(b_ours.X, b_ref.X, atol=1e-6)
    assert np.allclose(b_ours.M, b_ref.M)
    assert np.allclose(b_ours.n_obs_ot, b_ref.n_obs_ot)


@pytest.mark.skipif(not reference_available(), reason="no reference")
def test_extract_at_times_matches_reference(climate_data):
    add_reference_to_path()
    pytest.importorskip("torch")
    import torch
    from GRU_ODE_Bayes import data_utils_gru_ode_bayes as ref_du

    rs = np.random.RandomState(0)
    K, B, D = 30, 4, 2
    t_vec = np.round(np.arange(0, K + 1) * 0.5, 6)
    p_vec = rs.normal(size=(K + 1, B, D)).astype(np.float32)
    eval_times = np.array([0.5, 3.7, 7.5, 14.9])
    eval_idx = np.array([0, 1, 2, 3])

    ref = ref_du.extract_from_path(t_vec.copy(), torch.tensor(p_vec),
                                   eval_times.copy(), eval_idx)
    ours = cdu.extract_at_times(t_vec, p_vec, eval_times, eval_idx)
    assert np.allclose(ours, ref.numpy())


def test_climate_train_end_to_end(climate_data, tmp_path):
    from njode_tpu.training import climate_trainer
    d, _ = climate_data
    smp = str(tmp_path / "saved_models_climate")
    ret = climate_trainer.train(
        model_id=None, epochs=2, batch_size=16, save_every=1,
        learning_rate=0.01, hidden_size=9, dropout_rate=0.1,
        ode_nn=((12, "tanh"),), readout_nn=((12, "tanh"),),
        enc_nn=((12, "tanh"),),
        data_index=0, saved_models_path=smp,
        climate_dir=d, T=20.0, delta_t=0.5, T_val=15.0, max_val_samples=3)
    assert ret == 0
    import pandas as pd
    dfm = pd.read_csv(os.path.join(smp, "id-1", "metric_id-1.csv"),
                      index_col=0)
    assert list(dfm.columns) == climate_trainer.METR_COLUMNS
    assert len(dfm) == 2
    for c in ("train_loss", "eval_loss", "eval_metric", "test_loss",
              "test_metric"):
        assert np.all(np.isfinite(dfm[c].values)), c
    assert os.path.exists(os.path.join(smp, "id-1", "best_checkpoint",
                                       "checkpt.msgpack"))

    # resume continues epochs
    ret = climate_trainer.train(
        model_id=1, epochs=3, batch_size=16, save_every=1,
        data_index=0, saved_models_path=smp,
        climate_dir=d, T=20.0, delta_t=0.5, T_val=15.0, max_val_samples=3)
    assert ret == 0
    dfm2 = pd.read_csv(os.path.join(smp, "id-1", "metric_id-1.csv"),
                       index_col=0)
    assert sorted(dfm2["epoch"].values.tolist()) == [1, 2, 3]


def test_climate_train_gru_ode_bayes(climate_data, tmp_path):
    from njode_tpu.training import climate_trainer
    d, _ = climate_data
    smp = str(tmp_path / "saved_models_climate_gob")
    ret = climate_trainer.train(
        model_id=None, epochs=1, batch_size=16, save_every=1,
        learning_rate=0.01, hidden_size=8, dropout_rate=0.0,
        data_index=0, saved_models_path=smp,
        climate_dir=d, T=20.0, delta_t=0.5, T_val=15.0, max_val_samples=3,
        other_model="GRU_ODE_Bayes",
        **{"GRU_ODE_Bayes-impute": True, "GRU_ODE_Bayes-logvar": True,
           "GRU_ODE_Bayes-mixing": 0.0001})
    assert ret == 0
    import pandas as pd
    dfm = pd.read_csv(os.path.join(smp, "id-1", "metric_id-1.csv"),
                      index_col=0)
    assert np.isfinite(dfm["eval_metric"].values).all()


def test_misc_helpers_match_reference_semantics():
    """add_jitter / map_to_closest / compute_corr / sort_array_on_other /
    gaussian helpers (data_utils_gru_ode_bayes.py:209-231, 402-443)."""
    import pandas as pd
    from scipy import special

    df = pd.DataFrame({
        "ID": [0, 0, 1], "Time": [0.5, 1.0, 0.0],
        "Value_1": [1.0, 2.0, 3.0], "Value_2": [4.0, 5.0, 6.0],
        "Mask_1": [1.0, 1.0, 1.0], "Mask_2": [1.0, 0.0, 1.0]})
    out = cdu.add_jitter(df, jitter_time=0.1, seed=0)
    # rows with both observed are split into two single-feature rows
    assert len(out) == 1 + 2 * 2
    assert (out["Time"] >= 0).all()
    assert ((out["Mask_1"] + out["Mask_2"]) >= 1).all()

    ref = np.array([0.0, 1.0, 2.0])
    assert np.allclose(cdu.map_to_closest([0.2, 1.6, 5.0], ref),
                       [0.0, 2.0, 2.0])

    assert cdu.adjust_learning_rate(5, 0.3) == 0.3
    assert np.isclose(cdu.adjust_learning_rate(21, 0.3), 0.1)

    rs = np.random.RandomState(0)
    Xt = rs.normal(size=(20, 2))
    corr = cdu.compute_corr(Xt, Xt, np.ones_like(Xt))
    assert np.allclose(corr, 1.0, atol=1e-12)

    x1 = np.array([3, 1, 2])
    x2 = np.array([1, 2, 3])
    perm = cdu.sort_array_on_other(x1, x2)
    assert np.array_equal(x2[perm], x1)

    x, mu, lv = 1.0, 0.0, 0.0
    assert np.isclose(cdu.log_lik_gaussian(x, mu, lv),
                      np.log(np.sqrt(2 * np.pi)) + 0.5)
    assert np.isclose(cdu.tail_fun_gaussian(x, mu, lv),
                      0.5 - 0.5 * special.erf(1 / np.sqrt(2)))


def test_draw_stock_model(tmp_path):
    from njode_tpu.data import sde
    out = sde.draw_stock_model("OrnsteinUhlenbeck", n_paths=3,
                               save_path=str(tmp_path / "ou.png"))
    assert os.path.exists(out)


def test_preprocess_ushcn_daily_end_to_end(tmp_path):
    """Exercise the USHCN preprocessing recipe on a fabricated raw daily
    file: chunking, per-variable normalization, min-obs filtering, and that
    the output loads through ClimateDataset + collate (VERDICT r1 #8)."""
    import pandas as pd
    rs = np.random.RandomState(0)
    rows = []
    for sid in range(3):
        for day in range(430):   # > 2 chunks of 200 days
            mask = (rs.random(5) < 0.3).astype(int)
            if mask.sum() == 0:
                continue
            vals = rs.normal(10, 5, 5) * mask
            rows.append([sid, day] + list(vals) + list(mask))
    raw = pd.DataFrame(rows, columns=["ID", "day"]
                       + [f"Value_{i}" for i in range(5)]
                       + [f"Mask_{i}" for i in range(5)])
    raw_csv = str(tmp_path / "raw_ushcn.csv")
    raw.to_csv(raw_csv, index=False)

    out_csv = str(tmp_path / "small_chunked_sporadic.csv")
    out = cdu.preprocess_ushcn_daily(raw_csv, out_csv, chunk_days=200,
                                     min_obs_per_chunk=10)
    assert os.path.exists(out_csv)
    df = pd.read_csv(out_csv)
    # schema identical to the shipped climate CSV
    assert list(df.columns[:2]) == ["ID", "Time"]
    assert sum(c.startswith("Value") for c in df.columns) == 5
    assert sum(c.startswith("Mask") for c in df.columns) == 5
    # chunking: times live inside one chunk; ids contiguous from 0
    assert df["Time"].max() < 200
    assert sorted(df["ID"].unique()) == list(range(df["ID"].nunique()))
    assert df["ID"].nunique() >= 6  # 3 stations x >=2 full chunks
    # per-variable normalization over observed entries: ~zero mean, unit std
    for i in range(5):
        obs = df[f"Mask_{i}"] > 0
        v = df.loc[obs, f"Value_{i}"]
        assert abs(v.mean()) < 0.2 and abs(v.std() - 1.0) < 0.2
    # every chunk kept has >= 10 observation rows
    assert (df.groupby("ID")["Time"].count() >= 10).all()

    # loads through the production dataset + collate
    ds = cdu.ClimateDataset(csv_file=out_csv)
    ev = ds.collate(np.arange(min(8, len(ds))))
    assert ev["X"].shape[1] == 5
    assert len(ev["times"]) > 0

    # gating: missing raw file raises the documented error
    with pytest.raises(FileNotFoundError, match="raw USHCN"):
        cdu.preprocess_ushcn_daily(str(tmp_path / "nope.csv"), out_csv)


def test_climate_repeat_seed_distinct(climate_data, tmp_path):
    """'repeat_seed' varies the climate trainer's init/shuffle/dropout
    streams (fold split comes from the index files, so test/eval sets are
    identical); repeat_seed=0 equals the default stream exactly."""
    from njode_tpu.training import climate_trainer
    import pandas as pd
    d, _ = climate_data

    def run(tag, **kw):
        smp = str(tmp_path / tag)
        ret = climate_trainer.train(
            model_id=None, epochs=2, batch_size=16, save_every=1,
            learning_rate=0.01, hidden_size=9, dropout_rate=0.1,
            ode_nn=((12, "tanh"),), readout_nn=((12, "tanh"),),
            enc_nn=((12, "tanh"),),
            data_index=0, saved_models_path=smp,
            climate_dir=d, T=20.0, delta_t=0.5, T_val=15.0,
            max_val_samples=3, **kw)
        assert ret == 0
        return pd.read_csv(os.path.join(smp, "id-1", "metric_id-1.csv"),
                           index_col=0)

    d0 = run("rs0", repeat_seed=0)
    d_abs = run("rs_absent")
    d1 = run("rs1", repeat_seed=1)
    for c in ("train_loss", "eval_loss", "eval_metric"):
        np.testing.assert_array_equal(d0[c].values, d_abs[c].values, c)
    assert not np.array_equal(d0["train_loss"].values, d1["train_loss"].values)
    assert np.all(np.isfinite(d1["eval_metric"].values))


def test_climate_prestack_matches_legacy_collate(climate_data, tmp_path):
    """The climate prestacked device-batching path (round 3,
    climate.prestack_series) must reproduce the per-epoch host-collation
    path: with grid-aligned times (delta_t=0.1) the canonical grid is the
    per-batch union grid, so the metric CSVs must match (dropout 0: the
    canonical grid's always-present leading t=0 step shifts the fused
    dropout-mask slots for batches without a t=0 observation)."""
    import pandas as pd
    from njode_tpu.training import climate_trainer
    d, _ = climate_data

    def run(tag, prestack):
        smp = str(tmp_path / tag)
        ret = climate_trainer.train(
            model_id=None, epochs=2, batch_size=16, save_every=1,
            learning_rate=0.01, hidden_size=9, dropout_rate=0.0,
            ode_nn=((12, "tanh"),), readout_nn=((12, "tanh"),),
            enc_nn=((12, "tanh"),),
            data_index=0, saved_models_path=smp,
            climate_dir=d, T=20.0, delta_t=0.1, T_val=15.0,
            max_val_samples=3, prestack=prestack)
        assert ret == 0
        return pd.read_csv(os.path.join(smp, "id-1", "metric_id-1.csv"),
                           index_col=0)

    d_pre = run("pre", True)
    d_leg = run("leg", False)
    for col in ("train_loss", "eval_loss", "eval_metric", "test_loss",
                "test_metric"):
        np.testing.assert_allclose(d_pre[col].values, d_leg[col].values,
                                   rtol=1e-5, atol=1e-7, err_msg=col)


def test_climate_prestack_alignment_gate(climate_data):
    """Off-grid delta_t returns None from prestack_series (trainer falls
    back to per-batch collation); aligned delta_t builds the bank."""
    _, csv = climate_data
    ds = cdu.ClimateDataset(csv_file=csv, idx=np.arange(10))
    assert cdu.prestack_series(ds, 0.5, 20.0, 60) is None
    pre = cdu.prestack_series(ds, 0.1, 20.0, 220)
    assert pre is not None
    assert pre["k"].shape[0] == len(ds)
    assert pre["X"].shape == pre["M"].shape
    # events count matches the dataset's per-series rows
    assert pre["n_ev"].sum() == sum(
        len(r) for r in ds._rows_by_id.values())


def test_climate_group_planner():
    """Fold/repeat entries group; anything off the grouped surface stays
    sequential."""
    from njode_tpu.training import climate_group
    base = dict(dataset="climate", epochs=2, batch_size=16, hidden_size=9,
                ode_nn=((12, "tanh"),), readout_nn=((12, "tanh"),),
                enc_nn=((12, "tanh"),), T=20.0, delta_t=0.1, T_val=15.0,
                max_val_samples=3, climate_dir="/d")
    ps = [dict(base, data_index=f, model_id=f + 1, parallel=True,
               resume_training=False) for f in range(2)]
    ps += [dict(base, other_model="GRU_ODE_Bayes"),    # baseline model
           dict(base, prestack=False),                 # legacy path
           dict(base, epochs=5),                       # different constant
           dict(base, dataset="physionet")]            # wrong dataset
    groups, singles = climate_group.plan_groups(ps)
    assert groups == [[0, 1]]
    assert singles == [2, 3, 4, 5]


def test_climate_group_matches_sequential(climate_data, tmp_path, capsys):
    """Cross-fold grouped climate CV (one vmapped ensemble over the shared
    global bank) must reproduce the solo prestacked trainer fold-for-fold:
    same metric CSVs (incl. test metrics), same checkpoints. (The fixture
    folds share a train size; dead-batch suppression for uneven folds is
    pinned separately in test_climate_group_dead_batches_are_noops.)"""
    import pandas as pd
    from njode_tpu.training import climate_trainer, sweeps
    d, _ = climate_data

    def mk(smp):
        return [dict(dataset="climate", epochs=2, batch_size=16,
                     save_every=1, learning_rate=0.01, hidden_size=9,
                     dropout_rate=0.1, ode_nn=((12, "tanh"),),
                     readout_nn=((12, "tanh"),), enc_nn=((12, "tanh"),),
                     data_index=f, climate_dir=d, T=20.0, delta_t=0.1,
                     T_val=15.0, max_val_samples=3,
                     saved_models_path=str(tmp_path / smp))
                for f in range(2)]

    assert sweeps.parallel_training(params=mk("grouped"),
                                    vmap_groups=True) == [0, 0]
    assert "climate vmap group: 2 members" in capsys.readouterr().out
    assert sweeps.parallel_training(params=mk("solo")) == [0, 0]
    for mid in (1, 2):
        dg = pd.read_csv(os.path.join(str(tmp_path / "grouped"),
                                      f"id-{mid}", f"metric_id-{mid}.csv"),
                         index_col=0)
        ds = pd.read_csv(os.path.join(str(tmp_path / "solo"),
                                      f"id-{mid}", f"metric_id-{mid}.csv"),
                         index_col=0)
        assert list(dg.columns) == climate_trainer.METR_COLUMNS
        assert dg["epoch"].tolist() == ds["epoch"].tolist() == [1, 2]
        for col in ("train_loss", "eval_loss", "eval_metric",
                    "test_loss", "test_metric"):
            np.testing.assert_allclose(dg[col].values, ds[col].values,
                                       rtol=2e-4, atol=1e-7,
                                       err_msg=(mid, col))
        for slot in ("last_checkpoint", "best_checkpoint"):
            assert os.path.exists(os.path.join(
                str(tmp_path / "grouped"), f"id-{mid}", slot,
                "checkpt.msgpack")), (mid, slot)
    # the folds genuinely differ
    d1 = pd.read_csv(os.path.join(str(tmp_path / "grouped"), "id-1",
                                  "metric_id-1.csv"), index_col=0)
    d2 = pd.read_csv(os.path.join(str(tmp_path / "grouped"), "id-2",
                                  "metric_id-2.csv"), index_col=0)
    assert not np.array_equal(d1["eval_metric"].values,
                              d2["eval_metric"].values)
    # the CV aggregator consumes grouped artifacts transparently
    from njode_tpu.analysis import extras
    cv = extras.get_cross_validation(
        path=str(tmp_path / "grouped"),
        param_combinations=({"hidden_size": 9},),
        save_path=str(tmp_path / "grouped" / "cross_val.csv"))
    assert len(cv) == 1
    assert np.isfinite(cv["mean_eval_metric_min"].values[0])
    assert np.isfinite(cv["std_eval_metric_min"].values[0])


def test_climate_group_mesh_matches_single_device(climate_data, tmp_path,
                                                  capsys):
    """group_mesh shards the climate fold ensemble (ghost-padded 2->4);
    member numerics must match the single-device grouped run."""
    import pandas as pd
    from njode_tpu.parallel import sharding
    from njode_tpu.training import sweeps
    d, _ = climate_data

    def mk(smp):
        return [dict(dataset="climate", epochs=2, batch_size=16,
                     save_every=1, learning_rate=0.01, hidden_size=9,
                     dropout_rate=0.1, ode_nn=((12, "tanh"),),
                     readout_nn=((12, "tanh"),), enc_nn=((12, "tanh"),),
                     data_index=f, climate_dir=d, T=20.0, delta_t=0.1,
                     T_val=15.0, max_val_samples=3,
                     saved_models_path=str(tmp_path / smp))
                for f in range(2)]

    mesh = sharding.make_mesh(4)
    assert sweeps.parallel_training(params=mk("mesh"), vmap_groups=True,
                                    group_mesh=mesh) == [0, 0]
    assert "climate vmap group: 2 members" in capsys.readouterr().out
    assert sweeps.parallel_training(params=mk("one"),
                                    vmap_groups=True) == [0, 0]
    for mid in (1, 2):
        dm = pd.read_csv(os.path.join(str(tmp_path / "mesh"), f"id-{mid}",
                                      f"metric_id-{mid}.csv"), index_col=0)
        d1 = pd.read_csv(os.path.join(str(tmp_path / "one"), f"id-{mid}",
                                      f"metric_id-{mid}.csv"), index_col=0)
        for col in ("train_loss", "eval_loss", "eval_metric",
                    "test_loss", "test_metric"):
            np.testing.assert_allclose(dm[col].values, d1[col].values,
                                       rtol=2e-5, atol=1e-7,
                                       err_msg=(mid, col))
    assert not os.path.exists(os.path.join(str(tmp_path / "mesh"), "id-3"))


def test_climate_group_dead_batches_are_noops(climate_data):
    """Members with fewer batches than the group maximum (uneven folds)
    carry scale-0 dead batches — their updates must be EXACT no-ops:
    appending a dead batch to every member changes nothing."""
    import jax
    import jax.numpy as jnp
    from njode_tpu.training import climate_group
    from njode_tpu.training.steps import make_optimizer
    from njode_tpu.models import njode as M
    d, csv = climate_data

    ds = cdu.ClimateDataset(csv_file=csv)
    pre = cdu.prestack_series(ds, 0.1, 20.0, 220)
    N = pre["k"].shape[0]
    Emax, D = pre["k"].shape[1], pre["X"].shape[2]
    d_k = jnp.asarray(np.concatenate(
        [pre["k"], np.full((1, Emax), pre["times"].shape[0], np.int32)]))
    d_X = jnp.asarray(np.concatenate(
        [pre["X"], np.zeros((1, Emax, D), np.float32)]))
    d_M = jnp.asarray(np.concatenate(
        [pre["M"], np.zeros((1, Emax, D), np.float32)]))

    cfg = M.NJODEConfig(D, 9, D, ((12, "tanh"),), ((12, "tanh"),),
                        ((12, "tanh"),), dropout_rate=0.1, masked=True)
    fns = climate_group._make_cg_step_fns(
        cfg, 0.01, pre["times"], pre["dt"], True, False, "prng", False)
    E, B = 2, 8

    def run(n_batches, scales):
        params_e = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[M.init_params(jax.random.PRNGKey(i), cfg) for i in range(E)])
        opt_e = jax.vmap(make_optimizer(0.01).init)(params_e)
        idx = np.full((E, n_batches, B), N, np.int32)
        for m in range(E):
            rs = np.random.RandomState(m)
            for j in range(2):          # 2 real batches, rest dead
                idx[m, j] = rs.permutation(N)[:B]
        keys = jnp.stack([jax.random.split(jax.random.PRNGKey(9 + m),
                                           n_batches) for m in range(E)])
        pe, _, _ = fns["train_epoch"](
            params_e, opt_e, d_k, d_X, d_M, jnp.asarray(idx),
            jnp.float32(0.5), keys, jnp.asarray(scales, jnp.float32))
        return jax.device_get(pe)

    p_real = run(2, np.ones((E, 2)))
    p_dead = run(3, np.concatenate(
        [np.ones((E, 2)), np.zeros((E, 1))], axis=1))
    for a, b in zip(jax.tree.leaves(p_real), jax.tree.leaves(p_dead)):
        np.testing.assert_array_equal(a, b)


def test_climate_group_kernel_matches_group_xla(climate_data, tmp_path,
                                                capsys):
    """use_pallas=True grouped climate folds route member losses through
    the fused kernel ('input' masks, interpret mode on CPU) — the
    training trajectory must match the grouped XLA run fold-for-fold."""
    import pandas as pd
    from njode_tpu.training import sweeps
    d, _ = climate_data

    def mk(smp, **kw):
        return [dict(dataset="climate", epochs=2, batch_size=16,
                     save_every=1, learning_rate=0.01, hidden_size=9,
                     dropout_rate=0.1, ode_nn=((12, "tanh"),),
                     readout_nn=((12, "tanh"),), enc_nn=((12, "tanh"),),
                     data_index=f, climate_dir=d, T=20.0, delta_t=0.1,
                     T_val=15.0, max_val_samples=3,
                     saved_models_path=str(tmp_path / smp), **kw)
                for f in range(2)]

    kern = dict(use_pallas=True, pallas_mask_mode="input",
                pallas_interpret=True)
    assert sweeps.parallel_training(params=mk("kern", **kern),
                                    vmap_groups=True) == [0, 0]
    assert "climate vmap group: 2 members" in capsys.readouterr().out
    assert sweeps.parallel_training(params=mk("xla"),
                                    vmap_groups=True) == [0, 0]
    for mid in (1, 2):
        dk = pd.read_csv(os.path.join(str(tmp_path / "kern"), f"id-{mid}",
                                      f"metric_id-{mid}.csv"), index_col=0)
        dx = pd.read_csv(os.path.join(str(tmp_path / "xla"), f"id-{mid}",
                                      f"metric_id-{mid}.csv"), index_col=0)
        for col in ("train_loss", "eval_loss", "eval_metric",
                    "test_loss", "test_metric"):
            np.testing.assert_allclose(dk[col].values, dx[col].values,
                                       rtol=1e-4, atol=1e-7,
                                       err_msg=(mid, col))


def test_climate_gob_prestack_matches_legacy(climate_data, tmp_path):
    """The GRU-ODE-Bayes branch uses the prestacked bank too
    (gob.make_prestacked_step_fns over the shared steps.prestacked_batch);
    aligned delta_t must reproduce the per-epoch collate path."""
    import pandas as pd
    from njode_tpu.training import climate_trainer
    d, _ = climate_data

    def run(tag, prestack):
        smp = str(tmp_path / tag)
        ret = climate_trainer.train(
            model_id=None, epochs=1, batch_size=16, save_every=1,
            learning_rate=0.01, hidden_size=8, dropout_rate=0.0,
            data_index=0, saved_models_path=smp,
            climate_dir=d, T=20.0, delta_t=0.1, T_val=15.0,
            max_val_samples=3, prestack=prestack,
            other_model="GRU_ODE_Bayes",
            **{"GRU_ODE_Bayes-impute": False, "GRU_ODE_Bayes-logvar": True,
               "GRU_ODE_Bayes-mixing": 0.0001})
        assert ret == 0
        return pd.read_csv(os.path.join(smp, "id-1", "metric_id-1.csv"),
                           index_col=0)

    d_pre = run("gob_pre", True)
    d_leg = run("gob_leg", False)
    for col in ("train_loss", "eval_loss", "eval_metric", "test_loss",
                "test_metric"):
        np.testing.assert_allclose(d_pre[col].values, d_leg[col].values,
                                   rtol=1e-5, atol=1e-7, err_msg=col)


def _write_cov_label_files(d, csv, n_series, n_cov=3, seed=7):
    """Fabricated per-series covariate/label CSVs in the reference's
    schema (ID + cov columns / ID + 'label')."""
    import pandas as pd
    rs = np.random.RandomState(seed)
    ids = pd.read_csv(csv)["ID"].unique()
    cov_path = os.path.join(d, "covs.csv")
    lab_path = os.path.join(d, "labels.csv")
    pd.DataFrame(dict({"ID": ids}, **{
        f"Cov_{j}": rs.normal(size=len(ids)).astype(np.float32)
        for j in range(n_cov)})).to_csv(cov_path, index=False)
    pd.DataFrame({"ID": ids,
                  "label": rs.randint(0, 2, len(ids)).astype(np.float32)
                  }).to_csv(lab_path, index=False)
    return cov_path, lab_path


def test_cov_label_dummy_defaults(climate_data):
    """Without cov/label files the reference creates single-column zero
    dummies (data_utils_gru_ode_bayes.py:103-108); collate must emit them."""
    _, csv = climate_data
    ds = cdu.ClimateDataset(csv_file=csv)
    assert ds.cov_dim == 1
    ev = ds.collate(np.arange(5))
    assert ev["cov"].shape == (5, 1) and not ev["cov"].any()
    assert ev["y"].shape == (5,) and not np.asarray(ev["y"]).any()


@pytest.mark.skipif(not reference_available(), reason="no reference")
def test_cov_label_parity_with_reference(climate_data):
    """cov/label loading + collate emission must match the reference
    ODE_Dataset/custom_collate_fn on fabricated cov/label CSVs, through
    idx filtering/remapping (:125-134) and validation filtering (:122)."""
    add_reference_to_path()
    torch = pytest.importorskip("torch")  # noqa: F841
    from GRU_ODE_Bayes import data_utils_gru_ode_bayes as ref_du

    d, csv = climate_data
    cov_path, lab_path = _write_cov_label_files(d, csv, n_series=40)
    if not hasattr(np, "int"):
        np.int = int

    for val in (False, True):
        vo = {"T_val": 15.0, "max_val_samples": 3} if val else None
        idx = np.arange(3, 31)
        ours = cdu.ClimateDataset(csv_file=csv, idx=idx, validation=val,
                                  val_options=vo, cov_file=cov_path,
                                  label_file=lab_path)
        assert ours.cov_dim == 3
        ref_ds = ref_du.ODE_Dataset(
            csv_file=os.path.basename(csv), root_dir=d,
            cov_file=os.path.basename(cov_path),
            label_file=os.path.basename(lab_path),
            idx=idx, validation=val, val_options=vo)
        assert len(ours) == len(ref_ds)
        ref_batch = ref_du.custom_collate_fn(
            [ref_ds[i] for i in range(len(ref_ds))])
        ev = ours.collate(np.arange(len(ours)))
        np.testing.assert_allclose(ev["cov"],
                                   ref_batch["cov"].numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(ev["y"], np.float32).ravel(),
                                   ref_batch["y"].numpy().ravel(), atol=0)


def test_gob_climate_cov_file_end_to_end(climate_data, tmp_path):
    """GOB climate training with a cov_file: covariates ride as start_X
    into covariates_map (h0), through BOTH the prestacked bank and the
    legacy collate path (identical numerics), and genuinely change the
    trajectory vs the dummy-zero path."""
    import pandas as pd
    from njode_tpu.training import climate_trainer
    d, csv = climate_data
    cov_path, lab_path = _write_cov_label_files(d, csv, n_series=40)

    def run(tag, **kw):
        smp = str(tmp_path / tag)
        ret = climate_trainer.train(
            model_id=None, epochs=2, batch_size=16, save_every=1,
            learning_rate=0.01, hidden_size=8, dropout_rate=0.1,
            ode_nn=((12, "tanh"),), readout_nn=((12, "tanh"),),
            enc_nn=((12, "tanh"),), data_index=0, climate_dir=d,
            T=20.0, delta_t=0.1, T_val=15.0, max_val_samples=3,
            other_model="GRU_ODE_Bayes", saved_models_path=smp, **kw)
        assert ret == 0
        return pd.read_csv(os.path.join(smp, "id-1", "metric_id-1.csv"),
                           index_col=0)

    cov_kw = dict(cov_file="covs.csv", label_file="labels.csv")
    d_cov = run("cov", **cov_kw)
    d_cov2 = run("cov_legacy", prestack=False, **cov_kw)
    d_zero = run("zero")
    cols = ["train_loss", "eval_loss", "eval_metric"]
    assert np.isfinite(d_cov[cols].values).all()
    # prestacked and legacy collate agree with covariates threaded
    for c in cols:
        np.testing.assert_allclose(d_cov[c].values, d_cov2[c].values,
                                   rtol=2e-5, atol=1e-7, err_msg=c)
    # and real covariates actually change h0 (vs the dummy-zero path)
    assert not np.allclose(d_cov["train_loss"].values,
                           d_zero["train_loss"].values)
