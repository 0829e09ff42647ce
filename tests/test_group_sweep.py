"""Automatic vmap-grouping of sweeps (training/group_sweep.py): planner
partitioning and end-to-end artifact/numerics parity with the sequential
trainer path."""

import os

import numpy as np
import pytest

import conftest  # noqa: F401

from njode_tpu.data import datasets as du
from njode_tpu.training import group_sweep, sweeps

SMALL_HP = dict(drift=2.0, volatility=0.3, mean=4, speed=2.0,
                correlation=0.5, nb_paths=60, nb_steps=20, S0=1,
                maturity=1.0, dimension=1, obs_perc=0.2,
                scheme="euler", return_vol=False, v0=1)

NN = ((12, "tanh"),)


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("training_data_group"))
    du.create_dataset("BlackScholes", SMALL_HP, seed=1, base_path=base)
    return base


def _param(seed=398, **kw):
    p = dict(epochs=2, batch_size=12, save_every=1, learning_rate=0.01,
             test_size=0.2, seed=seed, hidden_size=8, dropout_rate=0.1,
             ode_nn=NN, readout_nn=NN, enc_nn=NN, dataset="BlackScholes",
             plot=False, evaluate=True)
    p.update(kw)
    return p


def test_plan_groups_partitioning():
    params = [
        _param(seed=1), _param(seed=2), _param(seed=3),       # one group
        _param(seed=1, ode_nn=((24, "tanh"),)),               # lone arch
        _param(seed=1, dataset="climate"),                    # real data
        _param(seed=1, other_model="GRU_ODE_Bayes"),          # baseline
        _param(seed=1, func_appl_X=["power-2"]),              # feature map
        _param(seed=1, resume_training=True),                 # resume
    ]
    groups, singles = group_sweep.plan_groups(params)
    assert groups == [[0, 1, 2]]
    assert singles == [3, 4, 5, 6, 7]
    # two members suffice; widths are part of the key (same-width guidance)
    g2, s2 = group_sweep.plan_groups(params[:2] + params[3:4])
    assert g2 == [[0, 1]] and s2 == [2]


def test_group_training_matches_sequential(tiny_dataset, tmp_path):
    import pandas as pd

    smp_g = str(tmp_path / "grouped") + os.sep
    smp_s = str(tmp_path / "solo") + os.sep
    mk = lambda smp: [  # noqa: E731
        _param(seed=398, saved_models_path=smp, base_data_path=tiny_dataset),
        _param(seed=399, saved_models_path=smp, base_data_path=tiny_dataset),
        # different width -> sequential fallback inside the same sweep
        _param(seed=398, ode_nn=((24, "tanh"),), readout_nn=((24, "tanh"),),
               enc_nn=((24, "tanh"),), saved_models_path=smp,
               base_data_path=tiny_dataset),
    ]
    res_g = sweeps.parallel_training(params=mk(smp_g), vmap_groups=True)
    res_s = sweeps.parallel_training(params=mk(smp_s))
    assert res_g == [0, 0, 0] and res_s == [0, 0, 0]

    for mid in (1, 2, 3):
        dg = pd.read_csv(os.path.join(smp_g, f"id-{mid}",
                                      f"metric_id-{mid}.csv"), index_col=0)
        ds = pd.read_csv(os.path.join(smp_s, f"id-{mid}",
                                      f"metric_id-{mid}.csv"), index_col=0)
        assert dg["epoch"].tolist() == ds["epoch"].tolist() == [1, 2]
        # member streams replicate the solo trainer's formulas; vmapped
        # arithmetic may reassociate -> tight-but-not-bitwise tolerance
        for col in ("train_loss", "eval_loss", "optimal_eval_loss",
                    "evaluation_mean_diff"):
            np.testing.assert_allclose(dg[col].values, ds[col].values,
                                       rtol=2e-3, atol=1e-6, err_msg=col)
        for slot in ("last_checkpoint", "best_checkpoint"):
            assert os.path.exists(os.path.join(
                smp_g, f"id-{mid}", slot, "checkpt.msgpack")), (mid, slot)

    # grouped checkpoints restore through the standard loader
    import jax
    from njode_tpu.models import njode
    from njode_tpu.training import checkpoints
    from njode_tpu.training.steps import make_optimizer
    cfg = njode.NJODEConfig(1, 8, 1, NN, NN, NN, dropout_rate=0.1)
    params = njode.init_params(jax.random.PRNGKey(0), cfg)
    opt_state = make_optimizer(0.01).init(params)
    p, o, epoch, weight = checkpoints.load_checkpoint(
        os.path.join(smp_g, "id-1", "last_checkpoint"), params, opt_state)
    assert epoch == 2 and 0.0 < weight <= 1.0


def test_padding_batches_are_exact_noops(tiny_dataset, tmp_path):
    """pad_batches_to (compile sharing across training_size variants) must
    not change the numbers: update-suppressed padding batches are exact
    no-ops."""
    import pandas as pd

    def run(tag, pad):
        smp = str(tmp_path / tag) + os.sep
        ps = [_param(seed=398, saved_models_path=smp,
                     base_data_path=tiny_dataset, training_size=24),
              _param(seed=399, saved_models_path=smp,
                     base_data_path=tiny_dataset, training_size=24)]
        res = sweeps.parallel_training(params=ps, vmap_groups=True) \
            if pad is None else None
        if pad is not None:
            ps = [dict(p, model_id=i + 1, resume_training=False,
                       parallel=True) for i, p in enumerate(ps)]
            res = group_sweep.train_group(ps, pad_batches_to=pad)
        assert all(r == 0 for r in res)
        return pd.read_csv(os.path.join(smp, "id-1", "metric_id-1.csv"),
                           index_col=0)

    d0 = run("nopad", None)           # 24/12 = 2 real batches
    d1 = run("pad", 7)                # + 5 no-op batches
    for col in ("train_loss", "eval_loss", "evaluation_mean_diff"):
        np.testing.assert_array_equal(d0[col].values, d1[col].values, col)


def test_plan_compile_sharing():
    ps = [_param(seed=s, training_size=ts)
          for ts in (240, 480) for s in (1, 2)]
    ps += [_param(seed=s, training_size=240, ode_nn=((24, "tanh"),))
           for s in (1, 2)]
    groups, singles = group_sweep.plan_groups(ps)
    assert len(groups) == 3 and not singles
    pads = group_sweep.plan_compile_sharing(ps, groups)
    # the two 12-wide groups share the max batch count (480/12=40);
    # the 24-wide group is its own supercluster
    by_ts = {ps[g[0]]["training_size"]: gi for gi, g in enumerate(groups)
             if ps[g[0]]["ode_nn"] == NN}
    assert pads[by_ts[240]] == pads[by_ts[480]] == 40


def test_group_key_separates_all_behavior_options():
    """Entries differing in ANY option train_group reads must not share a
    group, and options the grouped path does not implement make an entry
    ungroupable (sequential fallback) instead of being silently dropped
    by the p0-only reads."""
    base = _param()
    assert group_sweep.group_key(dict(base)) == group_sweep.group_key(
        dict(base, seed=7, model_id=3, parallel=True))  # vary-keys only
    for kw in (dict(compute_dtype="bfloat16"), dict(save_every=10),
               dict(base_data_path="/elsewhere"), dict(weight_decay=0.9),
               # kernel/fusion knobs are implemented, group-matched options
               dict(use_pallas=True), dict(pallas_mask_mode="input"),
               dict(pallas_interpret=True), dict(epoch_chunk=5)):
        assert group_sweep.group_key(dict(base, **kw)) \
            != group_sweep.group_key(dict(base)), kw
    # unimplemented options -> ungroupable, never silently ignored
    for kw in (dict(ema_decay=0.99), dict(remat=True)):
        assert group_sweep.group_key(dict(base, **kw)) is None, kw


def test_grouped_epoch_chunk_matches_per_epoch(tiny_dataset, tmp_path):
    """epoch_chunk=N on grouped entries runs N epochs (+ evals) as ONE
    device program with numerics identical to the per-epoch grouped loop
    (same perms/keys/weights) and the same checkpoint cadence."""
    import pandas as pd

    def mk(smp, **kw):
        return [_param(seed=s, epochs=5, weight_decay=0.9,
                       saved_models_path=smp, base_data_path=tiny_dataset,
                       **kw) for s in (398, 399)]

    smp_c = str(tmp_path / "chunked") + os.sep
    smp_p = str(tmp_path / "perepoch") + os.sep
    assert sweeps.parallel_training(params=mk(smp_c, epoch_chunk=3),
                                    vmap_groups=True) == [0, 0]
    assert sweeps.parallel_training(params=mk(smp_p),
                                    vmap_groups=True) == [0, 0]
    for mid in (1, 2):
        dc = pd.read_csv(os.path.join(smp_c, f"id-{mid}",
                                      f"metric_id-{mid}.csv"), index_col=0)
        dp = pd.read_csv(os.path.join(smp_p, f"id-{mid}",
                                      f"metric_id-{mid}.csv"), index_col=0)
        assert dc["epoch"].tolist() == dp["epoch"].tolist() == list(
            range(1, 6))
        for col in ("train_loss", "eval_loss", "evaluation_mean_diff"):
            np.testing.assert_array_equal(dc[col].values, dp[col].values,
                                          err_msg=(mid, col))
        for slot in ("last_checkpoint", "best_checkpoint"):
            assert os.path.exists(os.path.join(
                smp_c, f"id-{mid}", slot, "checkpt.msgpack")), (mid, slot)


def test_ragged_tail_matches_sequential(tiny_dataset, tmp_path):
    """batch_size that does not divide n_train: the grouped path must
    train the tail batch exactly like the solo trainer (one extra vmapped
    program, same fold_in key stream), not drop it."""
    import pandas as pd

    def mk(smp):
        # 60 paths, test 0.2 -> n_train=48; batch 9 -> 5 full + tail of 3
        return [_param(seed=s, batch_size=9, saved_models_path=smp,
                       base_data_path=tiny_dataset) for s in (398, 399)]

    smp_g = str(tmp_path / "grouped_tail") + os.sep
    smp_s = str(tmp_path / "solo_tail") + os.sep
    assert sweeps.parallel_training(params=mk(smp_g),
                                    vmap_groups=True) == [0, 0]
    assert sweeps.parallel_training(params=mk(smp_s)) == [0, 0]
    for mid in (1, 2):
        dg = pd.read_csv(os.path.join(smp_g, f"id-{mid}",
                                      f"metric_id-{mid}.csv"), index_col=0)
        ds = pd.read_csv(os.path.join(smp_s, f"id-{mid}",
                                      f"metric_id-{mid}.csv"), index_col=0)
        # train_loss is the LAST batch's loss = the tail batch's
        for col in ("train_loss", "eval_loss", "evaluation_mean_diff"):
            np.testing.assert_allclose(dg[col].values, ds[col].values,
                                       rtol=2e-3, atol=1e-6,
                                       err_msg=(mid, col))


def test_grouped_kernel_matches_grouped_xla(tiny_dataset, tmp_path):
    """use_pallas=True routes the grouped training loss through the fused
    kernel (vmap lifts the ensemble axis into the kernel grid). In
    'input' mask mode the member losses are bit-identical to the XLA
    path's, so the whole training trajectory must match the default
    grouped run member-for-member (interpret mode on CPU)."""
    import pandas as pd

    def mk(smp, **kw):
        return [_param(seed=s, saved_models_path=smp,
                       base_data_path=tiny_dataset, **kw)
                for s in (398, 399)]

    kern = dict(use_pallas=True, pallas_mask_mode="input",
                pallas_interpret=True)
    groups, singles = group_sweep.plan_groups(mk("unused", **kern))
    assert groups == [[0, 1]] and singles == []

    smp_k = str(tmp_path / "kernel") + os.sep
    smp_x = str(tmp_path / "xla") + os.sep
    assert sweeps.parallel_training(params=mk(smp_k, **kern),
                                    vmap_groups=True) == [0, 0]
    assert sweeps.parallel_training(params=mk(smp_x),
                                    vmap_groups=True) == [0, 0]
    for mid in (1, 2):
        dk = pd.read_csv(os.path.join(smp_k, f"id-{mid}",
                                      f"metric_id-{mid}.csv"), index_col=0)
        dx = pd.read_csv(os.path.join(smp_x, f"id-{mid}",
                                      f"metric_id-{mid}.csv"), index_col=0)
        np.testing.assert_array_equal(dk["optimal_eval_loss"].values,
                                      dx["optimal_eval_loss"].values)
        for col in ("train_loss", "eval_loss", "evaluation_mean_diff"):
            np.testing.assert_allclose(dk[col].values, dx[col].values,
                                       rtol=1e-4, atol=1e-7,
                                       err_msg=(mid, col))


def test_group_mesh_matches_single_device(tiny_dataset, tmp_path):
    """group_mesh shards the ENSEMBLE axis over a 1-D mesh (the TPU-native
    form of the reference's multi-worker sweep dispatch,
    parallel_train.py:214). E=3 on an 8-device mesh exercises the
    ghost-member padding; per-member numerics must match the single-device
    grouped run, and ghosts must leave no artifacts."""
    import pandas as pd
    from njode_tpu.parallel import sharding

    def mk(smp):
        return [_param(seed=s, saved_models_path=smp,
                       base_data_path=tiny_dataset)
                for s in (398, 399, 400)]

    smp_m = str(tmp_path / "mesh") + os.sep
    smp_1 = str(tmp_path / "single") + os.sep
    mesh = sharding.make_mesh(8)
    assert sweeps.parallel_training(params=mk(smp_m), vmap_groups=True,
                                    group_mesh=mesh) == [0, 0, 0]
    assert sweeps.parallel_training(params=mk(smp_1),
                                    vmap_groups=True) == [0, 0, 0]
    for mid in (1, 2, 3):
        dm = pd.read_csv(os.path.join(smp_m, f"id-{mid}",
                                      f"metric_id-{mid}.csv"), index_col=0)
        d1 = pd.read_csv(os.path.join(smp_1, f"id-{mid}",
                                      f"metric_id-{mid}.csv"), index_col=0)
        np.testing.assert_array_equal(dm["optimal_eval_loss"].values,
                                      d1["optimal_eval_loss"].values)
        # same math on different local shapes (E/N-member shards vs one
        # 3-member vmap) -> reassociation-tight, not bitwise
        for col in ("train_loss", "eval_loss", "evaluation_mean_diff"):
            np.testing.assert_allclose(dm[col].values, d1[col].values,
                                       rtol=2e-5, atol=1e-7,
                                       err_msg=(mid, col))
        for slot in ("last_checkpoint", "best_checkpoint"):
            assert os.path.exists(os.path.join(
                smp_m, f"id-{mid}", slot, "checkpt.msgpack")), (mid, slot)
    # ghost members (padding to the mesh multiple) write nothing
    assert not os.path.exists(os.path.join(smp_m, "id-4"))


def test_group_mesh_composes_with_kernel_and_epoch_chunk(tiny_dataset,
                                                         tmp_path):
    """The ensemble-sharded grouped path composes with the fused kernel
    (interpret mode, bit-stable 'input' masks) AND epoch_chunk (the
    train_epochs device program): a 2-member group on a 4-device mesh
    (ghost-padded to 4) must reproduce the single-device run."""
    import pandas as pd
    from njode_tpu.parallel import sharding

    kw = dict(use_pallas=True, pallas_mask_mode="input",
              pallas_interpret=True, epoch_chunk=2, epochs=4,
              weight_decay=0.9)

    def mk(smp):
        return [_param(seed=s, saved_models_path=smp,
                       base_data_path=tiny_dataset, **kw)
                for s in (398, 399)]

    smp_m = str(tmp_path / "mesh_k") + os.sep
    smp_1 = str(tmp_path / "single_k") + os.sep
    mesh = sharding.make_mesh(4)
    assert sweeps.parallel_training(params=mk(smp_m), vmap_groups=True,
                                    group_mesh=mesh) == [0, 0]
    assert sweeps.parallel_training(params=mk(smp_1),
                                    vmap_groups=True) == [0, 0]
    for mid in (1, 2):
        dm = pd.read_csv(os.path.join(smp_m, f"id-{mid}",
                                      f"metric_id-{mid}.csv"), index_col=0)
        d1 = pd.read_csv(os.path.join(smp_1, f"id-{mid}",
                                      f"metric_id-{mid}.csv"), index_col=0)
        assert dm["epoch"].tolist() == d1["epoch"].tolist() == [1, 2, 3, 4]
        for col in ("train_loss", "eval_loss", "evaluation_mean_diff"):
            np.testing.assert_allclose(dm[col].values, d1[col].values,
                                       rtol=2e-5, atol=1e-7,
                                       err_msg=(mid, col))
    assert not os.path.exists(os.path.join(smp_m, "id-3"))


def test_repeat_seed_members_group_and_match_sequential(tiny_dataset,
                                                        tmp_path):
    """configs._expand_repeats-style entries (same seed, distinct
    'repeat_seed') must vmap-group together, reproduce their sequential
    counterparts, and actually differ from each other."""
    import pandas as pd

    def mk(smp):
        return [
            _param(seed=398, saved_models_path=smp,
                   base_data_path=tiny_dataset),
            _param(seed=398, repeat_seed=1, saved_models_path=smp,
                   base_data_path=tiny_dataset),
        ]

    groups, singles = group_sweep.plan_groups(mk("unused"))
    assert groups == [[0, 1]] and singles == []

    smp_g = str(tmp_path / "grouped_rs") + os.sep
    smp_s = str(tmp_path / "solo_rs") + os.sep
    assert sweeps.parallel_training(params=mk(smp_g),
                                    vmap_groups=True) == [0, 0]
    assert sweeps.parallel_training(params=mk(smp_s)) == [0, 0]

    frames = {}
    for smp in (smp_g, smp_s):
        for mid in (1, 2):
            frames[(smp, mid)] = pd.read_csv(
                os.path.join(smp, f"id-{mid}", f"metric_id-{mid}.csv"),
                index_col=0)
    for mid in (1, 2):
        for col in ("train_loss", "eval_loss", "evaluation_mean_diff"):
            np.testing.assert_allclose(
                frames[(smp_g, mid)][col].values,
                frames[(smp_s, mid)][col].values,
                rtol=2e-3, atol=1e-6, err_msg=(mid, col))
    # the repeats genuinely differ (same split, different streams)
    assert not np.array_equal(frames[(smp_g, 1)]["train_loss"].values,
                              frames[(smp_g, 2)]["train_loss"].values)
    np.testing.assert_array_equal(
        frames[(smp_g, 1)]["optimal_eval_loss"].values,
        frames[(smp_g, 2)]["optimal_eval_loss"].values)


def test_grouped_orbax_backend(tiny_dataset, tmp_path, capsys):
    """use_orbax/orbax_async on grouped entries selects the orbax
    checkpoint backend (checkpoints.make_saver) for the per-member
    last/best slots, loadable through the standard loader."""
    import jax
    from njode_tpu.models import njode
    from njode_tpu.training import checkpoints
    from njode_tpu.training.steps import make_optimizer

    smp = str(tmp_path / "orbax_grp") + os.sep
    ps = [_param(seed=s, saved_models_path=smp, base_data_path=tiny_dataset,
                 use_orbax=True, orbax_async=True) for s in (398, 399)]
    assert sweeps.parallel_training(params=ps, vmap_groups=True) == [0, 0]
    assert "vmap group: 2 members" in capsys.readouterr().out
    for mid in (1, 2):
        slot = os.path.join(smp, f"id-{mid}", "last_checkpoint")
        assert os.path.isdir(os.path.join(slot, "orbax")), mid
        assert os.path.exists(os.path.join(slot, "checkpt_meta.json")), mid
    cfg = njode.NJODEConfig(1, 8, 1, NN, NN, NN, dropout_rate=0.1)
    params = njode.init_params(jax.random.PRNGKey(0), cfg)
    opt_state = make_optimizer(0.01).init(params)
    p, o, epoch, weight = checkpoints.load_checkpoint(
        os.path.join(smp, "id-1", "last_checkpoint"), params, opt_state)
    assert epoch == 2 and 0.0 < weight <= 1.0
