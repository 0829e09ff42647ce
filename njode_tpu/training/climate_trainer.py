"""Climate (USHCN) training — masked NJODE / GRU-ODE-Bayes on sporadic data.

Capability parity with ``climate_train.train``
(``/root/reference/NJODE/climate_train.py:91-506``) and its
``evaluate_model`` (``:508-566``): forces ``masked=True``, loads the sporadic
CSV with 5-fold train/val/test index files, trains with ``start_X = 0`` and
per-batch ``n_obs_ot`` recomputation, logs
``[epoch, train_time, eval_time, train_loss, eval_loss, eval_metric,
test_loss, test_metric]``, keys the best checkpoint on ``eval_metric``
(masked MSE at held-out post-``T_val`` observation times, extracted from the
pre-jump prediction path), and supports ``other_model='GRU_ODE_Bayes'``.

TPU-native execution: batches are densified onto the union Euler grid with
static shapes (fixed ``max_steps``, padded batch rows) so all steps share one
compiled program; the forward is the scan model from models/njode.py.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from njode_tpu.data import climate as cdu
from njode_tpu.models import njode
from njode_tpu.models.mlp import count_params
from njode_tpu.parallel import multihost
from njode_tpu.training import checkpoints, registry  # noqa: F401 (registry: resume surface)
from njode_tpu.data.grid import nearest_grid_steps, sparse_from_events
from njode_tpu.training.steps import make_optimizer, make_sparse_step_fns
from njode_tpu.utils import paths as path_cfg
from njode_tpu.utils.paths import makedirs

METR_COLUMNS = ["epoch", "train_time", "eval_time", "train_loss", "eval_loss",
                "eval_metric", "test_loss", "test_metric"]
default_ode_nn = ((50, "tanh"), (50, "tanh"))
default_readout_nn = ((50, "tanh"), (50, "tanh"))
default_enc_nn = ((50, "tanh"), (50, "tanh"))


def _load_fold_idx(climate_dir, data_index):
    d = os.path.join(climate_dir, f"small_chunk_fold_idx_{data_index}")
    return tuple(
        np.load(os.path.join(d, f"{s}_idx.npy"), allow_pickle=True)
        for s in ("train", "val", "test"))


def _to_device(batch):
    return jax.tree.map(jnp.asarray, batch)


def train(
        model_id=None, epochs=100, batch_size=100, save_every=1,
        learning_rate=0.001,
        hidden_size=10, bias=True, dropout_rate=0.1,
        ode_nn=default_ode_nn, readout_nn=default_readout_nn,
        enc_nn=default_enc_nn, use_rnn=False,
        solver="euler", weight=0.5, weight_decay=1.0,
        data_index=0, dataset="climate",
        saved_models_path=None,
        **options,
):
    """Train on the climate dataset fold ``data_index`` (0..4).

    Option surface follows the reference (``climate_train.py:128-177``):
    'which_loss', 'residual_enc_dec', 'delta_t' (default 0.1), 'load_best',
    'parallel', 'resume_training', 'other_model' + 'GRU_ODE_Bayes-*'.
    Extra TPU options: 'climate_dir' (data directory holding the sporadic
    CSV + fold index dirs; default <training_data>/climate), 'csv_name',
    'mesh' (a jax.sharding.Mesh with a 'data' axis for data-parallel
    training — batch rows sharded, params replicated, gradient all-reduce
    over ICI; numerically equivalent to solo), 'prestack' (default True:
    device-resident pre-stacked training bank, batches built inside jit —
    climate.prestack_series; alignment-gated with automatic fallback to
    the per-epoch collate path, which 'prestack'=False forces).
    :return: 0
    """
    saved_models_path = saved_models_path or os.path.join(
        os.path.dirname(path_cfg.saved_models_path.rstrip("/")),
        "saved_models_climate")
    options["masked"] = True
    # the mesh is a live runtime object: keep it out of the serialized
    # registry description and survive the resume-time options reload
    mesh = options.pop("mesh", None)
    if mesh is not None and batch_size % mesh.devices.size != 0:
        raise ValueError(
            f"batch_size={batch_size} must be divisible by the mesh size "
            f"{mesh.devices.size} for data-parallel training")
    initial_print = f"model-id: {model_id}"

    # ------- data (climate_train.py:200-247) -------
    climate_dir = options.get("climate_dir") or os.path.join(
        path_cfg.training_data_path, "climate")
    csv_file = os.path.join(climate_dir,
                            options.get("csv_name",
                                        "small_chunked_sporadic.csv"))
    train_idx, val_idx, test_idx = _load_fold_idx(climate_dir, data_index)
    val_options = {"T_val": options.get("T_val", 150),
                   "max_val_samples": options.get("max_val_samples", 3)}

    # per-series covariate / label files (ODE_Dataset's cov_file /
    # label_file surface, data_utils_gru_ode_bayes.py:84-108) — names
    # resolve relative to climate_dir like csv_name; with the shipped
    # USHCN data these are absent and the dummy-zero path applies
    def _data_file(opt_name):
        f = options.get(opt_name)
        if f is None:
            return None
        return f if os.path.isabs(f) else os.path.join(climate_dir, f)

    cov_file = _data_file("cov_file")
    label_file = _data_file("label_file")
    ds_kw = dict(cov_file=cov_file, label_file=label_file)

    data_train = cdu.ClimateDataset(csv_file=csv_file, idx=train_idx,
                                    **ds_kw)
    data_val = cdu.ClimateDataset(csv_file=csv_file, idx=val_idx,
                                  validation=True, val_options=val_options,
                                  **ds_kw)
    data_test = cdu.ClimateDataset(csv_file=csv_file, idx=test_idx,
                                   validation=True, val_options=val_options,
                                   **ds_kw)

    input_size = data_train.variable_num
    output_size = input_size
    T = options.get("T", 200)
    delta_t = options.get("delta_t", 0.1)
    max_steps = max(data_train.max_grid_steps(delta_t, T),
                    data_val.max_grid_steps(delta_t, T),
                    data_test.max_grid_steps(delta_t, T))

    # ------- registry / resume (climate_train.py:258-297) -------
    params_dict = {
        "input_size": input_size, "epochs": epochs,
        "hidden_size": hidden_size, "output_size": output_size, "bias": bias,
        "ode_nn": ode_nn, "readout_nn": readout_nn, "enc_nn": enc_nn,
        "use_rnn": use_rnn,
        "dropout_rate": dropout_rate, "batch_size": batch_size,
        "solver": solver, "data_index": data_index,
        "learning_rate": learning_rate,
        "weight": weight, "weight_decay": weight_decay, "options": options}
    desc = json.dumps(params_dict, sort_keys=True, default=str)

    resume_training = False
    if not options.get("parallel", False):
        # multi-host safe: process 0 touches the registry CSV, every host
        # agrees on (id, resume); degrades to a plain local call solo
        model_id, desc, saved_params, resume_training = \
            multihost.resolve_model_id_synced(saved_models_path, model_id,
                                              desc)
        if resume_training:
            initial_print += "\nmodel_id already exists -> resume training"
            params_dict = saved_params
            options = params_dict["options"]
        else:
            initial_print += f"\nnew model_id={model_id}"
    initial_print += f"\nmodel params:\n{desc}"
    if options.get("resume_training", False):
        resume_training = True

    model_path = os.path.join(saved_models_path, f"id-{model_id}")
    model_path_save_last = os.path.join(model_path, "last_checkpoint")
    model_path_save_best = os.path.join(model_path, "best_checkpoint")
    makedirs(model_path_save_last)
    makedirs(model_path_save_best)
    model_metric_file = os.path.join(model_path, f"metric_id-{model_id}.csv")
    # orbax backend (optionally async) behind the option surface;
    # checkpoint writes happen once (coordinator) in a multi-host run
    _save_backend = checkpoints.make_saver(options)

    def save_ckpt(*a):
        multihost.coordinator_only(_save_backend, *a)

    # ------- model & optimizer (climate_train.py:309-359) -------
    seed = int(options.get("seed", 398))
    # 'repeat_seed': distinct init/shuffle/dropout streams for repeated
    # sweep entries (the fold split comes from the on-disk index files and
    # is unaffected) — see trainer.py for the rationale vs the reference's
    # unseeded repeats. repeat_seed=0 keeps the historical stream.
    seed += 7_654_321 * int(options.get("repeat_seed", 0) or 0)
    if "other_model" not in options:
        cfg = njode.NJODEConfig(
            input_size=params_dict["input_size"],
            hidden_size=params_dict["hidden_size"],
            output_size=params_dict["output_size"],
            ode_nn=params_dict["ode_nn"],
            readout_nn=params_dict["readout_nn"],
            enc_nn=params_dict["enc_nn"],
            use_rnn=params_dict["use_rnn"],
            bias=params_dict["bias"],
            dropout_rate=params_dict["dropout_rate"],
            solver=params_dict["solver"],
            which_loss=options.get("which_loss", "standard"),
            residual_enc_dec=options.get("residual_enc_dec", True),
            input_current_t=options.get("input_current_t", False),
            masked=True,
            compute_dtype=options.get("compute_dtype", "float32"))
        params = njode.init_params(jax.random.PRNGKey(seed), cfg)
        model_name = "NJ-ODE"
        optimizer = make_optimizer(params_dict["learning_rate"])
        # fused (chunked) Pallas training kernel: auto-on for supported
        # configs on TPU (9.9x at climate scale vs the remat XLA scan —
        # results/RESULTS.md); composes with a data-parallel mesh via
        # shard_map (steps.make_grid_step_fns); eval stays on the XLA scan
        from njode_tpu.ops import fused_scan
        use_pallas = options.get(
            "use_pallas",
            jax.default_backend() == "tpu" and fused_scan.supported(cfg))
        fns = make_sparse_step_fns(cfg, optimizer, mesh=mesh,
                                    remat=options.get("remat"),
                                    use_pallas=use_pallas,
                                    pallas_mask_mode=options.get(
                                        "pallas_mask_mode", "prng"),
                                    pallas_interpret=options.get(
                                        "pallas_interpret", False))
    elif options["other_model"] == "GRU_ODE_Bayes":
        from njode_tpu.models import gru_ode_bayes as gob
        from njode_tpu.ops import fused_gob
        if cov_file is not None:
            # real covariates ride as start_X -> covariates_map -> h0
            # (models_gru_ode_bayes.py:314-320); without a cov_file the
            # zero start_X reproduces the reference's dummy-zero cov path
            options = dict(options, cov_size=data_train.cov_dim)
        cfg = gob.config_from_options(params_dict, options)
        params = gob.init_params(jax.random.PRNGKey(seed), cfg)
        model_name = "GRU-ODE-Bayes"
        optimizer = make_optimizer(params_dict["learning_rate"])
        use_pallas = options.get(
            "use_pallas",
            jax.default_backend() == "tpu" and fused_gob.supported(cfg))
        fns = gob.make_sparse_step_fns(cfg, optimizer, mesh=mesh,
                                        remat=options.get("remat"),
                                        use_pallas=use_pallas)
    else:
        raise ValueError(
            "Invalid argument for (option) parameter 'other_model'.")
    opt_state = optimizer.init(params)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        params = jax.device_put(params, NamedSharding(mesh, P()))
        opt_state = jax.device_put(opt_state, NamedSharding(mesh, P()))

    # static event-count bound for train batches (one compile for all)
    max_events = data_train.max_batch_events(batch_size)

    # real covariates feed the GOB family's covariates_map (h0); the
    # NJODE branch keeps the reference's start_X = 0 (climate_train.py)
    use_cov = cov_file is not None and model_name == "GRU-ODE-Bayes"

    # precompute sparse val/test batches (full-split single batches; the
    # events are densified on device — see grid.SparseBatch)
    def _full_batch(ds):
        ev = ds.collate(np.arange(len(ds)))
        B = ev["batch_size"]
        # under a mesh, pad the full-split batch up to a multiple of the
        # mesh size; eval_scale undoes the changed 1/B loss normalization
        Bp = (B if mesh is None else
              int(-(-B // mesh.devices.size) * mesh.devices.size))
        sb = sparse_from_events(ev, delta_t, T, max_steps,
                                max_events=len(ev["obs_idx"]),
                                pad_batch_to=Bp,
                                cov=ev["cov"] if use_cov else None)
        return ev, _to_device(sb), Bp / B

    ev_val, b_val, scale_val = _full_batch(data_val)
    ev_test, b_test, scale_test = _full_batch(data_test)

    # ------- resume (climate_train.py:361-385) -------
    import pandas as pd
    best_eval_metric = np.inf
    epoch = 1
    cur_weight = float(params_dict["weight"])
    w_decay = float(params_dict["weight_decay"])
    if resume_training:
        initial_print += "\nload saved model ..."
        try:
            which = (model_path_save_best if options.get("load_best")
                     else model_path_save_last)
            params, opt_state, epoch, cur_weight = \
                checkpoints.load_checkpoint(which, params, opt_state)
            df_metric = pd.read_csv(model_metric_file, index_col=0)
            best_eval_metric = np.min(df_metric["eval_metric"].values)
            epoch += 1
            cur_weight = njode.weight_decay_step(cur_weight, w_decay)
        except Exception as e:
            initial_print += "\nloading model failed -> initiate new model"
            initial_print += f"\nException:\n{e}"
            resume_training = False
    if not resume_training:
        initial_print += "\ninitiate new model ..."
        df_metric = pd.DataFrame(columns=METR_COLUMNS)

    def _heldout_pairs(ev, sb):
        """Nearest-grid-step indices for the held-out observations
        (pre-jump convention; extract_from_path semantics)."""
        k = nearest_grid_steps(sb.times, ev["times_val"])
        return (jnp.asarray(k),
                jnp.asarray(np.asarray(ev["index_val"], np.int32)),
                jnp.asarray(ev["X_val"]), jnp.asarray(ev["M_val"]))

    def evaluate_model(b_dev, pairs, scale):
        """(loss, masked-MSE metric) on a held-out split
        (``evaluate_model``, ``climate_train.py:508-566``); ONE forward
        computes loss AND the prediction path, and the held-out extraction
        runs on device (the path never leaves the chip)."""
        loss, se, n = fns["eval_loss_and_heldout_mse"](
            params, b_dev, *pairs, jnp.float32(cur_weight),
            jnp.float32(scale))
        return float(loss), float(se) / max(float(n), 1.0)

    pairs_val = _heldout_pairs(ev_val, b_val)
    pairs_test = _heldout_pairs(ev_test, b_test)

    if epoch <= epochs:
        print(initial_print)
        print(f"# parameters={count_params(params)}\n")
        print("start training ...")

    n_train = len(data_train)
    metric_app = []
    base_key = jax.random.PRNGKey(seed + 1)

    # ------- pre-stacked device-resident training bank (round 3) -------
    # Same fix as the PhysioNet trainer: the fold's training events are
    # static across epochs, so pre-stack them ONCE (canonical grid,
    # alignment-gated — climate.prestack_series) and build every batch
    # inside jit; only the [n_batches, B] index matrix ships per epoch.
    pre = (cdu.prestack_series(data_train, delta_t, T, max_steps)
           if options.get("prestack", True) else None)
    if pre is not None:
        remat_opt = (True if options.get("remat") is None
                     else options.get("remat"))
        if model_name == "NJ-ODE":
            from njode_tpu.training.steps import make_prestacked_step_fns
            pre_fns = make_prestacked_step_fns(
                cfg, optimizer, pre["times"], pre["dt"], mesh=mesh,
                remat=remat_opt, use_pallas=use_pallas,
                pallas_mask_mode=options.get("pallas_mask_mode", "prng"),
                pallas_interpret=options.get("pallas_interpret", False))
        else:
            from njode_tpu.models import gru_ode_bayes as gob
            cov_bank = (np.concatenate(
                [pre["cov"], np.zeros((1, pre["cov"].shape[1]),
                                      np.float32)]) if use_cov else None)
            pre_fns = gob.make_prestacked_step_fns(
                cfg, optimizer, pre["times"], pre["dt"], mesh=mesh,
                remat=remat_opt, use_pallas=use_pallas,
                pallas_mask_mode=options.get("pallas_mask_mode", "prng"),
                cov_bank=cov_bank)
        Kp, Emax, Dp = (pre["times"].shape[0], pre["k"].shape[1],
                        pre["X"].shape[2])
        # sentinel series N: zero events — pads the last short batch
        d_k = jnp.asarray(np.concatenate(
            [pre["k"], np.full((1, Emax), Kp, np.int32)]))
        d_X = jnp.asarray(np.concatenate(
            [pre["X"], np.zeros((1, Emax, Dp), np.float32)]))
        d_M = jnp.asarray(np.concatenate(
            [pre["M"], np.zeros((1, Emax, Dp), np.float32)]))
        initial_print += "\nprestacked training bank: ON (device batches)"

    def _epoch_indices(ep):
        """Same per-batch rng/scale streams as the collate path below."""
        perm = np.random.RandomState(
            (seed * 100_003 + ep) % 2**32).permutation(n_train)
        idxs, rngs, scales = [], [], []
        for b0 in range(0, n_train, batch_size):
            idx = perm[b0:b0 + batch_size]
            scales.append(batch_size / len(idx))
            idxs.append(np.concatenate(
                [idx, np.full(batch_size - len(idx), n_train)]))
            rngs.append(jax.random.fold_in(base_key, ep * 100_000 + b0))
        return (np.stack(idxs).astype(np.int32), rngs, scales)

    def _collate_epoch(ep):
        perm = np.random.RandomState(
            (seed * 100_003 + ep) % 2**32).permutation(
            n_train)
        sbs, rngs, scales = [], [], []
        for b0 in range(0, n_train, batch_size):
            idx = perm[b0:b0 + batch_size]
            ev = data_train.collate(idx)
            sbs.append(sparse_from_events(ev, delta_t, T, max_steps,
                                          max_events=max_events,
                                          pad_batch_to=batch_size,
                                          cov=(ev["cov"] if use_cov
                                               else None)))
            scales.append(batch_size / len(idx))
            rngs.append(jax.random.fold_in(base_key, ep * 100_000 + b0))
        return sbs, rngs, scales

    pending = (None if (pre is not None or epoch > epochs)
               else _collate_epoch(epoch))
    while epoch <= epochs:
        t0 = time.time()
        if pre is not None:
            idx_mat, rngs, scales = _epoch_indices(epoch)
            params, opt_state, losses = pre_fns["train_epoch"](
                params, opt_state, d_k, d_X, d_M, jnp.asarray(idx_mat),
                jnp.float32(cur_weight), jnp.stack(rngs),
                jnp.asarray(scales, jnp.float32))
            loss_last = losses[-1]
        else:
            sbs, rngs, scales = pending
            if "train_epoch" in fns:
                # whole-epoch device program: one dispatch instead of one
                # per batch (the tunnel dispatch dominates at this scale);
                # same per-batch rngs/scales => identical to the loop
                stack = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)),
                                     *sbs)
                params, opt_state, losses = fns["train_epoch"](
                    params, opt_state, stack, jnp.float32(cur_weight),
                    jnp.stack(rngs), jnp.asarray(scales, jnp.float32))
                loss_last = losses[-1]
            else:
                loss_last = None
                for sb, rng, scale in zip(sbs, rngs, scales):
                    params, opt_state, loss_last = fns["train_step"](
                        params, opt_state, _to_device(sb),
                        jnp.float32(cur_weight), rng, jnp.float32(scale))
            # the dispatch above is asynchronous: collate NEXT epoch's
            # batches on the host while the device runs this one
            pending = _collate_epoch(epoch + 1) if epoch < epochs else None
        train_loss = float(loss_last)
        train_time = time.time() - t0

        t0 = time.time()
        loss_val, mse_val = evaluate_model(b_val, pairs_val, scale_val)
        eval_time = time.time() - t0
        print(f"epoch {epoch}, weight={cur_weight:.5f}, "
              f"train-loss={train_loss:.5f}, eval-loss={loss_val:.5f}, "
              f"eval-metric={mse_val:.5f}")

        if mse_val < best_eval_metric:
            print(f"save new best model: last-best-metric: "
                  f"{best_eval_metric:.5f}, new-best-metric: {mse_val:.5f}, "
                  f"epoch: {epoch}")
            save_ckpt(model_path_save_best, params, opt_state, epoch,
                      cur_weight)
            best_eval_metric = mse_val
        loss_test, mse_test = evaluate_model(b_test, pairs_test, scale_test)
        print(f"test-loss={loss_test:.5f}, test-metric={mse_test:.5f}")

        metric_app.append([epoch, train_time, eval_time, train_loss,
                           loss_val, mse_val, loss_test, mse_test])

        if epoch % save_every == 0:
            print("save model ...")
            df_app = pd.DataFrame(data=metric_app, columns=METR_COLUMNS)
            df_metric = pd.concat([df_metric, df_app], ignore_index=True)
            multihost.coordinator_only(df_metric.to_csv,
                                       model_metric_file)
            save_ckpt(model_path_save_last, params, opt_state, epoch,
                      cur_weight)
            metric_app = []
            print("saved!")

        epoch += 1
        cur_weight = njode.weight_decay_step(cur_weight, w_decay)

    # conscious fix vs the reference: flush trailing metric rows
    if metric_app:
        df_app = pd.DataFrame(data=metric_app, columns=METR_COLUMNS)
        df_metric = pd.concat([df_metric, df_app], ignore_index=True)
        multihost.coordinator_only(df_metric.to_csv, model_metric_file)

    checkpoints.wait_for_async_saves()
    return 0
