"""Synthetic-dataset training — the central trainer.

Capability parity with ``train.train`` (``/root/reference/NJODE/train.py:85-645``):
dataset resolution, train/val split, optimal-loss oracle, model registry with
resume-by-id, Adam(+5e-4 L2), epoch loop with per-batch ``n_obs_ot``
recomputation, full-val-batch eval (+ optional oracle mean-squared-diff),
last/best checkpointing on the same cadence, metric CSV with the same schema,
loss-weight decay per epoch, plot-only demo mode, and ``func_appl_X`` moment
learning.

TPU-native execution: the dataset is resident on device; each step is a
jitted gather+scan+update (see training/steps.py), optionally sharded over a
device mesh for data parallelism. Deliberate deviations from the reference
are documented inline (batch shuffling uses a seeded per-epoch RNG instead of
torch's unseeded DataLoader; ``training_size`` subsampling is seeded)."""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from njode_tpu.data import datasets as du
from njode_tpu.data import oracle, sde
from njode_tpu.data.grid import batch_from_paths, recompute_n_obs
from njode_tpu.models import njode
from njode_tpu.models.mlp import count_params
from njode_tpu.parallel import multihost
from njode_tpu.training import checkpoints, registry  # noqa: F401
from njode_tpu.training.plots import plot_one_path_with_pred
from njode_tpu.training.steps import make_optimizer, make_step_fns
from njode_tpu.utils import paths as path_cfg
from njode_tpu.utils.paths import makedirs

METR_COLUMNS = ["epoch", "train_time", "eval_time", "train_loss", "eval_loss",
                "optimal_eval_loss"]
default_ode_nn = ((50, "tanh"), (50, "tanh"))
default_readout_nn = ((50, "tanh"), (50, "tanh"))
default_enc_nn = ((50, "tanh"), (50, "tanh"))


def _train_val_split(nb_paths, test_size, seed):
    """Same split as sklearn ``train_test_split(random_state=seed)``
    (``train.py:232-235``) — we call sklearn directly for index parity."""
    from sklearn.model_selection import train_test_split
    return train_test_split(np.arange(nb_paths), test_size=test_size,
                            random_state=seed)


def train(
        model_id=None, epochs=100, batch_size=100, save_every=1,
        learning_rate=0.001, test_size=0.2, seed=398,
        hidden_size=10, bias=True, dropout_rate=0.1,
        ode_nn=default_ode_nn, readout_nn=default_readout_nn,
        enc_nn=default_enc_nn, use_rnn=False,
        solver="euler", weight=0.5, weight_decay=1.0,
        dataset="BlackScholes", dataset_id=None, plot=True,
        paths_to_plot=(0,),
        saved_models_path=None,
        **options,
):
    """Train an NJODE (or baseline) model on a synthetic dataset.

    Accepts the reference's full option surface (``train.py:134-197``); see
    module docstring. Extra TPU options:
        'mesh'        a jax.sharding.Mesh for data-parallel training
        'base_data_path'  override the training-data directory
        'ema_decay'   float in (0,1): maintain an epoch-level exponential
                      moving average of the parameters (Polyak-style tail
                      averaging; avg <- d*avg + (1-d)*params after each
                      epoch) and additionally evaluate it — metric CSV
                      gains 'eval_loss_ema' (+ 'evaluation_mean_diff_ema'
                      with 'evaluate'). Isolates SGD/dropout noise from
                      the achievable accuracy floor (round-3 accuracy
                      campaign; the reference has no averaging).
    :return: 0 (reference convention)
    """
    saved_models_path = saved_models_path or path_cfg.saved_models_path
    base_data_path = options.get("base_data_path")
    # live runtime object: keep out of the registry description
    mesh = options.pop("mesh", None)
    # 'repeat_seed': repeated sweep entries must differ the way the
    # reference's do (its model init / DataLoader shuffle are unseeded,
    # train.py:203 seeds only under anomaly detection, so `params_list * 5`
    # repeats get independent draws, parallel_train.py:338). rseed offsets
    # the init/shuffle/dropout/subsample streams while the train/val split
    # stays pinned to `seed` (the reference's split IS seeded,
    # train.py:234). repeat_seed=0 is byte-identical to the historical
    # stream.
    rseed = seed + 7_654_321 * int(options.get("repeat_seed", 0) or 0)
    initial_print = f"model-id: {model_id}\n"

    # ------- dataset metadata & split (train.py:221-246) -------
    dataset_id = int(du._get_time_id(dataset, dataset_id, base_data_path))
    metadata = du.load_metadata(dataset, dataset_id, base_data_path)
    input_size = metadata["dimension"]
    output_size = input_size
    T = metadata["maturity"]
    delta_t = metadata["dt"]

    train_idx, val_idx = _train_val_split(metadata["nb_paths"], test_size,
                                          seed)
    if "training_size" in options:
        train_set_size = options["training_size"]
        if train_set_size < len(train_idx):
            # deviation: seeded for reproducibility (reference uses the
            # global unseeded np.random here, train.py:240-242)
            train_idx = np.random.RandomState(rseed).choice(
                train_idx, train_set_size, replace=False)

    data_train = du.PathDataset(dataset, dataset_id, train_idx,
                                base_data_path)
    data_val = du.PathDataset(dataset, dataset_id, val_idx, base_data_path)

    # ------- func_appl_X moment features (train.py:249-257) -------
    functions, mult = du.resolve_functions(options.get("func_appl_X"))
    if not functions:
        functions = None
    input_size = input_size * mult
    output_size = output_size * mult

    plot_variance = False
    std_factor = 1
    if functions is not None and mult > 1:
        plot_variance = options.get("plot_variance", False)
        std_factor = options.get("std_factor", 1)
    ylabels = options.get("ylabels")

    # ------- oracle & optimal eval loss (train.py:278-287) -------
    stockmodel = sde.make_model(metadata["model_name"], metadata)
    next_cond_exp = stockmodel.next_cond_exp
    val_paths_np, val_obs_np = data_val.dense_arrays(functions)
    val_batch = recompute_n_obs(batch_from_paths(
        data_val.stock_paths, data_val.observed_dates, delta_t,
        functions=functions))
    # note: like the reference (train.py:279 TODO), the oracle treats
    # func-applied dims with the same scalar cond-exp formula
    val_batch_j = jax.tree.map(jnp.asarray, val_batch)
    opt_eval_loss = float(oracle.optimal_loss(next_cond_exp, val_batch_j,
                                              weight=0.5))
    initial_print += ("\noptimal eval loss (achieved by true cond exp): "
                      f"{opt_eval_loss:.5f}")
    if "other_model" in options:
        opt_eval_loss = np.nan

    # ------- registry / resume (train.py:289-334) -------
    params_dict = {
        "input_size": input_size, "epochs": epochs,
        "hidden_size": hidden_size, "output_size": output_size, "bias": bias,
        "ode_nn": ode_nn, "readout_nn": readout_nn, "enc_nn": enc_nn,
        "use_rnn": use_rnn,
        "dropout_rate": dropout_rate, "batch_size": batch_size,
        "solver": solver, "dataset": dataset, "dataset_id": dataset_id,
        "learning_rate": learning_rate, "test_size": test_size, "seed": seed,
        "weight": weight, "weight_decay": weight_decay,
        "optimal_eval_loss": opt_eval_loss, "options": options}
    desc = json.dumps(params_dict, sort_keys=True, default=str)

    resume_training = False
    if not options.get("parallel", False):
        # multi-host safe: coordinator touches the registry CSV, all
        # hosts agree on (id, resume); plain local call single-process
        model_id, desc, saved_params, resume_training = \
            multihost.resolve_model_id_synced(saved_models_path, model_id,
                                              desc)
        if resume_training:
            initial_print += "\nmodel_id already exists -> resume training"
            params_dict = saved_params
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
    model_metric_file = os.path.join(model_path,
                                     f"metric_id-{model_id}.csv")
    # orbax backend (optionally async) behind the option surface;
    # checkpoint writes happen once (coordinator) in a multi-host run
    _save_backend = checkpoints.make_saver(options)

    def save_ckpt(*a):
        multihost.coordinator_only(_save_backend, *a)
    plot_save_path = os.path.join(model_path, "plots")
    save_extras = options.get("save_extras", {})

    # ------- model & optimizer (train.py:350-398) -------
    opts = params_dict.get("options", options)
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
            which_loss=opts.get("which_loss", "standard"),
            residual_enc_dec=opts.get("residual_enc_dec", True),
            input_current_t=opts.get("input_current_t", False),
            masked=opts.get("masked", False),
            compute_dtype=opts.get("compute_dtype", "float32"))
        params = njode.init_params(jax.random.PRNGKey(rseed), cfg)
        model_name = "NJODE"
    elif options["other_model"] == "GRU_ODE_Bayes":
        from njode_tpu.models import gru_ode_bayes as gob
        cfg = gob.config_from_options(params_dict, options)
        params = gob.init_params(jax.random.PRNGKey(rseed), cfg)
        model_name = "GRU-ODE-Bayes"
    else:
        raise ValueError(
            "Invalid argument for (option) parameter 'other_model'.")

    optimizer = make_optimizer(params_dict["learning_rate"])
    opt_state = optimizer.init(params)

    # ------- step functions (jitted; optionally sharded) -------
    K = data_train.stock_paths.shape[2] - 1
    times = (np.arange(1, K + 1) * delta_t).astype(np.float32)
    dts = np.full(K, delta_t, dtype=np.float32)
    if model_name == "NJODE":
        # fused Pallas training kernel: auto-on for supported configs on
        # TPU; composes with a data-parallel mesh via shard_map (the
        # kernel runs per-shard, grads psum'd — steps.make_step_fns)
        from njode_tpu.ops import fused_scan
        use_pallas = opts.get(
            "use_pallas",
            jax.default_backend() == "tpu" and fused_scan.supported(cfg))
        fns = make_step_fns(cfg, optimizer, times, dts, next_cond_exp,
                            use_pallas=use_pallas, mesh=mesh,
                            pallas_mask_mode=opts.get("pallas_mask_mode",
                                                      "prng"),
                            pallas_interpret=opts.get("pallas_interpret",
                                                      False),
                            remat=opts.get("remat", False))
    else:
        from njode_tpu.models import gru_ode_bayes as gob
        from njode_tpu.ops import fused_gob
        use_pallas = opts.get(
            "use_pallas",
            jax.default_backend() == "tpu" and fused_gob.supported(cfg))
        fns = gob.make_step_fns(cfg, optimizer, times, dts, next_cond_exp,
                                use_pallas=use_pallas, mesh=mesh)

    data_sharding = None
    if mesh is not None:
        if batch_size % mesh.devices.size != 0:
            raise ValueError(
                f"batch_size={batch_size} must be divisible by the mesh "
                f"size {mesh.devices.size} for data-parallel training")
        from jax.sharding import NamedSharding, PartitionSpec as P
        replicated = NamedSharding(mesh, P())
        data_sharding = NamedSharding(mesh, P("data"))
        params = jax.device_put(params, replicated)
        opt_state = jax.device_put(opt_state, replicated)

    # device-resident dataset
    train_paths_np, train_obs_np = data_train.dense_arrays(functions)
    d_train_paths = jnp.asarray(train_paths_np)
    d_train_obs = jnp.asarray(train_obs_np)
    d_val_paths = jnp.asarray(val_paths_np)
    d_val_obs = jnp.asarray(val_obs_np)
    n_train = len(data_train)
    val_idx_all = np.arange(len(data_val), dtype=np.int32)

    # ------- resume from checkpoint (train.py:400-427) -------
    import pandas as pd
    best_eval_loss = np.inf
    ema_decay = options.get("ema_decay")
    metr_columns = list(METR_COLUMNS)
    if options.get("evaluate"):
        metr_columns.append("evaluation_mean_diff")
    if ema_decay:
        metr_columns.append("eval_loss_ema")
        if options.get("evaluate"):
            metr_columns.append("evaluation_mean_diff_ema")
    epoch = 1
    cur_weight = float(params_dict["weight"])
    w_decay = float(params_dict["weight_decay"])
    if resume_training:
        initial_print += "\nload saved model ..."
        try:
            which = (model_path_save_best if options.get("load_best")
                     else model_path_save_last)
            params, opt_state, epoch, cur_weight = checkpoints.load_checkpoint(
                which, params, opt_state)
            df_metric = pd.read_csv(model_metric_file, index_col=0)
            best_eval_loss = np.min(df_metric["eval_loss"].values)
            epoch += 1
            cur_weight = njode.weight_decay_step(cur_weight, w_decay)
            initial_print += f"\nepoch: {epoch}, weight: {cur_weight}"
        except Exception as e:
            initial_print += "\nloading model failed -> initiate new model"
            initial_print += f"\nException:\n{e}"
            resume_training = False
    if not resume_training:
        initial_print += "\ninitiate new model ..."
        df_metric = pd.DataFrame(columns=metr_columns)

    def _plot(filename_tpl, weight_for_opt, plot_params=None):
        pred = fns["pred_path"](plot_params if plot_params is not None
                                else params,
                                d_val_paths, d_val_obs, val_idx_all)
        y_pre, y_post = oracle.cond_exp_paths(next_cond_exp, val_batch_j)
        true_t = np.concatenate([[0.0], np.asarray(val_batch.times)])
        true_y = np.concatenate([val_batch.start_X[None],
                                 np.asarray(y_post)], axis=0)
        plot_one_path_with_pred(
            None, np.asarray(pred["pred_t"]), np.asarray(pred["pred"]),
            true_t, true_y, data_val.stock_paths, data_val.observed_dates,
            delta_t, T, path_to_plot=paths_to_plot, save_path=plot_save_path,
            filename=filename_tpl, plot_variance=plot_variance,
            functions=options.get("func_appl_X"), std_factor=std_factor,
            model_name=model_name, ylabels=ylabels, save_extras=save_extras)
        return float(oracle.optimal_loss(next_cond_exp, val_batch_j,
                                         weight=weight_for_opt))

    # ------- plot-only demo mode (train.py:429-459) -------
    plot_fmt = options.get("plot_save_format", "pdf")
    if options.get("plot_only"):
        epoch -= 1
        initial_print += "\nplotting ..."
        curr_opt = _plot(f"demo-plot_epoch-{epoch}" + "_path-{}." + plot_fmt,
                         cur_weight)
        initial_print += (f"\noptimal eval-loss (with current weight="
                          f"{cur_weight:.5f}): {curr_opt:.5f}")
        print(initial_print)
        return 0

    # ------- training loop (train.py:461-624) -------
    if epoch <= epochs:
        initial_print += "\n\nmodel overview:"
        print(initial_print)
        print(f"# parameters={count_params(params)}\n")
        print("start training ...")
    metric_app = []
    base_key = jax.random.PRNGKey(rseed + 1)

    # aux subsystems (SURVEY §5): anomaly detection + profiler capture
    if options.get("anomaly_detection"):
        from njode_tpu.utils.profiling import enable_anomaly_detection
        enable_anomaly_detection()
    profile_dir = options.get("profile_dir")
    profiled = False

    use_epoch_scan = ("train_epoch" in fns and data_sharding is None
                      and not options.get("no_epoch_fusion", False))
    # 'epoch_chunk' = N: run N epochs (+ their evals) as ONE device
    # program (steps.train_epochs) — removes the per-epoch dispatch round
    # trip (~26 ms over the remote tunnel, ~30% of a demo-parity epoch).
    # Per-epoch metric rows, best/last checkpoints and plot cadence are
    # preserved exactly via the in-program eval and the params/opt
    # history; numerics identical to the per-epoch loop (same perms,
    # weights, rng streams — tested).
    epoch_chunk = int(options.get("epoch_chunk", 0) or 0)
    if epoch_chunk > 1:
        # the chunked program returns the per-epoch params+opt history
        # (3x model state per epoch with Adam), so HBM grows linearly
        # with the chunk: cap it to a history budget instead of OOMing
        state_bytes = 3 * sum(x.size * x.dtype.itemsize
                              for x in jax.tree.leaves(params))
        hist_budget = int(options.get("epoch_chunk_hist_bytes", 2 << 30))
        max_chunk = hist_budget // max(state_bytes, 1)
        if max_chunk < 2:
            print(f"epoch_chunk disabled: model state "
                  f"({state_bytes >> 20} MiB x chunk) exceeds the "
                  f"history budget ({hist_budget >> 20} MiB; raise with "
                  "the 'epoch_chunk_hist_bytes' option); using per-epoch "
                  "dispatch")
            epoch_chunk = -1  # sentinel: already explained
        elif epoch_chunk > max_chunk:
            print(f"epoch_chunk: capping {epoch_chunk} -> {max_chunk} "
                  f"(per-epoch history = {state_bytes >> 20} MiB/epoch, "
                  f"budget {hist_budget >> 20} MiB; raise with the "
                  "'epoch_chunk_hist_bytes' option)")
            epoch_chunk = max_chunk
    use_chunked = (epoch_chunk > 1 and use_epoch_scan and not ema_decay
                   and "train_epochs" in fns
                   and n_train % batch_size == 0)
    if epoch_chunk > 1 and not use_chunked:
        # never silently drop an explicitly requested fusion level —
        # the ~30% dispatch saving is the feature's whole point
        why = ("ema_decay" if ema_decay else
               "sharded data" if not use_epoch_scan else
               "ragged last batch (training size not divisible by "
               "batch_size)" if n_train % batch_size else
               "unsupported model")
        print(f"epoch_chunk disabled ({why}); using per-epoch dispatch")
    # copy, not alias: the jitted epoch fns DONATE params, which would
    # delete the buffers backing an aliased average
    ema_params = (jax.tree.map(jnp.array, params) if ema_decay else None)
    _ema_update = (jax.jit(lambda a, p: jax.tree.map(
        lambda x, y: ema_decay * x + (1.0 - ema_decay) * y, a, p))
        if ema_decay else None)

    def _flush_metrics():
        nonlocal df_metric, metric_app
        df_app = pd.DataFrame(data=metric_app, columns=metr_columns)
        df_metric = pd.concat([df_metric, df_app], ignore_index=True)
        multihost.coordinator_only(df_metric.to_csv, model_metric_file)
        metric_app = []

    while epoch <= epochs:
        if use_chunked:
            n_ep = min(epoch_chunk, epochs - epoch + 1)
            t0 = time.time()
            # per-epoch streams identical to the per-epoch loop below
            idx_mats = np.stack([
                np.random.RandomState(
                    (rseed * 100_003 + (epoch + j)) % 2**32).permutation(
                    n_train).astype(np.int32).reshape(-1, batch_size)
                for j in range(n_ep)])
            ws, w = [], cur_weight
            for j in range(n_ep):
                ws.append(w)
                w = njode.weight_decay_step(w, w_decay)
            rngs_c = jnp.stack([jax.random.fold_in(base_key, epoch + j)
                                for j in range(n_ep)])
            do_msd = bool(options.get("evaluate") and "eval_msd" in fns)
            params, opt_state, tl_c, ev_c, msd_c, p_hist, o_hist = \
                fns["train_epochs"](
                    params, opt_state, d_train_paths, d_train_obs,
                    jnp.asarray(idx_mats),
                    jnp.asarray(ws, jnp.float32), rngs_c,
                    d_val_paths, d_val_obs,
                    jnp.asarray(val_idx_all), do_msd)
            tl_c, ev_c, msd_c = (np.asarray(tl_c), np.asarray(ev_c),
                                 np.asarray(msd_c))
            per_ep = (time.time() - t0) / n_ep

            def _at(hist, j):
                return jax.tree.map(lambda x: x[j], hist)

            for j in range(n_ep):
                ep_j = epoch + j
                loss_val = float(ev_c[j])
                print(f"epoch {ep_j}, weight={ws[j]:.5f}, "
                      f"train-loss={float(tl_c[j]):.5f}, "
                      f"optimal-eval-loss={opt_eval_loss:.5f}, "
                      f"eval-loss={loss_val:.5f}, ")
                row = [ep_j, per_ep, 0.0, float(tl_c[j]), loss_val,
                       opt_eval_loss]
                if options.get("evaluate"):
                    row.append(float(msd_c[j]))
                    print("evaluation mean square difference="
                          f"{float(msd_c[j]):.5f}")
                metric_app.append(row)
                if ep_j % save_every == 0:
                    if plot:
                        print("plotting ...")
                        curr_opt = _plot(
                            f"epoch-{ep_j}" + "_path-{}." + plot_fmt,
                            ws[j], plot_params=_at(p_hist, j))
                        print(f"optimal eval-loss (with current weight="
                              f"{ws[j]:.5f}): {curr_opt:.5f}")
                    print("save model ...")
                    _flush_metrics()
                    save_ckpt(model_path_save_last, _at(p_hist, j),
                              _at(o_hist, j), ep_j, ws[j])
                    print("saved!")
                if loss_val < best_eval_loss:
                    print(f"save new best model: last-best-loss: "
                          f"{best_eval_loss:.5f}, new-best-loss: "
                          f"{loss_val:.5f}, epoch: {ep_j}")
                    _flush_metrics()
                    save_ckpt(model_path_save_last, _at(p_hist, j),
                              _at(o_hist, j), ep_j, ws[j])
                    save_ckpt(model_path_save_best, _at(p_hist, j),
                              _at(o_hist, j), ep_j, ws[j])
                    best_eval_loss = loss_val
                    print("saved!")
            epoch += n_ep
            cur_weight = w
            continue
        t0 = time.time()
        if profile_dir and not profiled:
            jax.profiler.start_trace(str(profile_dir))
        # deviation: seeded per-epoch shuffle (reference: unseeded DataLoader)
        perm = np.random.RandomState(
            (rseed * 100_003 + epoch) % 2**32).permutation(
            n_train).astype(np.int32)
        loss_val_last = None
        n_full = (n_train // batch_size) * batch_size
        if use_epoch_scan and n_full > 0:
            # all full batches in ONE device call (scan over batches)
            idx_mat = jnp.asarray(
                perm[:n_full].reshape(-1, batch_size))
            rng = jax.random.fold_in(base_key, epoch)
            params, opt_state, losses = fns["train_epoch"](
                params, opt_state, d_train_paths, d_train_obs, idx_mat,
                jnp.float32(cur_weight), rng)
            loss_val_last = losses[-1]
            tail = range(n_full, n_train, batch_size)
        else:
            tail = range(0, n_train, batch_size)
        for b0 in tail:
            idx = perm[b0:b0 + batch_size]
            if data_sharding is not None:
                if len(idx) % mesh.devices.size != 0:
                    continue  # drop ragged tail under sharding
                idx = jax.device_put(idx, data_sharding)
            rng = jax.random.fold_in(base_key, epoch * 100_000 + b0)
            params, opt_state, loss = fns["train_step"](
                params, opt_state, d_train_paths, d_train_obs, idx,
                jnp.float32(cur_weight), rng)
            loss_val_last = loss
        if profile_dir and not profiled:
            jax.block_until_ready(loss_val_last)
            jax.profiler.stop_trace()
            profiled = True
        train_loss = float(loss_val_last)
        if ema_decay:
            ema_params = _ema_update(ema_params, params)
        train_time = time.time() - t0

        # -------- evaluation (train.py:526-582) --------
        t0 = time.time()
        loss_val = float(fns["eval_loss"](params, d_val_paths, d_val_obs,
                                          val_idx_all,
                                          jnp.float32(cur_weight)))
        eval_msd = 0.0
        if options.get("evaluate") and "eval_msd" in fns:
            eval_msd = float(fns["eval_msd"](params, d_val_paths, d_val_obs,
                                             val_idx_all))
        if ema_decay:
            loss_val_ema = float(fns["eval_loss"](
                ema_params, d_val_paths, d_val_obs, val_idx_all,
                jnp.float32(cur_weight)))
            eval_msd_ema = 0.0
            if options.get("evaluate") and "eval_msd" in fns:
                eval_msd_ema = float(fns["eval_msd"](
                    ema_params, d_val_paths, d_val_obs, val_idx_all))
        eval_time = time.time() - t0
        print(f"epoch {epoch}, weight={cur_weight:.5f}, "
              f"train-loss={train_loss:.5f}, "
              f"optimal-eval-loss={opt_eval_loss:.5f}, "
              f"eval-loss={loss_val:.5f}, ")
        row = [epoch, train_time, eval_time, train_loss, loss_val,
               opt_eval_loss]
        if options.get("evaluate"):
            row.append(eval_msd)
            print(f"evaluation mean square difference={eval_msd:.5f}")
        if ema_decay:
            row.append(loss_val_ema)
            if options.get("evaluate"):
                row.append(eval_msd_ema)
                print(f"EMA eval-loss={loss_val_ema:.5f}, "
                      f"EMA mean square difference={eval_msd_ema:.5f}")
        metric_app.append(row)

        # -------- save cadence (train.py:584-621) --------
        if epoch % save_every == 0:
            if plot:
                print("plotting ...")
                curr_opt = _plot(f"epoch-{epoch}" + "_path-{}." + plot_fmt,
                                 cur_weight)
                print(f"optimal eval-loss (with current weight="
                      f"{cur_weight:.5f}): {curr_opt:.5f}")
            print("save model ...")
            _flush_metrics()
            save_ckpt(model_path_save_last, params, opt_state, epoch,
                      cur_weight)
            print("saved!")
        if loss_val < best_eval_loss:
            print(f"save new best model: last-best-loss: "
                  f"{best_eval_loss:.5f}, new-best-loss: {loss_val:.5f}, "
                  f"epoch: {epoch}")
            _flush_metrics()
            save_ckpt(model_path_save_last, params, opt_state, epoch,
                      cur_weight)
            save_ckpt(model_path_save_best, params, opt_state, epoch,
                      cur_weight)
            best_eval_loss = loss_val
            print("saved!")

        epoch += 1
        cur_weight = njode.weight_decay_step(cur_weight, w_decay)

    # conscious fix vs the reference: flush trailing metric rows at the end
    # (the reference drops rows collected since the last save, train.py:624)
    if metric_app:
        df_app = pd.DataFrame(data=metric_app, columns=metr_columns)
        df_metric = pd.concat([df_metric, df_app], ignore_index=True)
        multihost.coordinator_only(df_metric.to_csv, model_metric_file)

    checkpoints.wait_for_async_saves()
    return 0


def compute_optimal_eval_loss(val_batch, stockmodel, delta_t, T):
    """Optimal evaluation loss on a GridBatch (``train.py:648-670``)."""
    bj = jax.tree.map(jnp.asarray, val_batch)
    return float(oracle.optimal_loss(stockmodel.next_cond_exp, bj))
