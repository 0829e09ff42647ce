"""Vmap-grouped climate training — the 5-fold cross-validation as ONE
on-chip ensemble.

The reference's climate study trains each (architecture, fold) entry as a
separate joblib job (``/root/reference/NJODE/parallel_train.py:428-515``,
``climate_train.py``). All five folds index into the SAME sporadic CSV, so
the TPU-native fan-out is a vmapped member ensemble over one shared
device-resident prestacked series bank (``climate.prestack_series`` over
ALL series + ``steps.prestacked_batch``): member m (a fold, or a
repeat-seed of a fold) gathers its own batch-index stream — fold positions
mapped to global bank rows — out of the same bank. Members may have
DIFFERENT train sizes (folds differ by a few series), so each member
carries its own per-batch loss scales with dead-batch suppression (scale 0
=> the parameter/optimizer update is an exact no-op), the grouped
counterpart of ``group_sweep``'s compile-sharing padding batches.

Member numerics replicate the solo climate trainer stream-for-stream
(``climate_trainer.py``): init ``PRNGKey(seed_eff)``, shuffle
``RandomState(seed_eff * 100_003 + epoch)`` over the FOLD's positions,
per-batch dropout keys ``fold_in(PRNGKey(seed_eff + 1), ep*100_000+b0)``.
With grid-aligned times (the USHCN file at delta_t=0.1) the global
canonical grid equals every fold's canonical grid AND every per-batch
union grid, so member trajectories match the solo prestacked trainer's;
off-grid times fall back to sequential solo runs. Evaluation (per-member
val AND test splits, built once exactly like the solo path) runs
``lax.map`` over members on stacked per-member SparseBatches padded to
common shapes (padding rows have zero events and the changed 1/B loss
normalization is undone per member — the same scheme the solo trainer
uses under a data mesh); held-out pairs pad with mask 0.

Artifacts are trainer-parity: per-member ``metric_id-<id>.csv`` (same
columns incl. test metrics), best checkpoint on ``eval_metric``,
``save_every`` cadence. Deviations (by design, like ``group_sweep``):
recorded times are the group wall time divided by E; per-epoch plots are
skipped. ``mesh`` (1-D) splits the ENSEMBLE axis via ``shard_map``
(ghost-padded, zero collectives) exactly like the other grouped paths.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from njode_tpu.data import climate as cdu
from njode_tpu.data.grid import densify_sparse, nearest_grid_steps, \
    sparse_from_events
from njode_tpu.models import njode
from njode_tpu.training import checkpoints, group_common
from njode_tpu.training.climate_trainer import METR_COLUMNS, \
    _load_fold_idx, default_enc_nn, default_ode_nn, default_readout_nn
from njode_tpu.training.steps import make_optimizer, prestacked_batch
from njode_tpu.utils import paths as path_cfg

_MATCH_KEYS = (
    ("epochs", 100), ("batch_size", 100), ("save_every", 1),
    ("learning_rate", 1e-3), ("hidden_size", 10), ("bias", True),
    ("dropout_rate", 0.1), ("ode_nn", default_ode_nn),
    ("readout_nn", default_readout_nn), ("enc_nn", default_enc_nn),
    ("use_rnn", False), ("solver", "euler"), ("weight", 0.5),
    ("weight_decay", 1.0), ("saved_models_path", None),
    ("T", 200), ("delta_t", 0.1), ("T_val", 150), ("max_val_samples", 3),
    ("climate_dir", None), ("csv_name", "small_chunked_sporadic.csv"),
    ("which_loss", "standard"), ("residual_enc_dec", True),
    ("input_current_t", False), ("compute_dtype", "float32"),
    ("remat", None), ("use_pallas", None), ("pallas_mask_mode", "prng"),
    ("pallas_interpret", False), ("use_orbax", False),
    ("orbax_async", False))
_VARY_KEYS = ("data_index", "seed", "repeat_seed", "model_id")
_INERT_KEYS = ("dataset", "parallel", "masked", "prestack",
               "resume_training", "load_best", "plot_only", "other_model")
_NN_KEYS = ("ode_nn", "readout_nn", "enc_nn")


def _norm_val(k, v):
    return group_common.norm_val(k, v, _NN_KEYS)


def group_key(p):
    """Hashable key of everything that must be identical across the
    members of one climate vmap group (folds and/or repeats vary);
    ``None`` = not groupable (sequential fallback honors every option)."""
    if (p.get("dataset") != "climate" or p.get("other_model") is not None
            or p.get("resume_training") or p.get("load_best")
            or p.get("prestack") is False or p.get("plot_only")):
        return None
    known = {k for k, _ in _MATCH_KEYS} | set(_VARY_KEYS) | set(_INERT_KEYS)
    if set(p) - known:
        return None
    return tuple(_norm_val(k, p.get(k, d)) for k, d in _MATCH_KEYS)


def plan_groups(params_list, min_group=2):
    """Same planner contract as ``group_sweep.plan_groups``."""
    return group_common.plan_groups(params_list, group_key, min_group)


_FNS_CACHE = {}


def _make_cg_step_fns(cfg, optimizer_key, times, dts, remat, use_pallas,
                      pallas_mask_mode, pallas_interpret, mesh=None):
    """Vmapped-over-members steps on the SHARED global bank, with
    PER-MEMBER loss scales ([E, n]; 0 = dead batch, update suppressed
    exactly) and per-member eval batches (lax.map). ``mesh``: shard_map
    over the ensemble axis."""
    key = (cfg, optimizer_key, times.tobytes(), dts.tobytes(), remat,
           use_pallas, pallas_mask_mode, pallas_interpret, mesh)
    if key in _FNS_CACHE:
        return _FNS_CACHE[key]
    optimizer = make_optimizer(optimizer_key)
    d_times = jnp.asarray(times, jnp.float32)
    d_dts = jnp.asarray(dts, jnp.float32)
    if use_pallas:
        from njode_tpu.ops import fused_scan
        fused = fused_scan.make_fused_loss_fn(cfg,
                                              mask_mode=pallas_mask_mode,
                                              interpret=pallas_interpret,
                                              vmapped=True)

    def _one_loss(params, d_k, d_X, d_M, idx, weight, key, ls):
        batch = prestacked_batch(d_k, d_X, d_M, idx, d_times, d_dts)
        if use_pallas:
            return fused(params, batch, weight, key, True) * ls
        _, loss = njode.forward(params, cfg, batch, weight=weight, rng=key,
                                train=True, get_loss=True, remat=remat)
        return loss * ls

    def train_epoch_body(params_e, opt_state_e, d_k, d_X, d_M, idx_mat_e,
                         weight, keys_e, loss_scales_e):
        """idx_mat_e [E, n, B]; keys_e [E, n]; loss_scales_e [E, n] with
        0.0 marking a member's dead batches (folds with fewer batches) —
        their updates are suppressed into exact no-ops."""

        def body(carry, j):
            params_e, opt_state_e = carry

            def one(params, opt_state, idx, key, ls):
                loss, grads = jax.value_and_grad(_one_loss)(
                    params, d_k, d_X, d_M, idx, weight, key,
                    jnp.maximum(ls, 1e-30))
                updates, new_opt = optimizer.update(grads, opt_state,
                                                    params)
                new_params = optax.apply_updates(params, updates)
                live = ls > 0
                sel = lambda a, b: jnp.where(live, a, b)  # noqa: E731
                return (jax.tree.map(sel, new_params, params),
                        jax.tree.map(sel, new_opt, opt_state), loss)

            params_e, opt_state_e, losses = jax.vmap(one)(
                params_e, opt_state_e, idx_mat_e[:, j], keys_e[:, j],
                loss_scales_e[:, j])
            return (params_e, opt_state_e), losses

        (params_e, opt_state_e), losses = jax.lax.scan(
            body, (params_e, opt_state_e),
            jnp.arange(idx_mat_e.shape[1]))
        return params_e, opt_state_e, losses

    def eval_all_body(params_e, sb_e, k_idx_e, row_idx_e, x_val_e,
                      m_val_e, scale_e, weight):
        """Per-member (eval_loss, heldout-MSE) on stacked PER-MEMBER
        SparseBatches (steps.eval_loss_and_heldout_mse math, batches
        padded to common shapes by the caller; scale undoes the padded
        1/B loss normalization)."""

        def one(args):
            params, sb, k_idx, row_idx, x_val, m_val, scale = args
            batch = densify_sparse(sb)
            _, loss, (y0, y_pre, _) = njode.forward(
                params, cfg, batch, weight=weight, train=False,
                get_loss=True, return_path=True)
            pred = jnp.concatenate([y0[None], y_pre], axis=0)
            p = pred[k_idx, row_idx]                           # [L, D]
            se = jnp.sum(((x_val - p) ** 2) * m_val)
            return loss * scale, se, jnp.sum(m_val)

        return jax.lax.map(one, (params_e, sb_e, k_idx_e, row_idx_e,
                                 x_val_e, m_val_e, scale_e))

    if mesh is not None:
        if len(mesh.axis_names) != 1:
            raise ValueError("grouped-climate ensemble sharding needs a "
                             f"1-D mesh; got axes {mesh.axis_names}")
        from jax.sharding import PartitionSpec as P
        ax = mesh.axis_names[0]
        P_e, P_r = P(ax), P()
        train_epoch_body = jax.shard_map(
            train_epoch_body, mesh=mesh,
            in_specs=(P_e, P_e, P_r, P_r, P_r, P_e, P_r, P_e, P_e),
            out_specs=(P_e, P_e, P(None, ax)), check_vma=False)
        eval_all_body = jax.shard_map(
            eval_all_body, mesh=mesh,
            in_specs=(P_e, P_e, P_e, P_e, P_e, P_e, P_e, P_r),
            out_specs=(P_e, P_e, P_e), check_vma=False)

    fns = {"train_epoch": jax.jit(train_epoch_body, donate_argnums=(0, 1)),
           "eval_all": jax.jit(eval_all_body)}
    _FNS_CACHE[key] = fns
    return fns


_member = group_common.member_slice


def _stack_eval_split(datasets, delta_t, T, max_steps):
    """Per-member full-split eval batches + held-out pairs, padded to
    common shapes and stacked on a leading member axis. Returns
    (sb_e, k_idx_e, row_idx_e, x_val_e, m_val_e, scale_e)."""
    evs = [ds.collate(np.arange(len(ds))) for ds in datasets]
    B_pad = max(ev["batch_size"] for ev in evs)
    E_pad = max(len(ev["obs_idx"]) for ev in evs)
    L_pad = max(len(ev["times_val"]) for ev in evs)
    sbs, kis, ris, xvs, mvs, scales = [], [], [], [], [], []
    for ev in evs:
        sb = sparse_from_events(ev, delta_t, T, max_steps,
                                max_events=E_pad, pad_batch_to=B_pad)
        k = nearest_grid_steps(sb.times, ev["times_val"])
        L = len(k)
        pad = L_pad - L
        D = ev["X_val"].shape[1]
        kis.append(np.concatenate([k, np.zeros(pad)]).astype(np.int32))
        ris.append(np.concatenate(
            [np.asarray(ev["index_val"], np.int64),
             np.zeros(pad)]).astype(np.int32))
        xvs.append(np.concatenate(
            [np.asarray(ev["X_val"], np.float32),
             np.zeros((pad, D), np.float32)]))
        mvs.append(np.concatenate(
            [np.asarray(ev["M_val"], np.float32),
             np.zeros((pad, D), np.float32)]))
        sbs.append(sb)
        scales.append(B_pad / ev["batch_size"])
    sb_e = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *sbs)
    return (sb_e, jnp.asarray(np.stack(kis)), jnp.asarray(np.stack(ris)),
            jnp.asarray(np.stack(xvs)), jnp.asarray(np.stack(mvs)),
            jnp.asarray(np.asarray(scales, np.float32)))


def train_group(group_params, verbose=True, mesh=None):
    """Train one climate vmap group (folds x repeats of one architecture)
    end-to-end with trainer-parity artifacts. Falls back to sequential
    solo runs when the shared bank is unavailable (off-grid times).

    :return: list of 0s, one per member
    """
    E = len(group_params)
    p0 = group_params[0]
    saved_models_path = p0.get("saved_models_path") or os.path.join(
        os.path.dirname(path_cfg.saved_models_path.rstrip("/")),
        "saved_models_climate")

    climate_dir = p0.get("climate_dir") or os.path.join(
        path_cfg.training_data_path, "climate")
    csv_file = os.path.join(climate_dir,
                            p0.get("csv_name", "small_chunked_sporadic.csv"))
    T = p0.get("T", 200)
    delta_t = p0.get("delta_t", 0.1)
    val_options = {"T_val": p0.get("T_val", 150),
                   "max_val_samples": p0.get("max_val_samples", 3)}

    # ------- per-member fold datasets + the shared global bank -------
    ds_all = cdu.ClimateDataset(csv_file=csv_file)
    folds = [int(p.get("data_index", 0)) for p in group_params]
    fold_sets = {}
    for f in set(folds):
        tr, va, te = _load_fold_idx(climate_dir, f)
        fold_sets[f] = {
            "train": cdu.ClimateDataset(csv_file=csv_file, idx=tr),
            "val": cdu.ClimateDataset(csv_file=csv_file, idx=va,
                                      validation=True,
                                      val_options=val_options),
            "test": cdu.ClimateDataset(csv_file=csv_file, idx=te,
                                       validation=True,
                                       val_options=val_options),
            "train_ids": np.sort(np.asarray(tr)),
        }
    max_steps = max(max(s[k].max_grid_steps(delta_t, T)
                        for k in ("train", "val", "test"))
                    for s in fold_sets.values())
    pre = cdu.prestack_series(ds_all, delta_t, T, max_steps)
    if pre is None:
        if verbose:
            print("climate group: prestack unavailable -> sequential")
        from njode_tpu.training import climate_trainer
        return [climate_trainer.train(**p) for p in group_params]

    input_size = ds_all.variable_num
    epochs = int(p0.get("epochs", 100))
    batch_size = int(p0.get("batch_size", 100))
    save_every = int(p0.get("save_every", 1))
    lr = float(p0.get("learning_rate", 1e-3))

    def _nn(v):
        return tuple((int(w), str(a)) for w, a in v) if v else v

    cfg = njode.NJODEConfig(
        input_size=input_size, hidden_size=int(p0.get("hidden_size", 10)),
        output_size=input_size,
        ode_nn=_nn(p0.get("ode_nn", default_ode_nn)),
        readout_nn=_nn(p0.get("readout_nn", default_readout_nn)),
        enc_nn=_nn(p0.get("enc_nn", default_enc_nn)),
        use_rnn=bool(p0.get("use_rnn", False)),
        bias=bool(p0.get("bias", True)),
        dropout_rate=float(p0.get("dropout_rate", 0.1)),
        solver=str(p0.get("solver", "euler")),
        which_loss=str(p0.get("which_loss", "standard")),
        residual_enc_dec=bool(p0.get("residual_enc_dec", True)),
        input_current_t=bool(p0.get("input_current_t", False)),
        masked=True,
        compute_dtype=str(p0.get("compute_dtype", "float32")))

    from njode_tpu.ops import fused_scan
    use_pallas = p0.get("use_pallas")
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and fused_scan.supported(cfg))
    else:
        use_pallas = bool(use_pallas) and fused_scan.supported(cfg)
    remat = p0.get("remat")
    if remat is None:
        remat = True

    # ------- member streams; fold position -> global bank row -------
    seeds = [int(p.get("seed", 398)) for p in group_params]
    effs = [s + 7_654_321 * int(p.get("repeat_seed", 0) or 0)
            for p, s in zip(group_params, seeds)]
    bank_pos = [np.searchsorted(ds_all.ids, fold_sets[f]["train_ids"])
                .astype(np.int64) for f in folds]
    if mesh is not None:
        n_ghost = (-E) % mesh.devices.size
        effs = effs + [effs[-1]] * n_ghost
        folds = folds + [folds[-1]] * n_ghost
        bank_pos = bank_pos + [bank_pos[-1]] * n_ghost

    n_trains = [len(bp) for bp in bank_pos]
    n_batches = [-(-n // batch_size) for n in n_trains]
    n_max = max(n_batches)

    # ------- shared device bank (sentinel row N) -------
    Kp, Emax, Dp = (pre["times"].shape[0], pre["k"].shape[1],
                    pre["X"].shape[2])
    N_all = pre["k"].shape[0]
    d_k = jnp.asarray(np.concatenate(
        [pre["k"], np.full((1, Emax), Kp, np.int32)]))
    d_X = jnp.asarray(np.concatenate(
        [pre["X"], np.zeros((1, Emax, Dp), np.float32)]))
    d_M = jnp.asarray(np.concatenate(
        [pre["M"], np.zeros((1, Emax, Dp), np.float32)]))

    # ------- per-member eval/test batches (built once, stacked) -------
    eval_val = _stack_eval_split([fold_sets[f]["val"] for f in folds],
                                 delta_t, T, max_steps)
    eval_test = _stack_eval_split([fold_sets[f]["test"] for f in folds],
                                  delta_t, T, max_steps)

    optimizer = make_optimizer(lr)
    params_e = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[njode.init_params(jax.random.PRNGKey(e), cfg) for e in effs])
    opt_state_e = jax.vmap(optimizer.init)(params_e)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        ens = NamedSharding(mesh, P(mesh.axis_names[0]))
        params_e = jax.device_put(params_e, ens)
        opt_state_e = jax.device_put(opt_state_e, ens)
    fns = _make_cg_step_fns(cfg, lr, pre["times"], pre["dt"], remat,
                            use_pallas,
                            str(p0.get("pallas_mask_mode", "prng")),
                            bool(p0.get("pallas_interpret", False)),
                            mesh=mesh)

    # msgpack default; 'use_orbax'/'orbax_async' switch the backend like
    # the solo trainers (checkpoints.make_saver)
    save_ckpt = checkpoints.make_saver(p0)
    arts = group_common.MemberArtifacts(group_params, saved_models_path,
                                        METR_COLUMNS)
    cur_weight = float(p0.get("weight", 0.5))
    w_decay = float(p0.get("weight_decay", 1.0))
    best_eval_metric = np.full(E, np.inf)

    if verbose:
        print(f"climate vmap group: {E} members, ids="
              f"{[p['model_id'] for p in group_params]}, folds={folds[:E]},"
              f" arch={cfg.ode_nn}")

    def _epoch_arrays(ep):
        """Solo streams member-by-member (climate_trainer._epoch_indices):
        the member's perm runs over ITS fold's positions, mapped to global
        bank rows; dead batches (beyond the member's count) carry scale 0
        and sentinel rows."""
        idxs_e = np.full((len(effs), n_max, batch_size), N_all, np.int32)
        keys_e, scales_e = [], np.zeros((len(effs), n_max), np.float32)
        for m, (s, bp) in enumerate(zip(effs, bank_pos)):
            perm = np.random.RandomState(
                (s * 100_003 + ep) % 2**32).permutation(n_trains[m])
            keys = []
            for j, b0 in enumerate(range(0, n_trains[m], batch_size)):
                idx = bp[perm[b0:b0 + batch_size]]
                idxs_e[m, j, :len(idx)] = idx
                scales_e[m, j] = batch_size / len(idx)
                keys.append(jax.random.fold_in(
                    jax.random.PRNGKey(s + 1), ep * 100_000 + b0))
            keys += [jnp.zeros((2,), jnp.uint32)] * (n_max - len(keys))
            keys_e.append(jnp.stack(keys))
        return idxs_e, jnp.stack(keys_e), scales_e

    for epoch in range(1, epochs + 1):
        t0 = time.time()
        idx_mat_e, keys_e, scales_e = _epoch_arrays(epoch)
        params_e, opt_state_e, losses = fns["train_epoch"](
            params_e, opt_state_e, d_k, d_X, d_M, jnp.asarray(idx_mat_e),
            jnp.float32(cur_weight), keys_e, jnp.asarray(scales_e))
        losses = np.asarray(losses)                       # [n_max, E]
        train_losses = np.array([losses[n_batches[m] - 1, m]
                                 for m in range(E)])
        train_time = (time.time() - t0) / E

        t0 = time.time()
        ev_loss, se, cnt = fns["eval_all"](params_e, *eval_val,
                                           jnp.float32(cur_weight))
        te_loss, te_se, te_cnt = fns["eval_all"](params_e, *eval_test,
                                                 jnp.float32(cur_weight))
        ev_loss = np.asarray(ev_loss)[:E]
        mse_val = (np.asarray(se)[:E]
                   / np.maximum(np.asarray(cnt)[:E], 1.0))
        te_loss = np.asarray(te_loss)[:E]
        mse_test = (np.asarray(te_se)[:E]
                    / np.maximum(np.asarray(te_cnt)[:E], 1.0))
        eval_time = (time.time() - t0) / E

        if verbose:
            print(f"epoch {epoch}, weight={cur_weight:.5f}, eval-metric="
                  f"{np.array2string(mse_val, precision=5)}")

        for i in range(E):
            arts.append(i, [epoch, train_time, eval_time,
                            float(train_losses[i]), float(ev_loss[i]),
                            float(mse_val[i]), float(te_loss[i]),
                            float(mse_test[i])])

        improved = mse_val < best_eval_metric
        if improved.any() or epoch % save_every == 0:
            params_h = jax.device_get(params_e)
            opt_h = jax.device_get(opt_state_e)
            for i in np.nonzero(improved)[0]:
                best_eval_metric[i] = mse_val[i]
                save_ckpt(
                    arts.ckpt_dir(i, "best_checkpoint"),
                    _member(params_h, i), _member(opt_h, i), epoch,
                    cur_weight)
            if epoch % save_every == 0:
                for i in range(E):
                    arts.flush(i)
                    save_ckpt(
                        arts.ckpt_dir(i, "last_checkpoint"),
                        _member(params_h, i), _member(opt_h, i), epoch,
                        cur_weight)

        cur_weight = float(njode.weight_decay_step(cur_weight, w_decay))

    arts.flush_pending()
    checkpoints.wait_for_async_saves()
    return [0] * E
