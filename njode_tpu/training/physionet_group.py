"""Vmap-grouped PhysioNet training — repeated sweep entries as ONE
on-chip ensemble.

The reference's PhysioNet comparison study trains the same architecture
several times (its repeats get variance from unseeded torch init) through
the joblib pool (``/root/reference/NJODE/parallel_train.py:214``,
``physionet_train.py:90-407``). Here those repeats differ only in
``seed``/``repeat_seed`` — everything else (records, 80/20 split, test
holdout, architecture, loop constants) is shared — so the TPU-native
fan-out is a vmapped member ensemble over ONE shared device-resident
prestacked record bank (``physionet.prestack_train_records`` +
``steps.prestacked_batch``): a grouped epoch is one device program that
gathers E different batch-index streams out of the same bank.

Member numerics replicate the solo trainer stream-for-stream
(``physionet_trainer.py``): per-member init ``PRNGKey(seed_eff)``, shuffle
``RandomState(seed_eff * 100_003 + epoch)``, per-batch dropout keys
``fold_in(PRNGKey(seed_eff + 1), epoch * 100_000 + b0)``; the shared test
batch, holdout pairs and ``eval_input_prob`` re-injection are built once
exactly like the solo path. Artifacts are trainer-parity: per-member
``metric_id-<id>.csv`` (same columns), best checkpoint on ``eval_metric``,
``save_every`` cadence. Deviations (by design, like
``group_sweep.train_group``): recorded train/eval times are the group wall
time divided by E, and per-epoch plots are skipped.

Training is vmapped over members; evaluation runs ``lax.map``
(sequentially) over members inside one jitted call — the eval forward
keeps a dense [K, B_test, D] prediction path whose footprint must not be
multiplied by E at production scale (B_test ~1600, K ~3126).

``mesh`` (a 1-D ``jax.sharding.Mesh``) splits the ENSEMBLE axis via
``shard_map`` exactly like ``group_sweep._make_group_step_fns``: E/N
members per device, banks replicated, zero collectives; groups are
ghost-padded to a mesh multiple.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from njode_tpu.data import physionet as pdu
from njode_tpu.data.grid import densify_sparse, nearest_grid_steps, \
    sparse_from_events
from njode_tpu.models import njode
from njode_tpu.training import checkpoints, group_common
from njode_tpu.training.physionet_trainer import METR_COLUMNS, \
    _event_from_collate, default_enc_nn, default_ode_nn, default_readout_nn
from njode_tpu.training.steps import make_optimizer, prestacked_batch
from njode_tpu.utils import paths as path_cfg

# everything train_group reads from p0 and therefore REQUIRES to be
# identical across members (the solo trainer's full knob surface minus the
# per-member _VARY_KEYS); any option outside known keys makes the entry
# ungroupable so it can never be silently dropped
_MATCH_KEYS = (
    ("epochs", 100), ("batch_size", 50), ("save_every", 1),
    ("learning_rate", 1e-3), ("hidden_size", 41), ("bias", True),
    ("dropout_rate", 0.1), ("ode_nn", default_ode_nn),
    ("readout_nn", default_readout_nn), ("enc_nn", default_enc_nn),
    ("use_rnn", False), ("solver", "euler"), ("weight", 0.5),
    ("weight_decay", 1.0), ("saved_models_path", None),
    ("quantization", 0.016), ("n_samples", 8000),
    ("eval_input_prob", None), ("eval_input_seed", 3892),
    ("which_loss", "standard"), ("residual_enc_dec", True),
    ("input_current_t", False), ("compute_dtype", "float32"),
    ("delta_t", None), ("physionet_root", None), ("download", False),
    ("remat", None), ("use_pallas", None), ("pallas_mask_mode", "prng"),
    ("pallas_interpret", False), ("use_orbax", False),
    ("orbax_async", False))
_VARY_KEYS = ("seed", "repeat_seed", "model_id")
# checked explicitly in group_key (ungroupable when truthy) or read but
# group-invariant; listed so the unknown-key gate doesn't trip on them
_INERT_KEYS = ("dataset", "parallel", "masked", "prestack", "records",
               "resume_training", "load_best", "plot_only", "other_model")
_NN_KEYS = ("ode_nn", "readout_nn", "enc_nn")


def _norm_val(k, v):
    return group_common.norm_val(k, v, _NN_KEYS)


def group_key(p):
    """Hashable key of everything that must be identical across the
    members of one PhysioNet vmap group; ``None`` = not groupable (falls
    back to the sequential path, where every option is honored).
    'records' (in-memory stand-in datasets) are matched by object
    identity — members must share the very same list."""
    if (p.get("dataset") != "physionet" or p.get("other_model") is not None
            or p.get("resume_training") or p.get("load_best")
            or p.get("prestack") is False or p.get("plot_only")):
        return None
    known = {k for k, _ in _MATCH_KEYS} | set(_VARY_KEYS) | set(_INERT_KEYS)
    if set(p) - known:
        return None
    return (("records", id(p.get("records"))),) + tuple(
        _norm_val(k, p.get(k, d)) for k, d in _MATCH_KEYS)


def plan_groups(params_list, min_group=2):
    """Partition indices into vmappable groups (>= ``min_group`` members
    sharing :func:`group_key`) + leftover singles — the same planner
    contract as ``group_sweep.plan_groups``."""
    return group_common.plan_groups(params_list, group_key, min_group)


_FNS_CACHE = {}


def _make_pg_step_fns(cfg, optimizer_key, times, dts, remat, use_pallas,
                      pallas_mask_mode, pallas_interpret, mesh=None):
    """Vmapped-over-members step fns on a SHARED prestacked bank. Training
    vmaps the per-member step (solo math: steps.make_prestacked_step_fns);
    eval runs lax.map over members so the dense test-batch prediction path
    is never materialized E times. ``mesh``: shard_map over the ensemble
    axis (see module docstring)."""
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
                         weight, keys_e, loss_scales):
        """idx_mat_e [E, n, B]; keys_e [E, n] PRNG keys (solo stream:
        fold_in(PRNGKey(seed+1), epoch*100_000+b0)); loss_scales [n]
        (shared — the short-tail position is the same for every member)."""

        def body(carry, j):
            params_e, opt_state_e = carry

            def one(params, opt_state, idx, key):
                loss, grads = jax.value_and_grad(_one_loss)(
                    params, d_k, d_X, d_M, idx, weight, key,
                    loss_scales[j])
                updates, opt_state = optimizer.update(grads, opt_state,
                                                      params)
                return (optax.apply_updates(params, updates), opt_state,
                        loss)

            params_e, opt_state_e, losses = jax.vmap(one)(
                params_e, opt_state_e, idx_mat_e[:, j], keys_e[:, j])
            return (params_e, opt_state_e), losses

        (params_e, opt_state_e), losses = jax.lax.scan(
            body, (params_e, opt_state_e),
            jnp.arange(idx_mat_e.shape[1]))
        return params_e, opt_state_e, losses

    def eval_all_body(params_e, b_test, k_idx, x_val, m_val, weight,
                      scale):
        """Per-member (eval_loss, sq, cnt, metric_2) on the SHARED test
        batch (steps.eval_loss_and_masked_metrics math); the batch is
        densified once, members evaluated sequentially (lax.map)."""
        batch = densify_sparse(b_test)

        def one(params):
            _, loss, (y0, y_pre, _) = njode.forward(
                params, cfg, batch, weight=weight, train=False,
                get_loss=True, return_path=True)
            pred = jnp.concatenate([y0[None], y_pre], axis=0)
            B = x_val.shape[0]
            p = jnp.transpose(pred[k_idx][:, :B], (1, 0, 2))   # [B, L, D]
            err = ((x_val - p) ** 2) * m_val
            cnt_bd = m_val.sum(axis=1)                         # [B, D]
            per = jnp.where(cnt_bd > 0,
                            err.sum(axis=1) / jnp.maximum(cnt_bd, 1.0),
                            0.0)
            return (loss * scale, jnp.sum(err), jnp.sum(m_val),
                    per.mean())

        return jax.lax.map(one, params_e)

    if mesh is not None:
        if len(mesh.axis_names) != 1:
            raise ValueError("grouped-PhysioNet ensemble sharding needs a "
                             f"1-D mesh; got axes {mesh.axis_names}")
        from jax.sharding import PartitionSpec as P
        ax = mesh.axis_names[0]
        P_e, P_r = P(ax), P()
        train_epoch_body = jax.shard_map(
            train_epoch_body, mesh=mesh,
            in_specs=(P_e, P_e, P_r, P_r, P_r, P_e, P_r, P_e, P_r),
            out_specs=(P_e, P_e, P(None, ax)), check_vma=False)
        eval_all_body = jax.shard_map(
            eval_all_body, mesh=mesh,
            in_specs=(P_e, P_r, P_r, P_r, P_r, P_r, P_r),
            out_specs=(P_e, P_e, P_e, P_e), check_vma=False)

    fns = {"train_epoch": jax.jit(train_epoch_body, donate_argnums=(0, 1)),
           "eval_all": jax.jit(eval_all_body)}
    _FNS_CACHE[key] = fns
    return fns


_member = group_common.member_slice


def train_group(group_params, verbose=True, mesh=None):
    """Train one PhysioNet vmap group end-to-end with trainer-parity
    artifacts (see module docstring). Falls back to sequential solo runs
    when the prestacked bank is unavailable (grid-misaligned records).

    :param group_params: reconciled param dicts (model_id assigned, same
        :func:`group_key`); seed/repeat_seed may differ per member.
    :param mesh: optional 1-D mesh — ensemble axis sharded over it,
        ghost-padded to a mesh multiple.
    :return: list of 0s (reference convention), one per member
    """
    E = len(group_params)
    p0 = group_params[0]
    saved_models_path = p0.get("saved_models_path") or os.path.join(
        os.path.dirname(path_cfg.saved_models_path.rstrip("/")),
        "saved_models_physionet")

    # ------- shared data (physionet_trainer.py:85-100) -------
    quantization = float(p0.get("quantization", 0.016))
    n_samples = int(p0.get("n_samples", 8000))
    root = p0.get("physionet_root") or os.path.join(
        path_cfg.training_data_path, "physionet")
    data = pdu.parse_datasets(root, n_samples=n_samples,
                              quantization=quantization,
                              download=bool(p0.get("download", False)),
                              records=p0.get("records"))
    train_records = data["train_records"]
    test_records = data["test_records"]
    data_min, data_max = data["data_min"], data["data_max"]
    input_size = data["input_dim"]
    T = 1 + 1e-12
    delta_t = p0.get("delta_t") or quantization / 48.0
    max_steps = pdu.max_union_grid_steps(train_records + test_records,
                                         delta_t, T)

    pre = pdu.prestack_train_records(train_records, data_min, data_max,
                                     delta_t, T, max_steps)
    if pre is None:
        # grid-misaligned record times: the grouped gather/scatter bank
        # does not apply — run the members through the solo trainer
        if verbose:
            print("physionet group: prestack unavailable -> sequential")
        from njode_tpu.training import physionet_trainer
        return [physionet_trainer.train(**p) for p in group_params]

    epochs = int(p0.get("epochs", 100))
    batch_size = int(p0.get("batch_size", 50))
    save_every = int(p0.get("save_every", 1))
    lr = float(p0.get("learning_rate", 1e-3))

    def _nn(v):
        return tuple((int(w), str(a)) for w, a in v) if v else v

    cfg = njode.NJODEConfig(
        input_size=input_size, hidden_size=int(p0.get("hidden_size", 41)),
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

    # ------- per-member seed streams (solo formulas) -------
    seeds = [int(p.get("seed", 398)) for p in group_params]
    effs = [s + 7_654_321 * int(p.get("repeat_seed", 0) or 0)
            for p, s in zip(group_params, seeds)]
    if mesh is not None:
        n_ghost = (-E) % mesh.devices.size
        effs = effs + [effs[-1]] * n_ghost

    # ------- shared device-resident bank (sentinel row N) -------
    Kp, Emax, Dp = (pre["times"].shape[0], pre["k"].shape[1],
                    pre["X"].shape[2])
    d_k = jnp.asarray(np.concatenate(
        [pre["k"], np.full((1, Emax), Kp, np.int32)]))
    d_X = jnp.asarray(np.concatenate(
        [pre["X"], np.zeros((1, Emax, Dp), np.float32)]))
    d_M = jnp.asarray(np.concatenate(
        [pre["M"], np.zeros((1, Emax, Dp), np.float32)]))

    # ------- shared test batch + holdout pairs (solo :195-242) -------
    test_collate = pdu.collate_records(
        test_records, data_min, data_max, data_type="test",
        eval_input_prob=p0.get("eval_input_prob"),
        eval_input_seed=int(p0.get("eval_input_seed", 3892)))
    ev_test = _event_from_collate(test_collate)
    b_test = jax.tree.map(jnp.asarray, sparse_from_events(
        ev_test, delta_t, T, max_steps,
        max_events=len(ev_test["obs_idx"])))
    k_per_t = jnp.asarray(nearest_grid_steps(b_test.times,
                                             test_collate["times_val"]))
    d_vals_val = jnp.asarray(test_collate["vals_val"])
    d_mask_val = jnp.asarray(test_collate["mask_val"])

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
    fns = _make_pg_step_fns(cfg, lr, pre["times"], pre["dt"], remat,
                            use_pallas,
                            str(p0.get("pallas_mask_mode", "prng")),
                            bool(p0.get("pallas_interpret", False)),
                            mesh=mesh)

    # msgpack default; 'use_orbax'/'orbax_async' switch the backend like
    # the solo trainers (checkpoints.make_saver)
    save_ckpt = checkpoints.make_saver(p0)
    arts = group_common.MemberArtifacts(group_params, saved_models_path,
                                        METR_COLUMNS)
    n_train = len(train_records)
    cur_weight = float(p0.get("weight", 0.5))
    w_decay = float(p0.get("weight_decay", 1.0))
    best_eval_metric = np.full(E, np.inf)

    if verbose:
        print(f"physionet vmap group: {E} members, ids="
              f"{[p['model_id'] for p in group_params]}, "
              f"arch={cfg.ode_nn}, n_train={n_train}")

    def _epoch_arrays(ep):
        """Solo streams member-by-member (physionet_trainer.py:294-306):
        shuffle RandomState(seed*100_003+ep), short tail padded with the
        sentinel row, keys fold_in(PRNGKey(seed+1), ep*100_000+b0)."""
        idxs_e, keys_e = [], []
        scales = [batch_size / len(range(b0, min(b0 + batch_size,
                                                 n_train)))
                  for b0 in range(0, n_train, batch_size)]
        for s in effs:
            perm = np.random.RandomState(
                (s * 100_003 + ep) % 2**32).permutation(n_train)
            idxs, keys = [], []
            for b0 in range(0, n_train, batch_size):
                idx = perm[b0:b0 + batch_size]
                idxs.append(np.concatenate(
                    [idx, np.full(batch_size - len(idx), n_train)]))
                keys.append(jax.random.fold_in(
                    jax.random.PRNGKey(s + 1), ep * 100_000 + b0))
            idxs_e.append(np.stack(idxs))
            keys_e.append(jnp.stack(keys))
        return (np.stack(idxs_e).astype(np.int32), jnp.stack(keys_e),
                np.asarray(scales, np.float32))

    for epoch in range(1, epochs + 1):
        t0 = time.time()
        idx_mat_e, keys_e, scales = _epoch_arrays(epoch)
        params_e, opt_state_e, losses = fns["train_epoch"](
            params_e, opt_state_e, d_k, d_X, d_M, jnp.asarray(idx_mat_e),
            jnp.float32(cur_weight), keys_e, jnp.asarray(scales))
        train_losses = np.asarray(losses[-1])[:E]
        train_time = (time.time() - t0) / E

        t0 = time.time()
        ev_loss, sq, cnt, mse2 = fns["eval_all"](
            params_e, b_test, k_per_t, d_vals_val, d_mask_val,
            jnp.float32(cur_weight), jnp.float32(1.0))
        ev_loss = np.asarray(ev_loss)[:E]
        mse = (np.asarray(sq)[:E] / np.maximum(np.asarray(cnt)[:E], 1.0))
        mse2 = np.asarray(mse2)[:E]
        eval_time = (time.time() - t0) / E

        if verbose:
            print(f"epoch {epoch}, weight={cur_weight:.5f}, eval-metric="
                  f"{np.array2string(mse, precision=5)}")

        for i in range(E):
            arts.append(i, [epoch, train_time, eval_time,
                            float(train_losses[i]), float(ev_loss[i]),
                            float(mse[i]), float(mse2[i])])

        improved = mse < best_eval_metric
        if improved.any() or epoch % save_every == 0:
            params_h = jax.device_get(params_e)
            opt_h = jax.device_get(opt_state_e)
            for i in np.nonzero(improved)[0]:
                best_eval_metric[i] = mse[i]
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

    # trailing metric flush (same conscious fix as the solo trainer)
    arts.flush_pending()
    checkpoints.wait_for_async_saves()
    return [0] * E
