"""Automatic vmap-grouping for hyperparameter sweeps.

The reference fans out every sweep entry to its own CPU process
(``/root/reference/NJODE/parallel_train.py:214-224``). On a TPU chip the
equivalent fan-out is a vmapped model ensemble (training/vmap_sweep.py,
measured 9.1x per-model at E=16) — but round 2 left the grouping MANUAL.
This module closes that gap: :func:`plan_groups` partitions a reconciled
sweep param list into vmap-compatible SAME-ARCHITECTURE groups (per the
measured guidance in results/RESULTS.md — heterogeneous-width padding is a
wash at large spreads, so widths are part of the group key), and
:func:`train_group` runs one group end-to-end with the full trainer
artifact surface: per-model ``metric_id-<id>.csv`` (same schema as
training/trainer.py incl. ``evaluation_mean_diff``), per-model last/best
checkpoints (so ``analysis.extras.plot_paths_from_checkpoint`` works), and
the shared registry untouched (ids are pre-assigned by
``sweeps.parallel_training`` exactly like the reference does before
forking).

Numerics: each member uses ITS OWN seed stream with the SAME formulas as
the solo trainer (split/subsample via sklearn + RandomState(seed), batch
shuffle RandomState(seed*100_003+epoch), per-batch dropout keys
split(fold_in(PRNGKey(seed+1), epoch))) — a group of one is the solo
trainer's XLA-path stream (``use_pallas=False``) member-for-member.
The grouped path defaults to the vmapped XLA scan; sweep entries that set
``use_pallas=True`` route each member's training loss through the fused
Pallas kernel instead (``jax.vmap`` lifts the ensemble axis into an outer
sequential kernel-grid dimension — 'input' mask mode is bit-identical to
the XLA path, parity-tested in interpret mode). On TPU — where the solo
trainer's default enables the kernel with in-kernel PRNG dropout — a
default grouped run's dropout stream differs from a solo run of the same
seed (both are valid samples of the same training distribution). Ragged batch tails train like the solo path's (one extra vmapped
program at the tail size, same key stream). Deviations from the solo
path, by design: per-epoch plots are skipped (recover them from the
saved checkpoints via the analysis layer), and the recorded train/eval
times are the group wall time divided by E (each member's amortized cost
share — the honest per-model number under vmapping).
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from njode_tpu.data import datasets as du
from njode_tpu.data import oracle, sde
from njode_tpu.models import njode
from njode_tpu.training import checkpoints, group_common
from njode_tpu.training.steps import gather_dense_batch, make_optimizer
from njode_tpu.utils import paths as path_cfg

METR_COLUMNS = ["epoch", "train_time", "eval_time", "train_loss", "eval_loss",
                "optimal_eval_loss"]

SYNTHETIC_DATASETS = ("BlackScholes", "Heston", "OrnsteinUhlenbeck",
                      "HestonWOFeller", "sine_BlackScholes", "sine_Heston",
                      "sine_OrnsteinUhlenbeck")


def _norm_nn(nn):
    """JSON round-trips turn nn tuples into lists; normalize for hashing."""
    if nn is None:
        return None
    return tuple((int(w), str(a)) for w, a in nn)


# Every key :func:`train_group` reads (from p0 — so members must agree),
# with the default it reads it with. A key may be added here ONLY together
# with its train_group support; any param key outside _MATCH/_VARY/_INERT
# makes the entry ungroupable (sequential fallback), so options the
# grouped path does not implement (ema_decay, remat, ...) can never be
# silently dropped by the p0-only reads.
_MATCH_KEYS = (
    ("dataset", "BlackScholes"), ("dataset_id", None), ("epochs", 100),
    ("batch_size", 100), ("save_every", 1), ("learning_rate", 1e-3),
    ("test_size", 0.2), ("training_size", None), ("hidden_size", 10),
    ("bias", True), ("dropout_rate", 0.1), ("ode_nn", None),
    ("readout_nn", None), ("enc_nn", None), ("use_rnn", False),
    ("solver", "euler"), ("weight", 0.5), ("weight_decay", 1.0),
    ("saved_models_path", None), ("base_data_path", None),
    ("evaluate", False), ("which_loss", "standard"),
    ("residual_enc_dec", True), ("input_current_t", False),
    ("masked", False), ("compute_dtype", "float32"),
    ("use_pallas", False), ("pallas_mask_mode", "prng"),
    ("pallas_interpret", False), ("epoch_chunk", 0),
    ("epoch_chunk_hist_bytes", 2 << 30), ("use_orbax", False),
    ("orbax_async", False))
_VARY_KEYS = ("seed", "model_id", "repeat_seed")  # may differ per member
# read by the gates below, injected by sweeps.parallel_training
# bookkeeping ('parallel'), or deliberately inert in the grouped path
# (per-epoch plots are reconstructed from checkpoints post hoc)
_INERT_KEYS = ("other_model", "func_appl_X", "resume_training",
               "plot_only", "plot", "paths_to_plot", "parallel")
_NN_KEYS = ("ode_nn", "readout_nn", "enc_nn")


def _norm_val(k, v):
    return group_common.norm_val(k, v, _NN_KEYS)


def group_key(p):
    """Hashable key of everything that must be IDENTICAL across the members
    of one vmapped group (architecture incl. widths, dataset, all
    train-loop constants — exactly the ``_MATCH_KEYS`` train_group reads).
    Returns None when the run is not groupable: baseline models, real-data
    trainers, func_appl_X feature maps, resumes, or ANY option outside the
    grouped path's implemented surface — those fall back to the sequential
    path, where every option is honored."""
    ds = p.get("dataset", "BlackScholes")
    if (p.get("other_model") is not None
            or (ds not in SYNTHETIC_DATASETS and "combined" not in ds)
            or p.get("func_appl_X")
            or p.get("resume_training")
            or p.get("plot_only")):
        return None
    known = {k for k, _ in _MATCH_KEYS} | set(_VARY_KEYS) | set(_INERT_KEYS)
    if set(p) - known:
        return None
    return tuple(_norm_val(k, p.get(k, d)) for k, d in _MATCH_KEYS)


# position of training_size inside the group_key tuple (used by the
# compile-sharing planner below)
_TS_KEY_INDEX = [k for k, _ in _MATCH_KEYS].index("training_size")


def plan_compile_sharing(params_list, groups):
    """For groups that differ ONLY in training_size (and have equal member
    count), return {group_index: padded_batch_count} so they share one
    compiled epoch program (padding batches are exact no-ops). Groups with
    an implicit (None) training_size keep their own compile."""
    from collections import defaultdict
    sup = defaultdict(list)
    for gi, g in enumerate(groups):
        p = params_list[g[0]]
        ts = p.get("training_size")
        if not ts:
            continue
        k = group_key(p)
        k_nots = k[:_TS_KEY_INDEX] + k[_TS_KEY_INDEX + 1:] + (len(g),)
        sup[k_nots].append((gi, int(ts) // int(p.get("batch_size", 100))))
    pads = {}
    for lst in sup.values():
        m = max(nb for _, nb in lst)
        for gi, _ in lst:
            pads[gi] = m
    return pads


def plan_groups(params_list, min_group=2):
    """Partition a sweep into (groups, singles): ``groups`` is a list of
    index lists (each a vmappable same-architecture group of >=
    ``min_group`` members), ``singles`` the remaining indices in original
    order (ungroupable or lone runs -> sequential train_switcher)."""
    return group_common.plan_groups(params_list, group_key, min_group)


def _kernel_ok(cfg):
    """Graceful degrade: an explicit ``use_pallas=True`` on a config the
    fused kernel does not cover falls back to the vmapped XLA scan (the
    solo trainers gate identically via ``fused_scan.supported``)."""
    from njode_tpu.ops import fused_scan
    ok = fused_scan.supported(cfg)
    if not ok:
        print("group_sweep: use_pallas requested but config unsupported "
              "by the fused kernel; using the vmapped XLA scan")
    return ok


def _member_split(n_paths, test_size, seed, training_size, sub_seed=None):
    """The solo trainer's exact split + subsample (trainer.py:96-114):
    the split is pinned to ``seed``, the training_size subsample draws
    from ``sub_seed`` (the repeat_seed-offset stream) when given."""
    from sklearn.model_selection import train_test_split
    train_idx, val_idx = train_test_split(
        np.arange(n_paths), test_size=test_size, random_state=seed)
    if training_size is not None and training_size < len(train_idx):
        train_idx = np.random.RandomState(
            seed if sub_seed is None else sub_seed).choice(
            train_idx, training_size, replace=False)
    return train_idx, val_idx


# step-fns cache: jit caches per python function object, so groups sharing
# the key reuse COMPILED programs (the axon remote compile of a vmapped
# scan is tens of seconds — it dominated the first grouped-study run)
_FNS_CACHE = {}


def _make_group_step_fns(cfg, optimizer_key, times, dts, next_cond_exp,
                         evaluate, oracle_key, use_pallas=False,
                         pallas_mask_mode="prng", pallas_interpret=False,
                         mesh=None):
    """Vmapped-over-members step functions with PER-MEMBER batch indices,
    dropout keys and val sets. The inner per-member computation is the
    solo make_step_fns math. ``batch_scales [n_batches]`` carries 1.0 for
    real batches and 0.0 for compile-sharing padding batches (their
    parameter/optimizer updates are suppressed, making them exact no-ops —
    all training_size variants of one architecture then share ONE
    compiled epoch program).

    ``use_pallas``: run each member's training loss through the fused
    Pallas kernel (ops/fused_scan.py) — ``jax.vmap`` lifts the ensemble
    axis into an outer (sequential) kernel-grid dimension, so the group
    runs E back-to-back kernel invocations per batch inside one compiled
    program. 'input' mask mode keeps the member losses bit-identical to
    the vmapped XLA scan (parity-tested in interpret mode); eval stays on
    the vmapped XLA scan either way.

    ``mesh``: a 1-D ``jax.sharding.Mesh`` — the ENSEMBLE axis is split
    over it via ``shard_map`` (each device trains E/N members; the members
    are independent, so the program needs no collectives at all). This is
    the TPU-native counterpart of the reference fanning sweep jobs out to
    N workers (``parallel_train.py:214``, ``N_JOBS``): task parallelism
    rides the device mesh instead of joblib processes. Composes with
    ``use_pallas`` (the per-shard computation is the unchanged vmapped
    kernel/XLA program). The caller pads E to a multiple of the mesh size
    (ghost members, see :func:`train_group`)."""
    key = (cfg, optimizer_key, times.tobytes(), dts.tobytes(), evaluate,
           oracle_key, use_pallas, pallas_mask_mode, pallas_interpret,
           mesh)
    if key in _FNS_CACHE:
        return _FNS_CACHE[key]
    optimizer = make_optimizer(optimizer_key)
    times = jnp.asarray(times, jnp.float32)
    dts = jnp.asarray(dts, jnp.float32)
    if use_pallas:
        from njode_tpu.ops import fused_scan
        fused = fused_scan.make_fused_loss_fn(cfg,
                                              mask_mode=pallas_mask_mode,
                                              interpret=pallas_interpret,
                                              vmapped=True)

    def _one_loss(params, paths, obs, idx, weight, key):
        batch = gather_dense_batch(paths, obs, idx, times, dts)
        if use_pallas:
            return fused(params, batch, weight, key, True)
        _, loss = njode.forward(params, cfg, batch, weight=weight, rng=key,
                                train=True, get_loss=True)
        return loss

    def _epoch_scan(params_e, opt_state_e, paths, obs, idx_mat_e, weight,
                    keys_e, batch_scales):
        def body(carry, k):
            params_e, opt_state_e = carry
            live = batch_scales[k] > 0

            def one(params, opt_state, idx, key):
                loss, grads = jax.value_and_grad(_one_loss)(
                    params, paths, obs, idx, weight, key)
                updates, new_opt = optimizer.update(grads, opt_state,
                                                    params)
                new_params = optax.apply_updates(params, updates)
                sel = lambda a, b: jnp.where(live, a, b)  # noqa: E731
                return (jax.tree.map(sel, new_params, params),
                        jax.tree.map(sel, new_opt, opt_state), loss)

            params_e, opt_state_e, losses = jax.vmap(one)(
                params_e, opt_state_e, idx_mat_e[:, k], keys_e[:, k])
            return (params_e, opt_state_e), losses

        return jax.lax.scan(body, (params_e, opt_state_e),
                            jnp.arange(idx_mat_e.shape[1]))

    def _eval_members(params_e, paths, obs, val_idx_e, weight):
        def one(params, vidx):
            batch = gather_dense_batch(paths, obs, vidx, times, dts)
            _, loss = njode.forward(params, cfg, batch, weight=weight,
                                    train=False, get_loss=True)
            if evaluate and next_cond_exp is not None:
                msd = njode.evaluate(params, cfg, batch, next_cond_exp)
            else:
                msd = jnp.float32(0.0)
            return loss, msd

        return jax.vmap(one)(params_e, val_idx_e)

    def train_epoch_body(params_e, opt_state_e, paths, obs, idx_mat_e,
                         weight, keys_e, batch_scales):
        """idx_mat_e [E, n_batches, B]; keys_e [E, n_batches] PRNG keys —
        member i's stream equals the solo trainer's train_epoch
        (steps.py: split(fold_in(base_key, epoch)))."""
        (params_e, opt_state_e), losses = _epoch_scan(
            params_e, opt_state_e, paths, obs, idx_mat_e, weight, keys_e,
            batch_scales)
        return params_e, opt_state_e, losses

    def eval_all_body(params_e, paths, obs, val_idx_e, weight):
        """Per-member full-val-batch eval loss (+ oracle mean-squared-diff
        when ``evaluate``): val_idx_e [E, n_val]."""
        return _eval_members(params_e, paths, obs, val_idx_e, weight)

    def train_epochs_body(params_e, opt_state_e, paths, obs, idx_mats_e,
                          weights, keys_ce, batch_scales, val_idx_e):
        """C EPOCHS of the grouped program (+ their per-member evals) as
        ONE device call — the vmap-grouped counterpart of
        steps.train_epochs ('epoch_chunk'). idx_mats_e [C, E, n, B],
        weights [C] (the loss-weight decay sequence), keys_ce [C, E, n].
        Returns per-epoch losses [C, n, E], eval/msd [C, E], and the
        per-epoch params/opt histories for exact checkpoint cadence."""

        def epoch_body(carry, inp):
            params_e, opt_state_e = carry
            idx_mat_e, weight, keys_e = inp
            (params_e, opt_state_e), losses = _epoch_scan(
                params_e, opt_state_e, paths, obs, idx_mat_e, weight,
                keys_e, batch_scales)
            ev, msd = _eval_members(params_e, paths, obs, val_idx_e,
                                    weight)
            return (params_e, opt_state_e), (losses, ev, msd, params_e,
                                             opt_state_e)

        (params_e, opt_state_e), (tl, ev, msd, p_hist, o_hist) = \
            jax.lax.scan(epoch_body, (params_e, opt_state_e),
                         (idx_mats_e, weights, keys_ce))
        return params_e, opt_state_e, tl, ev, msd, p_hist, o_hist

    if mesh is not None:
        # ensemble axis over the mesh: every [E, ...] operand splits on
        # its leading axis, the dataset/scalars replicate, and the
        # per-shard program is the UNCHANGED vmapped epoch on E/N local
        # members — zero collectives (members are independent).
        # check_vma=False matches ops/fused_scan.py:1223 — the kernel
        # path's pallas_call avals carry no varying-mesh-axes annotation.
        if len(mesh.axis_names) != 1:
            raise ValueError("grouped-sweep ensemble sharding needs a 1-D "
                             f"mesh; got axes {mesh.axis_names}")
        from jax.sharding import PartitionSpec as P
        ax = mesh.axis_names[0]
        P_e, P_r = P(ax), P()
        train_epoch_body = jax.shard_map(
            train_epoch_body, mesh=mesh,
            in_specs=(P_e, P_e, P_r, P_r, P_e, P_r, P_e, P_r),
            out_specs=(P_e, P_e, P(None, ax)), check_vma=False)
        eval_all_body = jax.shard_map(
            eval_all_body, mesh=mesh,
            in_specs=(P_e, P_r, P_r, P_e, P_r),
            out_specs=(P_e, P_e), check_vma=False)
        train_epochs_body = jax.shard_map(
            train_epochs_body, mesh=mesh,
            in_specs=(P_e, P_e, P_r, P_r, P(None, ax), P_r, P(None, ax),
                      P_r, P_e),
            out_specs=(P_e, P_e, P(None, None, ax), P(None, ax),
                       P(None, ax), P(None, ax), P(None, ax)),
            check_vma=False)

    fns = {"train_epoch": jax.jit(train_epoch_body, donate_argnums=(0, 1)),
           "eval_all": jax.jit(eval_all_body),
           "train_epochs": jax.jit(train_epochs_body,
                                   donate_argnums=(0, 1))}
    _FNS_CACHE[key] = fns
    return fns


_member = group_common.member_slice


def train_group(group_params, verbose=True, pad_batches_to=None,
                mesh=None):
    """Train one vmap group end-to-end with trainer-parity artifacts.

    :param group_params: list of reconciled param dicts (model_id assigned,
        same :func:`group_key`); seeds may differ per member.
    :param mesh: optional 1-D ``jax.sharding.Mesh`` — split the ENSEMBLE
        axis over it (each device trains E/N members; see
        :func:`_make_group_step_fns`). When E is not a multiple of the
        mesh size the group is padded with GHOST members (copies of the
        last member) whose artifacts are discarded — they ride along in
        otherwise-idle device slots, so they cost no wall time.
    :param pad_batches_to: pad the epoch to this many batches with exact
        no-op batches (update-suppressed) so groups that differ ONLY in
        training_size share one compiled program — the sweep runner sets
        this to the supercluster maximum.
    :return: list of 0s (reference convention), one per member
    """
    E = len(group_params)
    p0 = group_params[0]
    saved_models_path = (p0.get("saved_models_path")
                         or path_cfg.saved_models_path)
    base_data_path = p0.get("base_data_path")
    dataset = p0.get("dataset", "BlackScholes")
    dataset_id = int(du._get_time_id(dataset, p0.get("dataset_id"),
                                     base_data_path))
    metadata = du.load_metadata(dataset, dataset_id, base_data_path)
    delta_t = metadata["dt"]
    input_size = metadata["dimension"]
    epochs = int(p0.get("epochs", 100))
    batch_size = int(p0.get("batch_size", 100))
    evaluate = bool(p0.get("evaluate"))

    cfg = njode.NJODEConfig(
        input_size=input_size, hidden_size=int(p0.get("hidden_size", 10)),
        output_size=input_size, ode_nn=_norm_nn(p0.get("ode_nn")),
        readout_nn=_norm_nn(p0.get("readout_nn")),
        enc_nn=_norm_nn(p0.get("enc_nn")),
        use_rnn=bool(p0.get("use_rnn", False)),
        bias=bool(p0.get("bias", True)),
        dropout_rate=float(p0.get("dropout_rate", 0.1)),
        solver=str(p0.get("solver", "euler")),
        which_loss=str(p0.get("which_loss", "standard")),
        residual_enc_dec=bool(p0.get("residual_enc_dec", True)),
        input_current_t=bool(p0.get("input_current_t", False)),
        masked=bool(p0.get("masked", False)),
        compute_dtype=str(p0.get("compute_dtype", "float32")))

    stockmodel = sde.make_model(metadata["model_name"], metadata)
    next_cond_exp = stockmodel.next_cond_exp

    # whole dataset on device once, member splits per seed
    ds_all = du.PathDataset(dataset, dataset_id,
                            np.arange(metadata["nb_paths"]), base_data_path)
    paths_np, obs_np = ds_all.dense_arrays(None)
    d_paths = jnp.asarray(paths_np)
    d_obs = jnp.asarray(obs_np)
    K = paths_np.shape[2] - 1
    times = (np.arange(1, K + 1) * delta_t).astype(np.float32)
    dts = np.full(K, delta_t, dtype=np.float32)

    seeds = [int(p.get("seed", 398)) for p in group_params]
    # repeat_seed-offset streams for init/shuffle/dropout/subsample; the
    # split stays on the raw seed (mirrors trainer.py's rseed exactly)
    effs = [s + 7_654_321 * int(p.get("repeat_seed", 0) or 0)
            for p, s in zip(group_params, seeds)]
    splits = [_member_split(metadata["nb_paths"],
                            float(p.get("test_size", 0.2)), s,
                            p.get("training_size"), sub_seed=e)
              for p, s, e in zip(group_params, seeds, effs)]
    if mesh is not None:
        # pad to a mesh multiple with ghost copies of the last member;
        # only members [0, E) write metrics/checkpoints below
        n_ghost = (-E) % mesh.devices.size
        effs = effs + [effs[-1]] * n_ghost
        splits = splits + [splits[-1]] * n_ghost
    n_val = len(splits[0][1])
    assert all(len(v) == n_val for _, v in splits)
    val_idx_e = jnp.asarray(np.stack([v for _, v in splits]).astype(
        np.int32))
    n_train = len(splits[0][0])
    assert all(len(t) == n_train for t, _ in splits), \
        "group members must share training_size (group_key enforces this)"
    n_full = (n_train // batch_size) * batch_size
    if n_full == 0:
        raise ValueError(f"training set ({n_train}) smaller than "
                         f"batch_size={batch_size}")
    n_batches = n_full // batch_size

    # per-member optimal eval loss (host, once) on the member's val batch
    from njode_tpu.data.grid import batch_from_paths, recompute_n_obs
    opt_losses = []
    for _, vidx in splits[:E]:
        vb = recompute_n_obs(batch_from_paths(
            ds_all.stock_paths[vidx], ds_all.observed_dates[vidx], delta_t))
        opt_losses.append(float(oracle.optimal_loss(
            next_cond_exp, jax.tree.map(jnp.asarray, vb), weight=0.5)))

    lr = float(p0.get("learning_rate", 1e-3))
    optimizer = make_optimizer(lr)
    params_e = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[njode.init_params(jax.random.PRNGKey(e), cfg) for e in effs])
    opt_state_e = jax.vmap(optimizer.init)(params_e)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        ens_sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
        params_e = jax.device_put(params_e, ens_sharding)
        opt_state_e = jax.device_put(opt_state_e, ens_sharding)
    fns = _make_group_step_fns(
        cfg, lr, times, dts, next_cond_exp, evaluate,
        (dataset, dataset_id),
        use_pallas=bool(p0.get("use_pallas", False)) and _kernel_ok(cfg),
        pallas_mask_mode=str(p0.get("pallas_mask_mode", "prng")),
        pallas_interpret=bool(p0.get("pallas_interpret", False)),
        mesh=mesh)
    n_pad = max(pad_batches_to or 0, n_batches)

    # artifact dirs + metric frames per member
    metr_columns = METR_COLUMNS + (["evaluation_mean_diff"] if evaluate
                                   else [])
    # msgpack default; 'use_orbax'/'orbax_async' switch the backend like
    # the solo trainers (checkpoints.make_saver)
    save_ckpt = checkpoints.make_saver(p0)
    arts = group_common.MemberArtifacts(group_params, saved_models_path,
                                        metr_columns)

    save_every = int(p0.get("save_every", 1))
    cur_weight = final_weight = float(p0.get("weight", 0.5))
    w_decay = float(p0.get("weight_decay", 1.0))
    best_eval = np.full(E, np.inf)
    best_snapshot = [None] * E

    if verbose:
        print(f"vmap group: {E} members, ids="
              f"{[p['model_id'] for p in group_params]}, dataset={dataset}, "
              f"arch={cfg.ode_nn}, training_size={n_train}")

    batch_scales = jnp.asarray(
        [1.0] * n_batches + [0.0] * (n_pad - n_batches), jnp.float32)

    def _epoch_arrays(ep):
        """Solo-trainer streams, member by member (trainer.py:333-344);
        padding batches (exact no-ops) appended AFTER the real ones so
        the real batches' index/key streams are unchanged. Real batches
        keep the solo stream: split(.., n_batches) exactly, THEN pad with
        dummy keys (split(.., n_pad) would change them)."""
        idx_mat = np.zeros((len(effs), n_pad, batch_size), np.int32)
        perms = [np.random.RandomState(
            (s * 100_003 + ep) % 2**32).permutation(np.asarray(tr))
            for s, (tr, _) in zip(effs, splits)]
        for i, perm in enumerate(perms):
            idx_mat[i, :n_batches] = perm[:n_full].reshape(
                n_batches, batch_size)
        keys_e = jnp.stack([
            jnp.concatenate([
                jax.random.split(jax.random.fold_in(
                    jax.random.PRNGKey(s + 1), ep), n_batches),
                jnp.zeros((n_pad - n_batches, 2), jnp.uint32)])
            for s in effs])
        return idx_mat, keys_e, perms

    def _bookkeep(ep, last_losses, ev_loss, ev_msd, ttime, etime,
                  weight_now, get_pair):
        """Per-epoch metric rows + last/best checkpoint cadence (the solo
        trainer's semantics). ``get_pair()`` -> HOST (params_E, opt_E)
        stacked trees for THIS epoch; called lazily so a save-free epoch
        costs no device fetch. Ghost-member entries (mesh padding, indices
        >= E) are dropped here."""
        last_losses = np.asarray(last_losses)[:E]
        ev_loss = np.asarray(ev_loss)[:E]
        ev_msd = np.asarray(ev_msd)[:E]
        for i in range(E):
            row = [ep, ttime, etime, float(last_losses[i]),
                   float(ev_loss[i]), opt_losses[i]]
            if evaluate:
                row.append(float(ev_msd[i]))
            arts.append(i, row)
        if verbose:
            print(f"epoch {ep}, weight={weight_now:.5f}, eval-loss="
                  f"{np.array2string(ev_loss, precision=5)}")
        improved = ev_loss < best_eval
        if ep % save_every == 0 or improved.any():
            params_h, opt_h = get_pair()
            for i in np.nonzero(improved)[0]:
                best_eval[i] = ev_loss[i]
                best_snapshot[i] = (_member(params_h, i),
                                    _member(opt_h, i), ep, weight_now)
            for i in range(E):
                if ep % save_every == 0 or improved[i]:
                    arts.flush(i)
                    save_ckpt(
                        arts.ckpt_dir(i, "last_checkpoint"),
                        _member(params_h, i), _member(opt_h, i),
                        ep, weight_now)
                if improved[i]:
                    save_ckpt(
                        arts.ckpt_dir(i, "best_checkpoint"),
                        *best_snapshot[i])

    # 'epoch_chunk' (solo-trainer option, grouped counterpart): N epochs
    # (+ their per-member evals) as ONE device program. Same history-
    # budget guard as the solo trainer — the chunked program returns the
    # per-epoch params+opt history (3x E-stacked state per epoch).
    epoch_chunk = int(p0.get("epoch_chunk", 0) or 0)
    if epoch_chunk > 1:
        state_bytes = 3 * sum(x.size * x.dtype.itemsize
                              for x in jax.tree.leaves(params_e))
        hist_budget = int(p0.get("epoch_chunk_hist_bytes", 2 << 30))
        max_chunk = hist_budget // max(state_bytes, 1)
        if max_chunk < 2:
            print(f"epoch_chunk disabled: group state "
                  f"({state_bytes >> 20} MiB x chunk) exceeds the history "
                  f"budget ({hist_budget >> 20} MiB; raise with "
                  "'epoch_chunk_hist_bytes'); using per-epoch dispatch")
            epoch_chunk = 0
        elif epoch_chunk > max_chunk:
            print(f"epoch_chunk: capping {epoch_chunk} -> {max_chunk}")
            epoch_chunk = max_chunk
    use_chunked = epoch_chunk > 1 and n_full == n_train
    if epoch_chunk > 1 and not use_chunked:
        print("epoch_chunk disabled (ragged last batch); "
              "using per-epoch dispatch")

    epoch = 1
    while epoch <= epochs:
        if use_chunked:
            n_ep = min(epoch_chunk, epochs - epoch + 1)
            t0 = time.time()
            mats, keys = [], []
            ws, w = [], cur_weight
            for j in range(n_ep):
                m, k, _ = _epoch_arrays(epoch + j)
                mats.append(m)
                keys.append(k)
                ws.append(w)
                w = float(njode.weight_decay_step(w, w_decay))
            params_e, opt_state_e, tl_c, ev_c, msd_c, p_hist, o_hist = \
                fns["train_epochs"](
                    params_e, opt_state_e, d_paths, d_obs,
                    jnp.asarray(np.stack(mats)),
                    jnp.asarray(ws, jnp.float32), jnp.stack(keys),
                    batch_scales, val_idx_e)
            tl_c = np.asarray(tl_c)
            ev_c = np.asarray(ev_c)
            msd_c = np.asarray(msd_c)
            per_ep = (time.time() - t0) / (n_ep * E)
            hist_h = {}

            def _pair_at(j):
                if "p" not in hist_h:
                    # ONE bulk fetch of the whole chunk history, first
                    # save event only
                    hist_h["p"] = jax.device_get(p_hist)
                    hist_h["o"] = jax.device_get(o_hist)
                return (jax.tree.map(lambda x: x[j], hist_h["p"]),
                        jax.tree.map(lambda x: x[j], hist_h["o"]))

            for j in range(n_ep):
                _bookkeep(epoch + j, tl_c[j, n_batches - 1], ev_c[j],
                          msd_c[j], per_ep, 0.0, ws[j], partial(_pair_at, j))
            final_weight = ws[-1]
            cur_weight = w
            epoch += n_ep
            continue

        t0 = time.time()
        idx_mat, keys_e, perms = _epoch_arrays(epoch)
        params_e, opt_state_e, losses = fns["train_epoch"](
            params_e, opt_state_e, d_paths, d_obs, jnp.asarray(idx_mat),
            jnp.float32(cur_weight), keys_e, batch_scales)
        last_losses = np.asarray(losses[n_batches - 1])
        if n_full < n_train:
            # ragged tail: one extra 1-batch program at the tail size,
            # solo-stream keys (trainer.py: fold_in(base, epoch*1e5+b0))
            tail_idx = jnp.asarray(np.stack(
                [p[n_full:] for p in perms]).astype(np.int32))[:, None, :]
            tail_keys = jnp.stack(
                [jax.random.fold_in(jax.random.PRNGKey(s + 1),
                                    epoch * 100_000 + n_full)
                 for s in effs])[:, None]
            params_e, opt_state_e, tl = fns["train_epoch"](
                params_e, opt_state_e, d_paths, d_obs, tail_idx,
                jnp.float32(cur_weight), tail_keys,
                jnp.ones((1,), jnp.float32))
            last_losses = np.asarray(tl[0])
        train_time = (time.time() - t0) / E

        t0 = time.time()
        ev_loss, ev_msd = fns["eval_all"](params_e, d_paths, d_obs,
                                          val_idx_e,
                                          jnp.float32(cur_weight))
        ev_loss = np.asarray(ev_loss)
        ev_msd = np.asarray(ev_msd)
        eval_time = (time.time() - t0) / E

        _bookkeep(epoch, last_losses, ev_loss, ev_msd, train_time,
                  eval_time, cur_weight,
                  lambda: (jax.device_get(params_e),
                           jax.device_get(opt_state_e)))
        final_weight = cur_weight
        cur_weight = float(njode.weight_decay_step(cur_weight, w_decay))
        epoch += 1

    params_h = jax.device_get(params_e)
    opt_h = jax.device_get(opt_state_e)
    arts.flush_pending()
    for i in range(E):
        save_ckpt(
            arts.ckpt_dir(i, "last_checkpoint"),
            _member(params_h, i), _member(opt_h, i), epochs,
            final_weight)
    checkpoints.wait_for_async_saves()
    return [0] * E
