"""Jitted training/eval step factories.

The hot path: the full (tiny) dataset lives on device; a step receives only a
batch index vector, gathers the batch, builds the dense GridBatch on device,
and runs forward+backward through the scan. Under a ``jax.sharding.Mesh`` the
index vector (and thus the whole batch computation) is sharded over the
'data' axis and XLA inserts the gradient all-reduce over ICI automatically —
the TPU-native replacement for the reference's single-device loop
(``train.py:488-524``)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from njode_tpu.data.grid import GridBatch
from njode_tpu.models import njode


def make_optimizer(learning_rate: float, weight_decay: float = 0.0005):
    """Adam with L2 weight decay folded into the gradients, matching
    ``torch.optim.Adam(lr, weight_decay=5e-4)`` (``train.py:397-398``)."""
    return optax.chain(optax.add_decayed_weights(weight_decay),
                       optax.adam(learning_rate))


def gather_dense_batch(paths, obs, idx, times, dts):
    """Gather rows ``idx`` from the device-resident dataset and build the
    dense GridBatch — the single shared on-device batching path (used by
    the solo trainer, the epoch scan, and the vmapped ensemble)."""
    pb = jnp.take(paths, idx, axis=0)
    ob = jnp.take(obs, idx, axis=0)
    return dense_batch(pb, ob, times, dts)


def dense_batch(paths_b, obs_b, times, dts):
    """Build a GridBatch on device from ``[B, D, T+1]`` paths and
    ``[B, T+1]`` observation indicators (grid-aligned data)."""
    obs_t = obs_b[:, 1:].T                                     # [K, B]
    X = jnp.transpose(paths_b[:, :, 1:], (2, 0, 1)) * obs_t[:, :, None]
    M = jnp.broadcast_to(obs_t[:, :, None], X.shape)
    start_X = paths_b[:, :, 0]
    n_obs = obs_t.sum(axis=0)
    return GridBatch(times=times, dt=dts, obs=obs_t, X=X, M=M,
                     start_X=start_X, n_obs_ot=n_obs)


def make_grid_step_fns(cfg: njode.NJODEConfig, optimizer,
                       sparse: bool = False, mesh=None, remat=None,
                       use_pallas: bool = False,
                       pallas_mask_mode: str = "prng",
                       pallas_interpret: bool = False,
                       pallas_force_plan=None):
    """Jitted step functions for the real-data trainers.

    ``sparse=False``: steps take a full dense :class:`GridBatch` argument.
    ``sparse=True``: steps take a :class:`SparseBatch` — compact events
    densified ON DEVICE (grid.densify_sparse); the dense [K, B, D] tensors
    are ~100x larger than the events, so this removes the dominant
    host->device transfer. Shapes stay static either way (fixed
    ``max_steps``, padded batch rows); ``loss_scale`` preserves the
    reference's 1/batch_size normalization under row padding.

    ``mesh``: a ``jax.sharding.Mesh`` with a 'data' axis — the densified
    batch is pinned to the data-parallel layout (batch rows sharded,
    params replicated by the caller) so GSPMD partitions the scan and
    all-reduces the gradients over ICI. Numerically equivalent to the
    solo path (tested 1-vs-8 devices).

    ``remat``: scan-axis gradient checkpointing on the training backward
    (njode.forward remat); defaults to ON for the sparse (real-data) path
    whose grids are the long ones (K ~ 2000-3000; SURVEY §2.16 SP row).
    Numerically identical — only the backward's memory/compute trade
    changes (measured at PhysioNet scale in results/RESULTS.md).

    ``use_pallas``: run the TRAINING loss through the fused Pallas scan
    kernel (ops/fused_scan.py — masked configs supported; long grids run
    chunked). Composes with ``mesh``: the kernel runs per-device under
    ``shard_map`` over the batch axis with the gradient psum inserted by
    the shard_map transpose (numerics identical to the no-mesh kernel,
    tested 1-vs-N). Eval/prediction stay on the XLA scan.
    """
    from njode_tpu.data.grid import densify_sparse

    if remat is None:
        remat = sparse
    if use_pallas:
        from njode_tpu.ops import fused_scan
        fused = fused_scan.make_fused_loss_fn(cfg,
                                              mask_mode=pallas_mask_mode,
                                              mesh=mesh,
                                              interpret=pallas_interpret,
                                              force_plan=pallas_force_plan)
    if mesh is not None:
        from njode_tpu.parallel.sharding import constrain_batch

        def prep(b):
            batch = densify_sparse(b) if sparse else b
            return constrain_batch(batch, mesh)
    else:
        prep = densify_sparse if sparse else (lambda b: b)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, b, weight, rng, loss_scale):
        batch = prep(b)

        def loss_fn(p):
            if use_pallas:
                loss = fused(p, batch, weight, rng, True)
            else:
                _, loss = njode.forward(p, cfg, batch, weight=weight,
                                        rng=rng, train=True, get_loss=True,
                                        remat=remat)
            return loss * loss_scale

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_epoch(params, opt_state, b_stack, weight, rngs, loss_scales):
        """One full epoch as a SINGLE device program: ``lax.scan`` over a
        stacked batch pytree (leading [n_batches] axis on every leaf).
        Removes the per-batch host dispatch — over the remote-TPU tunnel
        that dispatch (10-100 ms/batch) dominates the real-data epoch time
        (results/RESULTS.md). Numerically identical to the per-batch loop:
        the caller passes the exact same per-batch rng keys and loss
        scales the loop would have used."""

        def body(carry, inp):
            params, opt_state = carry
            b, rng, ls = inp
            batch = prep(b)

            def loss_fn(p):
                if use_pallas:
                    loss = fused(p, batch, weight, rng, True)
                else:
                    _, loss = njode.forward(p, cfg, batch, weight=weight,
                                            rng=rng, train=True,
                                            get_loss=True, remat=remat)
                return loss * ls

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (b_stack, rngs, loss_scales))
        return params, opt_state, losses

    @jax.jit
    def eval_loss(params, b, weight, loss_scale):
        _, loss = njode.forward(params, cfg, prep(b), weight=weight,
                                train=False, get_loss=True)
        return loss * loss_scale

    def _pred(params, b):
        _, _, (y0, y_pre, _) = njode.forward(
            params, cfg, prep(b), train=False, get_loss=False,
            return_path=True)
        return jnp.concatenate([y0[None], y_pre], axis=0)   # [K+1, B, D]

    @jax.jit
    def pred_prejump(params, b):
        """Full pre-jump prediction path (y0 [B,D], y_pre [K,B,D])."""
        pred = _pred(params, b)
        return pred[0], pred[1:]

    @jax.jit
    def heldout_mse(params, b, k_idx, row_idx, x_val, m_val):
        """Masked squared error of the PRE-JUMP prediction at held-out
        (grid-step, row) pairs, fully on device: (sum sq err, mask count).
        Avoids shipping the [K, B, D] prediction path to the host."""
        p = _pred(params, b)[k_idx, row_idx]                # [L, D]
        return jnp.sum(((x_val - p) ** 2) * m_val), jnp.sum(m_val)

    @jax.jit
    def pred_at(params, b, k_idx):
        """Pre-jump predictions gathered at grid steps ``k_idx`` [L] —
        returns [L, B, D] (only the needed slice leaves the device)."""
        return _pred(params, b)[k_idx]

    def _loss_and_pred(params, b, weight, loss_scale):
        """ONE forward for the whole evaluation (loss + prediction path)
        instead of two — halves the eval forwards of the real-data
        trainers."""
        batch = prep(b)
        _, loss, (y0, y_pre, _) = njode.forward(
            params, cfg, batch, weight=weight, train=False, get_loss=True,
            return_path=True)
        pred = jnp.concatenate([y0[None], y_pre], axis=0)
        return loss * loss_scale, pred

    @jax.jit
    def eval_loss_and_heldout_mse(params, b, k_idx, row_idx, x_val, m_val,
                                  weight, loss_scale):
        loss, pred = _loss_and_pred(params, b, weight, loss_scale)
        p = pred[k_idx, row_idx]
        return loss, jnp.sum(((x_val - p) ** 2) * m_val), jnp.sum(m_val)

    @jax.jit
    def eval_loss_and_pred_at(params, b, k_idx, weight, loss_scale):
        loss, pred = _loss_and_pred(params, b, weight, loss_scale)
        return loss, pred[k_idx]

    @jax.jit
    def eval_loss_and_masked_metrics(params, b, k_idx, x_val, m_val,
                                     weight, loss_scale):
        """Fully ON-DEVICE evaluation for the PhysioNet-style holdout:
        eval loss + masked-MSE parts + the latent-ODE per-(patient, dim)
        metric (``physionet.compute_masked_likelihood_mse``) — only four
        scalars leave the device. Shipping the [L, B, D] held-out
        prediction slice to the host instead costs ~40 s/epoch at
        production scale over the remote tunnel (L~1500, B=1600, D=41 —
        measured round 3). ``x_val/m_val [B, L, D]`` are static across
        epochs; keep them device-resident."""
        loss, pred = _loss_and_pred(params, b, weight, loss_scale)
        B = x_val.shape[0]
        p = jnp.transpose(pred[k_idx][:, :B], (1, 0, 2))    # [B, L, D]
        err = ((x_val - p) ** 2) * m_val
        sq, cnt = jnp.sum(err), jnp.sum(m_val)
        cnt_bd = m_val.sum(axis=1)                          # [B, D]
        se_bd = err.sum(axis=1)
        per = jnp.where(cnt_bd > 0, se_bd / jnp.maximum(cnt_bd, 1.0), 0.0)
        return loss, sq, cnt, per.mean()

    return {"train_step": train_step, "train_epoch": train_epoch,
            "eval_loss": eval_loss, "pred_prejump": pred_prejump,
            "heldout_mse": heldout_mse, "pred_at": pred_at,
            "eval_loss_and_heldout_mse": eval_loss_and_heldout_mse,
            "eval_loss_and_pred_at": eval_loss_and_pred_at,
            "eval_loss_and_masked_metrics": eval_loss_and_masked_metrics}


def make_sparse_step_fns(cfg: njode.NJODEConfig, optimizer, mesh=None,
                         remat=None, use_pallas: bool = False,
                         pallas_mask_mode: str = "prng",
                         pallas_interpret: bool = False,
                         pallas_force_plan=None):
    """SparseBatch step functions (see :func:`make_grid_step_fns`)."""
    return make_grid_step_fns(cfg, optimizer, sparse=True, mesh=mesh,
                              remat=remat, use_pallas=use_pallas,
                              pallas_mask_mode=pallas_mask_mode,
                              pallas_interpret=pallas_interpret,
                              pallas_force_plan=pallas_force_plan)


def prestacked_batch(k_all, X_all, M_all, idx, times, dts):
    """Densify one batch from a PRE-STACKED record bank inside jit: gather
    the rows ``idx`` out of ``k [N, E] / X, M [N, E, D]`` (sentinel step
    K marks padding events; sentinel row N is the all-padding record) and
    scatter them onto the union grid — a :class:`GridBatch` with
    ``start_X = 0`` (the real-data trainers' convention)."""
    K = times.shape[0]
    k = jnp.take(k_all, idx, axis=0)                  # [B, E]
    Xe = jnp.take(X_all, idx, axis=0)                 # [B, E, D]
    Me = jnp.take(M_all, idx, axis=0)
    B = idx.shape[0]
    D = Xe.shape[-1]
    row = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None], k.shape)
    obs = jnp.zeros((K + 1, B), jnp.float32).at[k, row].max(
        (k < K).astype(jnp.float32))[:K]
    X = jnp.zeros((K + 1, B, D), jnp.float32).at[k, row].set(Xe)[:K]
    M = jnp.zeros((K + 1, B, D), jnp.float32).at[k, row].set(Me)[:K]
    return GridBatch(times=times, dt=dts, obs=obs, X=X, M=M,
                     start_X=jnp.zeros((B, D), jnp.float32),
                     n_obs_ot=obs.sum(axis=0))


def make_prestacked_step_fns(cfg: njode.NJODEConfig, optimizer, times, dts,
                             mesh=None, remat: bool = True,
                             use_pallas: bool = False,
                             pallas_mask_mode: str = "prng",
                             pallas_interpret: bool = False,
                             pallas_force_plan=None):
    """Training steps over a PRE-STACKED record bank (round-3 PhysioNet
    host-gap fix): the per-record event arrays (``k [N, E]`` grid steps with
    sentinel K, ``X/M [N, E, D]``, from e.g.
    ``physionet.prestack_train_records``) live ON DEVICE once; a batch is a
    row-index gather + scatter inside jit, so an epoch needs ZERO host
    collation and ZERO event transfers — only the [n_batches, B] index
    matrix ships. ``start_X = 0`` (the real-data trainers' convention,
    ``climate_train.py:431-432``). Composes with ``mesh`` and the fused
    Pallas kernel exactly like :func:`make_grid_step_fns`.

    Returned fns take the resident bank as arguments:
    ``train_step(params, opt_state, k_all, X_all, M_all, idx, weight, rng,
    loss_scale)`` and ``train_epoch(..., idx_mat [n,B], weight, rngs [n],
    loss_scales [n])``. Pad short batches with row index N (a zero-event
    sentinel record appended by the caller) and scale via ``loss_scale``.
    """
    times = jnp.asarray(times, jnp.float32)
    dts = jnp.asarray(dts, jnp.float32)

    if use_pallas:
        from njode_tpu.ops import fused_scan
        fused = fused_scan.make_fused_loss_fn(cfg,
                                              mask_mode=pallas_mask_mode,
                                              mesh=mesh,
                                              interpret=pallas_interpret,
                                              force_plan=pallas_force_plan)
    if mesh is not None:
        from njode_tpu.parallel.sharding import constrain_batch

    def _batch(k_all, X_all, M_all, idx):
        b = prestacked_batch(k_all, X_all, M_all, idx, times, dts)
        return constrain_batch(b, mesh) if mesh is not None else b

    def _loss(p, batch, weight, rng):
        if use_pallas:
            return fused(p, batch, weight, rng, True)
        _, loss = njode.forward(p, cfg, batch, weight=weight, rng=rng,
                                train=True, get_loss=True, remat=remat)
        return loss

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, k_all, X_all, M_all, idx, weight,
                   rng, loss_scale):
        batch = _batch(k_all, X_all, M_all, idx)
        loss, grads = jax.value_and_grad(
            lambda p: _loss(p, batch, weight, rng) * loss_scale)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_epoch(params, opt_state, k_all, X_all, M_all, idx_mat,
                    weight, rngs, loss_scales):
        def body(carry, inp):
            params, opt_state = carry
            idx, rng, ls = inp
            batch = _batch(k_all, X_all, M_all, idx)
            loss, grads = jax.value_and_grad(
                lambda p: _loss(p, batch, weight, rng) * ls)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (idx_mat, rngs, loss_scales))
        return params, opt_state, losses

    return {"train_step": train_step, "train_epoch": train_epoch}


def make_step_fns(cfg: njode.NJODEConfig, optimizer, times, dts,
                  next_cond_exp=None, use_pallas: bool = False,
                  pallas_mask_mode: str = "prng", remat: bool = False,
                  mesh=None, pallas_interpret: bool = False,
                  pallas_force_plan=None):
    """Build the jitted step functions for a fixed grid.

    :param times/dts: [K] float32 grid arrays (baked as constants)
    :param use_pallas: run the training loss through the fused Pallas scan
        kernel (ops/fused_scan.py); requires a supported config
    :param pallas_mask_mode: dropout-mask source for the kernel ('prng' =
        in-kernel TPU PRNG, fastest; 'input' = exact XLA-path parity)
    :param mesh: 1-D data-parallel ``Mesh``; the fused kernel composes via
        ``shard_map`` (eval keeps the GSPMD-partitioned XLA scan)
    :return: dict of jitted fns
    """
    times = jnp.asarray(times, jnp.float32)
    dts = jnp.asarray(dts, jnp.float32)

    if use_pallas:
        from njode_tpu.ops import fused_scan
        fused = fused_scan.make_fused_loss_fn(cfg,
                                              mask_mode=pallas_mask_mode,
                                              mesh=mesh,
                                              interpret=pallas_interpret,
                                              force_plan=pallas_force_plan)

        def _train_loss(p, batch, weight, rng):
            return fused(p, batch, weight, rng, True)

        if mesh is None:
            fused_eval = fused_scan.make_fused_eval_fn(
                cfg, interpret=pallas_interpret)

            def _eval_loss(p, batch, weight):
                return fused_eval(p, batch, weight)
        else:
            # eval keeps the XLA scan under a mesh (GSPMD partitions it;
            # the fused eval forward measured no win at large batch)
            def _eval_loss(p, batch, weight):
                _, loss = njode.forward(p, cfg, batch, weight=weight,
                                        train=False, get_loss=True)
                return loss
    else:
        def _train_loss(p, batch, weight, rng):
            _, loss = njode.forward(p, cfg, batch, weight=weight, rng=rng,
                                    train=True, get_loss=True, remat=remat)
            return loss

        def _eval_loss(p, batch, weight):
            _, loss = njode.forward(p, cfg, batch, weight=weight,
                                    train=False, get_loss=True)
            return loss

    def _batch(paths, obs, idx):
        return gather_dense_batch(paths, obs, idx, times, dts)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, paths, obs, idx, weight, rng):
        batch = _batch(paths, obs, idx)
        loss, grads = jax.value_and_grad(_train_loss)(params, batch, weight,
                                                      rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def eval_loss(params, paths, obs, idx, weight):
        return _eval_loss(params, _batch(paths, obs, idx), weight)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_epoch(params, opt_state, paths, obs, idx_mat, weight, rng):
        """One full epoch as a single device program: ``lax.scan`` over the
        batch-index matrix ``idx_mat [n_batches, B]``. Removes per-step host
        dispatch entirely (the reference pays a Python iteration per batch,
        ``train.py:491``); returns per-batch losses ``[n_batches]``."""
        keys = jax.random.split(rng, idx_mat.shape[0])

        def body(carry, inp):
            params, opt_state = carry
            idx, key = inp
            batch = _batch(paths, obs, idx)
            loss, grads = jax.value_and_grad(_train_loss)(
                params, batch, weight, key)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (idx_mat, keys))
        return params, opt_state, losses

    @partial(jax.jit, donate_argnums=(0, 1), static_argnums=(10,))
    def train_epochs(params, opt_state, paths, obs, idx_mats, weights,
                     rngs, val_paths, val_obs, val_idx, do_msd):
        """N EPOCHS (+ their evaluations) as ONE device program: a scan
        over epochs of the scan over batches, with the full-val-batch eval
        loss (and optionally the oracle mean-squared-diff) computed
        IN-PROGRAM after each epoch, and the per-epoch params/opt_state
        history returned so checkpoint/plot cadence semantics stay exactly
        the per-epoch loop's. Removes the per-epoch host dispatch round
        trip (~26 ms over the remote tunnel = ~30% of a demo-parity epoch,
        results/RESULTS.md): this is the dispatch-amortized throughput the
        chip actually sustains.

        :param idx_mats: [N, n_batches, B] per-epoch batch indices
        :param weights: [N] loss weights (the per-epoch decay sequence)
        :param rngs: [N] per-epoch PRNG keys (same stream as train_epoch)
        :param val_paths/val_obs/val_idx: the validation split arrays +
            row indices (the trainer's separate val dataset)
        :param do_msd: static bool — compute the oracle metric per epoch
        :return: (params, opt_state, train_last_losses [N],
            eval_losses [N], eval_msds [N], params_hist, opt_hist)
        """
        val_batch = gather_dense_batch(val_paths, val_obs, val_idx,
                                       times, dts)

        def epoch_body(carry, inp):
            params, opt_state = carry
            idx_mat, weight, rng = inp
            keys = jax.random.split(rng, idx_mat.shape[0])

            def body(c, i):
                params, opt_state = c
                idx, key = i
                batch = _batch(paths, obs, idx)
                loss, grads = jax.value_and_grad(_train_loss)(
                    params, batch, weight, key)
                updates, opt_state = optimizer.update(grads, opt_state,
                                                      params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (idx_mat, keys))
            ev = _eval_loss(params, val_batch, weight)
            msd = (njode.evaluate(params, cfg, val_batch, next_cond_exp)
                   if (do_msd and next_cond_exp is not None)
                   else jnp.float32(0.0))
            return (params, opt_state), (losses[-1], ev, msd,
                                         params, opt_state)

        (params, opt_state), (tl, ev, msd, p_hist, o_hist) = jax.lax.scan(
            epoch_body, (params, opt_state), (idx_mats, weights, rngs))
        return params, opt_state, tl, ev, msd, p_hist, o_hist

    fns = {"train_step": train_step, "train_epoch": train_epoch,
           "train_epochs": train_epochs,
           "eval_loss": eval_loss, "times": times, "dts": dts}

    if next_cond_exp is not None:
        @jax.jit
        def eval_msd(params, paths, obs, idx):
            batch = _batch(paths, obs, idx)
            return njode.evaluate(params, cfg, batch, next_cond_exp)

        fns["eval_msd"] = eval_msd

    @jax.jit
    def pred_path(params, paths, obs, idx):
        batch = _batch(paths, obs, idx)
        return njode.get_pred(params, cfg, batch)

    fns["pred_path"] = pred_path
    return fns
