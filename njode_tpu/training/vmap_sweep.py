"""Vmapped multi-model training: an ensemble of NJODE models trained
simultaneously on one chip.

The reference's only parallelism is a joblib process pool over independent
hyperparameter runs (``parallel_train.py:214-224``) — 27 CPU processes each
training one tiny model. On TPU the idiomatic form for *same-architecture*
runs (e.g. the convergence study's x5 repeats per configuration,
``parallel_train.py:292-351``) is ``jax.vmap`` over a stacked parameter
pytree: E models advance together in one jitted program, turning the
hardware's under-utilization on a single [batch<=200, width<=400] MLP into
model-axis parallelism (SURVEY §2.16 "vmapped multi-model training on one
chip for small nets").

Each ensemble member gets its own init seed, its own batch shuffling, and
its own dropout stream; member 0 with ``seeds=[s]`` reproduces a solo run
of the same step math exactly (tested).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from njode_tpu.models import njode
from njode_tpu.training.steps import gather_dense_batch, make_optimizer


def init_ensemble(cfg: njode.NJODEConfig, seeds):
    """Stacked parameter pytree: leaf shapes ``[E, ...]``."""
    keys = [jax.random.PRNGKey(int(s)) for s in seeds]
    all_params = [njode.init_params(k, cfg) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *all_params)


def _pad_net(layers, widths_small, widths_big):
    out = []
    for p, (i_s, o_s), (i_b, o_b) in zip(
            layers, zip(widths_small[:-1], widths_small[1:]),
            zip(widths_big[:-1], widths_big[1:])):
        q = {"w": jnp.zeros((i_b, o_b), jnp.float32).at[:i_s, :o_s].set(
            p["w"])}
        if "b" in p:
            q["b"] = jnp.zeros((o_b,), jnp.float32).at[:o_s].set(p["b"])
        out.append(q)
    return out


def _net_widths(cfg, which):
    # single source of truth for the input layout lives with the model
    # (models/njode.py) so the zero-padded super-architecture can never
    # drift from the real one
    return njode.net_widths(cfg, which)


def hetero_super_config(cfgs):
    """The width-wise maximum configuration over architectures that differ
    ONLY in their MLP layer widths (same input/hidden/output sizes, depths,
    activations, residual/masked/bias flags)."""
    c0 = cfgs[0]
    for c in cfgs[1:]:
        same = (c.input_size == c0.input_size
                and c.hidden_size == c0.hidden_size
                and c.output_size == c0.output_size
                and c.use_rnn == c0.use_rnn and c.bias == c0.bias
                and c.dropout_rate == c0.dropout_rate
                and c.which_loss == c0.which_loss
                and c.residual_enc_dec == c0.residual_enc_dec
                and c.input_current_t == c0.input_current_t
                and c.masked == c0.masked
                and all(len(a) == len(b) and
                        all(x[1] == y[1] for x, y in zip(a, b))
                        for a, b in ((c.ode_nn, c0.ode_nn),
                                     (c.enc_nn, c0.enc_nn),
                                     (c.readout_nn, c0.readout_nn))))
        if not same:
            raise ValueError(
                "heterogeneous ensembles support differing MLP widths only "
                "(same sizes/depths/activations/flags)")

    def wmax(get):
        nns = [get(c) for c in cfgs]
        return tuple((max(nn[i][0] for nn in nns), nns[0][i][1])
                     for i in range(len(nns[0])))

    return dataclasses_replace(c0, ode_nn=wmax(lambda c: c.ode_nn),
                               enc_nn=wmax(lambda c: c.enc_nn),
                               readout_nn=wmax(lambda c: c.readout_nn))


def dataclasses_replace(cfg, **kw):
    import dataclasses
    return dataclasses.replace(cfg, **kw)


def init_hetero_ensemble(cfgs, seeds):
    """Stacked params for DIFFERENT-width architectures trained together —
    the reference's convergence study varies exactly this axis
    (``parallel_train.py:304-305``: network_size 10..320 at fixed
    hidden_size) and runs each on its own CPU process; here the E members
    ride one vmap.

    Each member is initialized with ITS OWN widths (Xavier fans of the
    small net) and zero-padded to the ensemble's width-wise maximum
    architecture. The padding is EXACT, not approximate: a padded unit's
    activation is ``act(0) = 0`` (tanh/relu) and its outgoing weights are
    0, so the forward equals the small net's forward; every gradient to a
    padded entry is a product with one of those zeros, hence 0, so Adam
    moments and L2 decay keep padded entries at exactly 0 for the whole
    run (eval/rate-0 equality is pinned in tests; with dropout the padded
    run is the same architecture under a different — equally distributed —
    mask stream, because mask tensors are drawn at the ensemble width).

    :return: (cfg_super, stacked params [E, ...])
    """
    cfg_big = hetero_super_config(list(cfgs))
    padded = []
    for cfg, s in zip(cfgs, seeds):
        p = njode.init_params(jax.random.PRNGKey(int(s)), cfg)
        q = {name: _pad_net(p[name], _net_widths(cfg, name),
                            _net_widths(cfg_big, name))
             for name in ("ode_f", "encoder", "readout")}
        if "gru" in p:          # width-independent (input/hidden fixed)
            q["gru"] = p["gru"]
        padded.append(q)
    return cfg_big, jax.tree.map(lambda *xs: jnp.stack(xs), *padded)


def make_ensemble_step_fns(cfg: njode.NJODEConfig, optimizer, times, dts):
    """Jitted ensemble train/eval functions.

    ``idx_mat [E, n_batches, B]`` gives each member its own batch order;
    ``rngs [E]`` (uint32 key array) its own dropout stream.
    """
    times = jnp.asarray(times, jnp.float32)
    dts = jnp.asarray(dts, jnp.float32)

    def _one_loss(params, paths, obs, idx, weight, rng):
        batch = gather_dense_batch(paths, obs, idx, times, dts)
        _, loss = njode.forward(params, cfg, batch, weight=weight, rng=rng,
                                train=True, get_loss=True)
        return loss

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_epoch(params_e, opt_state_e, paths, obs, idx_mat_e, weight,
                    rngs_e):
        """One epoch for all members: scan over batches, vmap over models."""
        n_batches = idx_mat_e.shape[1]

        def body(carry, k):
            params_e, opt_state_e = carry

            def one(params, opt_state, idx, rng):
                loss, grads = jax.value_and_grad(_one_loss)(
                    params, paths, obs, idx, weight,
                    jax.random.fold_in(rng, k))
                updates, opt_state = optimizer.update(grads, opt_state,
                                                      params)
                return optax.apply_updates(params, updates), opt_state, loss

            params_e, opt_state_e, losses = jax.vmap(one)(
                params_e, opt_state_e, idx_mat_e[:, k], rngs_e)
            return (params_e, opt_state_e), losses

        (params_e, opt_state_e), losses = jax.lax.scan(
            body, (params_e, opt_state_e), jnp.arange(n_batches))
        return params_e, opt_state_e, losses[-1]

    @jax.jit
    def eval_losses(params_e, paths, obs, idx, weight):
        batch = gather_dense_batch(paths, obs, idx, times, dts)

        def one(params):
            _, loss = njode.forward(params, cfg, batch, weight=weight,
                                    train=False, get_loss=True)
            return loss

        return jax.vmap(one)(params_e)

    return {"train_epoch": train_epoch, "eval_losses": eval_losses}


def train_ensemble(cfg: njode.NJODEConfig, paths, observed, delta_t,
                   train_idx, val_idx, seeds, epochs=10, batch_size=20,
                   learning_rate=1e-3, weight=0.5, weight_decay=1.0,
                   shuffle_seed=0, cfgs=None):
    """Train ``len(seeds)`` models together.

    Same architecture by default; pass ``cfgs`` (one per seed, differing
    only in MLP widths) to train a HETEROGENEOUS ensemble via exact
    zero-padding to the width-wise super-architecture (see
    :func:`init_hetero_ensemble`) — the convergence study's network_size
    axis in one vmap.

    :param paths/observed: full dataset arrays ([N, D, T+1] / [N, T+1])
    :return: dict with stacked 'params' [E, ...], per-epoch
        'train_losses' [epochs, E] (last batch, reference convention) and
        'eval_losses' [epochs, E]
    """
    E = len(seeds)
    K = paths.shape[2] - 1
    times = (np.arange(1, K + 1) * delta_t).astype(np.float32)
    dts = np.full(K, delta_t, dtype=np.float32)
    optimizer = make_optimizer(learning_rate)
    if cfgs is not None:
        assert len(cfgs) == E
        cfg, params_e = init_hetero_ensemble(cfgs, seeds)
    else:
        params_e = init_ensemble(cfg, seeds)
    opt_state_e = jax.vmap(optimizer.init)(params_e)
    fns = make_ensemble_step_fns(cfg, optimizer, times, dts)

    d_paths = jnp.asarray(np.asarray(paths, np.float32))
    d_obs = jnp.asarray(np.asarray(observed, np.float32))
    train_idx = np.asarray(train_idx)
    val_idx = jnp.asarray(np.asarray(val_idx, np.int32))
    n_full = (len(train_idx) // batch_size) * batch_size
    if n_full == 0:
        raise ValueError(
            f"training set ({len(train_idx)}) smaller than "
            f"batch_size={batch_size}")
    rngs_e = jnp.stack([jax.random.PRNGKey(int(s) + 10_000) for s in seeds])

    cur_weight = float(weight)
    train_hist, eval_hist = [], []
    for epoch in range(1, epochs + 1):
        idx_mat = np.stack([
            np.random.RandomState(
                int(s) * 100_003 + epoch
                + 1_000_033 * int(shuffle_seed)).permutation(
                train_idx)[:n_full].reshape(-1, batch_size)
            for s in seeds]).astype(np.int32)
        params_e, opt_state_e, last_losses = fns["train_epoch"](
            params_e, opt_state_e, d_paths, d_obs, jnp.asarray(idx_mat),
            jnp.float32(cur_weight), jax.vmap(jax.random.fold_in)(
                rngs_e, jnp.full(E, epoch)))
        ev = fns["eval_losses"](params_e, d_paths, d_obs, val_idx,
                                jnp.float32(cur_weight))
        train_hist.append(np.asarray(last_losses))
        eval_hist.append(np.asarray(ev))
        cur_weight = float(njode.weight_decay_step(cur_weight, weight_decay))

    return {"params": params_e,
            "train_losses": np.stack(train_hist),
            "eval_losses": np.stack(eval_hist)}
