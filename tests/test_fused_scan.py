"""Fused Pallas scan kernel vs the XLA scan: loss and gradient parity in
interpret mode (CPU)."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.flatten_util
import jax.numpy as jnp

from njode_tpu.data import grid
from njode_tpu.models import njode
from njode_tpu.ops import fused_scan

NN = ((13, "tanh"), (7, "relu"))


def make_batch(seed=0, B=8, D=2, steps=15, obs_perc=0.35):
    rs = np.random.RandomState(seed)
    dt = 1.0 / steps
    paths = rs.lognormal(0.0, 0.3, size=(B, D, steps + 1))
    observed = (rs.random((B, steps + 1)) < obs_perc).astype(np.int64)
    observed[0, steps] = 1
    for i in range(B):
        if observed[i, 1:].sum() == 0:
            observed[i, 3] = 1
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, observed, dt))
    return jax.tree.map(jnp.asarray, b)


CONFIGS = [
    dict(),                                  # default: residual, standard
    dict(which_loss="easy"),
    dict(residual_enc_dec=False),
    dict(dropout_rate=0.1),
]


@pytest.mark.parametrize("kw", CONFIGS)
@pytest.mark.parametrize("train", [False, True])
def test_fused_loss_and_grads_match_xla(kw, train):
    cfg = njode.NJODEConfig(input_size=2, hidden_size=10, output_size=2,
                            ode_nn=NN, readout_nn=NN, enc_nn=NN, **kw)
    assert fused_scan.supported(cfg)
    params = njode.init_params(jax.random.PRNGKey(1), cfg)
    batch = make_batch(seed=3)
    rng = jax.random.PRNGKey(7)
    weight = jnp.float32(0.7)

    fused = fused_scan.make_fused_loss_fn(cfg, interpret=True)

    def loss_xla(p):
        _, loss = njode.forward(p, cfg, batch, weight=weight, rng=rng,
                                train=train, get_loss=True)
        return loss

    def loss_fused(p):
        return fused(p, batch, weight, rng, train)

    l_ref, g_ref = jax.value_and_grad(loss_xla)(params)
    l_fus, g_fus = jax.value_and_grad(loss_fused)(params)
    assert np.allclose(float(l_fus), float(l_ref), rtol=1e-5, atol=1e-6)
    flat_ref, _ = jax.flatten_util.ravel_pytree(g_ref)
    flat_fus, _ = jax.flatten_util.ravel_pytree(g_fus)
    assert np.allclose(np.asarray(flat_fus), np.asarray(flat_ref),
                       rtol=2e-4, atol=2e-5), (
        np.abs(np.asarray(flat_fus) - np.asarray(flat_ref)).max())


def test_fused_with_padding_steps():
    """dt==0 padding steps must be exact no-ops in both passes."""
    cfg = njode.NJODEConfig(input_size=1, hidden_size=6, output_size=1,
                            ode_nn=((8, "tanh"),), readout_nn=((8, "tanh"),),
                            enc_nn=((8, "tanh"),))
    params = njode.init_params(jax.random.PRNGKey(0), cfg)
    b = make_batch(seed=5, B=4, D=1, steps=10)
    # append 3 padding steps
    K, B = b.times.shape[0], b.start_X.shape[0]
    pad = 3
    b = b._replace(
        times=jnp.concatenate([b.times, jnp.full((pad,), 1.0)]),
        dt=jnp.concatenate([b.dt, jnp.zeros((pad,))]),
        obs=jnp.concatenate([b.obs, jnp.zeros((pad, B))]),
        X=jnp.concatenate([b.X, jnp.zeros((pad, B, 1))]),
        M=jnp.concatenate([b.M, jnp.zeros((pad, B, 1))]))
    rng = jax.random.PRNGKey(2)
    fused = fused_scan.make_fused_loss_fn(cfg, interpret=True)

    def loss_xla(p):
        _, loss = njode.forward(p, cfg, b, weight=0.5, rng=rng,
                                train=False, get_loss=True)
        return loss

    l_ref, g_ref = jax.value_and_grad(loss_xla)(params)
    l_fus, g_fus = jax.value_and_grad(
        lambda p: fused(p, b, jnp.float32(0.5), rng, False))(params)
    assert np.allclose(float(l_fus), float(l_ref), rtol=1e-5)
    fr, _ = jax.flatten_util.ravel_pytree(g_ref)
    ff, _ = jax.flatten_util.ravel_pytree(g_fus)
    assert np.allclose(np.asarray(ff), np.asarray(fr), rtol=2e-4, atol=2e-5)


def test_supported_gates():
    base = dict(input_size=1, hidden_size=6, output_size=1,
                ode_nn=((8, "tanh"),), readout_nn=((8, "tanh"),),
                enc_nn=((8, "tanh"),))
    assert fused_scan.supported(njode.NJODEConfig(**base))
    assert fused_scan.supported(njode.NJODEConfig(**base, masked=True))
    assert fused_scan.supported(
        njode.NJODEConfig(**base, input_current_t=True))
    assert fused_scan.supported(njode.NJODEConfig(**base, use_rnn=True))
    # masked imputation writes the readout into last_X: needs out == in
    assert not fused_scan.supported(njode.NJODEConfig(
        input_size=1, hidden_size=6, output_size=2, ode_nn=((8, "tanh"),),
        readout_nn=((8, "tanh"),), enc_nn=((8, "tanh"),), masked=True))


def make_masked_batch(seed=0, B=8, D=3, steps=15, obs_perc=0.4):
    """Batch with PARTIAL coordinate masks (like climate/PhysioNet rows)."""
    b = make_batch(seed=seed, B=B, D=D, steps=steps, obs_perc=obs_perc)
    rs = np.random.RandomState(seed + 100)
    K = b.times.shape[0]
    m = (rs.random((K, B, D)) < 0.6).astype(np.float32)
    # every observed (step, row) keeps at least one coordinate
    m[..., 0] = 1.0
    M = jnp.asarray(m) * b.obs[:, :, None]
    return b._replace(M=M, X=b.X * M)


MASKED_CONFIGS = [
    dict(masked=True),
    dict(masked=True, which_loss="easy"),
    dict(masked=True, residual_enc_dec=False),
    dict(masked=True, dropout_rate=0.1),
    dict(masked=True, input_current_t=True),
    dict(input_current_t=True),
    dict(use_rnn=True),
    dict(use_rnn=True, dropout_rate=0.1),
    dict(use_rnn=True, masked=True),
]


@pytest.mark.parametrize("kw", MASKED_CONFIGS)
@pytest.mark.parametrize("train", [False, True])
def test_fused_masked_matches_xla(kw, train):
    """Masked / input_current_t configs (the climate & PhysioNet model
    family, forced masked=True — climate_train.py:177, physionet_train.py:
    152): loss and gradient parity vs the XLA scan."""
    cfg = njode.NJODEConfig(input_size=3, hidden_size=12, output_size=3,
                            ode_nn=NN, readout_nn=NN, enc_nn=NN, **kw)
    assert fused_scan.supported(cfg)
    params = njode.init_params(jax.random.PRNGKey(1), cfg)
    batch = make_masked_batch(seed=3) if kw.get("masked") else \
        make_batch(seed=3, D=3)
    rng = jax.random.PRNGKey(7)
    weight = jnp.float32(0.7)
    fused = fused_scan.make_fused_loss_fn(cfg, interpret=True)

    def loss_xla(p):
        _, loss = njode.forward(p, cfg, batch, weight=weight, rng=rng,
                                train=train, get_loss=True)
        return loss

    l_ref, g_ref = jax.value_and_grad(loss_xla)(params)
    l_fus, g_fus = jax.value_and_grad(
        lambda p: fused(p, batch, weight, rng, train))(params)
    assert np.allclose(float(l_fus), float(l_ref), rtol=1e-5, atol=1e-6)
    fr, _ = jax.flatten_util.ravel_pytree(g_ref)
    ff, _ = jax.flatten_util.ravel_pytree(g_fus)
    assert np.allclose(np.asarray(ff), np.asarray(fr), rtol=2e-4,
                       atol=2e-5), np.abs(np.asarray(ff)
                                          - np.asarray(fr)).max()


@pytest.mark.parametrize("masked", [False, True])
def test_fused_chunked_matches_xla(masked, monkeypatch):
    """Multi-chunk plan (grid over the K axis, carries in scratch): force a
    tiny VMEM budget so K=30 splits into several chunks, incl. a padded
    final chunk; loss and grads must match the XLA scan exactly."""
    cfg = njode.NJODEConfig(input_size=2, hidden_size=10, output_size=2,
                            ode_nn=NN, readout_nn=NN, enc_nn=NN,
                            masked=masked, dropout_rate=0.1)
    params = njode.init_params(jax.random.PRNGKey(1), cfg)
    batch = (make_masked_batch(seed=4, D=2, steps=30) if masked
             else make_batch(seed=4, D=2, steps=30))
    spec = fused_scan._Spec(cfg, "input")
    K, B = batch.times.shape[0], batch.start_X.shape[0]
    full = fused_scan._chunk_vmem_bytes(spec, K, B, True, True, bwd=True)
    monkeypatch.setattr(fused_scan, "MONO_BUDGET", 0)
    monkeypatch.setattr(fused_scan, "VMEM_BUDGET", full // 3)
    plan = fused_scan._plan(spec, K, B, True)
    assert plan is not None and plan[1] >= 3           # really chunked
    assert plan[1] * plan[0] >= K                      # padded final chunk
    rng = jax.random.PRNGKey(9)
    fused = fused_scan.make_fused_loss_fn(cfg, interpret=True)

    def loss_xla(p):
        _, loss = njode.forward(p, cfg, batch, weight=0.6, rng=rng,
                                train=True, get_loss=True)
        return loss

    l_ref, g_ref = jax.value_and_grad(loss_xla)(params)
    l_fus, g_fus = jax.value_and_grad(
        lambda p: fused(p, batch, jnp.float32(0.6), rng, True))(params)
    assert np.allclose(float(l_fus), float(l_ref), rtol=1e-5, atol=1e-6)
    fr, _ = jax.flatten_util.ravel_pytree(g_ref)
    ff, _ = jax.flatten_util.ravel_pytree(g_fus)
    assert np.allclose(np.asarray(ff), np.asarray(fr), rtol=2e-4, atol=2e-5)


def test_vmapped_plan_never_mono():
    """A plan for a kernel under a jax.vmap member axis must always chunk:
    the mono layout's scoped-VMEM stack grows with the vmap extent and
    fails remote compile at E>=4 (measured 29.9-58.9M vs the 16M limit on
    the bench config whose single-member mono plan is ~14.7M — round 3,
    scripts/vmap_kernel_calib.py)."""
    cfg = njode.NJODEConfig(input_size=1, hidden_size=10, output_size=1,
                            ode_nn=((50, "tanh"), (50, "tanh")),
                            readout_nn=((50, "tanh"), (50, "tanh")),
                            enc_nn=((50, "tanh"), (50, "tanh")),
                            dropout_rate=0.1)
    spec = fused_scan._Spec(cfg, "prng")
    K, B = 100, 200
    solo = fused_scan._plan(spec, K, B, True)
    assert solo is not None and solo[1] == 1        # solo stays mono-fast
    grouped = fused_scan._plan(spec, K, B, True, vmapped=True)
    assert grouped is not None and grouped[1] >= 2  # vmapped always chunks


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pltpu.prng_seed has no CPU interpret rule")
def test_prng_mask_mode():
    """In-kernel PRNG dropout ('prng' mode): deterministic per rng,
    differentiable, statistically equivalent to input-mode dropout.
    (TPU-only: driven by the on-chip verification runs.)"""
    cfg = njode.NJODEConfig(input_size=2, hidden_size=10, output_size=2,
                            ode_nn=NN, readout_nn=NN, enc_nn=NN,
                            dropout_rate=0.1)
    params = njode.init_params(jax.random.PRNGKey(1), cfg)
    batch = make_batch(seed=3)
    rng = jax.random.PRNGKey(7)
    weight = jnp.float32(0.5)
    fused = fused_scan.make_fused_loss_fn(cfg, mask_mode="prng")

    l1 = fused(params, batch, weight, rng, True)
    l2 = fused(params, batch, weight, rng, True)
    assert np.isfinite(float(l1))
    # deterministic given the same rng; different rng -> different masks
    assert float(l1) == float(l2)
    l3 = fused(params, batch, weight, jax.random.PRNGKey(8), True)
    assert float(l3) != float(l1)

    # gradient flows and is finite (backward re-draws identical masks)
    g = jax.grad(lambda p: fused(p, batch, weight, rng, True))(params)
    flat = jax.flatten_util.ravel_pytree(g)[0]
    assert np.isfinite(np.asarray(flat)).all()

    # eval mode (no dropout) is bit-identical to the input-mode kernel
    fused_in = fused_scan.make_fused_loss_fn(cfg, mask_mode="input")
    le_p = fused(params, batch, weight, rng, False)
    le_i = fused_in(params, batch, weight, rng, False)
    assert float(le_p) == float(le_i)

    # statistical sanity: train-mode losses across rngs bracket the
    # eval-mode loss scale (dropout perturbs but does not explode)
    ls = [float(fused(params, batch, weight, jax.random.PRNGKey(100 + i),
                      True)) for i in range(5)]
    assert np.std(ls) > 0
    assert abs(np.mean(ls) - float(le_p)) < 2.0 * abs(float(le_p)) + 1.0


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pltpu.prng_seed has no CPU interpret rule")
def test_prng_mask_mode_grad_proof():
    """PROOF that the prng-mode backward re-draws the forward's masks:
    reconstruct the in-kernel PRNG mask stream with a standalone dump
    kernel (same seed arithmetic: prng_seed(seed + k), S draws of
    [B, Wmax] per step), replay it through the exact-parity 'input'-mode
    kernel, and require loss AND gradient equality. A seed-offset bug in
    the backward's mask regeneration would break gradient equality here
    while passing every finiteness/determinism check."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cfg = njode.NJODEConfig(input_size=2, hidden_size=10, output_size=2,
                            ode_nn=NN, readout_nn=NN, enc_nn=NN,
                            dropout_rate=0.1)
    params = njode.init_params(jax.random.PRNGKey(1), cfg)
    batch = make_batch(seed=3)
    rng = jax.random.PRNGKey(7)
    weight = jnp.float32(0.5)
    spec = fused_scan._Spec(cfg, "prng")
    K, B = batch.times.shape[0], batch.start_X.shape[0]
    S, W = spec.S, spec.w_max

    # the seed the prng-mode loss_fn derives from rng (same split tree)
    _, k_scan = jax.random.split(rng, 2)
    _, k_u = jax.random.split(k_scan)
    seed = jax.random.randint(k_u, (), 0, 1 << 24)

    thresh = np.uint32(min(int((1.0 - spec.rate) * 2.0 ** 32), 2 ** 32 - 1))

    def dump_kernel(seed_ref, out_ref):
        def body(k, _):
            pltpu.prng_seed(seed_ref[0, 0] + k)
            for s in range(S):
                bits = pltpu.bitcast(pltpu.prng_random_bits((B, W)),
                                     jnp.uint32)
                out_ref[k, s] = (bits < thresh).astype(jnp.int8)
            return 0
        jax.lax.fori_loop(0, K, body, 0)

    u_dump = pl.pallas_call(
        dump_kernel,
        out_shape=jax.ShapeDtypeStruct((K, S, B, W), jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(seed, jnp.int32).reshape(1, 1))

    fused_prng = fused_scan.make_fused_loss_fn(cfg, mask_mode="prng")
    fused_replay = fused_scan.make_fused_loss_fn(cfg, mask_mode="input",
                                                 u_override=u_dump)
    l_p, g_p = jax.value_and_grad(
        lambda p: fused_prng(p, batch, weight, rng, True))(params)
    l_i, g_i = jax.value_and_grad(
        lambda p: fused_replay(p, batch, weight, rng, True))(params)
    assert float(l_p) == float(l_i), (float(l_p), float(l_i))
    fp, _ = jax.flatten_util.ravel_pytree(g_p)
    fi, _ = jax.flatten_util.ravel_pytree(g_i)
    np.testing.assert_allclose(np.asarray(fp), np.asarray(fi),
                               rtol=0, atol=0)


def test_fused_eval_matches_xla():
    """Histogram-free eval kernel: loss equals the XLA eval forward."""
    cfg = njode.NJODEConfig(input_size=2, hidden_size=10, output_size=2,
                            ode_nn=NN, readout_nn=NN, enc_nn=NN,
                            dropout_rate=0.1)
    params = njode.init_params(jax.random.PRNGKey(1), cfg)
    batch = make_batch(seed=3)
    ev = fused_scan.make_fused_eval_fn(cfg, interpret=True)
    l_f = ev(params, batch, jnp.float32(0.7))
    _, l_x = njode.forward(params, cfg, batch, weight=0.7, train=False,
                           get_loss=True)
    assert np.allclose(float(l_f), float(l_x), rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# batch-block plans (wide nets with no K-chunk plan at the full batch)
# ---------------------------------------------------------------------------


def test_block_plan_exists_for_climate_400():
    """The climate-400 convergence-study shape (D=5, H=50, 400-400 nets,
    masked, K=2004, B=100) has NO K-chunked plan — the smallest legal chunk
    compiles to 17.02M scoped VMEM against the 16M limit (measured,
    results/RESULTS.md 'Kernel plan probes') — but the batch-parallel
    kernel CAN block along B. Pure planning math at the real budgets."""
    W = ((400, "tanh"), (400, "tanh"))
    cfg = njode.NJODEConfig(input_size=5, hidden_size=50, output_size=5,
                            ode_nn=W, readout_nn=W, enc_nn=W, masked=True,
                            dropout_rate=0.1)
    spec = fused_scan._Spec(cfg, "prng")
    K, B = 2004, 100
    assert fused_scan._plan(spec, K, B, True) is None
    bp = fused_scan._block_plan(spec, K, B, True)
    assert bp is not None
    CK, NC, K_pad, BB, NB = bp
    assert BB % 8 == 0 and BB < B and NB * BB >= B
    assert CK % 8 == 0 and NC * CK == K_pad >= K


def _force_block_budgets(monkeypatch, spec, K, B, shrink=2):
    """Monkeypatch the VMEM budgets so the full-B chunk search fails but a
    batch-block plan exists; returns the block plan."""
    need_full = max(
        fused_scan._chunk_vmem_bytes(spec, 8, B, True, True, bwd=False),
        fused_scan._chunk_vmem_bytes(spec, 8, B, True, True, bwd=True))
    monkeypatch.setattr(fused_scan, "MONO_BUDGET", 0)
    monkeypatch.setattr(fused_scan, "MONO_MAX_BUFFER", 0)
    monkeypatch.setattr(fused_scan, "VMEM_BUDGET",
                        need_full // shrink if shrink > 1 else need_full - 1)
    assert fused_scan._plan(spec, K, B, True) is None
    bp = fused_scan._block_plan(spec, K, B, True)
    assert bp is not None and bp[3] < B and bp[4] >= 2
    return bp


@pytest.mark.parametrize("masked", [False, True])
def test_blocked_kernel_matches_xla(masked, monkeypatch):
    """Batch-block path (vmap over BB-row blocks, padded batch tail):
    loss and gradients must match the XLA scan, incl. 'input'-mode
    dropout masks splitting with their rows."""
    cfg = njode.NJODEConfig(input_size=2, hidden_size=10, output_size=2,
                            ode_nn=NN, readout_nn=NN, enc_nn=NN,
                            masked=masked, dropout_rate=0.1)
    batch = (make_masked_batch(seed=4, D=2, B=20) if masked
             else make_batch(seed=4, B=20))
    spec = fused_scan._Spec(cfg, "input")
    K, B = batch.times.shape[0], batch.start_X.shape[0]
    bp = _force_block_budgets(monkeypatch, spec, K, B)
    assert bp[4] * bp[3] > B                 # padded batch tail in play
    params = njode.init_params(jax.random.PRNGKey(1), cfg)
    rng = jax.random.PRNGKey(9)
    fused = fused_scan.make_fused_loss_fn(cfg, interpret=True)

    def loss_xla(p):
        _, loss = njode.forward(p, cfg, batch, weight=0.6, rng=rng,
                                train=True, get_loss=True)
        return loss

    l_ref, g_ref = jax.value_and_grad(loss_xla)(params)
    l_fus, g_fus = jax.value_and_grad(
        lambda p: fused(p, batch, jnp.float32(0.6), rng, True))(params)
    assert np.allclose(float(l_fus), float(l_ref), rtol=1e-5, atol=1e-6)
    fr, _ = jax.flatten_util.ravel_pytree(g_ref)
    ff, _ = jax.flatten_util.ravel_pytree(g_fus)
    assert np.allclose(np.asarray(ff), np.asarray(fr), rtol=2e-4,
                       atol=2e-5), np.abs(np.asarray(ff)
                                          - np.asarray(fr)).max()


def test_blocked_kernel_under_mesh(monkeypatch):
    """Blocking composes with the data-parallel shard_map: each shard
    blocks its LOCAL batch; loss and grads match the XLA scan."""
    from njode_tpu.parallel import sharding

    cfg = njode.NJODEConfig(input_size=2, hidden_size=10, output_size=2,
                            ode_nn=NN, readout_nn=NN, enc_nn=NN,
                            dropout_rate=0.1)
    batch = make_batch(seed=4, B=40)
    spec = fused_scan._Spec(cfg, "input")
    K = batch.times.shape[0]
    _force_block_budgets(monkeypatch, spec, K, 20)   # per-shard batch
    params = njode.init_params(jax.random.PRNGKey(1), cfg)
    rng = jax.random.PRNGKey(9)
    mesh = sharding.make_mesh(2)
    fused = fused_scan.make_fused_loss_fn(cfg, interpret=True, mesh=mesh)

    def loss_xla(p):
        _, loss = njode.forward(p, cfg, batch, weight=0.6, rng=rng,
                                train=True, get_loss=True)
        return loss

    l_ref, g_ref = jax.value_and_grad(loss_xla)(params)
    l_fus, g_fus = jax.value_and_grad(
        lambda p: fused(p, batch, jnp.float32(0.6), rng, True))(params)
    assert np.allclose(float(l_fus), float(l_ref), rtol=1e-5, atol=1e-6)
    fr, _ = jax.flatten_util.ravel_pytree(g_ref)
    ff, _ = jax.flatten_util.ravel_pytree(g_fus)
    assert np.allclose(np.asarray(ff), np.asarray(fr), rtol=2e-4, atol=2e-5)


def test_plan_pins_at_calibrated_shapes():
    """Pin the planner's decisions at the two on-chip-calibrated shapes
    with the REAL production budgets (pure planner math, no kernel run).
    If MONO_BUDGET / VMEM_BUDGET / _live_rows or the footprint
    estimators drift, this catches the plan change at exactly the shapes
    whose plans were measured on the chip (results/RESULTS.md "Kernel
    plan probes" and "Batch-block kernel plans")."""
    W50 = ((50, "tanh"), (50, "tanh"))
    demo = fused_scan._Spec(njode.NJODEConfig(
        input_size=1, hidden_size=10, output_size=1,
        ode_nn=W50, readout_nn=W50, enc_nn=W50, dropout_rate=0.1), "prng")
    # demo/bench shape: whole scan resident (mono), measured 4% faster
    # than the best forced chunk plan solo (259k vs 248k paths/s)
    assert fused_scan._plan(demo, 100, 200, True) == (100, 1, 100)
    # under a grouped-sweep member vmap the same shape must CHUNK (mono's
    # scoped VMEM grows with the vmap extent; OOM'd at E=4 on chip)
    vp = fused_scan._plan(demo, 100, 200, True, vmapped=True)
    assert vp is not None and vp[1] > 1 and vp[0] % 8 == 0

    W400 = ((400, "tanh"), (400, "tanh"))
    wide = fused_scan._Spec(njode.NJODEConfig(
        input_size=5, hidden_size=50, output_size=5,
        ode_nn=W400, readout_nn=W400, enc_nn=W400,
        dropout_rate=0.1, masked=True), "prng")
    # climate-400 shape: NO K-chunk plan at the full batch (CK=8 compiled
    # to 17.02M scoped VMEM vs the 16M limit on chip) ...
    assert fused_scan._plan(wide, 2004, 100, True) is None
    # ... so the batch-BLOCK plan engages; the planner's measured choice
    # was BB=40, NB=3, CK=8 (48-50 ms/step vs 115-117 for XLA remat)
    assert fused_scan._block_plan(wide, 2004, 100, True) == (
        8, 251, 2008, 40, 3)

    # round-4 width-grid calibration pins (results/plan_calibration.json,
    # K=2004, B=100 masked climate shapes): the planner's CK choice and
    # the fitted live-rows bias model at every probed width
    def wspec(w, h=50):
        nn = ((w, "tanh"), (w, "tanh"))
        return fused_scan._Spec(njode.NJODEConfig(
            input_size=5, hidden_size=h, output_size=5, ode_nn=nn,
            readout_nn=nn, enc_nn=nn, dropout_rate=0.1, masked=True),
            "prng")

    for w in (50, 100, 200):
        # CK=16 at the production budgets (CK=24 compiled on chip but
        # measured SLOWER at w=50/100 — 12.3 vs 10.9 ms/step — so the
        # conservative budget is also the fast choice)
        assert fused_scan._plan(wspec(w), 2004, 100, True) == (
            16, 126, 2016), w
    # fitted bias model: reproduces the measured per-width biases' signs
    assert fused_scan._live_rows(wspec(50)) == 0       # measured -19.0
    assert fused_scan._live_rows(wspec(100)) == 0      # measured -20.8
    # w=200 measured a POSITIVE bias bound (+5.8); the r>=2 floor keeps
    # the margin at >= 6 rows instead of the fit's clamped 0 (ADVICE r4)
    assert fused_scan._live_rows(wspec(200)) == 6
    assert fused_scan._live_rows(wspec(400)) == 28     # measured +28.8
    # w=800: resident weights alone blow scoped VMEM at ANY CK/BB — no
    # kernel plan of any kind; the XLA remat fallback is the right call
    w800 = wspec(800)
    assert fused_scan._plan(w800, 2004, 100, True) is None
    assert fused_scan._block_plan(w800, 2004, 100, True) is None

    # round-5 B/K-dependence probe pins (plan_calibration.json B=200 /
    # K=1000 rows): every probed arm was measured INFEASIBLE on chip
    # (actual scoped 16.3-18.7M > the 16M limit), and the planner must
    # keep rejecting each forced CK — all five fail the VMEM_BUDGET
    # gate outright, independent of the (falsified-as-a-law, kept-as-a-
    # bound) live-rows bias term; see _live_rows.
    for w, B, K, CK in ((50, 200, 2004, 16), (100, 200, 2004, 16),
                        (200, 200, 2004, 16), (400, 200, 2004, 8),
                        (400, 100, 1000, 16)):
        assert not fused_scan._fits_chunk(wspec(w), CK, B, True, True), \
            (w, B, K, CK)
    # ... while the planner still finds the chip-verified plans at the
    # same widths and B=200: K-chunk at w<=200 (smaller CK), block at 400
    assert fused_scan._plan(wspec(50), 2004, 200, True)[0] == 8
    bp = fused_scan._block_plan(wspec(400), 2004, 200, True)
    assert bp is not None and bp[3] == 40  # same verified BB as B=100


def test_blocked_kernel_under_member_vmap(monkeypatch):
    """Blocking composes with the grouped-sweep member vmap (nested vmap:
    member axis outer, block axis inner): per-member losses and grads
    match the solo blocked kernel's."""
    cfg = njode.NJODEConfig(input_size=1, hidden_size=8, output_size=1,
                            ode_nn=((9, "tanh"),), readout_nn=((9, "tanh"),),
                            enc_nn=((9, "tanh"),))
    batch = make_batch(seed=4, B=16, D=1, steps=10)
    spec = fused_scan._Spec(cfg, "input")
    K, B = batch.times.shape[0], batch.start_X.shape[0]
    # tiny widths: the live-activation margin dominates, so the block plan
    # only fits just under the full-batch footprint
    _force_block_budgets(monkeypatch, spec, K, B, shrink=1)
    keys = [jax.random.PRNGKey(i) for i in (1, 2)]
    stack = jax.tree.map(lambda *xs: jnp.stack(xs),
                         *[njode.init_params(k, cfg) for k in keys])
    rng = jax.random.PRNGKey(9)
    fused = fused_scan.make_fused_loss_fn(cfg, interpret=True, vmapped=True)

    def member_loss(p):
        return fused(p, batch, jnp.float32(0.5), rng, True)

    l_v, g_v = jax.vmap(jax.value_and_grad(member_loss))(stack)
    for e in range(2):
        p_e = jax.tree.map(lambda x, e=e: x[e], stack)
        l_s, g_s = jax.value_and_grad(member_loss)(p_e)
        assert np.allclose(float(l_v[e]), float(l_s), rtol=1e-6, atol=1e-7)
        fv, _ = jax.flatten_util.ravel_pytree(
            jax.tree.map(lambda x, e=e: x[e], g_v))
        fs, _ = jax.flatten_util.ravel_pytree(g_s)
        assert np.allclose(np.asarray(fv), np.asarray(fs), rtol=1e-5,
                           atol=1e-6)


# ---------------------------------------------------------------------------
# kernel x data-parallel mesh composition (shard_map)
# ---------------------------------------------------------------------------

MESH_CONFIGS = [
    dict(dropout_rate=0.1),
    dict(masked=True, dropout_rate=0.1),
    dict(use_rnn=True),
]


@pytest.mark.parametrize("kw", MESH_CONFIGS)
@pytest.mark.parametrize("train", [False, True])
def test_mesh_kernel_matches_solo_and_xla(kw, train):
    """The shard_map-composed kernel on a 4-device mesh must match BOTH the
    single-device kernel and the XLA scan — loss and gradients, including
    'input'-mode dropout (the XLA prologue draws the global masks, so the
    stream is bit-identical across mesh sizes). This is the composition
    round 2 lacked (use_pallas and mesh were mutually exclusive)."""
    from njode_tpu.parallel import sharding

    cfg = njode.NJODEConfig(input_size=2, hidden_size=10, output_size=2,
                            ode_nn=NN, readout_nn=NN, enc_nn=NN, **kw)
    assert fused_scan.supported(cfg)
    params = njode.init_params(jax.random.PRNGKey(1), cfg)
    batch = (make_masked_batch(seed=3, D=2) if kw.get("masked")
             else make_batch(seed=3))
    rng = jax.random.PRNGKey(7)
    weight = jnp.float32(0.7)
    mesh = sharding.make_mesh(4)

    fused_solo = fused_scan.make_fused_loss_fn(cfg, interpret=True)
    fused_mesh = fused_scan.make_fused_loss_fn(cfg, interpret=True,
                                               mesh=mesh)

    def loss_xla(p):
        _, loss = njode.forward(p, cfg, batch, weight=weight, rng=rng,
                                train=train, get_loss=True)
        return loss

    l_ref, g_ref = jax.value_and_grad(loss_xla)(params)
    l_solo, g_solo = jax.value_and_grad(
        lambda p: fused_solo(p, batch, weight, rng, train))(params)
    l_mesh, g_mesh = jax.value_and_grad(
        lambda p: fused_mesh(p, batch, weight, rng, train))(params)
    assert np.allclose(float(l_mesh), float(l_solo), rtol=1e-6, atol=1e-7)
    assert np.allclose(float(l_mesh), float(l_ref), rtol=1e-5, atol=1e-6)
    fr, _ = jax.flatten_util.ravel_pytree(g_ref)
    fs, _ = jax.flatten_util.ravel_pytree(g_solo)
    fm, _ = jax.flatten_util.ravel_pytree(g_mesh)
    assert np.allclose(np.asarray(fm), np.asarray(fs), rtol=1e-5,
                       atol=1e-6), np.abs(np.asarray(fm)
                                          - np.asarray(fs)).max()
    assert np.allclose(np.asarray(fm), np.asarray(fr), rtol=2e-4, atol=2e-5)


def test_mesh_kernel_local_plan_fits_when_global_does_not(monkeypatch):
    """The per-device VMEM plan is sized for the LOCAL batch: a global
    batch with no single-device plan still runs fused across 8 shards."""
    from njode_tpu.parallel import sharding

    cfg = njode.NJODEConfig(input_size=2, hidden_size=10, output_size=2,
                            ode_nn=NN, readout_nn=NN, enc_nn=NN)
    params = njode.init_params(jax.random.PRNGKey(1), cfg)
    batch = make_batch(seed=3, B=16)
    spec = fused_scan._Spec(cfg, "input")
    K = batch.times.shape[0]
    # budget where B_local=2 fits but the global B=16 does not
    mono16 = fused_scan._mono_vmem_bytes(spec, K, 16, True)
    mono2 = fused_scan._mono_vmem_bytes(spec, K, 2, True)
    assert mono2 < mono16
    monkeypatch.setattr(fused_scan, "MONO_BUDGET", (mono2 + mono16) // 2)
    monkeypatch.setattr(fused_scan, "VMEM_BUDGET", 0)  # no chunk fallback
    assert fused_scan._plan(spec, K, 16, True) is None
    assert fused_scan._plan(spec, K, 2, True) is not None

    rng = jax.random.PRNGKey(7)
    mesh = sharding.make_mesh(8)
    fused_mesh = fused_scan.make_fused_loss_fn(cfg, interpret=True,
                                               mesh=mesh)

    def loss_xla(p):
        _, loss = njode.forward(p, cfg, batch, weight=0.5, rng=rng,
                                train=True, get_loss=True)
        return loss

    l_ref, g_ref = jax.value_and_grad(loss_xla)(params)
    l_mesh, g_mesh = jax.value_and_grad(
        lambda p: fused_mesh(p, batch, jnp.float32(0.5), rng, True))(params)
    assert np.allclose(float(l_mesh), float(l_ref), rtol=1e-5, atol=1e-6)
    fr, _ = jax.flatten_util.ravel_pytree(g_ref)
    fm, _ = jax.flatten_util.ravel_pytree(g_mesh)
    assert np.allclose(np.asarray(fm), np.asarray(fr), rtol=2e-4, atol=2e-5)


def test_mesh_step_fns_sparse_kernel_equivalence():
    """steps.make_sparse_step_fns with mesh + use_pallas: a full train step
    (fwd+bwd+Adam) through the shard-mapped kernel on 8 devices must equal
    the single-device kernel step — the 'fast on eight' configuration."""
    from njode_tpu.data.grid import events_from_paths, sparse_from_events
    from njode_tpu.parallel import sharding
    from njode_tpu.training.steps import make_optimizer, make_sparse_step_fns
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = njode.NJODEConfig(input_size=2, hidden_size=10, output_size=2,
                            ode_nn=NN, readout_nn=NN, enc_nn=NN,
                            masked=True, dropout_rate=0.1)
    rs = np.random.RandomState(0)
    B, D, steps = 16, 2, 12
    dt = 1.0 / steps
    paths = rs.lognormal(0, 0.2, (B, D, steps + 1)).astype(np.float32)
    obs = (rs.random((B, steps + 1)) < 0.4).astype(np.int64)
    obs[:, 5] = 1
    ev = events_from_paths(paths, obs, dt)
    ev["batch_size"] = B
    ev["M"] = np.ones_like(ev["X"])
    sb = sparse_from_events(ev, dt, 1.0, max_steps=steps + 4,
                            max_events=len(ev["obs_idx"]) + 8)

    def run(mesh, use_pallas):
        fns = make_sparse_step_fns(
            cfg, make_optimizer(1e-3), mesh=mesh, use_pallas=use_pallas,
            pallas_mask_mode="input", pallas_interpret=True)
        p = njode.init_params(jax.random.PRNGKey(0), cfg)
        o = make_optimizer(1e-3).init(p)
        bq = jax.tree.map(jnp.asarray, sb)
        if mesh is not None:
            rep = NamedSharding(mesh, P())
            p, o, bq = (jax.device_put(x, rep) for x in (p, o, bq))
        p, o, loss = fns["train_step"](p, o, bq, jnp.float32(0.5),
                                       jax.random.PRNGKey(1),
                                       jnp.float32(1.0))
        return float(loss), p

    l_solo, p_solo = run(None, True)
    l_mesh, p_mesh = run(sharding.make_mesh(8), True)
    l_xla, p_xla = run(sharding.make_mesh(8), False)
    assert np.allclose(l_mesh, l_solo, rtol=1e-6, atol=1e-7)
    fs, _ = jax.flatten_util.ravel_pytree(p_solo)
    fm, _ = jax.flatten_util.ravel_pytree(p_mesh)
    fx, _ = jax.flatten_util.ravel_pytree(p_xla)
    assert np.allclose(np.asarray(fm), np.asarray(fs), rtol=1e-4,
                       atol=1e-6), np.abs(np.asarray(fm)
                                          - np.asarray(fs)).max()
    # vs the XLA mesh step: same math, different dropout-mask transport
    # ('input' mode shares the stream) -> tight here too
    assert np.allclose(np.asarray(fm), np.asarray(fx), rtol=1e-3, atol=1e-5)


def test_select_plan_force_arms():
    """First-class plan forcing (fused_scan._select_plan, VERDICT r3 #1):
    each force value resolves to the demanded layout independent of the
    budget globals — the retired budget-mutation idiom raced against
    trace-time planning and made the round-3 blocked-kernel A/B measure
    the kernel against itself."""
    cfg = njode.NJODEConfig(input_size=2, hidden_size=10, output_size=2,
                            ode_nn=NN, readout_nn=NN, enc_nn=NN,
                            dropout_rate=0.1)
    spec = fused_scan._Spec(cfg, "input")
    K, B = 48, 16
    sel = fused_scan._select_plan
    assert sel(spec, K, B, True, force="xla") == (None, None)
    assert sel(spec, K, B, True, force="mono") == ((K, 1, K), None)
    assert sel(spec, K, B, True, force=("chunk", 8)) == ((8, 6, 48), None)
    plan, bplan = sel(spec, K, B, True, force=("block", 8))
    assert plan is None and bplan[3] == 8 and bplan[4] == 2
    plan, bplan = sel(spec, K, B, True, force=("block", 8, 16))
    assert bplan == (16, 3, 48, 8, 2)
    # budget-driven default: identical to _plan/_block_plan
    assert sel(spec, K, B, True) == (fused_scan._plan(spec, K, B, True),
                                     None)
    with pytest.raises(ValueError, match="unknown force_plan"):
        sel(spec, K, B, True, force="bogus")


def test_select_plan_forced_arms_never_fall_through(monkeypatch):
    """Forced non-XLA arms must RAISE when infeasible — a probe that
    silently fell through to the XLA scan would time the wrong arm (the
    exact failure mode of the round-3 blocked_kernel check)."""
    cfg = njode.NJODEConfig(input_size=2, hidden_size=10, output_size=2,
                            ode_nn=NN, readout_nn=NN, enc_nn=NN)
    spec = fused_scan._Spec(cfg, "input")
    monkeypatch.setattr(fused_scan, "VMEM_BUDGET", 0)
    with pytest.raises(ValueError, match="no CK fits"):
        fused_scan._select_plan(spec, 48, 16, True, force="chunk")
    with pytest.raises(ValueError, match="no batch-block plan"):
        fused_scan._select_plan(spec, 48, 16, True, force="block")


def test_force_plan_xla_arm_never_touches_the_kernel(monkeypatch):
    """force_plan='xla' must run the pure XLA path: poison the kernel
    entry points and the loss must still evaluate (and match
    njode.forward). This is the property whose absence broke the round-3
    blocked-kernel A/B."""
    cfg = njode.NJODEConfig(input_size=2, hidden_size=10, output_size=2,
                            ode_nn=NN, readout_nn=NN, enc_nn=NN,
                            dropout_rate=0.1)
    params = njode.init_params(jax.random.PRNGKey(1), cfg)
    batch = make_batch(seed=3)
    rng = jax.random.PRNGKey(7)

    def boom(*a, **k):
        raise AssertionError("kernel entered under force_plan='xla'")

    monkeypatch.setattr(fused_scan, "fused_njode_loss", boom)
    monkeypatch.setattr(fused_scan, "_blocked_loss", boom)
    fused = fused_scan.make_fused_loss_fn(cfg, interpret=True,
                                          force_plan="xla")
    l_x = jax.jit(lambda p: fused(p, batch, jnp.float32(0.6), rng, True))(
        params)
    _, l_ref = njode.forward(params, cfg, batch, weight=0.6, rng=rng,
                             train=True, get_loss=True, remat=True)
    assert np.allclose(float(l_x), float(l_ref), rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("force", ["mono", ("chunk", 8), ("block", 8)])
def test_force_plan_arms_match_xla(force):
    """Every forced kernel arm computes the same loss and gradients as the
    XLA scan (interpret mode) — forcing changes the LAYOUT only."""
    cfg = njode.NJODEConfig(input_size=2, hidden_size=10, output_size=2,
                            ode_nn=NN, readout_nn=NN, enc_nn=NN,
                            dropout_rate=0.1)
    params = njode.init_params(jax.random.PRNGKey(1), cfg)
    batch = make_batch(seed=3, B=16, steps=20)
    rng = jax.random.PRNGKey(7)
    fused = fused_scan.make_fused_loss_fn(cfg, interpret=True,
                                          force_plan=force)

    def loss_xla(p):
        _, loss = njode.forward(p, cfg, batch, weight=0.6, rng=rng,
                                train=True, get_loss=True)
        return loss

    l_ref, g_ref = jax.value_and_grad(loss_xla)(params)
    l_fus, g_fus = jax.value_and_grad(
        lambda p: fused(p, batch, jnp.float32(0.6), rng, True))(params)
    assert np.allclose(float(l_fus), float(l_ref), rtol=1e-5, atol=1e-6)
    fr, _ = jax.flatten_util.ravel_pytree(g_ref)
    ff, _ = jax.flatten_util.ravel_pytree(g_fus)
    assert np.allclose(np.asarray(ff), np.asarray(fr), rtol=2e-4,
                       atol=2e-5), np.abs(np.asarray(ff)
                                          - np.asarray(fr)).max()
