"""On-chip calibration: can the chunked fused-NJODE kernel cover the
400-wide arms (climate CV / sine experiments) if ``VMEM_BUDGET`` rises?

Round 3 found the climate-400 config (D=5, H=50, 400-400 nets, masked)
has NO feasible chunk plan under the conservative 11MB budget and falls
back to the (remat) XLA scan. Hand accounting puts the CK=8 backward
footprint at ~11.7MB against the MEASURED 16MB scoped-VMEM limit — the
11MB figure was a guessed safety margin (round-2 commit 0ec1db9), not a
measured failure point. This script measures where the real ceiling is:

  python scripts/wide_plan_probe.py            # solo sweep over budgets
  python scripts/wide_plan_probe.py vmap 5     # vmapped-member variant

For each candidate budget it forces ``fused_scan.VMEM_BUDGET``, replans,
compiles + runs jit(value_and_grad(loss)) at the real climate-400 shape
(K=2004, B=100), checks the train=False loss against the XLA scan, and
times both paths (pipelined reps, device-dominated).
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from njode_tpu.data import grid
from njode_tpu.models import njode
from njode_tpu.ops import fused_scan

MODE = sys.argv[1] if len(sys.argv) > 1 else "solo"
E = int(sys.argv[2]) if len(sys.argv) > 2 else 5

D, H, B, K = 5, 50, 100, 2004
NN = ((400, "tanh"), (400, "tanh"))
if MODE == "narrow":
    # the already-kernel-covered climate-50 shape (RESULTS: CK=16,
    # 10.9 ms/step at 11M budget): does a raised budget (bigger CK,
    # fewer chunks) speed it too?
    H = 10
    NN = ((50, "tanh"), (50, "tanh"))
CFG = njode.NJODEConfig(input_size=D, hidden_size=H, output_size=D,
                        ode_nn=NN, readout_nn=NN, enc_nn=NN,
                        dropout_rate=0.1, masked=True)


def make_masked_batch(seed=0, obs_perc=0.08):
    rs = np.random.RandomState(seed)
    dt = 1.0 / K
    paths = rs.lognormal(0.0, 0.2, size=(B, D, K + 1))
    observed = (rs.random((B, K + 1)) < obs_perc).astype(np.int64)
    observed[:, 0] = 0
    for i in range(B):
        if observed[i, 1:].sum() == 0:
            observed[i, 3] = 1
    b = grid.batch_from_paths(paths, observed, dt)
    m = (rs.random((K, B, D)) < 0.6).astype(np.float32)
    m[..., 0] = 1.0
    M = m * np.asarray(b.obs)[:, :, None]
    b = b._replace(M=jnp.asarray(M), X=b.X * jnp.asarray(M))
    return jax.tree.map(jnp.asarray, grid.recompute_n_obs(b))


batch = make_masked_batch()
spec = fused_scan._Spec(CFG, "prng")
MB = 1024 * 1024
for CK in (8, 16, 24, 32):
    fb = fused_scan._chunk_vmem_bytes(spec, CK, B, True, True, bwd=False)
    bb = fused_scan._chunk_vmem_bytes(spec, CK, B, True, True, bwd=True)
    print(f"estimate CK={CK}: fwd={fb / MB:.2f}M bwd={bb / MB:.2f}M",
          flush=True)


def timed(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps, out


def run_solo():
    params = njode.init_params(jax.random.PRNGKey(0), CFG)
    key = jax.random.PRNGKey(7)

    # XLA-scan fallback baseline (MONO/VMEM budgets zeroed -> plan None)
    fused_scan.MONO_BUDGET, fused_scan.VMEM_BUDGET = 0, 0
    xla = fused_scan.make_fused_loss_fn(CFG, mask_mode="prng")
    vg_x = jax.jit(jax.value_and_grad(
        lambda p: xla(p, batch, jnp.float32(0.5), key, True)))
    le_x = jax.jit(lambda p: xla(p, batch, jnp.float32(0.5), key, False))
    tx, (lx, gx) = timed(vg_x, params)
    _, leval_x = timed(le_x, params, reps=3)
    print(f"XLA fallback: {tx * 1e3:.1f} ms/step loss={float(lx):.5f} "
          f"eval_loss={float(leval_x):.6f}", flush=True)

    # Budgets chosen so _plan's largest-fitting-CK search selects exactly
    # CK=8 (est. bwd 11.17M), 16 (15.24M), 24 (19.31M — expected to FAIL
    # the 16M scoped limit; its error message reports the ACTUAL scoped
    # size, measuring the estimator's bias).
    for budget_mb in ((11.5, 15.3, 19.4) if MODE != "narrow"
                      else (11.0, 13.0, 15.3)):
        fused_scan.VMEM_BUDGET = int(budget_mb * MB)
        plan = fused_scan._plan(spec, K, B, True)
        if plan is None:
            print(f"budget {budget_mb}M: no plan", flush=True)
            continue
        CK, NC, Kp = plan
        fused = fused_scan.make_fused_loss_fn(CFG, mask_mode="prng")
        vg = jax.jit(jax.value_and_grad(
            lambda p: fused(p, batch, jnp.float32(0.5), key, True)))
        le = jax.jit(lambda p: fused(p, batch, jnp.float32(0.5), key,
                                     False))
        try:
            t0 = time.time()
            tf, (lf, gf) = timed(vg, params)
            compile_s = time.time() - t0
            _, leval_f = timed(le, params, reps=3)
            rel = abs(float(leval_f) - float(leval_x)) / abs(float(leval_x))
            gn = float(jnp.sqrt(sum(jnp.vdot(x, x)
                                    for x in jax.tree.leaves(gf))).real)
            print(f"budget {budget_mb}M: plan CK={CK} NC={NC} OK "
                  f"compile~{compile_s:.0f}s {tf * 1e3:.1f} ms/step "
                  f"({tx / tf:.2f}x vs XLA) loss={float(lf):.5f} "
                  f"|g|={gn:.3e} eval rel-diff vs XLA={rel:.2e}", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"budget {budget_mb}M: plan CK={CK} NC={NC} FAILED: "
                  f"{str(exc)[:300]}", flush=True)


def run_vmap():
    budget_mb = int(sys.argv[3]) if len(sys.argv) > 3 else 13
    fused_scan.VMEM_BUDGET = budget_mb * MB
    plan = fused_scan._plan(spec, K, B, True, vmapped=True)
    print(f"vmap budget {budget_mb}M plan: {plan}", flush=True)
    if plan is None:
        return
    fused = fused_scan.make_fused_loss_fn(CFG, mask_mode="prng",
                                          vmapped=True)
    params_e = jax.vmap(lambda k: njode.init_params(k, CFG))(
        jax.random.split(jax.random.PRNGKey(1), E))
    keys = jax.random.split(jax.random.PRNGKey(7), E)
    vg = jax.jit(jax.vmap(jax.value_and_grad(
        lambda p, k: fused(p, batch, jnp.float32(0.5), k, True))))
    try:
        t0 = time.time()
        t, (lf, _) = timed(vg, params_e, keys)
        print(f"vmap E={E}: OK compile~{time.time() - t0:.0f}s "
              f"{t * 1e3 / E:.1f} ms/step/member loss[0]={float(lf[0]):.5f}",
              flush=True)
    except Exception as exc:  # noqa: BLE001
        print(f"vmap E={E}: FAILED: {str(exc)[:300]}", flush=True)


def run_blocked():
    """Probe the batch-BLOCK plan at the climate-400 shape (round 3: no
    K-chunk plan exists at B=100 — 17.02M scoped vs 16M at CK=8 — so the
    kernel blocks along B instead). Arms: the planner's own choice at the
    shipped budgets, then any forced BBs passed on argv (e.g.
    ``blocked 16 48``), vs the XLA remat fallback."""
    params = njode.init_params(jax.random.PRNGKey(0), CFG)
    key = jax.random.PRNGKey(7)

    bp = fused_scan._block_plan(spec, K, B, True)
    print(f"planner block plan (CK, NC, K_pad, BB, NB): {bp}", flush=True)

    # XLA-scan remat fallback baseline (budgets zeroed -> no plan at all)
    saved = (fused_scan.MONO_BUDGET, fused_scan.VMEM_BUDGET)
    fused_scan.MONO_BUDGET, fused_scan.VMEM_BUDGET = 0, 0
    xla = fused_scan.make_fused_loss_fn(CFG, mask_mode="prng")
    vg_x = jax.jit(jax.value_and_grad(
        lambda p: xla(p, batch, jnp.float32(0.5), key, True)))
    le_x = jax.jit(lambda p: xla(p, batch, jnp.float32(0.5), key, False))
    tx, (lx, _) = timed(vg_x, params)
    _, leval_x = timed(le_x, params, reps=3)
    print(f"XLA fallback: {tx * 1e3:.1f} ms/step loss={float(lx):.5f} "
          f"eval_loss={float(leval_x):.6f}", flush=True)
    fused_scan.MONO_BUDGET, fused_scan.VMEM_BUDGET = saved

    arms = [None] + [int(a) for a in sys.argv[2:]]
    for force_bb in arms:
        if force_bb is None:
            plan = bp
        else:
            CKf = fused_scan._largest_ck(
                spec, K, force_bb, True, True,
                margin=fused_scan._block_margin(spec, force_bb))
            if CKf is None:
                print(f"BB={force_bb}: no CK fits", flush=True)
                continue
            NCf = -(-K // CKf)
            plan = (CKf, NCf, NCf * CKf, force_bb, -(-B // force_bb))
        if plan is None:
            print("planner: no block plan", flush=True)
            continue
        CK, NC, Kp, BB, NB = plan
        orig = fused_scan._block_plan
        fused_scan._block_plan = lambda *a, **k: plan  # noqa: E731
        try:
            fused = fused_scan.make_fused_loss_fn(CFG, mask_mode="prng")
            vg = jax.jit(jax.value_and_grad(
                lambda p: fused(p, batch, jnp.float32(0.5), key, True)))
            le = jax.jit(lambda p: fused(p, batch, jnp.float32(0.5), key,
                                         False))
            t0 = time.time()
            tf, (lf, gf) = timed(vg, params)
            compile_s = time.time() - t0
            _, leval_f = timed(le, params, reps=3)
            rel = abs(float(leval_f) - float(leval_x)) / abs(float(leval_x))
            gn = float(jnp.sqrt(sum(jnp.vdot(x, x)
                                    for x in jax.tree.leaves(gf))).real)
            print(f"blocked BB={BB} NB={NB} CK={CK} NC={NC}: OK "
                  f"compile~{compile_s:.0f}s {tf * 1e3:.1f} ms/step "
                  f"({tx / tf:.2f}x vs XLA) loss={float(lf):.5f} "
                  f"|g|={gn:.3e} eval rel-diff vs XLA={rel:.2e}", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"blocked BB={BB} NB={NB} CK={CK}: FAILED: "
                  f"{str(exc)[:300]}", flush=True)
        finally:
            fused_scan._block_plan = orig


if MODE == "vmap":
    run_vmap()
elif MODE == "blocked":
    run_blocked()
else:
    run_solo()          # 'solo' (400-wide) and 'narrow' (climate-50) modes
