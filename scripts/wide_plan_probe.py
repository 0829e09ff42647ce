"""On-chip kernel-plan probes and the WIDTH-GRID planner calibration.

Round 3 measured the 400-wide wall at ONE point: the CK=8 backward
compiled to 17.02M scoped VMEM vs the 11.17M estimate, and the one-point
margin (28 live rows) was fitted from that single shape
(fused_scan._block_margin). This script is the round-4 multi-width
calibration lane (VERDICT r3 item 3): every arm forces its plan through
the FIRST-CLASS ``force_plan`` parameter (fused_scan._select_plan) — the
module-global budget mutation idiom is gone (it raced against trace-time
planning and invalidated the round-3 blocked-kernel A/B).

Modes:

  python scripts/wide_plan_probe.py                 # 400-wide CK ladder
  python scripts/wide_plan_probe.py narrow          # climate-50 CK ladder
  python scripts/wide_plan_probe.py vmap 5 [CK]     # vmapped-member arm
  python scripts/wide_plan_probe.py blocked [BB...] # batch-block arms
  python scripts/wide_plan_probe.py widths [50 100 200 400 800]
      # calibration grid: per width, walk a forced-CK ladder upward until
      # Mosaic rejects the compile; the rejection message reports the
      # ACTUAL scoped-VMEM size, so (actual - estimate) measures the
      # live-activation bias _chunk_vmem_bytes does not model. Emits
      # ``CALIB {json}`` lines for results/plan_calibration.json.

Shapes: the climate CV grid (K=2004, B=100, masked, D=5) — the family
whose 400-wide arms hit the round-3 wall. ``NJODE_PROBE_B`` /
``NJODE_PROBE_K`` override the batch size / grid length (round-5
B-dependence probe, VERDICT r4 item 4: ``_fits_chunk`` scales the bias
by ``_pad8(B)``, an assumption calibrated only at B=100/K=2004); when
overridden, the ``widths`` mode uses ``NJODE_PROBE_CKS`` (comma list)
as the ladder for every requested width.
"""
import json
import os
import re
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

D, H = 5, 50
B = int(os.environ.get("NJODE_PROBE_B", "100"))
K = int(os.environ.get("NJODE_PROBE_K", "2004"))
MB = 1024 * 1024


def make_cfg(width, hidden=50):
    nn = ((width, "tanh"), (width, "tanh"))
    return njode.NJODEConfig(input_size=D, hidden_size=hidden, output_size=D,
                             ode_nn=nn, readout_nn=nn, enc_nn=nn,
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


def timed(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps, out


_SCOPED_RE = re.compile(r"[Ss]coped allocation with size ([0-9.]+)([MKG])")


def _scoped_bytes(msg):
    """Parse Mosaic's 'Scoped allocation with size 17.02M and limit
    16.00M' rejection into bytes; None when the failure is another kind."""
    m = _SCOPED_RE.search(msg)
    if not m:
        return None
    mult = {"K": 1024, "M": MB, "G": 1024 * MB}[m.group(2)]
    return int(float(m.group(1)) * mult)


def _xla_arm(cfg, batch, key, reps=10):
    xla = fused_scan.make_fused_loss_fn(cfg, mask_mode="prng",
                                        force_plan="xla")
    vg_x = jax.jit(jax.value_and_grad(
        lambda p: xla(p, batch, jnp.float32(0.5), key, True)))
    le_x = jax.jit(lambda p: xla(p, batch, jnp.float32(0.5), key, False))
    return vg_x, le_x


def run_ladder(cfg, cks, with_xla=True):
    """Force-CK ladder at one config: compile + time each arm, parity-check
    eval loss vs the XLA scan, and harvest actual scoped-VMEM sizes from
    Mosaic rejections. ``with_xla=False`` skips the XLA baseline arm (a
    4-6 min remote compile) for pure VMEM-calibration runs."""
    batch = make_masked_batch()
    spec = fused_scan._Spec(cfg, "prng")
    params = njode.init_params(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(7)
    width = spec.w_max

    tx = leval_x = None
    if with_xla:
        vg_x, le_x = _xla_arm(cfg, batch, key)
        tx, (lx, _) = timed(vg_x, params)
        _, leval_x = timed(le_x, params, reps=3)
        print(f"w={width} XLA fallback: {tx * 1e3:.1f} ms/step "
              f"loss={float(lx):.5f} eval_loss={float(leval_x):.6f}",
              flush=True)
    rows = []
    for CK in cks:
        est_f = fused_scan._chunk_vmem_bytes(spec, CK, B, True, True, False)
        est_b = fused_scan._chunk_vmem_bytes(spec, CK, B, True, True, True)
        est = max(est_f, est_b)
        row = {"width": int(width), "B": B, "K": K, "CK": int(CK),
               "est_bytes": int(est), "est_fwd": int(est_f),
               "est_bwd": int(est_b)}
        fused = fused_scan.make_fused_loss_fn(cfg, mask_mode="prng",
                                              force_plan=("chunk", CK))
        vg = jax.jit(jax.value_and_grad(
            lambda p: fused(p, batch, jnp.float32(0.5), key, True)))
        le = jax.jit(lambda p: fused(p, batch, jnp.float32(0.5), key, False))
        try:
            t0 = time.time()
            tf, (lf, gf) = timed(vg, params)
            row.update(ok=True, compile_s=round(time.time() - t0, 1),
                       ms_step=round(tf * 1e3, 1))
            gn = float(jnp.sqrt(sum(jnp.vdot(x, x)
                                    for x in jax.tree.leaves(gf))).real)
            finite = bool(jnp.isfinite(lf)) and bool(np.isfinite(gn))
            row["grads_finite"] = finite
            tag = ""
            if with_xla:
                row["speedup_vs_xla"] = round(tx / tf, 2)
                _, leval_f = timed(le, params, reps=3)
                rel = (abs(float(leval_f) - float(leval_x))
                       / abs(float(leval_x)))
                row["eval_rel_diff"] = rel
                tag = f"({tx / tf:.2f}x vs XLA) eval rel-diff={rel:.2e} "
            print(f"w={width} CK={CK}: OK est={est / MB:.2f}M "
                  f"{tf * 1e3:.1f} ms/step {tag}"
                  f"loss={float(lf):.5f} |g|={gn:.3e}", flush=True)
        except Exception as exc:  # noqa: BLE001
            actual = _scoped_bytes(str(exc))
            row.update(ok=False, actual_scoped_bytes=actual,
                       error=str(exc)[:200])
            if actual is not None:
                bias = actual - est
                rows_est = bias / (fused_scan._pad8(B)
                                   * fused_scan._lane(width) * 4)
                row["bias_bytes"] = int(bias)
                row["bias_live_rows"] = round(rows_est, 1)
                print(f"w={width} CK={CK}: SCOPED-FAIL est={est / MB:.2f}M "
                      f"actual={actual / MB:.2f}M bias={bias / MB:.2f}M "
                      f"(~{rows_est:.1f} live [Bp, w] rows)", flush=True)
            else:
                print(f"w={width} CK={CK}: FAILED {str(exc)[:200]}",
                      flush=True)
        print("CALIB " + json.dumps(row), flush=True)
        rows.append(row)
        if not row["ok"] and row.get("actual_scoped_bytes"):
            # one rejection actual per width is the datapoint; a second
            # bigger CK only recompiles 4-6 min for a redundant point
            break
    return rows


# Hand-picked calibration ladders (chosen from the estimator table so
# each width gets one expected-OK arm just under the 16M scoped limit and
# one expected-reject arm just over it — the rejection message carries
# the ACTUAL scoped size, bracketing the estimator bias per width).
WIDTH_LADDERS = {
    50: (24, 32),     # planner CK=16 (est 8.9M); 24 est 13.0M, 32 est 17.1M
    100: (24, 32),    # planner CK=16 (est 9.3M); 24 est 13.4M, 32 est 17.4M
    200: (16, 24),    # planner CK=16 (est 10.6M); 24 est 14.7M
    400: (8,),        # no plan at B=100 (round-3 actual 17.02M at CK=8)
}


def run_widths():
    widths = [int(a) for a in sys.argv[2:]] or [50, 100, 200, 400]
    env_cks = os.environ.get("NJODE_PROBE_CKS")
    out = []
    for w in widths:
        cfg = make_cfg(w)
        spec = fused_scan._Spec(cfg, "prng")
        chosen = fused_scan._largest_ck(spec, K, B, True, True)
        if env_cks:
            ladder = tuple(int(c) for c in env_cks.split(","))
        else:
            ladder = WIDTH_LADDERS.get(w)
        if ladder is None:
            est8 = max(fused_scan._chunk_vmem_bytes(spec, 8, B, True, True,
                                                    bwd)
                       for bwd in (False, True))
            ladder = (8,) if est8 < 24 * MB else ()
        print(f"== width {w}: ladder {list(ladder)} (planner CK={chosen}) "
              f"==", flush=True)
        out += run_ladder(cfg, ladder, with_xla=False)
    print("CALIB_ALL " + json.dumps(out), flush=True)


def run_vmap():
    CK = int(sys.argv[3]) if len(sys.argv) > 3 else None
    cfg = make_cfg(400)
    batch = make_masked_batch()
    spec = fused_scan._Spec(cfg, "prng")
    force = ("chunk", CK) if CK else "chunk"
    try:
        plan, _ = fused_scan._select_plan(spec, K, B, True, vmapped=True,
                                          force=force)
    except ValueError as exc:
        print(f"vmap: {exc}", flush=True)
        return
    print(f"vmap plan: {plan}", flush=True)
    fused = fused_scan.make_fused_loss_fn(cfg, mask_mode="prng",
                                          vmapped=True, force_plan=force)
    params_e = jax.vmap(lambda k: njode.init_params(k, cfg))(
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
    """Batch-block arms at the climate-400 shape: the planner's own block
    plan, then any forced BBs from argv, vs the XLA remat fallback."""
    cfg = make_cfg(400)
    batch = make_masked_batch()
    spec = fused_scan._Spec(cfg, "prng")
    params = njode.init_params(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(7)

    print(f"planner block plan (CK, NC, K_pad, BB, NB): "
          f"{fused_scan._block_plan(spec, K, B, True)}", flush=True)
    vg_x, le_x = _xla_arm(cfg, batch, key)
    tx, (lx, _) = timed(vg_x, params)
    _, leval_x = timed(le_x, params, reps=3)
    print(f"XLA fallback: {tx * 1e3:.1f} ms/step loss={float(lx):.5f} "
          f"eval_loss={float(leval_x):.6f}", flush=True)

    arms = [None] + [int(a) for a in sys.argv[2:]]
    for force_bb in arms:
        force = "block" if force_bb is None else ("block", force_bb)
        try:
            _, bplan = fused_scan._select_plan(spec, K, B, True, force=force)
        except ValueError as exc:
            print(f"BB={force_bb}: {exc}", flush=True)
            continue
        CK, NC, Kp, BB, NB = bplan
        try:
            fused = fused_scan.make_fused_loss_fn(cfg, mask_mode="prng",
                                                  force_plan=force)
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
            actual = _scoped_bytes(str(exc))
            tag = (f"scoped={actual / MB:.2f}M " if actual else "")
            print(f"blocked BB={BB} NB={NB} CK={CK}: FAILED {tag}"
                  f"{str(exc)[:300]}", flush=True)


def run_solo(narrow=False):
    cfg = make_cfg(50, hidden=10) if narrow else make_cfg(400)
    run_ladder(cfg, (8, 16, 24) if not narrow else (16, 32, 64))


if MODE == "vmap":
    run_vmap()
elif MODE == "blocked":
    run_blocked()
elif MODE == "widths":
    run_widths()
elif MODE == "narrow":
    run_solo(narrow=True)
else:
    run_solo()
