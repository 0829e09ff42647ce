"""Fused Pallas TPU kernel for the NJODE training scan.

The hot loop (SURVEY §3.2; reference event loop ``NJODE/models.py:379-518``)
is K sequential steps of tiny matmuls ([B<=256, width<=128]) — far too small
to keep the MXU busy from HBM, and dominated by per-op overhead under a
plain XLA ``lax.scan``. This kernel runs the ENTIRE scan in one
``pallas_call``: all weights and the hidden state live in VMEM; the matmuls
hit the MXU with no inter-op round trips. The backward pass is a second
kernel implementing hand-written BPTT: the forward stores only the small
per-step carries (``h``, ``last_X``, ``tau`` — O(K*B*H)), and the backward
re-materializes each step's activations from them in reverse order
(gradient checkpointing at step granularity), accumulating weight gradients
in VMEM.

Long grids are CHUNKED: a sequential TPU grid walks K in chunks of CK
steps; the per-step data (obs/X/M/dropout masks) and the carry histories
stream chunk-by-chunk between HBM and VMEM (double-buffered by the Pallas
pipeline) while the carries persist in VMEM scratch across grid steps. The
backward grid runs the chunks in reverse. This is what lets the
climate/PhysioNet-scale scans (K ~ 2000-3000, masked=True — the reference's
longest workloads, ``climate_train.py:244-247``, ``physionet_train.py:
192-194``) run in the kernel instead of falling back to the XLA scan; a
single-chunk plan (NC=1) is the small-K special case.

Wide nets with NO feasible K-chunk plan at the full batch (the 400-wide
experiment arms: resident weights plus batch-scaled live activations
overflow scoped VMEM at any CK — measured 17.02M vs the 16M limit at CK=8)
run batch-BLOCKED instead: the batch-parallel kernel executes once per
BB-row block under ``jax.vmap`` (``_block_plan``/``_blocked_loss``),
measured 2.4x the remat XLA fallback at the climate-400 shape.

Scope: the FULL NJODE configuration surface — masked and unmasked, with
or without ``input_current_t``, ``use_rnn`` (GRU jump, hand-written GRU
BPTT); both losses; arbitrary MLP depths/widths and residual modes;
dropout via the precomputed mask tensor from models/njode.py or the
in-kernel TPU PRNG. ``supported(cfg)`` reports eligibility (only
non-euler solvers and masked output!=input fall out); unsupported
configurations fall back to the XLA scan.

Semantics match ``njode.forward(..., train=?, get_loss=True)`` exactly
(same dense-grid scan, same fused-dropout convention); verified in
interpret mode against the XLA path and ``jax.grad`` in
tests/test_fused_scan.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-10

# Mosaic's scoped VMEM budget is ~16MB and oversubscription is a compile
# error; plans are sized against this with headroom for the pipeline.
VMEM_BUDGET = 11 * 1024 * 1024


def supported(cfg) -> bool:
    """Whether this kernel covers the given NJODEConfig."""
    return (cfg.solver == "euler"
            and cfg.which_loss in ("standard", "easy")
            and cfg.ode_nn is not None and cfg.readout_nn is not None
            and cfg.enc_nn is not None
            and (not cfg.masked or cfg.output_size == cfg.input_size)
            # the kernel is fp32 end-to-end; bf16 configs use the XLA
            # path (measured: no MXU win at these matmul widths anyway,
            # results/RESULTS.md round-3 mixed-precision study)
            and getattr(cfg, "compute_dtype", "float32") == "float32")


# ---------------------------------------------------------------------------
# static config plumbing
# ---------------------------------------------------------------------------

def _acts(nn_desc):
    return tuple(a for (_, a) in nn_desc)


def _flatten_params(params):
    """Deterministic leaf order: ode layers, enc layers, readout layers
    (per layer w then b), then the GRU jump cell when present
    (w_ih, w_hh[, b_ih, b_hh])."""
    flat = []
    for name in ("ode_f", "encoder", "readout"):
        for layer in params[name]:
            flat.append(layer["w"])
            if "b" in layer:
                # biases as [1, W]: Mosaic wants >=2-D VMEM tiles
                flat.append(layer["b"].reshape(1, -1))
    if "gru" in params:
        # gate-split: whole [*, 3H] gate tensors would need unaligned
        # lane slices at offsets H and 2H every step (cross-lane shifts —
        # see the packed-history negative result); six [*, H] leaves keep
        # every kernel access lane-aligned
        g = params["gru"]
        H = g["w_hh"].shape[0]
        for w in (g["w_ih"], g["w_hh"]):
            flat += [w[:, :H], w[:, H:2 * H], w[:, 2 * H:]]
        if "b_ih" in g:
            for b in (g["b_ih"], g["b_hh"]):
                flat += [b[:H].reshape(1, -1), b[H:2 * H].reshape(1, -1),
                         b[2 * H:].reshape(1, -1)]
    return flat


class _Spec:
    """Static kernel specification derived from an NJODEConfig.

    ``mask_mode``: how training dropout masks reach the kernel —
    'input' (int8 tensor thresholded outside; bit-identical to the XLA
    path, used by the parity tests) or 'prng' (generated in-kernel with
    the TPU PRNG, re-seeded per step so the backward re-draws identical
    masks; no [K,S,B,W] tensor in VMEM — faster and lighter)."""

    def __init__(self, cfg, mask_mode: str = "input"):
        assert mask_mode in ("input", "prng")
        self.mask_mode = mask_mode
        from njode_tpu.models import mlp
        self.D = cfg.input_size
        self.H = cfg.hidden_size
        self.O = cfg.output_size
        self.masked = bool(cfg.masked)
        self.use_rnn = bool(cfg.use_rnn)
        self.ict = bool(cfg.input_current_t)
        # width chains from the model's single source of truth
        # (models/njode.net_widths) so the kernel layout tracks the layout
        # njode.forward actually uses
        from njode_tpu.models import njode as njode_mod
        self.ode_w = njode_mod.net_widths(cfg, "ode_f")
        self.enc_w = njode_mod.net_widths(cfg, "encoder")
        self.ro_w = njode_mod.net_widths(cfg, "readout")
        self.ode_a = _acts(cfg.ode_nn)
        self.enc_a = _acts(cfg.enc_nn)
        self.ro_a = _acts(cfg.readout_nn)
        # residual identity uses the RAW (pre-mask-concat) input
        # (models.py:261-276), so the case is computed from D, not 2D
        self.enc_case, self.enc_mult = mlp.residual_case(
            self.D, self.H, cfg.residual_enc_dec)
        self.ro_case, self.ro_mult = mlp.residual_case(
            self.H, self.O, cfg.residual_enc_dec)
        self.bias = cfg.bias
        self.rate = float(cfg.dropout_rate)
        self.easy = cfg.which_loss == "easy"
        self.n_ode = len(cfg.ode_nn)
        self.n_enc = len(cfg.enc_nn)
        self.n_ro = len(cfg.readout_nn)
        # dropout slot offsets, matching njode.forward's layout:
        # [ode..., enc..., readout_pre..., readout_post...]
        self.s_ode = 0
        self.s_enc = self.n_ode
        self.s_r1 = self.n_ode + self.n_enc
        self.s_r2 = self.n_ode + self.n_enc + self.n_ro
        self.S = self.s_r2 + self.n_ro
        widths = [w for nn in (cfg.ode_nn, cfg.enc_nn, cfg.readout_nn)
                  for (w, _) in nn]
        self.w_max = max(widths) if widths else 1

    def key(self):
        return (self.D, self.H, self.O, self.ode_w, self.enc_w, self.ro_w,
                self.ode_a, self.enc_a, self.ro_a, self.enc_case,
                self.enc_mult, self.ro_case, self.ro_mult, self.bias,
                self.rate, self.easy, self.mask_mode, self.masked, self.ict,
                self.use_rnn)

    @property
    def n_weight_bytes(self):
        n = 0
        for ws in (self.ode_w, self.enc_w, self.ro_w):
            n += sum(a * b + b for a, b in zip(ws[:-1], ws[1:]))
        if self.use_rnn:
            n += 3 * self.H * (self.D + self.H + 2)
        return n * 4


def _pad8(x):
    return -(-int(x) // 8) * 8


def _lane(x):
    return -(-int(x) // 128) * 128


def _mono_vmem_bytes(spec, K, B, train, want_hists=True):
    """UNPADDED footprint estimate for the single-invocation (NC=1) plan —
    the empirically calibrated round-1 gate: whole-scan-resident kernels
    within this budget compile and hit the measured 837x throughput, even
    though naive (8,128)-tile padding of the history buffers would exceed
    the nominal scoped-VMEM figure (Mosaic streams whole-array outputs)."""
    n_w = spec.n_weight_bytes
    hists = K * B * (spec.H + spec.D + 1) * 4 if want_hists else 0
    data = K * B * (spec.D + 1) * 4
    if spec.masked:
        data += K * B * spec.D * 4                       # M
    masks = (K * spec.S * B * spec.w_max
             if (train and spec.rate > 0.0 and spec.mask_mode == "input")
             else 0)
    return 2 * n_w + hists + data + masks + n_w


MONO_BUDGET = 12 * 1024 * 1024

# Empirical v5e rule for sliced-access kernels (the scan kernels index
# their big arrays per step): each SINGLE buffer is stack-allocated at its
# (8,128)-tiled size and must fit the 16MB scoped limit on its own —
# several 10.2MB buffers compile together (bench config), one 20.5MB
# buffer does not ("Scoped allocation with size 21.70M and limit 16.00M").
MONO_MAX_BUFFER = 12 * 1024 * 1024


def _mono_max_buffer_bytes(spec, K, B, train, want_hists):
    """Largest single lane-padded buffer of the mono (NC=1) kernels."""
    Bp = _pad8(B)
    cands = [K * Bp * _lane(spec.D) * 4,                        # X
             _pad8(K) * _lane(B) * 4]                           # obs
    if want_hists:
        cands.append(K * Bp * _lane(spec.H) * 4)                # h history
    if spec.masked:
        cands.append(K * Bp * _lane(spec.D) * 4)                # M
    if train and spec.rate > 0.0 and spec.mask_mode == "input":
        cands.append(K * spec.S * Bp * _lane(spec.w_max))       # u (int8)
    return max(cands)


def _chunk_vmem_bytes(spec, CK, B, train, want_hists, bwd):
    """PADDED VMEM footprint of one chunked invocation: resident weights +
    carries plus the double-buffered per-chunk streams, with every block
    costed at its (8,128)-tiled size (last dim -> 128 lanes, second-minor
    -> multiple of 8; verified empirically on v5e)."""
    Bp = _pad8(B)
    x_blk = CK * Bp * _lane(spec.D) * 4
    m_blk = x_blk if spec.masked else 0
    obs_blk = _pad8(CK) * _lane(B) * 4
    u_blk = (CK * spec.S * Bp * _lane(spec.w_max)
             if (train and spec.rate > 0.0 and spec.mask_mode == "input")
             else 0)
    hist_blk = (CK * Bp * (_lane(spec.H) + _lane(spec.D) + 128) * 4
                if want_hists else 0)
    per_chunk = x_blk + m_blk + obs_blk + u_blk + hist_blk
    scr = Bp * (_lane(spec.H) + _lane(spec.D) + 128) * 4  # carry scratch (3 bufs)
    const = 2 * spec.n_weight_bytes + Bp * 128 * 4 + scr
    const += 2 * Bp * (_lane(spec.H) + _lane(spec.D)) * 4  # h0, start_X
    if bwd:
        const += spec.n_weight_bytes + scr                 # grad acc + d-carry
    return const + 2 * per_chunk


# The real Mosaic scoped-VMEM ceiling, minus pipeline headroom. Plans must
# satisfy BOTH (estimate + margin <= VMEM_BUDGET, the historical
# calibrated gate) AND (estimate + live-rows bias <= this true limit) —
# the second guard catches wide configs whose estimator bias eats the
# VMEM_BUDGET->16M headroom (round-4 width calibration).
TRUE_SCOPED_LIMIT = int(15.5 * 1024 * 1024)


def _live_rows(spec):
    """Measured live-activation bias of ``_chunk_vmem_bytes``, in units of
    one (8-padded batch rows) x (128-padded w_max lanes) x 4B row — the
    term the estimator does not model. Round-4 width-grid calibration
    (results/plan_calibration.json, Mosaic scoped-VMEM rejections at
    K=2004, B=100): w=50 -> -19.0 rows, w=100 -> -20.8, w=200 -> within
    +5.8 (CK=24, est 15.38M compiled), w=400 -> +28.8. The signed bias
    grows ~linearly with the lane ratio; fitted rows = 16*(lane/128) - 36
    (r=1: -20, r=2: -4, r=4: +28). For use as a safety margin the fit is
    clamped from below: at r=1 the measured biases are firmly negative
    (-19/-20.8) so the floor is 0, while at r>=2 the floor is 6 — the
    w=200 point measured a POSITIVE bias bound (+5.8 rows: CK=24 with an
    est of 15.38M compiled, so usage can exceed the estimate by up to
    0.62M) and the fit alone would give widths 129-256 a zero margin
    (ADVICE r4). At r=4 this still reproduces the round-3 one-point
    margin of 28, so the measured production plans do not shift; at
    r=2-3 the production gate stays VMEM_BUDGET-bound (11M + 6 rows <<
    TRUE_SCOPED_LIMIT), so plans are unchanged there too.

    Round-5 B/K probe (scripts/b_probe.sh, 5 more rejection arms in
    results/plan_calibration.json): the bias is NOT B-proportional —
    in BYTES it shrinks or holds as B grows (w=400 CK=8: +6.14M at
    B=100 vs +1.86M at B=200; w=50/100: -0.7/-1.0M at B=200 vs
    -1.0/-1.1M at B=100), and at fixed B=100 it moves with (K, CK)
    (+16.8 rows at K=1000/CK=16 vs +28.8 at K=2004/CK=8) — Mosaic's
    allocation is nonlinear in our terms, so the per-row fit is a
    BOUND, not a law. It is kept because it is conservative at every
    probed point: all 5 new arms are genuinely infeasible on chip
    (actual 16.3-18.7M > the 16M limit) and the production planner
    rejects each via the VMEM_BUDGET gate alone; the bias term only
    ever tightens gates, and the one at-risk acceptance it allows
    (the w=400 BB=40 block plan) is chip-verified good. The un-probed
    region (B < 40 at r=4) only makes the margin smaller on plans that
    are already stricter than the verified BB=40 point."""
    r = _lane(spec.w_max) // 128
    fitted = 16 * r - 36
    return max(6 if r >= 2 else 0, fitted)


def _fits_chunk(spec, CK, B, train, want_hists, margin=0):
    fb = _chunk_vmem_bytes(spec, CK, B, train, want_hists, bwd=False)
    bb = _chunk_vmem_bytes(spec, CK, B, train, want_hists, bwd=True)
    est = max(fb, bb)
    bias = _live_rows(spec) * _pad8(B) * _lane(spec.w_max) * 4
    return (est + margin <= VMEM_BUDGET
            and est + max(margin, bias) <= TRUE_SCOPED_LIMIT)


def _largest_ck(spec, K, B, train, want_hists, margin=0):
    """Largest multiple-of-8 chunk size whose forward AND backward padded
    footprints (+ margin) fit the budget; None when even CK=8 does not."""
    lo, hi = 8, max(8, (K // 2) // 8 * 8)
    if not _fits_chunk(spec, lo, B, train, want_hists, margin):
        return None
    while lo < hi:                       # largest fitting multiple of 8
        mid = (lo + hi + 8) // 16 * 8
        if _fits_chunk(spec, mid, B, train, want_hists, margin):
            lo = mid
        else:
            hi = mid - 8
    return lo


def _plan(spec, K, B, train, want_hists=True, vmapped=False):
    """Choose (CK, NC, K_pad). Preference order: the whole scan resident in
    one invocation (NC=1, the round-1 fast path); else the largest chunk
    size — a multiple of 8, for Mosaic's (8,128) block-divisibility rule on
    the [CK, B] observation block — whose forward AND backward footprints
    fit the budget (one shared plan keeps the history layout consistent
    between the two kernels). Returns None when even CK=8 does not fit.

    ``vmapped``: the kernel call will sit under a ``jax.vmap`` member axis
    (grouped sweeps, training/group_sweep.py). Calibrated on the chip
    (scripts/vmap_kernel_calib.py): the MONO layout's scoped-VMEM stack
    grows with the vmap extent (E=4 of a 14.7M-scoped single member asked
    for 29.9-58.9M against the 16M limit and failed remote compile), while
    the CHUNKED layout's scoped window is E-independent (E=8 compiles and
    runs under the unchanged single-member budget, ~0.9 ms/member steady
    vs mono's 2.2 ms at E=1). So a vmapped plan always chunks."""
    K = int(K)
    if (not vmapped
            and _mono_vmem_bytes(spec, K, B, train, want_hists)
            <= MONO_BUDGET
            and _mono_max_buffer_bytes(spec, K, B, train, want_hists)
            <= MONO_MAX_BUFFER):
        return K, 1, K
    CK = _largest_ck(spec, K, B, train, want_hists)
    if CK is None:
        return None
    NC = -(-K // CK)
    return CK, NC, NC * CK


def _block_margin(spec, BB):
    """Live-activation margin for batch-BLOCK plans: the width-fitted
    ``_live_rows`` bias (round-4 calibration) costed at the block's row
    count. At the 400-wide wall (lane ratio 4 -> 28 rows) this equals the
    round-3 one-point margin, so the measured production block plans are
    unchanged; narrow widths, whose estimator over-counts, get no
    margin (block plans never engage there in production — a K-chunk
    plan always exists first)."""
    return _live_rows(spec) * _pad8(BB) * _lane(spec.w_max) * 4


def _select_plan(spec, K, B, train, vmapped=False, force=None):
    """Resolve the kernel plan for one (K, B, train) shape.

    Returns ``(plan, bplan)`` where ``plan = (CK, NC, K_pad)`` (K-chunk or
    mono layout), ``bplan = (CK, NC, K_pad, BB, NB)`` (batch-block layout),
    and ``(None, None)`` means the XLA-scan fallback. At most one of the
    two is non-None.

    ``force`` overrides the budget-driven choice — the FIRST-CLASS plan
    forcing hook (VERDICT r3 item 1; replaces the module-global
    MONO_BUDGET/VMEM_BUDGET mutation idiom, which raced against trace-time
    planning and produced a self-vs-self A/B in tpu_checks round 3):

    - ``None``            — budget-driven selection (production behavior).
    - ``'xla'``           — always the XLA remat fallback.
    - ``'mono'``          — whole-scan-resident NC=1 layout, budget checks
                            SKIPPED (probes; may fail Mosaic compile).
    - ``'chunk'``         — largest budget-feasible K-chunk; raises if
                            even CK=8 does not fit (no silent XLA
                            fall-through — probes must not measure the
                            wrong arm).
    - ``('chunk', CK)``   — exact chunk size, budget checks skipped.
    - ``'block'``         — budget-driven batch-block plan; raises if none.
    - ``('block', BB[, CK])`` — exact batch block (and chunk), checks
                            skipped.
    """
    K, B = int(K), int(B)
    if force is None:
        plan = _plan(spec, K, B, train, vmapped=vmapped)
        if plan is not None:
            return plan, None
        return None, _block_plan(spec, K, B, train)
    kind = force if isinstance(force, str) else force[0]
    if kind == "xla":
        return None, None
    if kind == "mono":
        return (K, 1, K), None
    if kind == "chunk":
        if isinstance(force, tuple):
            CK = int(force[1])
        else:
            CK = _largest_ck(spec, K, B, train, True)
            if CK is None:
                raise ValueError(
                    f"force_plan='chunk': no CK fits VMEM at K={K}, B={B}")
        NC = -(-K // CK)
        return (CK, NC, NC * CK), None
    if kind == "block":
        if isinstance(force, tuple):
            BB = int(force[1])
            if len(force) > 2:
                CK = int(force[2])
            else:
                CK = _largest_ck(spec, K, BB, train, True,
                                 margin=_block_margin(spec, BB))
                if CK is None:
                    raise ValueError(
                        f"force_plan=('block', {BB}): no CK fits VMEM")
            NC = -(-K // CK)
            return None, (CK, NC, NC * CK, BB, -(-B // BB))
        bplan = _block_plan(spec, K, B, train)
        if bplan is None:
            raise ValueError(
                f"force_plan='block': no batch-block plan at K={K}, B={B}")
        return None, bplan
    raise ValueError(f"unknown force_plan {force!r}")


def _block_plan(spec, K, B, train, want_hists=True):
    """Batch-axis blocking for configs with NO K-chunk plan at the full
    batch: wide nets whose resident weights plus batch-scaled live
    activations exceed scoped VMEM at any CK (measured at the climate-400
    shape — CK=8 needs 17.02M vs the 16M limit). The kernel is batch-
    parallel, so the scan runs once per BB-row batch block under
    ``jax.vmap`` (one extra leading grid dimension; the chunked layout's
    scoped window is vmap-extent-independent — see ``_plan``). Prefers the
    LARGEST feasible BB (fewest blocks => best MXU row utilization), then
    the largest CK under the activation-margin-adjusted budget. Returns
    (CK, NC, K_pad, BB, NB) or None; batch rows pad to NB*BB."""
    K, B = int(K), int(B)
    for BB in range(_pad8(B) - 8, 7, -8):
        CK = _largest_ck(spec, K, BB, train, want_hists,
                         margin=_block_margin(spec, BB))
        if CK is None:
            continue
        NC = -(-K // CK)
        NB = -(-B // BB)
        return CK, NC, NC * CK, BB, NB
    return None


def _act(name, x):
    return jnp.tanh(x) if name == "tanh" else jax.nn.relu(x)


def _act_grad(name, pre):
    if name == "tanh":
        t = jnp.tanh(pre)
        return 1.0 - t * t
    return (pre > 0).astype(pre.dtype)


# ---------------------------------------------------------------------------
# shared per-step math (used inside both kernels)
# ---------------------------------------------------------------------------

def _ffnn_fwd(ws, acts, x, us, rate, train, save=False):
    """Forward through a get_ffnn MLP. ``ws`` = [(w, b), ...];
    ``us`` = precomputed keep-masks per hidden layer (or None). Returns
    (out, pres) where pres are the pre-activation inputs per hidden layer
    (only filled when save=True, for the backward recompute)."""
    pres = []
    w, b = ws[0]
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    for i, name in enumerate(acts):
        if save:
            pres.append(y)
        a = _act(name, y)
        if train and rate > 0.0 and us is not None:
            keep = 1.0 - rate
            a = jnp.where(us[i][:, :a.shape[-1]], a / keep, 0.0)
        w, b = ws[i + 1]
        y = jnp.dot(a, w, preferred_element_type=jnp.float32)
        if b is not None:
            y = y + b
    return y, pres


def _ffnn_bwd(ws, acts, x, pres, us, rate, train, dy, acc, base):
    """Backward through a get_ffnn MLP; accumulates weight grads into the
    ``acc`` refs starting at slot ``base`` (layer-ordered w[,b]) and returns
    dx. Activations are recomputed from the saved pre-activations."""
    n_hidden = len(acts)
    keep = 1.0 - rate
    # recompute the post-dropout activations a_i
    a_list = []
    for i, name in enumerate(acts):
        a = _act(name, pres[i])
        if train and rate > 0.0 and us is not None:
            a = jnp.where(us[i][:, :a.shape[-1]], a / keep, 0.0)
        a_list.append(a)
    # walk layers in reverse: layer n_hidden..1 consume a_{i-1}
    d = dy
    for i in range(n_hidden, 0, -1):
        w, b = ws[i]
        a = a_list[i - 1]
        _acc_wb(acc, base, i, w, b, a, d)
        da = jnp.dot(d, w.T, preferred_element_type=jnp.float32)
        if train and rate > 0.0 and us is not None:
            da = jnp.where(us[i - 1][:, :da.shape[-1]], da / keep,
                           0.0)
        d = da * _act_grad(acts[i - 1], pres[i - 1])
    w, b = ws[0]
    _acc_wb(acc, base, 0, w, b, x, d)
    return jnp.dot(d, w.T, preferred_element_type=jnp.float32)


def _acc_wb(acc, base, layer, w, b, a_in, d):
    """acc layout: per layer, w grad ref then (if bias) b grad ref."""
    stride = 2 if b is not None else 1
    wi = base + layer * stride
    acc[wi][...] += jnp.dot(a_in.T, d, preferred_element_type=jnp.float32)
    if b is not None:
        acc[wi + 1][...] += jnp.sum(d, axis=0, keepdims=True)


def _residual_fwd(case, mult, x_raw, out):
    if case == 0:
        return out
    if case == 1:
        return jnp.concatenate([x_raw] * mult, axis=-1) + out
    # case 2: mean of `mult` chunks of the raw input — static slices, not a
    # 3-D reshape (Mosaic cannot lower (B, W) -> (B, mult, chunk) casts)
    chunk = x_raw.shape[-1] // mult
    ident = x_raw[:, :chunk]
    for i in range(1, mult):
        ident = ident + x_raw[:, i * chunk:(i + 1) * chunk]
    return ident / mult + out


def _residual_bwd(case, mult, dout):
    """Gradient of the identity branch wrt x_raw."""
    if case == 0:
        return 0.0
    if case == 1:
        chunk = dout.shape[-1] // mult
        acc = dout[:, :chunk]
        for i in range(1, mult):
            acc = acc + dout[:, i * chunk:(i + 1) * chunk]
        return acc
    return jnp.concatenate([dout / mult] * mult, axis=-1)


def _split_ws(refs, widths, bias, start):
    """Read (w, b) pairs for one MLP from the flat ref list."""
    ws = []
    i = start
    for _ in range(len(widths) - 1):
        w = refs[i][...]
        i += 1
        b = None
        if bias:
            b = refs[i][...]
            i += 1
        ws.append((w, b))
    return ws, i


def _split_gru(refs, spec, start):
    """Read the gate-split GRU leaves: ((wr,wz,wn),(ur,uz,un),ih_b,hh_b)."""
    w_ih = tuple(refs[start + i][...] for i in range(3))
    w_hh = tuple(refs[start + 3 + i][...] for i in range(3))
    i = start + 6
    b_ih = b_hh = (None, None, None)
    if spec.bias:
        b_ih = tuple(refs[i + j][...] for j in range(3))
        b_hh = tuple(refs[i + 3 + j][...] for j in range(3))
        i += 6
    return (w_ih, w_hh, b_ih, b_hh), i


def _lin3(x, ws, bs):
    outs = []
    for w, b in zip(ws, bs):
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        outs.append(y if b is None else y + b)
    return outs


def _gru_fwd(gru, x, h):
    """torch GRUCell forward (gate order r, z, n — mlp.gru_cell_apply)."""
    w_ih, w_hh, b_ih, b_hh = gru
    gi_r, gi_z, gi_n = _lin3(x, w_ih, b_ih)
    gh_r, gh_z, gh_n = _lin3(h, w_hh, b_hh)
    r = jax.nn.sigmoid(gi_r + gh_r)
    z = jax.nn.sigmoid(gi_z + gh_z)
    n = jnp.tanh(gi_n + r * gh_n)
    return (1.0 - z) * n + z * h, (r, z, n, gh_n)


def _gru_bwd(gru, g_acc, base, x, h, saved, dh2):
    """Hand-written GRUCell BPTT; accumulates the 12 gate-split weight
    grads (wr wz wn ur uz un [br bz bn cr cz cn]) and returns (dx, dh)."""
    w_ih, w_hh, b_ih, b_hh = gru
    r, z, n, gh_n = saved
    da_z = dh2 * (h - n) * z * (1.0 - z)
    dn = dh2 * (1.0 - z)
    dh = dh2 * z
    da_n = dn * (1.0 - n * n)
    dgi_n = da_n
    dr = da_n * gh_n
    dgh_n = da_n * r
    da_r = dr * r * (1.0 - r)
    dgi = (da_r, da_z, dgi_n)
    dgh = (da_r, da_z, dgh_n)
    has_b = b_ih[0] is not None
    dx = 0.0
    for i, (w, d) in enumerate(zip(w_ih, dgi)):
        g_acc[base + i][...] += jnp.dot(x.T, d,
                                        preferred_element_type=jnp.float32)
        dx = dx + jnp.dot(d, w.T, preferred_element_type=jnp.float32)
    for i, (w, d) in enumerate(zip(w_hh, dgh)):
        g_acc[base + 3 + i][...] += jnp.dot(
            h.T, d, preferred_element_type=jnp.float32)
        dh = dh + jnp.dot(d, w.T, preferred_element_type=jnp.float32)
    if has_b:
        for i, d in enumerate(dgi):
            g_acc[base + 6 + i][...] += jnp.sum(d, axis=0, keepdims=True)
        for i, d in enumerate(dgh):
            g_acc[base + 9 + i][...] += jnp.sum(d, axis=0, keepdims=True)
    return dx, dh


def _loss_terms(spec, X, y, y_bj, obs, n_obs, weight, B_total, M=None):
    Mv = 1.0 if M is None else M
    e1 = jnp.sum(Mv * (X - y) ** 2, axis=-1)
    tgt = X if spec.easy else y
    e2 = jnp.sum(Mv * (y_bj - tgt) ** 2, axis=-1)
    s1 = jnp.sqrt(e1 + EPS)
    s2 = jnp.sqrt(e2 + EPS)
    fac = 1.0 if spec.easy else 2.0
    g = fac * weight * s1 + fac * (1.0 - weight) * s2
    denom = jnp.maximum(n_obs, 1.0)
    return jnp.sum(obs * g * g / denom) / B_total, (s1, s2, g)


def _step_masks(spec, B, train, u_ref, seed_ref, j, k):
    """Per-step boolean dropout masks: ``j`` indexes the current chunk's
    block of the int8 input tensor ('input' mode); ``k`` is the GLOBAL step
    index seeding the TPU PRNG ('prng' mode — re-seeded per step so the
    backward pass re-draws the identical sequence regardless of chunking)."""
    if not (train and spec.rate > 0.0):
        return None
    if spec.mask_mode == "input":
        u = u_ref[j]
        return [u[s] != 0 for s in range(spec.S)]
    seed = seed_ref[0, 0].astype(jnp.int32)
    pltpu.prng_seed(seed + k)
    keep = 1.0 - spec.rate
    thresh = jnp.uint32(min(int(keep * 2.0 ** 32), 2 ** 32 - 1))
    out = []
    for _ in range(spec.S):
        bits = pltpu.bitcast(pltpu.prng_random_bits((B, spec.w_max)),
                             jnp.uint32)
        out.append(bits < thresh)
    return out


def _slot_masks(spec, us):
    if us is None:
        return None, None, None, None
    return (us[spec.s_ode:spec.s_ode + spec.n_ode],
            us[spec.s_enc:spec.s_enc + spec.n_enc],
            us[spec.s_r1:spec.s_r1 + spec.n_ro],
            us[spec.s_r2:spec.s_r2 + spec.n_ro])


def _ode_in(spec, last_X, h, tau, tdiff):
    feats = [jnp.tanh(last_X), jnp.tanh(h), tau, tdiff]
    if spec.ict:
        feats.append(tau + tdiff)       # == current t (models.py:195-197)
    return jnp.concatenate(feats, axis=-1)


def _stack_ro(spec):
    """Whether the two readouts run as one batch-stacked chain (any config
    whose jump does not consume the pre-jump prediction)."""
    return not (spec.masked and not spec.use_rnn)


def _step_forward(spec, ws_ode, ws_enc, ws_ro, gru, h, last_X, tau, t, dt,
                  obs, X, M, us, train, save=False):
    """One NJODE step; returns (h2, lastX', tau', y, y_bj, saved).
    ``us``: per-slot boolean dropout masks (or None). The masked branch
    mirrors ``njode.forward``'s imputation path (models.py:459-470): the
    pre-jump readout feeds the encoder's imputed input, so the two readouts
    are sequential there. ``use_rnn`` replaces the jump encoder with the
    GRU cell on the RAW observation (even in masked mode,
    models.py:460-461); the encoder then only produces h0, outside."""
    u_ode, u_enc, u_r1, u_r2 = _slot_masks(spec, us)

    t_prev = t - dt
    tdiff = t_prev - tau                                   # [B, 1]
    f, ode_pres = _ffnn_fwd(ws_ode, spec.ode_a,
                            _ode_in(spec, last_X, h, tau, tdiff),
                            u_ode, spec.rate, train, save)
    h1 = h + dt * f
    obs_c = obs[:, None]
    if _stack_ro(spec):
        # the jump doesn't consume y_bj: run the jump first, then BOTH
        # readouts as one batch-stacked [2B, .] MLP chain (half the
        # per-step op count; weight grads of the stacked backward sum the
        # two contributions automatically)
        if spec.use_rnn:
            X_imp = X
            h_t = jnp.tanh(h1)
            h_enc, enc_pres = _gru_fwd(gru, jnp.tanh(X), h_t)
        else:
            X_imp = X
            enc_o, enc_pres = _ffnn_fwd(ws_enc, spec.enc_a, jnp.tanh(X),
                                        u_enc, spec.rate, train, save)
            h_enc = _residual_fwd(spec.enc_case, spec.enc_mult, X, enc_o)
        h2 = obs_c * h_enc + (1.0 - obs_c) * h1
        r_in = jnp.tanh(jnp.concatenate([h1, h2], axis=0))
        # concat the masks as int8 in BOTH modes: bool (i1) vregs fail
        # Mosaic's concat lowering ("Invalid vector register cast") — for
        # int8-comparison bools always, and for the prng-mode bools at
        # batch sizes that are not sublane-aligned (B=20 measured, r3)
        if u_r1 is None:
            u_r = None
        else:
            u_r = [jnp.concatenate([a.astype(jnp.int8),
                                    b.astype(jnp.int8)], axis=0) != 0
                   for a, b in zip(u_r1, u_r2)]
        y2_o, r_pres = _ffnn_fwd(ws_ro, spec.ro_a, r_in, u_r, spec.rate,
                                 train, save)
        y2 = _residual_fwd(spec.ro_case, spec.ro_mult,
                           jnp.concatenate([h1, h2], axis=0), y2_o)
        B = h1.shape[0]
        y_bj, y = y2[:B], y2[B:]
        r1_pres, r2_pres = r_pres, None
    else:
        # masked imputation: the pre-jump readout feeds the encoder input
        r1_in = jnp.tanh(h1)
        y_bj_o, r1_pres = _ffnn_fwd(ws_ro, spec.ro_a, r1_in, u_r1,
                                    spec.rate, train, save)
        y_bj = _residual_fwd(spec.ro_case, spec.ro_mult, h1, y_bj_o)
        X_imp = X * M + (1.0 - M) * y_bj
        e_in = jnp.concatenate([jnp.tanh(X_imp), M], axis=-1)
        enc_o, enc_pres = _ffnn_fwd(ws_enc, spec.enc_a, e_in, u_enc,
                                    spec.rate, train, save)
        h_enc = _residual_fwd(spec.enc_case, spec.enc_mult, X_imp, enc_o)
        h2 = obs_c * h_enc + (1.0 - obs_c) * h1
        r2_in = jnp.tanh(h2)
        y_o, r2_pres = _ffnn_fwd(ws_ro, spec.ro_a, r2_in, u_r2, spec.rate,
                                 train, save)
        y = _residual_fwd(spec.ro_case, spec.ro_mult, h2, y_o)
    # masked mode records the post-jump PREDICTION as last_X
    # (models.py:483-486); unmasked records the observation
    new_last = y if spec.masked else X
    last_X2 = jnp.where(obs_c > 0, new_last, last_X)
    tau2 = jnp.where(obs_c > 0, jnp.full_like(tau, t), tau)
    saved = (ode_pres, r1_pres, enc_pres, r2_pres, h1, h2, X_imp) \
        if save else None
    return h2, last_X2, tau2, y, y_bj, saved


def _step_backward(spec, ws_ode, ws_enc, ws_ro, gru, g_acc, bases, n_obs,
                   weight, B, dloss, h, last_X, tau, t, dt, obs, X, M, us,
                   train, dh_next, dlx_next, dtau_next):
    """Hand-written BPTT for one step: recomputes the step forward from the
    entry carry (h, last_X, tau) and propagates (dh, dlx, dtau), adding the
    step's weight-gradient contributions into ``g_acc``."""
    ode_base, enc_base, ro_base, gru_base = bases
    u_ode, u_enc, u_r1, u_r2 = _slot_masks(spec, us)
    obs_c = obs[:, None]

    # ---- recompute the step forward (with saved pre-activations)
    _, _, _, y, y_bj, saved = _step_forward(
        spec, ws_ode, ws_enc, ws_ro, gru, h, last_X, tau, t, dt, obs, X, M,
        us, train, save=True)
    ode_pres, r1_pres, enc_pres, r2_pres, h1, h2, X_imp = saved

    # ---- loss gradients wrt y, y_bj
    Mv = 1.0 if not spec.masked else M
    _, (s1, s2, g) = _loss_terms(spec, X, y, y_bj, obs, n_obs, weight,
                                 float(B), M if spec.masked else None)
    denom = jnp.maximum(n_obs, 1.0)
    dinner = dloss * obs / denom / float(B)        # [B]
    fac = 1.0 if spec.easy else 2.0
    dg = 2.0 * g * dinner
    de1 = (fac * weight * dg) * (0.5 / s1)
    de2 = (fac * (1.0 - weight) * dg) * (0.5 / s2)
    dy = de1[:, None] * 2.0 * Mv * (y - X)
    tgt = X if spec.easy else y
    dybj = de2[:, None] * 2.0 * Mv * (y_bj - tgt)
    if not spec.easy:
        dy = dy + de2[:, None] * 2.0 * Mv * (y - y_bj)

    # ---- carries through the state updates
    if spec.masked:
        dy = dy + obs_c * dlx_next     # last_X2 = where(obs, y, last_X)
    dtau = (1.0 - obs_c) * dtau_next
    dlx = (1.0 - obs_c) * dlx_next

    if _stack_ro(spec):
        # ---- both readouts backward as one stacked chain
        Bn = h1.shape[0]
        hh12 = jnp.concatenate([h1, h2], axis=0)
        r_in = jnp.tanh(hh12)
        d_stack = jnp.concatenate([dybj, dy], axis=0)
        # concat the masks as int8 in BOTH modes: bool (i1) vregs fail
        # Mosaic's concat lowering ("Invalid vector register cast") — for
        # int8-comparison bools always, and for the prng-mode bools at
        # batch sizes that are not sublane-aligned (B=20 measured, r3)
        if u_r1 is None:
            u_r = None
        else:
            u_r = [jnp.concatenate([a.astype(jnp.int8),
                                    b.astype(jnp.int8)], axis=0) != 0
                   for a, b in zip(u_r1, u_r2)]
        d_rin = _ffnn_bwd(ws_ro, spec.ro_a, r_in, r1_pres, u_r,
                          spec.rate, train, d_stack, g_acc, ro_base)
        d_t = d_rin * (1.0 - r_in * r_in) \
            + _residual_bwd(spec.ro_case, spec.ro_mult, d_stack)
        dh1_ro, dh2_ro = d_t[:Bn], d_t[Bn:]
        dh2 = dh_next + dh2_ro
        dh_enc = obs_c * dh2
        dh1 = (1.0 - obs_c) * dh2 + dh1_ro
        if spec.use_rnn:
            h_t = jnp.tanh(h1)
            _, dh_t = _gru_bwd(gru, g_acc, gru_base, jnp.tanh(X), h_t,
                               enc_pres, dh_enc)
            dh1 = dh1 + dh_t * (1.0 - h_t * h_t)
        else:
            # input X is data: grads only to weights
            _ffnn_bwd(ws_enc, spec.enc_a, jnp.tanh(X), enc_pres, u_enc,
                      spec.rate, train, dh_enc, g_acc, enc_base)
    else:
        # ---- post-jump readout backward (input h2)
        r2_in = jnp.tanh(h2)
        d_r2in = _ffnn_bwd(ws_ro, spec.ro_a, r2_in, r2_pres, u_r2,
                           spec.rate, train, dy, g_acc, ro_base)
        dh2 = dh_next + d_r2in * (1.0 - r2_in * r2_in) \
            + _residual_bwd(spec.ro_case, spec.ro_mult, dy)

        # ---- jump select h2 = obs*h_enc + (1-obs)*h1
        dh_enc = obs_c * dh2
        dh1 = (1.0 - obs_c) * dh2

        # ---- masked-imputation jump backward
        e_in = jnp.concatenate([jnp.tanh(X_imp), M], axis=-1)
        d_ein = _ffnn_bwd(ws_enc, spec.enc_a, e_in, enc_pres, u_enc,
                          spec.rate, train, dh_enc, g_acc, enc_base)
        tXi = jnp.tanh(X_imp)
        dX_imp = (d_ein[:, :spec.D] * (1.0 - tXi * tXi)
                  + _residual_bwd(spec.enc_case, spec.enc_mult, dh_enc))
        # X_imp = X*M + (1-M)*y_bj — X and M are data; only y_bj carries
        dybj = dybj + (1.0 - M) * dX_imp

        # ---- pre-jump readout backward (input h1)
        r1_in = jnp.tanh(h1)
        d_r1in = _ffnn_bwd(ws_ro, spec.ro_a, r1_in, r1_pres, u_r1,
                           spec.rate, train, dybj, g_acc, ro_base)
        dh1 = dh1 + d_r1in * (1.0 - r1_in * r1_in) \
            + _residual_bwd(spec.ro_case, spec.ro_mult, dybj)

    # ---- Euler step backward: h1 = h + dt * f(ode_in)
    df = dt * dh1
    t_prev = t - dt
    tdiff = t_prev - tau
    d_odein = _ffnn_bwd(ws_ode, spec.ode_a,
                        _ode_in(spec, last_X, h, tau, tdiff), ode_pres,
                        u_ode, spec.rate, train, df, g_acc, ode_base)
    D, H = spec.D, spec.H
    d_tlx = d_odein[:, :D]
    d_th = d_odein[:, D:D + H]
    d_tau_f = d_odein[:, D + H:D + H + 1]
    d_tdiff = d_odein[:, D + H + 1:D + H + 2]
    # the input_current_t feature tau+tdiff == t_prev is constant in tau
    # (its +1/-1 contributions cancel), so it adds nothing to dtau
    tlx = jnp.tanh(last_X)
    th = jnp.tanh(h)
    dlx = dlx + d_tlx * (1.0 - tlx * tlx)
    dh = dh1 + d_th * (1.0 - th * th)
    dtau = dtau + d_tau_f - d_tdiff
    return dh, dlx, dtau


# ---------------------------------------------------------------------------
# kernels (chunked sequential grid; NC=1 == whole-scan-resident)
# ---------------------------------------------------------------------------

def _n_weight_refs(spec):
    n_w = 2 if spec.bias else 1
    n = n_w * (len(spec.ode_w) + len(spec.enc_w) + len(spec.ro_w) - 3)
    if spec.use_rnn:
        n += 12 if spec.bias else 6
    return n


def _grad_bases(spec):
    n_w = 2 if spec.bias else 1
    n_ode_l = len(spec.ode_w) - 1
    n_enc_l = len(spec.enc_w) - 1
    n_ro_l = len(spec.ro_w) - 1
    return (0, n_w * n_ode_l, n_w * (n_ode_l + n_enc_l),
            n_w * (n_ode_l + n_enc_l + n_ro_l))


def _make_fwd_kernel(spec, CK, NC, B, train, want_hists: bool = True):
    n_refs = _n_weight_refs(spec)

    def kernel(*refs):
        w_refs = refs[:n_refs]
        (t_ref, dt_ref, obs_ref, X_ref, M_ref, u_ref, nobs_ref, wt_ref,
         seed_ref, h0_ref, sx_ref) = refs[n_refs:n_refs + 11]
        rest = refs[n_refs + 11:]
        if want_hists:
            loss_ref, hh_ref, lxh_ref, tauh_ref = rest[:4]
            h_s, lx_s, tau_s = rest[4:]
        else:
            loss_ref = rest[0]
            h_s, lx_s, tau_s = rest[1:]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            h_s[...] = h0_ref[...]
            lx_s[...] = sx_ref[...]
            tau_s[...] = jnp.zeros_like(tau_s)
            loss_ref[...] = jnp.zeros_like(loss_ref)

        ws_ode, p = _split_ws(w_refs, spec.ode_w, spec.bias, 0)
        ws_enc, p = _split_ws(w_refs, spec.enc_w, spec.bias, p)
        ws_ro, p = _split_ws(w_refs, spec.ro_w, spec.bias, p)
        gru = _split_gru(w_refs, spec, p)[0] if spec.use_rnn else None
        n_obs = nobs_ref[...][:, 0]
        weight = wt_ref[0, 0]

        def body(j, carry):
            h, last_X, tau, loss = carry
            if want_hists:
                # record step-entry carries for the backward recompute.
                # THREE separate buffers, deliberately: packing them into
                # one [B, H+D+1] buffer (to save 2 lane-pads of VMEM) costs
                # a lane-axis concat per step + unaligned slices in the
                # backward -> cross-lane shifts that measured 8x SLOWER at
                # climate scale (13.5 -> 113.6 ms/step)
                hh_ref[j] = h
                lxh_ref[j] = last_X
                tauh_ref[j] = tau
            k = i * CK + j
            t = t_ref[0, k]
            dt = dt_ref[0, k]
            obs = obs_ref[j]
            X = X_ref[j]
            M = M_ref[j] if spec.masked else None
            us = _step_masks(spec, B, train, u_ref, seed_ref, j, k)
            h2, lx2, tau2, y, y_bj, _ = _step_forward(
                spec, ws_ode, ws_enc, ws_ro, gru, h, last_X, tau, t, dt,
                obs, X, M, us, train)
            l_step, _ = _loss_terms(spec, X, y, y_bj, obs, n_obs, weight,
                                    float(B), M)
            return (h2, lx2, tau2, loss + l_step)

        h, lx, tau, dl = jax.lax.fori_loop(
            0, CK, body,
            (h_s[...], lx_s[...], tau_s[...], jnp.float32(0.0)))
        h_s[...] = h
        lx_s[...] = lx
        tau_s[...] = tau
        loss_ref[...] += dl * jnp.ones((1, 1), jnp.float32)

    return kernel, n_refs


def _make_bwd_kernel(spec, CK, NC, B, train):
    n_refs = _n_weight_refs(spec)
    bases = _grad_bases(spec)

    def kernel(*refs):
        w_refs = refs[:n_refs]
        (t_ref, dt_ref, obs_ref, X_ref, M_ref, u_ref, nobs_ref, wt_ref,
         seed_ref, hh_ref, lxh_ref, tauh_ref, dloss_ref) = \
            refs[n_refs:n_refs + 13]
        outs = refs[n_refs + 13:n_refs + 13 + n_refs + 1]
        g_acc = outs[:n_refs]
        dh0_ref = outs[n_refs]
        dh_s, dlx_s, dtau_s = refs[n_refs + 14 + n_refs:]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            for r in g_acc:
                r[...] = jnp.zeros(r.shape, jnp.float32)
            dh_s[...] = jnp.zeros_like(dh_s)
            dlx_s[...] = jnp.zeros_like(dlx_s)
            dtau_s[...] = jnp.zeros_like(dtau_s)

        ws_ode, p = _split_ws(w_refs, spec.ode_w, spec.bias, 0)
        ws_enc, p = _split_ws(w_refs, spec.enc_w, spec.bias, p)
        ws_ro, p = _split_ws(w_refs, spec.ro_w, spec.bias, p)
        gru = _split_gru(w_refs, spec, p)[0] if spec.use_rnn else None
        n_obs = nobs_ref[...][:, 0]
        weight = wt_ref[0, 0]
        dloss = dloss_ref[0, 0]

        def body(jj, carry):
            j = CK - 1 - jj                      # step within this chunk
            k = (NC - 1 - i) * CK + j            # global step index
            dh_next, dlx_next, dtau_next = carry
            us = _step_masks(spec, B, train, u_ref, seed_ref, j, k)
            return _step_backward(
                spec, ws_ode, ws_enc, ws_ro, gru, g_acc, bases, n_obs,
                weight, B, dloss, hh_ref[j], lxh_ref[j], tauh_ref[j],
                t_ref[0, k],
                dt_ref[0, k], obs_ref[j], X_ref[j],
                M_ref[j] if spec.masked else None, us, train,
                dh_next, dlx_next, dtau_next)

        dh, dlx, dtau = jax.lax.fori_loop(
            0, CK, body, (dh_s[...], dlx_s[...], dtau_s[...]))
        dh_s[...] = dh
        dlx_s[...] = dlx
        dtau_s[...] = dtau

        @pl.when(i == NC - 1)
        def _emit():
            dh0_ref[...] = dh

    return kernel, n_refs


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------

def _vmem(shape=None, index_map=None):
    if shape is None:
        return pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)


def _smem():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _chunked_in_specs(spec, CK, B, train, fwd: bool, NC: int):
    """Block specs for the per-step data streams (obs, X, M, u); the
    backward walks the chunks in reverse."""
    ix = (lambda i: (i,)) if fwd else (lambda i: (NC - 1 - i,))

    def c(i):
        return ix(i)[0]

    D = spec.D
    specs = [
        _vmem((CK, B), lambda i: (c(i), 0)),                      # obs
        _vmem((CK, B, D), lambda i: (c(i), 0, 0)),                # X
    ]
    if spec.masked:
        specs.append(_vmem((CK, B, D), lambda i: (c(i), 0, 0)))   # M
    else:
        specs.append(_vmem((1, 1, 1), lambda i: (0, 0, 0)))       # M dummy
    if train and spec.rate > 0.0 and spec.mask_mode == "input":
        specs.append(_vmem((CK, spec.S, B, spec.w_max),
                           lambda i: (c(i), 0, 0, 0)))            # u
    else:
        specs.append(_vmem((1, 1, 1, 1), lambda i: (0, 0, 0, 0)))  # u dummy
    return specs


def _carry_scratch(spec, B):
    return [pltpu.VMEM((B, spec.H), jnp.float32),
            pltpu.VMEM((B, spec.D), jnp.float32),
            pltpu.VMEM((B, 1), jnp.float32)]


# ---------------------------------------------------------------------------
# public entry: custom-VJP fused loss
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def fused_njode_loss(spec_key, shapes, interpret, flat_params, batch_arrays,
                     weight, u_scan, seed, h0):
    """Fused NJODE scan loss (see module docstring).

    :param spec_key: hashable static spec (from ``_Spec.key()``); the actual
        spec is rebuilt via the cfg registry in :func:`make_fused_loss_fn`
    :param shapes: (K_pad, CK, NC, B, train) static tuple (K_pad = NC*CK;
        the caller pads the grid axis with dt=0 no-op steps)
    :param flat_params: leaf list from :func:`_flatten_params`
    :param batch_arrays: (times [K_pad], dts [K_pad], obs [K_pad,B],
        X [K_pad,B,D], M [K_pad,B,D] or [1,1,1], n_obs [B], start_X [B,D])
    :param u_scan: int8 dropout keep-masks [K_pad,S,B,Wmax] ('input' mode;
        dummy [1,1,1,1] otherwise)
    :param seed: f32 scalar holding the integer PRNG seed ('prng' mode;
        f32 so the cotangent machinery stays float — values < 2^24)
    :param h0: encoder output at t=0 [B,H] (computed outside, XLA — its
        VJP to the encoder weights is handled by jax around this op)
    """
    loss, _ = _fwd_impl(spec_key, shapes, interpret, flat_params,
                        batch_arrays, weight, u_scan, seed, h0)
    return loss


_SPECS = {}


def _fwd_impl(spec_key, shapes, interpret, flat_params, batch_arrays,
              weight, u_scan, seed, h0):
    spec = _SPECS[spec_key]
    K, CK, NC, B, train = shapes
    times, dts, obs, X, M, n_obs, start_X = batch_arrays
    kernel, n_refs = _make_fwd_kernel(spec, CK, NC, B, train)

    out_shape = (
        jax.ShapeDtypeStruct((1, 1), jnp.float32),              # loss
        jax.ShapeDtypeStruct((K, B, spec.H), jnp.float32),      # h history
        jax.ShapeDtypeStruct((K, B, spec.D), jnp.float32),      # lastX hist
        jax.ShapeDtypeStruct((K, B, 1), jnp.float32),           # tau hist
    )
    ins = (list(flat_params)
           + [times.reshape(1, K), dts.reshape(1, K), obs, X, M, u_scan,
              n_obs.reshape(B, 1),
              jnp.asarray(weight, jnp.float32).reshape(1, 1),
              jnp.asarray(seed, jnp.float32).reshape(1, 1), h0, start_X])
    in_specs = ([_vmem()] * len(flat_params)
                + [_smem(), _smem()]                    # times, dts
                + _chunked_in_specs(spec, CK, B, train, True, NC)
                + [_vmem()]                             # n_obs
                + [_smem(), _smem()]                    # weight, seed
                + [_vmem()] * 2)                        # h0, start_X
    out_specs = (
        _vmem((1, 1), lambda i: (0, 0)),
        _vmem((CK, B, spec.H), lambda i: (i, 0, 0)),
        _vmem((CK, B, spec.D), lambda i: (i, 0, 0)),
        _vmem((CK, B, 1), lambda i: (i, 0, 0)),
    )
    loss, hh, lx, tau = pl.pallas_call(
        kernel,
        grid=(NC,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=_carry_scratch(spec, B),
        interpret=interpret,
    )(*ins)
    return loss[0, 0], (hh, lx, tau)


def _fused_fwd(spec_key, shapes, interpret, flat_params, batch_arrays,
               weight, u_scan, seed, h0):
    loss, hists = _fwd_impl(spec_key, shapes, interpret, flat_params,
                            batch_arrays, weight, u_scan, seed, h0)
    return loss, (flat_params, batch_arrays, weight, u_scan, seed, hists)


def _fused_bwd(spec_key, shapes, interpret, res, dloss):
    spec = _SPECS[spec_key]
    K, CK, NC, B, train = shapes
    flat_params, batch_arrays, weight, u_scan, seed, (hh, lx, tau) = res
    times, dts, obs, X, M, n_obs, start_X = batch_arrays
    kernel, n_refs = _make_bwd_kernel(spec, CK, NC, B, train)

    out_shape = tuple(jax.ShapeDtypeStruct(p.shape, jnp.float32)
                      for p in flat_params) + (
        jax.ShapeDtypeStruct((B, spec.H), jnp.float32),)        # dh0
    ins = (list(flat_params)
           + [times.reshape(1, K), dts.reshape(1, K), obs, X, M, u_scan,
              n_obs.reshape(B, 1),
              jnp.asarray(weight, jnp.float32).reshape(1, 1),
              jnp.asarray(seed, jnp.float32).reshape(1, 1),
              hh, lx, tau,
              jnp.asarray(dloss, jnp.float32).reshape(1, 1)])
    rev = lambda i: (NC - 1 - i, 0, 0)  # noqa: E731
    in_specs = ([_vmem()] * len(flat_params)
                + [_smem(), _smem()]                    # times, dts
                + _chunked_in_specs(spec, CK, B, train, False, NC)
                + [_vmem()]                             # n_obs
                + [_smem(), _smem()]                    # weight, seed
                + [_vmem((CK, B, spec.H), rev),         # hh
                   _vmem((CK, B, spec.D), rev),         # lx
                   _vmem((CK, B, 1), rev)]              # tau
                + [_smem()])                            # dloss
    out_specs = tuple(
        _vmem(p.shape, lambda i, nd=p.ndim: (0,) * nd)
        for p in flat_params) + (
        _vmem((B, spec.H), lambda i: (0, 0)),)
    outs = pl.pallas_call(
        kernel,
        grid=(NC,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=_carry_scratch(spec, B),
        interpret=interpret,
    )(*ins)
    g_flat = list(outs[:-1])
    dh0 = outs[-1]
    zeros_batch = jax.tree.map(jnp.zeros_like, batch_arrays)
    return (g_flat, zeros_batch, jnp.zeros_like(weight),
            jnp.zeros_like(u_scan), jnp.zeros((), jnp.float32), dh0)


fused_njode_loss.defvjp(_fused_fwd, _fused_bwd)


def _pad_grid(arr, K_pad, axis=0):
    K = arr.shape[axis]
    if K == K_pad:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, K_pad - K)
    return jnp.pad(arr, widths)


def _split_blocks(arr, NB, BB, axis):
    """[..., B, ...] -> [NB, ..., BB, ...]: pad the batch axis to NB*BB
    with zero rows (obs==0 no-op rows) and move the block index to front."""
    B = arr.shape[axis]
    if B != NB * BB:
        widths = [(0, 0)] * arr.ndim
        widths[axis] = (0, NB * BB - B)
        arr = jnp.pad(arr, widths)
    shape = arr.shape[:axis] + (NB, BB) + arr.shape[axis + 1:]
    return jnp.moveaxis(arr.reshape(shape), axis, 0)


def _blocked_loss(key, shapes, interpret, flat, batch_arrays, weight,
                  u_scan, seeds, h0, BB, NB):
    """Invoke the fused kernel once per BB-row batch block under
    ``jax.vmap`` (shapes = (K_pad, CK, NC, train)). Padded rows have
    obs==0 everywhere, so they contribute exactly zero loss and zero
    gradient; each block's kernel normalizes its sum by the static BB,
    undone here against the real batch size. 'input'-mode dropout masks
    split with their rows, so the loss is the unblocked kernel's up to
    fp reassociation; 'prng' mode seeds per block (``seeds`` is [NB])."""
    K_pad, CK, NC, train = shapes
    times, dts, obs, X, M, n_obs, start_X = batch_arrays
    B = start_X.shape[0]
    spec = _SPECS[key]
    obs_b = _split_blocks(obs, NB, BB, 1)
    X_b = _split_blocks(X, NB, BB, 1)
    M_b = _split_blocks(M, NB, BB, 1) if spec.masked else M
    nobs_b = _split_blocks(n_obs, NB, BB, 0)
    sx_b = _split_blocks(start_X, NB, BB, 0)
    h0_b = _split_blocks(h0, NB, BB, 0)
    u_real = u_scan.ndim == 4 and u_scan.shape[2] == B
    u_b = _split_blocks(u_scan, NB, BB, 2) if u_real else u_scan

    def one(ba, u, seed, h0_blk):
        return fused_njode_loss(key, (K_pad, CK, NC, BB, train), interpret,
                                flat, ba, weight, u, seed, h0_blk)

    losses = jax.vmap(one, in_axes=(
        (None, None, 0, 0, 0 if spec.masked else None, 0, 0),
        0 if u_real else None, 0, 0))(
        (times, dts, obs_b, X_b, M_b, nobs_b, sx_b), u_b, seeds, h0_b)
    return jnp.sum(losses) * (float(BB) / float(B))


def make_fused_eval_fn(cfg, interpret: bool = False):
    """History-free fused forward for EVALUATION: the same chunked kernel
    computing the loss only (no backward-recompute carries are stored or
    streamed). Returns ``eval_fn(params, batch, weight)``; falls back to
    the XLA scan when no chunk plan fits VMEM."""
    from njode_tpu.models import njode as njode_mod

    assert supported(cfg), "config not supported by the fused kernel"
    spec = _Spec(cfg, "input")

    def eval_fn(params, batch, weight):
        K = batch.times.shape[0]
        B = batch.start_X.shape[0]
        # Mosaic pads the trailing observable dim to 128 lanes, so the
        # [K, B, D] inputs cost K*B*ceil(D/128)*128*4 bytes each in VMEM —
        # large eval batches (e.g. the 4k-path validation split) overflow;
        # fall back to the XLA scan there. Whole-scan only: a chunked eval
        # pipeline measured SLOWER than the XLA scan at large batch
        # (results/RESULTS.md — the forward alone doesn't amortize the
        # per-chunk traffic).
        n_data = 3 if cfg.masked else 2          # X [, M], + obs smaller
        est = n_data * K * B * _lane(spec.D) * 4 + K * B * 4
        if est > MONO_BUDGET:
            _, loss = njode_mod.forward(params, cfg, batch, weight=weight,
                                        train=False, get_loss=True)
            return loss
        CK, NC, K_pad = K, 1, K
        zero_mask = (jnp.zeros_like(batch.start_X) if cfg.masked else None)
        h0 = njode_mod._encoder_apply(params["encoder"], cfg, batch.start_X,
                                      zero_mask, None, False)
        flat = _flatten_params(params)
        kernel, n_refs = _make_fwd_kernel(spec, CK, NC, B, train=False,
                                          want_hists=False)
        M = (_pad_grid(batch.M, K_pad) if cfg.masked
             else jnp.zeros((1, 1, 1), jnp.float32))
        ins = (list(flat)
               + [_pad_grid(batch.times, K_pad).reshape(1, K_pad),
                  _pad_grid(batch.dt, K_pad).reshape(1, K_pad),
                  _pad_grid(batch.obs, K_pad), _pad_grid(batch.X, K_pad),
                  M, jnp.zeros((1, 1, 1, 1), jnp.int8),
                  jnp.asarray(batch.n_obs_ot,
                              jnp.float32).reshape(B, 1),
                  jnp.asarray(weight, jnp.float32).reshape(1, 1),
                  jnp.zeros((1, 1), jnp.float32), h0, batch.start_X])
        in_specs = ([_vmem()] * len(flat)
                    + [_smem(), _smem()]
                    + _chunked_in_specs(spec, CK, B, False, True, NC)
                    + [_vmem()]
                    + [_smem(), _smem()]
                    + [_vmem()] * 2)
        loss = pl.pallas_call(
            kernel,
            grid=(NC,),
            out_shape=(jax.ShapeDtypeStruct((1, 1), jnp.float32),),
            in_specs=in_specs,
            out_specs=(_vmem((1, 1), lambda i: (0, 0)),),
            scratch_shapes=_carry_scratch(spec, B),
            interpret=interpret,
        )(*ins)[0]
        return loss[0, 0]

    return eval_fn


def make_fused_loss_fn(cfg, interpret: bool = False,
                       mask_mode: str = "input", u_override=None,
                       mesh=None, axis: str = "data",
                       vmapped: bool = False, force_plan=None):
    """Return ``loss_fn(params, batch, weight, rng, train)`` using the fused
    kernel; differentiable wrt params (the t=0 encoder runs in XLA so its
    weight gradients compose with the kernel's via the h0 cotangent).

    :param mask_mode: 'input' = exact mask parity with the XLA scan;
        'prng' = in-kernel TPU PRNG masks (no [K,S,B,W] tensor — faster;
        statistically equivalent dropout, different stream).
    :param u_override: test hook ('input' mode only): an int8 [K,S,B,Wmax]
        keep-mask tensor used INSTEAD of the jax.random draw — lets the
        prng-mode mask stream be replayed through the exact-parity input
        path to prove forward/backward mask consistency
        (tests/test_fused_scan.py::test_prng_mask_mode_grad_proof).
    :param mesh: a 1-D ``jax.sharding.Mesh`` over ``axis``: the kernel runs
        data-parallel via ``shard_map`` — batch rows split over the axis,
        one kernel invocation per device, per-shard losses pmean-reduced
        (each shard's loss divides by its LOCAL batch so the mean equals
        the global 1/B normalization), weight gradients psum'd by the
        shard_map transpose. The XLA prologue (t=0 encoder, 'input'-mode
        dropout draws) runs on the GLOBAL batch under ordinary GSPMD, so
        'input' mode stays bit-identical to the no-mesh kernel; 'prng'
        mode draws one seed PER SHARD so the in-kernel streams decorrelate
        across devices. The per-device VMEM plan is sized for the LOCAL
        batch — global batches n_shards-times larger than the single-chip
        limit still run fused.
    :param vmapped: declare that the returned ``loss_fn`` will be called
        under a ``jax.vmap`` member axis (grouped sweeps): the VMEM plan
        then always chunks — the whole-scan-resident mono layout's scoped
        stack grows with the vmap extent and fails remote compile at E>=4
        (see ``_plan`` and scripts/vmap_kernel_calib.py).
    :param force_plan: override the budget-driven plan selection (probes,
        A/B harnesses, calibration — see :func:`_select_plan` for the
        accepted values: 'xla' | 'mono' | 'chunk' | ('chunk', CK) |
        'block' | ('block', BB[, CK])). Evaluated at TRACE time where the
        plan is chosen, so it cannot race against budget restores the way
        the module-global mutation idiom did. Forced non-XLA arms raise
        instead of silently falling through to the XLA scan."""
    from njode_tpu.models import njode as njode_mod

    assert supported(cfg), "config not supported by the fused kernel"
    spec = _Spec(cfg, mask_mode)
    key = spec.key()
    _SPECS[key] = spec
    n_shards = 1
    if mesh is not None:
        if tuple(mesh.axis_names) != (axis,):
            raise ValueError(
                f"fused kernel sharding needs a 1-D mesh over '{axis}'; "
                f"got axes {mesh.axis_names}")
        n_shards = int(mesh.shape[axis])

    def loss_fn(params, batch, weight, rng, train):
        K = batch.times.shape[0]
        B = batch.start_X.shape[0]
        B_local = B // n_shards if B % n_shards == 0 else None
        if B_local is None:
            if force_plan not in (None, "xla"):
                raise ValueError(
                    f"force_plan={force_plan!r} but batch {B} is not "
                    f"divisible by the {n_shards}-way mesh")
            plan = bplan = None
        else:
            plan, bplan = _select_plan(spec, K, B_local, train,
                                       vmapped=vmapped, force=force_plan)
        if plan is None and bplan is None:
            # no feasible chunking even per batch block (indivisible shard /
            # nets whose resident weights alone blow the chunk budget):
            # XLA scan fallback (GSPMD-partitioned under a mesh).
            # ALWAYS remat here — plan-less shapes are exactly the big
            # ones, and the plain backward saves every per-step MLP
            # activation ([K,E,B,W] x ~20 tensors: 44G for a 5-member
            # climate-400 fold group vs 15.75G HBM, measured round 3);
            # remat is also 3.4x FASTER at real-data scale (RESULTS.md).
            _, loss = njode_mod.forward(params, cfg, batch, weight=weight,
                                        rng=rng, train=train, get_loss=True,
                                        remat=True)
            return loss
        if plan is not None:
            CK, NC, K_pad = plan
            BB = NB = None
        else:
            # no K-chunk plan at the full (local) batch — wide nets whose
            # batch-scaled live activations overflow scoped VMEM at any CK
            # (the climate-400 wall, results/RESULTS.md): run the batch-
            # parallel kernel once per batch block instead
            CK, NC, K_pad, BB, NB = bplan
        n_blocks = NB if NB is not None else 1
        dropping = train and spec.rate > 0.0
        seeds = jnp.zeros((n_shards, n_blocks), jnp.float32)
        if dropping:
            n_ode, n_enc, n_ro, w_max = njode_mod._dropout_slots(cfg)
            k0_enc, k_scan = jax.random.split(rng, 2)
            k_u0, k_u = jax.random.split(k_scan)
            if spec.mask_mode == "input":
                if u_override is not None:
                    u_scan = jnp.asarray(u_override, jnp.int8)
                else:
                    # same bf16 draws as njode.forward, thresholded OUTSIDE
                    # the kernel into int8 keep-masks (f32 compare =>
                    # identical masks; int8 keeps the tensor within VMEM)
                    keep = jnp.float32(1.0 - spec.rate)
                    u_scan = (jax.random.uniform(
                        k_u, (K, spec.S, B, w_max),
                        dtype=jnp.bfloat16).astype(jnp.float32)
                        < keep).astype(jnp.int8)
                u_scan = _pad_grid(u_scan, K_pad)
            else:
                u_scan = jnp.zeros((1, 1, 1, 1), jnp.int8)
                seeds = jax.random.randint(
                    k_u, (n_shards, n_blocks), 0,
                    1 << 24).astype(jnp.float32)
            u0 = jax.random.uniform(k_u0, (max(n_enc, 1), B, w_max),
                                    dtype=jnp.bfloat16)
        else:
            k0_enc = rng
            u_scan = jnp.zeros((1, 1, 1, 1), jnp.int8)
            u0 = None
        zero_mask = (jnp.zeros_like(batch.start_X) if cfg.masked else None)
        h0 = njode_mod._encoder_apply(
            params["encoder"], cfg, batch.start_X, zero_mask, k0_enc, train,
            drop_u=([u0[i] for i in range(spec.n_enc)] if dropping
                    else None))
        flat = _flatten_params(params)
        M = (_pad_grid(batch.M, K_pad) if cfg.masked
             else jnp.zeros((1, 1, 1), jnp.float32))
        batch_arrays = (
            _pad_grid(batch.times, K_pad), _pad_grid(batch.dt, K_pad),
            _pad_grid(batch.obs, K_pad), _pad_grid(batch.X, K_pad), M,
            jnp.asarray(batch.n_obs_ot, jnp.float32), batch.start_X)
        w = jnp.asarray(weight, jnp.float32)
        if mesh is None:
            if BB is None:
                return fused_njode_loss(key, (K_pad, CK, NC, B, train),
                                        interpret, flat, batch_arrays, w,
                                        u_scan, seeds[0, 0], h0)
            return _blocked_loss(key, (K_pad, CK, NC, train), interpret,
                                 flat, batch_arrays, w, u_scan, seeds[0],
                                 h0, BB, NB)

        from jax.sharding import PartitionSpec as P
        P_rep = P()
        u_sharded = u_scan.ndim == 4 and u_scan.shape[2] == B
        ba_specs = (P_rep, P_rep,                       # times, dts
                    P(None, axis), P(None, axis, None),  # obs, X
                    P(None, axis, None) if cfg.masked else P_rep,  # M
                    P(axis), P(axis, None))             # n_obs, start_X

        def local_loss(flat_l, ba_l, w_l, u_l, seeds_l, h0_l):
            if BB is None:
                loss = fused_njode_loss(
                    key, (K_pad, CK, NC, B_local, train), interpret, flat_l,
                    ba_l, w_l, u_l, seeds_l[0, 0], h0_l)
            else:
                loss = _blocked_loss(
                    key, (K_pad, CK, NC, train), interpret, flat_l, ba_l,
                    w_l, u_l, seeds_l[0], h0_l, BB, NB)
            return jax.lax.pmean(loss, axis)

        # check_vma=False: pallas_call's out_shape avals carry no varying-
        # mesh-axes annotation, which the checker requires; the specs here
        # are the whole contract and are parity-tested 1-vs-N
        smapped = jax.shard_map(
            local_loss, mesh=mesh,
            in_specs=([P_rep] * len(flat), ba_specs, P_rep,
                      P(None, None, axis, None) if u_sharded else P_rep,
                      P(axis, None), P(axis, None)),
            out_specs=P_rep, check_vma=False)
        return smapped(flat, batch_arrays, w, u_scan, seeds, h0)

    return loss_fn
