"""Dense union-time-grid batching — the TPU-native replacement for the
reference's ragged event-stream encoding.

The reference collates irregular observations into
``(times, time_ptr, X, obs_idx, M)`` (``NJODE/data_utils.py:278-316``) and
consumes them with a data-dependent Python loop (``NJODE/models.py:430-511``).
On TPU the idiomatic form is a *fixed union time grid* with per-step
observation masks, consumed by one ``lax.scan``:

- ``dt[k]``      step size of Euler step k (0.0 marks padding steps),
- ``times[k]``   absolute time at the END of step k,
- ``obs[k, b]``  1.0 iff batch row b has an observation (jump) at ``times[k]``,
- ``X[k, b, d]`` observed value (0 where unobserved),
- ``M[k, b, d]`` per-coordinate observation mask (for masked datasets;
  equal to ``obs`` broadcast for fully-observed data).

Grid construction replicates the reference's clipped Euler stepping
(``models.py:432-436``): full ``delta_t`` steps, with a fractional final step
landing exactly on each observation time, and stepping resuming *from* the
observation time afterwards. For grid-aligned observations (all synthetic
datasets, ``data_utils.py:79-81``) this reduces to the plain dataset grid.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np


class GridBatch(NamedTuple):
    """A dense batch on the union time grid. All arrays are numpy/jnp;
    time-major layout ``[K, ...]`` so it can be fed straight into
    ``lax.scan``."""

    times: np.ndarray     # [K] float32, absolute time at end of each step
    dt: np.ndarray        # [K] float32, Euler step sizes (0 => padding)
    obs: np.ndarray       # [K, B] float32, observation indicator
    X: np.ndarray         # [K, B, D] float32, observed values
    M: np.ndarray         # [K, B, D] float32, coordinate mask
    start_X: np.ndarray   # [B, D] float32
    n_obs_ot: np.ndarray  # [B] float32, total #observations per row

    @property
    def num_steps(self):
        return self.times.shape[0]

    @property
    def batch_size(self):
        return self.start_X.shape[0]


def build_union_grid(obs_times, delta_t: float, T: float,
                     max_steps: Optional[int] = None):
    """Replicate the reference's Euler stepping on the host in float64.

    Mirrors the while-loops at ``models.py:432-436`` (propagate to each
    observation with clipping) and ``models.py:497-511`` (propagate to T).

    :param obs_times: sorted array of distinct observation times (batch union)
    :param delta_t: nominal Euler step
    :param T: terminal time
    :param max_steps: pad the grid with dt=0 steps up to this static length
    :return: (times [K], dt [K], obs_step_index [len(obs_times)] int)
        where obs_step_index[i] is the grid step whose end time equals
        obs_times[i] (-1 if that observation lies beyond T+tol).
    """
    obs_times = np.asarray(obs_times, dtype=np.float64)
    if max_steps is not None:
        from njode_tpu import native
        res = native.build_union_grid(obs_times, delta_t, T, max_steps)
        if res is not None:
            times, dts, obs_idx, _ = res
            return times, dts, obs_idx
        # fall through: library unavailable, or max_steps exceeded (the
        # Python path raises the descriptive error below)
    tol = 1e-10 * delta_t
    times, dts = [], []
    obs_idx = np.full(len(obs_times), -1, dtype=np.int64)
    current = 0.0
    for i, ot in enumerate(obs_times):
        if ot > T + 1e-10:
            # reference breaks out of the event loop (stock_model.py:90-91)
            break
        if ot <= tol:
            # observation AT t=0: the reference event loop jumps before any
            # propagation (models.py:430-432 with obs_time=0); represent it
            # as a leading dt=0 step so the scan's jump fires with a no-op
            # Euler step (sorted input => these come first)
            if not times:
                times.append(0.0)
                dts.append(0.0)
            obs_idx[i] = 0
            continue
        while current < ot - tol:
            d = delta_t if current < ot - delta_t else ot - current
            current = current + d
            times.append(current)
            dts.append(d)
        obs_idx[i] = len(times) - 1
    while current < T - tol:
        d = delta_t if current < T - delta_t else T - current
        current = current + d
        times.append(current)
        dts.append(d)
    times = np.asarray(times, dtype=np.float64)
    dts = np.asarray(dts, dtype=np.float64)
    if max_steps is not None:
        if len(times) > max_steps:
            raise ValueError(
                f"grid needs {len(times)} steps > max_steps={max_steps}")
        pad = max_steps - len(times)
        times = np.concatenate([times, np.full(pad, T, dtype=np.float64)])
        dts = np.concatenate([dts, np.zeros(pad, dtype=np.float64)])
    return times, dts, obs_idx


def batch_from_paths(paths, observed_dates, delta_t: float,
                     functions=None) -> GridBatch:
    """Build a GridBatch from grid-sampled synthetic data.

    Inputs follow the reference dataset layout: ``paths [B, D, T+1]``,
    ``observed_dates [B, T+1]`` 0/1 (column 0 is ignored for jumps — the
    reference collate walks t=1..T, ``data_utils.py:298``; ``start_X`` is
    always ``paths[:,:,0]``).

    :param functions: optional list of callables applied to X and appended as
        extra dims (the ``func_appl_X`` feature, ``data_utils.py:352-416``).
    """
    paths = np.asarray(paths)
    observed_dates = np.asarray(observed_dates)
    B, D, T1 = paths.shape
    K = T1 - 1
    if functions:
        paths = np.concatenate([paths] + [f(paths) for f in functions], axis=1)
        D = paths.shape[1]

    times = (np.arange(1, K + 1) * delta_t).astype(np.float64)
    dts = np.full(K, delta_t, dtype=np.float64)
    from njode_tpu import native
    nat = native.densify_paths(paths.astype(np.float64),
                               observed_dates.astype(np.int64))
    if nat is not None:
        obs, X, M, n_obs = nat
    else:
        obs = observed_dates[:, 1:].T.astype(np.float32)        # [K, B]
        X = np.transpose(paths[:, :, 1:], (2, 0, 1)).astype(np.float32)
        X = X * obs[:, :, None]
        M = np.broadcast_to(obs[:, :, None], X.shape).astype(np.float32)
        n_obs = obs.sum(axis=0).astype(np.float32)
    start_X = paths[:, :, 0].astype(np.float32)
    return GridBatch(times=times.astype(np.float32),
                     dt=dts.astype(np.float32),
                     obs=obs, X=X, M=M, start_X=start_X, n_obs_ot=n_obs)


def batch_from_events(times, time_ptr, X, obs_idx, delta_t, T, start_X,
                      n_obs_ot=None, M=None,
                      max_steps: Optional[int] = None) -> GridBatch:
    """Build a GridBatch from the reference's ragged event encoding.

    This is the compatibility bridge: the exact input format of
    ``NJODE.forward`` (``models.py:379-409``) densified onto the union grid.
    Used for real-data pipelines (climate/PhysioNet) whose observation times
    are not grid-aligned, and for parity tests against the reference format.
    """
    times = np.asarray(times, dtype=np.float64)
    time_ptr = np.asarray(time_ptr, dtype=np.int64)
    assert len(times) + 1 == len(time_ptr), \
        f"event encoding invariant broken: {len(times)} times vs " \
        f"{len(time_ptr)} ptrs (reference models.py:428)"
    X = np.asarray(X, dtype=np.float32)
    obs_idx = np.asarray(obs_idx, dtype=np.int64)
    start_X = np.asarray(start_X, dtype=np.float32)
    B, D = start_X.shape

    g_times, g_dts, obs_step = build_union_grid(times, delta_t, T, max_steps)
    K = len(g_times)
    from njode_tpu import native
    nat = native.densify_events(
        obs_step, time_ptr, obs_idx, X,
        None if M is None else np.asarray(M, np.float32), K, B)
    if nat is not None:
        obs, Xd, Md = nat
    else:
        obs = np.zeros((K, B), dtype=np.float32)
        Xd = np.zeros((K, B, D), dtype=np.float32)
        Md = np.zeros((K, B, D), dtype=np.float32)
        for i in range(len(times)):
            k = obs_step[i]
            if k < 0:
                continue
            s, e = time_ptr[i], time_ptr[i + 1]
            rows = obs_idx[s:e]
            obs[k, rows] = 1.0
            Xd[k, rows] = X[s:e]
            Md[k, rows] = (1.0 if M is None
                           else np.asarray(M[s:e], dtype=np.float32))
    if n_obs_ot is None:
        n_obs = obs.sum(axis=0).astype(np.float32)
    else:
        n_obs = np.asarray(n_obs_ot, dtype=np.float32)
    # X stays RAW (not pre-masked): the reference's GRU jump consumes the
    # raw X_obs even for masked data (models.py:460-461); consumers that
    # need masking (loss, encoder imputation) apply M explicitly
    return GridBatch(times=g_times.astype(np.float32),
                     dt=g_dts.astype(np.float32),
                     obs=obs, X=Xd, M=Md, start_X=start_X, n_obs_ot=n_obs)


class SparseBatch(NamedTuple):
    """Compact event batch for on-device densification.

    The dense [K, B, D] tensors of a real-data batch are ~100x larger than
    the underlying events; shipping them host->device per batch dominates
    epoch time (especially over a remote-device tunnel). This layout sends
    only the events plus the [K] grid arrays; :func:`densify_sparse`
    scatters them on device. Padding entries carry ``step == K`` (scattered
    into a sentinel row that is dropped).
    """

    times: np.ndarray     # [K] float32
    dt: np.ndarray        # [K] float32
    step: np.ndarray      # [E] int32, grid step per event (K = padding)
    row: np.ndarray       # [E] int32, batch row per event
    X: np.ndarray         # [E, D] float32
    M: np.ndarray         # [E, D] float32
    start_X: np.ndarray   # [B, D] float32


def sparse_from_events(ev, delta_t: float, T: float, max_steps: int,
                       max_events: int, pad_batch_to=None,
                       cov=None) -> SparseBatch:
    """Pack an event dict (times/time_ptr/X/M/obs_idx/batch_size) into a
    :class:`SparseBatch` on the union grid.

    ``cov``: optional per-row covariates ``[batch_size, C]`` shipped as
    ``start_X`` (padding rows get zeros) — the GRU-ODE-Bayes convention
    ``cov -> covariates_map -> h0`` (models_gru_ode_bayes.py:314-320);
    default keeps the real-data trainers' ``start_X = 0``."""
    times = np.asarray(ev["times"], np.float64)
    time_ptr = np.asarray(ev["time_ptr"], np.int64)
    assert len(times) + 1 == len(time_ptr)
    g_times, g_dts, obs_step = build_union_grid(times, delta_t, T, max_steps)
    K = len(g_times)
    E = len(ev["obs_idx"])
    if E > max_events:
        raise ValueError(f"batch has {E} events > max_events={max_events}")
    counts = np.diff(time_ptr)
    step = np.repeat(obs_step, counts).astype(np.int64)
    step = np.where(step < 0, K, step)   # beyond-T events -> sentinel
    rows = np.asarray(ev["obs_idx"], np.int64)
    # deterministic duplicate handling: the dense bridge keeps the LAST
    # event per (step, row) (numpy fancy assignment); JAX scatter order is
    # undefined, so retire earlier duplicates to the sentinel row here
    key = step * (int(rows.max(initial=0)) + 1) + rows
    _, last_rev = np.unique(key[::-1], return_index=True)
    keep = np.zeros(E, bool)
    keep[E - 1 - last_rev] = True
    step = np.where(keep, step, K)
    D = ev["X"].shape[1]
    pad = max_events - E
    B = ev["batch_size"] if pad_batch_to is None else pad_batch_to
    M = (np.asarray(ev["M"], np.float32) if ev.get("M") is not None
         else np.ones_like(ev["X"], np.float32))
    if cov is not None:
        cov = np.asarray(cov, np.float32)
        start_X = np.zeros((B, cov.shape[1]), np.float32)
        start_X[:cov.shape[0]] = cov
    else:
        start_X = np.zeros((B, D), np.float32)
    return SparseBatch(
        times=g_times.astype(np.float32), dt=g_dts.astype(np.float32),
        step=np.concatenate([step, np.full(pad, K)]).astype(np.int32),
        row=np.concatenate([rows, np.zeros(pad)]).astype(np.int32),
        X=np.concatenate([np.asarray(ev["X"], np.float32),
                          np.zeros((pad, D), np.float32)]),
        M=np.concatenate([M, np.zeros((pad, D), np.float32)]),
        start_X=start_X)


def densify_sparse(sb: SparseBatch, B=None) -> GridBatch:
    """Scatter a SparseBatch into a dense GridBatch ON DEVICE (jnp ops;
    call inside jit). ``n_obs_ot`` is recomputed from the scattered mask,
    matching the trainers' per-batch recomputation."""
    import jax.numpy as jnp

    if B is None:
        B = sb.start_X.shape[0]
    K = sb.times.shape[0]
    D = sb.X.shape[1]
    obs = jnp.zeros((K + 1, B), jnp.float32).at[sb.step, sb.row].max(
        (sb.step < K).astype(jnp.float32))[:K]
    X = jnp.zeros((K + 1, B, D), jnp.float32).at[sb.step, sb.row].set(
        sb.X)[:K]
    M = jnp.zeros((K + 1, B, D), jnp.float32).at[sb.step, sb.row].set(
        sb.M)[:K]
    return GridBatch(times=sb.times, dt=sb.dt, obs=obs, X=X, M=M,
                     start_X=sb.start_X, n_obs_ot=obs.sum(axis=0))


def events_from_paths(paths, observed_dates, delta_t: float):
    """Encode grid-sampled data into the reference's ragged event format.

    Mirrors ``custom_collate_fn`` (``data_utils.py:278-316``): walk grid steps
    t=1..T, collect times with >=1 observation into ``times``, flatten all
    observations (time-major, then path order) into ``X`` with ``obs_idx`` and
    CSR-style ``time_ptr``. Used for parity testing against the reference and
    by compatibility tooling.
    """
    paths = np.asarray(paths)
    observed_dates = np.asarray(observed_dates)
    B, D, T1 = paths.shape
    times, time_ptr, X, obs_idx = [], [0], [], []
    current_time, counter = 0.0, 0
    for t in range(1, T1):
        current_time += delta_t
        if observed_dates[:, t].sum() > 0:
            times.append(current_time)
            for i in range(B):
                if observed_dates[i, t] == 1:
                    counter += 1
                    X.append(paths[i, :, t])
                    obs_idx.append(i)
            time_ptr.append(counter)
    return {
        "times": np.array(times),
        "time_ptr": np.array(time_ptr),
        "X": np.array(X, dtype=np.float32).reshape(len(X), D),
        "obs_idx": np.array(obs_idx, dtype=np.int64),
        "start_X": paths[:, :, 0].astype(np.float32),
        "n_obs_ot": observed_dates[:, 1:].sum(axis=1).astype(np.float32),
    }


def validate_batch(batch: GridBatch, strict: bool = True):
    """Data-invariant checks for a GridBatch (the functional counterpart of
    the reference's runtime assertions, SURVEY §4.5/§5: collate invariants,
    monotone times, NaN tripwires).

    :returns: list of violation strings (empty when valid); raises
        ``ValueError`` with all of them when ``strict``.
    """
    problems = []
    t = np.asarray(batch.times, np.float64)
    dt = np.asarray(batch.dt, np.float64)
    obs = np.asarray(batch.obs)
    live = dt > 0
    # a leading dt==0 step at time 0 carries t=0 observations (jump before
    # any propagation) and counts as live for structural purposes
    zero_step = np.zeros_like(live)
    if len(t) and dt[0] == 0 and abs(t[0]) < 1e-12:
        zero_step[0] = True
    if np.any(dt < 0):
        problems.append("negative dt steps")
    if live.any():
        tl = t[live]
        if np.any(np.diff(tl) <= 0):
            problems.append("times not strictly increasing on live steps")
        # padding must be a suffix: no live step after the first dt==0
        body = live | zero_step
        if live[np.argmin(body):].any() and not body.all():
            problems.append("dt==0 padding step before a live step")
    if np.any((obs != 0) & (obs != 1)):
        problems.append("obs indicators not in {0, 1}")
    if np.any(obs[~(live | zero_step)] != 0):
        problems.append("observations on padding steps")
    n_obs = np.asarray(batch.n_obs_ot)
    if not np.allclose(obs.sum(axis=0), n_obs):
        problems.append("n_obs_ot inconsistent with obs mask "
                        "(run recompute_n_obs)")
    M = np.asarray(batch.M)
    if np.any((np.asarray(batch.X) != 0) & (M == 0) & (obs[:, :, None] == 0)):
        problems.append("nonzero X at fully unobserved entries")
    for name in ("X", "M", "start_X"):
        if not np.isfinite(np.asarray(getattr(batch, name))).all():
            problems.append(f"non-finite values in {name}")
    if strict and problems:
        raise ValueError("invalid GridBatch: " + "; ".join(problems))
    return problems


def nearest_grid_steps(grid_times, eval_times):
    """Index of the nearest entry of ``[0.0] + grid_times`` per eval time —
    the pre-jump extraction convention shared by the real-data trainers
    (``extract_from_path``, data_utils_gru_ode_bayes.py:379-400)."""
    pred_t = np.concatenate([[0.0], np.asarray(grid_times, np.float64)])
    ev = np.asarray(eval_times, np.float64)
    return np.abs(pred_t[None, :] - ev[:, None]).argmin(axis=1).astype(
        np.int32)


def recompute_n_obs(batch: GridBatch) -> GridBatch:
    """Recompute per-row observation counts from the mask.

    The reference train loop distrusts the dataset's ``n_obs_ot`` and
    recomputes it from the batch (``train.py:498-507``).
    """
    return batch._replace(n_obs_ot=batch.obs.sum(axis=0).astype(np.float32))
