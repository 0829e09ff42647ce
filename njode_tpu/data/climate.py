"""Climate (USHCN) sporadic time-series pipeline.

Capability parity with ``ODE_Dataset`` / ``custom_collate_fn`` /
``extract_from_path`` (``/root/reference/GRU_ODE_Bayes/
data_utils_gru_ode_bayes.py:58-207, 235-303, 379-407``) and the data plumbing
of ``climate_train.py:200-247``, re-designed TPU-first: the ragged per-batch
event encoding is densified onto the union Euler grid (data/grid.py) with
*static* shapes — fixed ``max_steps`` and fixed batch rows — so every training
step hits the same compiled program.

Data file: the reference ships fold indices but the CSV itself
(``data/training_data/climate/small_chunked_sporadic.csv``) is a missing
large blob (``.MISSING_LARGE_BLOBS:1``) to be regenerated with the
GRU-ODE-Bayes USHCN preprocessing. This module therefore provides:

- :class:`ClimateDataset` — reads any long-format sporadic CSV with columns
  ``ID, Time, Value_*, Mask_*`` (the exact schema of the reference file),
- :func:`make_synthetic_climate_csv` — a documented synthetic stand-in
  generator producing the same schema/statistics (5 variables, times on a
  0.1 grid over [0, 200], sporadic masks) for tests and demos where the real
  USHCN file is unavailable,
- :func:`make_fold_indices` — 5-fold train/val/test index files in the
  reference's ``small_chunk_fold_idx_<i>/{train,val,test}_idx.npy`` layout
  (the shipped real fold files are used when present).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from njode_tpu.data import grid
from njode_tpu.utils.paths import makedirs


class ClimateDataset:
    """Long-format sporadic dataset (``ODE_Dataset``,
    ``data_utils_gru_ode_bayes.py:58-207``).

    Holds one row per (ID, Time) with per-variable values and masks.
    ``validation=True`` keeps only series with >=1 observation before and
    after ``T_val``, truncates inputs at ``T_val`` and stores at most
    ``max_val_samples`` held-out rows per series (``:110-123, :160-183``).
    ``idx`` filters series and remaps IDs to ``0..n-1`` (``:125-134``).

    ``cov_file``/``label_file`` (or ``cov_df``/``label_df`` with
    ``panda_df``): per-series covariates (``ID, <cov columns...>``) and
    labels (``ID, label``), following the reference's loading surface
    (``:84-108``) — absent files get the reference's dummy single
    zero column (``:103-108``); validation filtering and ``idx``
    remapping apply to both (``:122-134``); covariates cast float32
    (``:142``). ``collate`` emits them as ``cov [B, cov_dim]`` / ``y
    [B]`` (``:242-244, :296-297``). With the shipped USHCN data the
    reference only ever uses the dummies; this surface exists for
    covariate-bearing datasets (the GOB trainer feeds ``cov`` to
    ``covariates_map`` as h0 when provided).
    """

    def __init__(self, csv_file=None, panda_df=None, idx=None,
                 t_mult: float = 1.0, validation: bool = False,
                 val_options: Optional[dict] = None,
                 cov_file=None, label_file=None,
                 cov_df=None, label_df=None):
        import pandas as pd
        if panda_df is not None:
            # cov/label FILES are only read in the csv branch (mirrors the
            # reference); with a pre-built frame they would be silently
            # ignored — require the df variants instead (ADVICE r4)
            assert cov_file is None and label_file is None, \
                "with panda_df pass cov_df/label_df, not cov_file/label_file"
            df = panda_df.copy()
        else:
            df = pd.read_csv(csv_file)
            if label_file is not None:
                label_df = pd.read_csv(label_file)
                assert label_df.columns[0] == "ID"
                assert label_df.columns[1] == "label"
            if cov_file is not None:
                cov_df = pd.read_csv(cov_file)
                assert cov_df.columns[0] == "ID"
        assert df.columns[0] == "ID"
        # dummy covariates / labels when not fed (:103-108)
        if cov_df is None:
            cov_df = pd.DataFrame({"ID": df["ID"].unique(),
                                   "Cov": np.zeros(df["ID"].nunique())})
        else:
            cov_df = cov_df.copy()
        if label_df is None:
            label_df = pd.DataFrame({"ID": df["ID"].unique(),
                                     "label": np.zeros(df["ID"].nunique())})
        else:
            label_df = label_df.copy()

        if validation:
            assert val_options is not None, \
                "Validation set options should be fed"
            t_val = val_options["T_val"]
            before = df.loc[df["Time"] <= t_val, "ID"].unique()
            if val_options.get("T_val_from"):
                # held-out samples only after some later time (:116-120)
                after = df.loc[df["Time"] >= val_options["T_val_from"],
                               "ID"].unique()
            else:
                after = df.loc[df["Time"] > t_val, "ID"].unique()
            valid = np.intersect1d(before, after)
            df = df.loc[df["ID"].isin(valid)]
            cov_df = cov_df.loc[cov_df["ID"].isin(valid)]
            label_df = label_df.loc[label_df["ID"].isin(valid)]

        if idx is not None:
            df = df.loc[df["ID"].isin(idx)].copy()
            mapping = dict(zip(df["ID"].unique(),
                               np.arange(df["ID"].nunique())))
            df["ID"] = df["ID"].map(mapping)
            cov_df = cov_df.loc[cov_df["ID"].isin(idx)].copy()
            cov_df["ID"] = cov_df["ID"].map(mapping)
            label_df = label_df.loc[label_df["ID"].isin(idx)].copy()
            label_df["ID"] = label_df["ID"].map(mapping)
        assert cov_df.shape[0] == df["ID"].nunique()

        self.value_cols = [c for c in df.columns if c.startswith("Value")]
        self.mask_cols = [c for c in df.columns if c.startswith("Mask")]
        self.variable_num = len(self.value_cols)

        time64 = df["Time"].astype(np.float64) * t_mult
        df = df.astype(np.float32)
        # conscious fix vs the reference's all-float32 cast (:156): Time
        # stays float64 — float32 times beyond ~100 drift off the 0.1 grid
        # by >1e-6 and would force the conservative off-grid scan bound
        df["Time"] = time64
        df["ID"] = df["ID"].astype(np.int64)

        self.validation = validation
        if validation:
            t_val = val_options["T_val"]
            df_before = df.loc[df["Time"] <= t_val].copy()
            if val_options.get("T_val_from"):
                df_after = df.loc[df["Time"] >= val_options["T_val_from"]] \
                    .sort_values("Time").copy()
            else:
                df_after = df.loc[df["Time"] > t_val] \
                    .sort_values("Time").copy()
            if val_options.get("T_closest") is not None:
                # one held-out row per series: the one nearest T_closest
                # (ties broken on Value_0, :172-178)
                tc = val_options["T_closest"]
                tmp = df_after.copy()
                tmp["Time_from_target"] = (tmp["Time"] - tc).abs()
                tmp.sort_values(by=["Time_from_target", "Value_0"],
                                inplace=True, ascending=True)
                tmp.drop_duplicates(subset=["ID"], keep="first",
                                    inplace=True)
                df_after = tmp.drop(columns=["Time_from_target"])
            else:
                # at most max_val_samples held-out rows per series (:177)
                df_after = df_after.groupby("ID").head(
                    val_options["max_val_samples"]).copy()
            df_after.sort_values("Time", inplace=True)
            self.df_after = df_after
            df = df_before
        else:
            self.df_after = None

        df.sort_values("Time", inplace=True)
        self.df = df
        self.ids = np.sort(df["ID"].unique())
        self.length = len(self.ids)

        # per-series covariates / labels aligned to ``self.ids`` order
        # (reference sets ID as the frame index, :143-145; here the arrays
        # are position-indexed like the collate's event caches)
        self.cov_dim = cov_df.shape[1] - 1
        cov_df = cov_df.copy()
        cov_df["ID"] = cov_df["ID"].astype(np.int64)
        cov_df = cov_df.set_index("ID").astype(np.float32)
        label_df = label_df.copy()
        label_df["ID"] = label_df["ID"].astype(np.int64)
        label_df = label_df.set_index("ID")
        self.cov_df, self.label_df = cov_df, label_df
        self._cov_by_pos = cov_df.loc[self.ids].values.astype(np.float32)
        self._label_by_pos = np.asarray(label_df.loc[self.ids, "label"])

        # per-ID row index cache: collate is called per batch per epoch, so
        # it must be O(batch rows), not an O(total rows) dataframe scan
        self._times = df["Time"].values.astype(np.float64)
        self._vals = df[self.value_cols].values.astype(np.float32)
        self._masks = df[self.mask_cols].values.astype(np.float32)
        ids_col = df["ID"].values
        self._rows_by_id = {
            int(i): np.where(ids_col == i)[0] for i in self.ids}
        if self.df_after is not None:
            da = self.df_after.sort_values(["ID", "Time"])
            self._a_times = da["Time"].values.astype(np.float64)
            self._a_vals = da[self.value_cols].values.astype(np.float32)
            self._a_masks = da[self.mask_cols].values.astype(np.float32)
            a_ids = da["ID"].values
            self._a_rows_by_id = {
                int(i): np.where(a_ids == i)[0] for i in self.ids}

    def __len__(self):
        return self.length

    def max_batch_events(self, batch_size: int) -> int:
        """Static event-count bound for any ``batch_size``-series batch:
        the top-``batch_size`` per-series row counts."""
        per_series = np.sort([len(r) for r in
                              self._rows_by_id.values()])[::-1]
        return int(per_series[:batch_size].sum())

    def collate(self, batch_ids):
        """Event-format batch for the given series ids (positions in
        ``self.ids``) — mirrors ``custom_collate_fn`` (``:235-303``).

        :return: dict with ``times [L]``, ``time_ptr [L+1]``,
            ``X/M [total_obs, D]``, ``obs_idx [total_obs]`` (positions within
            the batch), and, for validation sets, the held-out
            ``X_val/M_val/times_val/index_val``.
        """
        batch_ids = np.asarray(batch_ids)
        sel_ids = self.ids[batch_ids]
        rows = [self._rows_by_id[int(i)] for i in sel_ids]
        pos = np.concatenate([np.full(len(r), k, np.int64)
                              for k, r in enumerate(rows)])
        rows = np.concatenate(rows)
        order = np.argsort(self._times[rows], kind="stable")
        rows, pos = rows[order], pos[order]

        times, counts = np.unique(self._times[rows], return_counts=True)
        time_ptr = np.concatenate([[0], np.cumsum(counts)])
        res = {
            "times": times,
            "time_ptr": time_ptr.astype(np.int64),
            "X": self._vals[rows],
            "M": self._masks[rows],
            "obs_idx": pos,
            "batch_size": len(batch_ids),
            # per-series covariates / labels (custom_collate_fn emits
            # 'cov'/'y', :242-244, :296-297; dummies when no files fed)
            "cov": self._cov_by_pos[batch_ids],
            "y": self._label_by_pos[batch_ids],
        }
        if self.validation:
            a_rows = [self._a_rows_by_id[int(i)] for i in sel_ids]
            a_pos = np.concatenate([np.full(len(r), k, np.int64)
                                    for k, r in enumerate(a_rows)])
            a_rows = np.concatenate(a_rows)
            res["X_val"] = self._a_vals[a_rows]
            res["M_val"] = self._a_masks[a_rows]
            res["times_val"] = self._a_times[a_rows]
            res["index_val"] = a_pos
        return res

    def max_grid_steps(self, delta_t: float, T: float) -> int:
        """Static scan length that accommodates any batch from this split.

        If every observation time lies on the ``delta_t`` grid (true for the
        real USHCN file at delta_t=0.1) the union grid is the plain Euler
        grid. Otherwise each observation can force one fractional step AND
        offset the following full steps, so the safe bound is
        ``floor(T/dt) + n_distinct_times + 1`` (each scan step is either a
        full ``delta_t`` step — at most floor(T/dt) of those fit in [0,T] —
        or a fractional step landing on an observation time or on T)."""
        times = np.unique(self.df["Time"].values.astype(np.float64))
        times = times[times <= T + 1e-10]
        frac = times / delta_t
        n_grid = int(np.ceil(T / delta_t - 1e-9))
        if np.all(np.abs(frac - np.round(frac)) <= 1e-6):
            # +4 slack: float drift in the step accumulator can add a rare
            # fractional step even for aligned times (same loop semantics
            # as the reference, models.py:432-436)
            return n_grid + 4
        return n_grid + len(times) + 1


def dense_batch_from_events(ev, delta_t: float, T: float, max_steps: int,
                            pad_batch_to: Optional[int] = None):
    """Bridge an event-format batch to a static-shape :class:`GridBatch`.

    ``start_X`` is zeros (``climate_train.py:431-432``); ``n_obs_ot`` counts
    observation *events* per row, recomputed from ``obs_idx`` exactly as the
    train loop does (``climate_train.py:424-430``). Extra padded rows (up to
    ``pad_batch_to``) have no observations; callers must rescale losses by
    ``padded_B / real_B`` to keep the reference's 1/batch_size convention.
    """
    b = grid.batch_from_events(
        ev["times"], ev["time_ptr"], ev["X"], ev["obs_idx"], delta_t, T,
        start_X=np.zeros((ev["batch_size"], ev["X"].shape[1]), np.float32),
        M=ev["M"], max_steps=max_steps)
    b = grid.recompute_n_obs(b)
    if pad_batch_to is not None and pad_batch_to > b.batch_size:
        pad = pad_batch_to - b.batch_size
        b = b._replace(
            obs=np.pad(b.obs, ((0, 0), (0, pad))),
            X=np.pad(b.X, ((0, 0), (0, pad), (0, 0))),
            M=np.pad(b.M, ((0, 0), (0, pad), (0, 0))),
            start_X=np.pad(b.start_X, ((0, pad), (0, 0))),
            n_obs_ot=np.pad(b.n_obs_ot, (0, pad)))
    return b


def extract_at_times(pred_t, pred_path, eval_times, eval_idx):
    """Gather pre-jump predictions at held-out observation times
    (``extract_from_path``, ``data_utils_gru_ode_bayes.py:379-400``):
    for each (eval_time, row), take the prediction at the nearest grid time.

    :param pred_t: [K+1] grid times (incl. t=0), strictly increasing after
        dedup (padding steps share the terminal time — harmless, eval times
        are < T)
    :param pred_path: [K+1, B, D] pre-jump predictions
    :param eval_times: [L] held-out times
    :param eval_idx: [L] row index per held-out time
    :return: [L, D] predictions
    """
    pred_t = np.asarray(pred_t)
    pred_path = np.asarray(pred_path)
    eval_times = np.asarray(eval_times)
    k = np.abs(pred_t[None, :] - eval_times[:, None]).argmin(axis=1)
    return pred_path[k, np.asarray(eval_idx)]


def masked_mse_parts(pred_at_val, X_val, M_val):
    """Numerator/denominator of the climate eval metric
    (``climate_train.py:556-561``): masked squared error summed over held-out
    points, and the total mask count."""
    se = float((((X_val - pred_at_val) ** 2) * M_val).sum())
    return se, float(M_val.sum())


def seq_collate(df, n_vars: int):
    """Padded-sequence collate for the sequential-update model family
    (``seq_collate_fn``, ``data_utils_gru_ode_bayes.py:305-376``).

    Rows sorted by (Time, -n_obs_features); per event row, the observed
    values/feature-ids in ascending feature order padded to the batch max.
    Returns numpy arrays (the torch PackedSequence machinery is replaced by
    the dense per-feature masking in ``gru_ode_bayes.seq_forward``).
    """
    rows = []
    for _, r in df.iterrows():
        mask = np.array([r[f"Mask_{j}"] for j in range(n_vars)])
        vals = np.array([r[f"Value_{j}"] for j in range(n_vars)])
        feats = np.where(mask > 0)[0]
        rows.append((float(r["Time"]), -len(feats), int(r["ID"]),
                     vals, mask, feats))
    rows.sort(key=lambda x: (x[0], x[1], x[2]))
    times, counts = np.unique([r[0] for r in rows], return_counts=True)
    time_ptr = np.concatenate([[0], np.cumsum(counts)])
    lengths = np.array([len(r[5]) for r in rows], np.int64)
    l_max = int(lengths.max()) if len(lengths) else 1
    n = len(rows)
    Xp = np.zeros((n, l_max), np.float32)
    Fp = np.zeros((n, l_max), np.int64)
    X = np.zeros((n, n_vars), np.float32)
    M = np.zeros((n, n_vars), np.float32)
    obs_idx = np.zeros(n, np.int64)
    for i, (t, _, pid, vals, mask, feats) in enumerate(rows):
        Xp[i, :len(feats)] = vals[feats]
        Fp[i, :len(feats)] = feats
        X[i] = vals * mask
        M[i] = mask
        obs_idx[i] = pid
    return {"times": times, "time_ptr": time_ptr.astype(np.int64),
            "Xpadded": Xp, "Fpadded": Fp, "X": X, "M": M,
            "lengths": lengths, "obs_idx": obs_idx}


# ---------------------------------------------------------------------------
# Misc helpers (``data_utils_gru_ode_bayes.py:209-231, 402-443``)
# ---------------------------------------------------------------------------

def add_jitter(df, jitter_time: float = 1e-3, seed=None):
    """Split rows where both of 2 variables are observed, shifting one of
    the two observations earlier by ``jitter_time``
    (``add_jitter``, ``:209-231``; used for the double-OU experiments)."""
    import pandas as pd
    if df.columns.shape[0] != 6:
        raise ValueError(
            "Only df with 6 columns: supports 2 value and 2 mask columns.")
    rs = np.random.RandomState(seed)
    both = (df["Mask_1"] == 1.0) & (df["Mask_2"] == 1.0)
    df_single = df[~both]
    df_both1 = df[both].copy()
    df_both2 = df[both].copy()
    df_both1["Mask_2"] = 0.0
    df_both2["Mask_1"] = 0.0
    jitter = rs.randint(2, size=df_both1.shape[0])
    df_both1["Time"] = df_both1["Time"] - jitter_time * jitter
    df_both2["Time"] = df_both2["Time"] - jitter_time * (1 - jitter)
    out = pd.concat([df_single, df_both1, df_both2])
    out["Time"] = out["Time"].clip(lower=0.0)
    return out


def map_to_closest(values, reference):
    """Per element, the closest entry of ``reference``
    (``map_to_closest``, ``:402-407``)."""
    values = np.asarray(values)
    reference = np.asarray(reference)
    idx = np.abs(reference[None, :] - values[:, None]).argmin(axis=1)
    return reference[idx]


def adjust_learning_rate(epoch: int, init_lr: float) -> float:
    """Reference LR schedule: lr/3 after epoch 20
    (``adjust_learning_rate``, ``:409-412``; functional — returns the lr
    instead of mutating an optimizer)."""
    return init_lr / 3.0 if epoch > 20 else init_lr


def compute_corr(X_true, X_hat, mask):
    """Masked per-feature Pearson correlation (``compute_corr``,
    ``:414-420``)."""
    X_true = np.asarray(X_true, np.float64)
    X_hat = np.asarray(X_hat, np.float64)
    mask = np.asarray(mask, np.float64)
    means_true = X_true.sum(0) / mask.sum(0)
    means_hat = X_hat.sum(0) / mask.sum(0)
    num = ((X_true - means_true) * (X_hat - means_hat) * mask).sum(0)
    d1 = np.sqrt((((X_true - means_true) ** 2) * mask).sum(0))
    d2 = np.sqrt((((X_hat - means_hat) ** 2) * mask).sum(0))
    return num / (d1 * d2)


def sort_array_on_other(x1, x2):
    """Permutation ``perm`` with ``x2[perm] == x1``
    (``sort_array_on_other``, ``:423-434``)."""
    index = {v: i for i, v in enumerate(x1)}
    perm = np.argsort([index[v] for v in x2])
    assert (np.asarray(x2)[perm] == np.asarray(x1)).all()
    return perm


def log_lik_gaussian(x, mu, logvar):
    """Gaussian negative log-likelihood per element
    (``log_lik_gaussian``, ``:436-437``)."""
    x, mu, logvar = map(np.asarray, (x, mu, logvar))
    return (np.log(np.sqrt(2 * np.pi)) + logvar / 2
            + (x - mu) ** 2 / (2 * np.exp(logvar)))


def tail_fun_gaussian(x, mu, logvar):
    """P(N(mu, e^logvar) > x) (``tail_fun_gaussian``, ``:439-443``)."""
    from scipy import special
    x, mu, logvar = map(np.asarray, (x, mu, logvar))
    return 0.5 - 0.5 * special.erf(
        (x - mu) / (np.exp(0.5 * logvar) * np.sqrt(2)))


# ---------------------------------------------------------------------------
# Data regeneration / synthetic stand-in
# ---------------------------------------------------------------------------

def make_synthetic_climate_csv(path: str, n_series: int = 1114,
                               n_vars: int = 5, T: float = 200.0,
                               obs_perc: float = 0.02, seed: int = 0):
    """Generate a synthetic sporadic CSV with the schema and scale of the
    reference's ``small_chunked_sporadic.csv`` (missing large blob).

    Schema: ``ID, Time, Value_0..n, Mask_0..n`` — one row per (ID, Time) with
    >=1 observed variable; times on the 0.1 grid in [0, T]; values are
    standardized OU paths (the real file holds centered/scaled USHCN daily
    measurements). This is a *stand-in* for tests/demos, not climate data.
    """
    import pandas as pd
    rs = np.random.RandomState(seed)
    grid_times = np.round(np.arange(0.1, T + 1e-9, 0.1), 1)
    rows = []
    for sid in range(n_series):
        # OU dynamics per variable for realistic autocorrelation
        n_t = len(grid_times)
        x = np.zeros((n_t, n_vars))
        x[0] = rs.normal(0, 1, n_vars)
        for k in range(1, n_t):
            x[k] = x[k - 1] - 0.05 * x[k - 1] + 0.3 * rs.normal(0, 1, n_vars)
        mask = rs.random((n_t, n_vars)) < obs_perc
        keep = mask.any(axis=1)
        for k in np.where(keep)[0]:
            rows.append([sid, grid_times[k]]
                        + list(np.where(mask[k], x[k], 0.0))
                        + list(mask[k].astype(np.float32)))
    cols = (["ID", "Time"] + [f"Value_{i}" for i in range(n_vars)]
            + [f"Mask_{i}" for i in range(n_vars)])
    df = pd.DataFrame(rows, columns=cols)
    makedirs(os.path.dirname(path) or ".")
    df.to_csv(path, index=False)
    return df


def make_fold_indices(out_dir: str, n_series: int, n_folds: int = 5,
                      val_frac: float = 0.18, test_frac: float = 0.1,
                      seed: int = 0):
    """Write ``small_chunk_fold_idx_<i>/{train,val,test}_idx.npy`` fold files
    in the reference layout (5 folds, 801/201/112-style splits)."""
    rs = np.random.RandomState(seed)
    for i in range(n_folds):
        perm = rs.permutation(n_series)
        n_test = int(round(test_frac * n_series))
        n_val = int(round(val_frac * n_series))
        d = os.path.join(out_dir, f"small_chunk_fold_idx_{i}")
        makedirs(d)
        np.save(os.path.join(d, "test_idx.npy"), np.sort(perm[:n_test]))
        np.save(os.path.join(d, "val_idx.npy"),
                np.sort(perm[n_test:n_test + n_val]))
        np.save(os.path.join(d, "train_idx.npy"),
                np.sort(perm[n_test + n_val:]))


def prestack_series(ds: "ClimateDataset", delta_t: float, T: float,
                    max_steps: int):
    """ONE-TIME device-ready pre-stack of a (non-validation) climate split
    — the counterpart of ``physionet.prestack_train_records`` for the
    sporadic USHCN series: per series, every event row (raw values + mask,
    the ``collate`` convention — climate data is NOT renormalized) mapped
    to its step on the CANONICAL union grid of the split's OBSERVED times
    (t=0 appears only when a series observes at t=0; no unconditional
    prepend — see the comment below). Batches then build fully ON DEVICE
    via
    ``training/steps.prestacked_batch`` (gather + scatter inside jit),
    removing the per-epoch host collation and event transfer. Same
    documented canonical-grid tail property as the PhysioNet prestack:
    with grid-aligned times (true for the USHCN file at delta_t=0.1) the
    canonical grid IS the per-batch union grid, so batches are identical;
    off-grid times return ``None`` (fall back to per-batch collation).

    :return: dict with 'times'/'dt' [K] float32, 'k' [N, Emax] int32
        (grid step per event, K = padding sentinel), 'X'/'M' [N, Emax, D]
        float32, 'n_ev' [N] — series order follows ``ds.ids`` (the
        positions ``collate`` indexes with) — or None when off-grid.
    """
    assert not ds.validation, "prestack applies to training splits"
    # the canonical grid is built from the OBSERVED times only — exactly
    # the per-batch rule (sparse_from_events passes just the batch's
    # times). An unconditional t=0 entry used to prepend one dt==0 no-op
    # step, shifting every per-step dropout-mask index by one vs the
    # legacy path: dynamics identical, dropout STREAMS not (caught by
    # test_gob_climate_cov_file_end_to_end's prestack-vs-legacy leg).
    # Residual caveat (ADVICE r4): if ANY series observes at exactly
    # t=0, the canonical grid gains a leading t=0 step that per-batch
    # grids of batches WITHOUT a t=0 observation lack — those batches'
    # dropout-mask indices shift by one vs the legacy path (dynamics
    # still identical: the extra step is dt==0, a no-op; only the
    # dropout STREAM differs, which is statistically equivalent). USHCN
    # preprocessing CAN emit t=0 rows (day % chunk_days == 0), so this
    # is documented rather than gated — gating would silently disable
    # the prestacked fast path on the real dataset. See PARITY.md
    # (climate deviations).
    all_tt = np.unique(ds._times)
    frac = all_tt / delta_t
    if not np.all(np.abs(frac - np.round(frac)) <= 1e-6):
        return None
    g_times, g_dts, obs_step = grid.build_union_grid(all_tt, delta_t, T,
                                                     max_steps)
    K = len(g_times)
    D = ds.variable_num
    rows_by_pos = [ds._rows_by_id[int(i)] for i in ds.ids]
    n_ev = np.array([len(r) for r in rows_by_pos])
    Emax = int(n_ev.max())
    N = len(ds.ids)
    k_all = np.full((N, Emax), K, np.int32)
    X_all = np.zeros((N, Emax, D), np.float32)
    M_all = np.zeros((N, Emax, D), np.float32)
    for i, rows in enumerate(rows_by_pos):
        pos = np.searchsorted(all_tt, ds._times[rows])
        steps = obs_step[pos]
        e = len(rows)
        k_all[i, :e] = np.where(steps >= 0, steps, K)  # beyond-T: sentinel
        X_all[i, :e] = ds._vals[rows]
        M_all[i, :e] = ds._masks[rows]
    return {"times": g_times.astype(np.float32),
            "dt": g_dts.astype(np.float32), "k": k_all, "X": X_all,
            "M": M_all, "n_ev": n_ev,
            "cov": ds._cov_by_pos.copy()}   # [N, cov_dim], ds.ids order


def preprocess_ushcn_daily(raw_csv: str, out_csv: str,
                           chunk_days: int = 200, t_scale: float = 1.0,
                           min_obs_per_chunk: int = 10):
    """Regenerate ``small_chunked_sporadic.csv`` from raw USHCN daily data.

    Implements the GRU-ODE-Bayes preprocessing recipe referenced by
    ``README.md:191-195``: per-station daily measurements
    (PRCP, SNOW, SNWD, TMAX, TMIN) are centered/scaled per variable, the
    timeline is cut into ``chunk_days``-day chunks (each chunk becomes an
    independent series), and rows keep only days with >=1 observed variable.
    Requires the raw file (``ID, day, Value_0..4, Mask_0..4`` long format) —
    gated: raises FileNotFoundError when the raw data is absent (no network
    access in this environment).
    """
    import pandas as pd
    if not os.path.exists(raw_csv):
        raise FileNotFoundError(
            f"raw USHCN file {raw_csv} not found; download it with the "
            "GRU-ODE-Bayes preprocessing scripts, or use "
            "make_synthetic_climate_csv as a stand-in")
    df = pd.read_csv(raw_csv)
    value_cols = [c for c in df.columns if c.startswith("Value")]
    mask_cols = [c for c in df.columns if c.startswith("Mask")]
    # center/scale per variable over observed entries
    for v, m in zip(value_cols, mask_cols):
        obs = df[m] > 0
        mu, sd = df.loc[obs, v].mean(), df.loc[obs, v].std()
        df.loc[obs, v] = (df.loc[obs, v] - mu) / (sd + 1e-12)
        df.loc[~obs, v] = 0.0
    # chunk the timeline; each (station, chunk) is a new series
    df["chunk"] = (df["day"] // chunk_days).astype(int)
    df["Time"] = (df["day"] % chunk_days).astype(float) * t_scale
    df["ID"] = df.groupby(["ID", "chunk"]).ngroup()
    counts = df.groupby("ID")["Time"].transform("count")
    df = df[counts >= min_obs_per_chunk]
    df["ID"] = df.groupby("ID").ngroup()
    out = df[["ID", "Time"] + value_cols + mask_cols].sort_values(
        ["ID", "Time"])
    makedirs(os.path.dirname(out_csv) or ".")
    out.to_csv(out_csv, index=False)
    return out
