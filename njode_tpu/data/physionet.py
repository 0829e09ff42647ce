"""PhysioNet-2012 (mortality challenge) irregular time-series pipeline.

Capability parity with the latent-ODE-derived pipeline
(``/root/reference/latent_ODE/physionet_LODE.py``,
``parse_datasets_LODE.py``, ``utils_LODE.py``, ``likelihood_eval_LODE.py``):

- :class:`PhysioNetData`: download (gated — no network in this environment),
  parse per-patient text records with time quantization and same-bin
  averaging (``physionet_LODE.py:204-260``), cache as ``.npz``,
- :func:`get_data_min_max`: per-feature min/max over observed entries
  (``physionet_LODE.py:65-95``),
- :func:`normalize_masked_data`: ``(x - min) / max`` with zero-max guard —
  the reference divides by ``att_max``, not ``max - min``
  (``utils_LODE.py:370-385``, quirk deliberately preserved),
- :func:`collate_records` = ``variable_time_collate_fn1``
  (``physionet_LODE.py:428-544``): union-of-times grid, dense normalization,
  times ``/48``; test mode holds out the second half of the time grid as
  ``times_val/vals_val/mask_val`` and optionally re-injects held-out points
  with probability ``eval_input_prob`` (``:513-529``),
- :func:`parse_datasets` (``parse_datasets_LODE.py:58-186``): combine
  set-a + set-b, ``train_test_split(train_size=0.8, random_state=42)``,
- :func:`compute_masked_likelihood_mse`: the latent-ODE per-patient-per-dim
  masked-MSE metric (``likelihood_eval_LODE.py:171-236``),
- :func:`make_synthetic_records`: a synthetic record generator with the same
  structure (41 features, sparse masks, times in [0, 48] hours) used for
  tests/demos when the real tarballs are unavailable.

A record is a tuple ``(record_id, tt [T], vals [T, D], mask [T, D], label)``
in numpy, exactly the reference's structure minus torch.
"""

from __future__ import annotations

import os
import tarfile
from typing import List, Optional, Sequence, Tuple

import numpy as np

from njode_tpu.utils.paths import makedirs

URLS = [
    "https://physionet.org/files/challenge-2012/1.0.0/set-a.tar.gz?download",
    "https://physionet.org/files/challenge-2012/1.0.0/set-b.tar.gz?download",
]
OUTCOME_URLS = [
    "https://physionet.org/files/challenge-2012/1.0.0/Outcomes-a.txt"]

# the 41 parameters incl. the 4 static ones kept by the reference
# (physionet_LODE.py:107-117)
PARAMS = [
    "Age", "Gender", "Height", "ICUType",
    "Weight", "Albumin", "ALP", "ALT",
    "AST", "Bilirubin", "BUN",
    "Cholesterol", "Creatinine", "DiasABP", "FiO2", "GCS", "Glucose",
    "HCO3", "HCT", "HR", "K", "Lactate", "Mg",
    "MAP", "MechVent", "Na", "NIDiasABP", "NIMAP", "NISysABP", "PaCO2",
    "PaO2", "pH", "Platelets", "RespRate",
    "SaO2", "SysABP", "Temp", "TroponinI", "TroponinT", "Urine", "WBC",
]
PARAMS_DICT = {k: i for i, k in enumerate(PARAMS)}


def parse_record_lines(record_id: str, lines: Sequence[str],
                       quantization: float = 0.1, reduce: str = "average"):
    """Parse one raw record file into ``(record_id, tt, vals, mask)``.

    Reference semantics (``physionet_LODE.py:204-246``): times ``HH:MM`` in
    hours, rounded to the quantization bin; repeated observations of a
    parameter in the same bin are averaged (``reduce='average'``) or
    overwritten; unknown parameters other than 'RecordID' are an error.
    """
    D = len(PARAMS)
    prev_time = 0.0
    tt = [0.0]
    vals = [np.zeros(D)]
    mask = [np.zeros(D)]
    nobs = [np.zeros(D)]
    for line in lines[1:]:
        time_s, param, val = line.strip().split(",")
        hh, mm = time_s.split(":")
        time = float(hh) + float(mm) / 60.0
        time = round(time / quantization) * quantization
        if time != prev_time:
            tt.append(time)
            vals.append(np.zeros(D))
            mask.append(np.zeros(D))
            nobs.append(np.zeros(D))
            prev_time = time
        if param in PARAMS_DICT:
            j = PARAMS_DICT[param]
            n = nobs[-1][j]
            if reduce == "average" and n > 0:
                vals[-1][j] = (vals[-1][j] * n + float(val)) / (n + 1)
            else:
                vals[-1][j] = float(val)
            mask[-1][j] = 1
            nobs[-1][j] += 1
        else:
            assert param == "RecordID", f"Read unexpected param {param}"
    return (record_id, np.asarray(tt, np.float64),
            np.stack(vals).astype(np.float32),
            np.stack(mask).astype(np.float32))


class PhysioNetData:
    """Parsed + cached PhysioNet split (``PhysioNet``,
    ``physionet_LODE.py:98-320``).

    Download is gated: if the raw tarballs are absent and ``download=True``,
    a clear RuntimeError explains how to provide them (this environment has
    no network access). ``records`` is a list of
    ``(record_id, tt, vals, mask, label)`` tuples.
    """

    def __init__(self, root: str, train: bool = True,
                 quantization: float = 0.1, download: bool = False,
                 n_samples: Optional[int] = None):
        self.root = root
        self.train = train
        self.quantization = quantization
        split = "set-a" if train else "set-b"
        cache = os.path.join(self.processed_folder,
                             f"{split}_{quantization}.npz")
        if not os.path.exists(cache):
            if not download:
                raise RuntimeError(
                    "Dataset not found. You can use download=True to "
                    "download it")
            self._process(split, cache)
        self.records = self._load_cache(cache)
        if n_samples is not None:
            self.records = self.records[:n_samples]

    @property
    def raw_folder(self):
        return os.path.join(self.root, "PhysioNet", "raw")

    @property
    def processed_folder(self):
        return os.path.join(self.root, "PhysioNet", "processed")

    def _process(self, split, cache):
        makedirs(self.raw_folder)
        makedirs(self.processed_folder)
        tar_path = os.path.join(self.raw_folder, f"{split}.tar.gz")
        dirname = os.path.join(self.raw_folder, split)
        if not os.path.isdir(dirname):
            if not os.path.exists(tar_path):
                self._download(split, tar_path)
            with tarfile.open(tar_path, "r:gz") as tar:
                tar.extractall(self.raw_folder)
        outcomes = self._load_outcomes()
        records = []
        for txtfile in sorted(os.listdir(dirname)):
            rid = txtfile.split(".")[0]
            with open(os.path.join(dirname, txtfile)) as f:
                lines = f.readlines()
            rid, tt, vals, mask = parse_record_lines(
                rid, lines, self.quantization)
            label = outcomes.get(rid, np.nan)
            records.append((rid, tt, vals, mask, label))
        self._save_cache(cache, records)

    def _download(self, split, tar_path):
        """Fetch the raw tarball from physionet.org — gated on network
        availability; in offline environments place the tarballs under
        ``<root>/PhysioNet/raw/`` manually or use
        :func:`make_synthetic_records`."""
        import urllib.request
        url = [u for u in URLS if split in u][0]
        try:
            print(f"Downloading {url} ...")
            urllib.request.urlretrieve(url, tar_path)
        except Exception as e:
            raise RuntimeError(
                f"could not download {url} ({e}); this environment may have "
                f"no network access — place {split}.tar.gz under "
                f"{self.raw_folder} manually, or use "
                "make_synthetic_records() for a synthetic stand-in") from e

    def _load_outcomes(self):
        """Mortality label (last of the 5 outcome columns,
        ``physionet_LODE.py:188-200, 291``)."""
        path = os.path.join(self.raw_folder, "Outcomes-a.txt")
        if not os.path.exists(path):
            return {}
        out = {}
        with open(path) as f:
            for line in f.readlines()[1:]:
                cells = line.strip().split(",")
                out[cells[0]] = float(cells[-1])
        return out

    @staticmethod
    def _save_cache(cache, records):
        flat = {}
        for i, (rid, tt, vals, mask, label) in enumerate(records):
            flat[f"rid_{i}"] = np.asarray(rid)
            flat[f"tt_{i}"] = tt
            flat[f"vals_{i}"] = vals
            flat[f"mask_{i}"] = mask
            flat[f"label_{i}"] = np.asarray(label, np.float64)
        flat["n"] = np.asarray(len(records))
        np.savez_compressed(cache, **flat)

    @staticmethod
    def _load_cache(cache):
        z = np.load(cache, allow_pickle=False)
        n = int(z["n"])
        return [(str(z[f"rid_{i}"]), z[f"tt_{i}"], z[f"vals_{i}"],
                 z[f"mask_{i}"], float(z[f"label_{i}"])) for i in range(n)]

    def __len__(self):
        return len(self.records)

    def __getitem__(self, i):
        return self.records[i]


def make_synthetic_records(n_records: int, n_vars: int = len(PARAMS),
                           max_hours: float = 48.0,
                           quantization: float = 0.1,
                           obs_perc: float = 0.05, seed: int = 0):
    """Synthetic stand-in records with the real dataset's structure: sparse
    per-feature masks, quantized times in [0, 48] hours, a t=0 row. Not
    medical data — for tests/demos without the physionet.org tarballs."""
    rs = np.random.RandomState(seed)
    records = []
    bins = np.arange(0.0, max_hours + 1e-9, quantization)
    for i in range(n_records):
        n_t = rs.randint(5, max(6, int(len(bins) * 0.2)))
        tt = np.sort(rs.choice(bins[1:], n_t - 1, replace=False))
        tt = np.concatenate([[0.0], tt])
        vals = rs.normal(0.0, 1.0, (len(tt), n_vars)).astype(np.float32)
        mask = (rs.random((len(tt), n_vars)) < obs_perc).astype(np.float32)
        mask[0] = 0.0  # reference records start with an all-zero t=0 row
        vals = vals * mask
        records.append((f"syn{i:06d}", tt.astype(np.float64), vals, mask,
                        float(rs.randint(2))))
    return records


def get_data_min_max(records):
    """Per-feature min/max over observed entries (``physionet_LODE.py:65-95``);
    features never observed get (+inf, -inf) like the reference."""
    D = records[0][2].shape[1]
    data_min = np.full(D, np.inf)
    data_max = np.full(D, -np.inf)
    for _, _, vals, mask, _ in records:
        obs = mask > 0
        for j in range(D):
            v = vals[:, j][obs[:, j]]
            if len(v):
                data_min[j] = min(data_min[j], v.min())
                data_max[j] = max(data_max[j], v.max())
    return data_min.astype(np.float32), data_max.astype(np.float32)


def normalize_masked_data(data, mask, att_min, att_max):
    """``(x - min) / max`` with masked entries reset to 0
    (``utils_LODE.py:370-385``; division by ``att_max`` — not the range —
    is a reference quirk preserved for metric comparability)."""
    att_max = np.where(att_max == 0.0, 1.0, att_max)
    norm = (data - att_min) / att_max
    if np.isnan(norm).any():
        raise ValueError("nans!")
    return np.where(mask > 0, norm, 0.0).astype(np.float32)


def collate_records(batch, data_min, data_max, data_type: str = "train",
                    eval_input_prob: Optional[float] = None,
                    eval_input_seed: Optional[int] = 3892):
    """``variable_time_collate_fn1`` (``physionet_LODE.py:428-544``).

    :return: event dict with ``times`` (normalized /48), ``time_ptr``,
        ``X/M [total_obs, D]``, ``obs_idx``, ``batch_size``; in test mode
        also the held-out second half: ``times_val [L]``,
        ``vals_val/mask_val [B, L, D]``.
    """
    D = batch[0][2].shape[1]
    B = len(batch)
    all_tt = np.concatenate([ex[1] for ex in batch])
    combined_tt, inverse = np.unique(all_tt, return_inverse=True)
    T_u = len(combined_tt)
    combined_vals = np.zeros((B, T_u, D), np.float32)
    combined_mask = np.zeros((B, T_u, D), np.float32)
    offset = 0
    for b, (_, tt, vals, mask, _) in enumerate(batch):
        idx = inverse[offset:offset + len(tt)]
        offset += len(tt)
        combined_vals[b, idx] = vals
        combined_mask[b, idx] = mask
    times = (combined_tt / 48.0).astype(np.float64)  # 48h timeline -> [0,1]

    if data_type == "train":
        # hot path (once per batch per epoch): only the observed event rows
        # survive into the output, so normalize THOSE [E, D] rows instead
        # of the dense [B, T, D] block (~85% of which is padding) — same
        # per-entry formula, ~5x less host time (the epoch's collation cost
        # at PhysioNet scale, results/RESULTS.md)
        present = combined_mask.sum(-1) > 0             # [B, T_u]
        t_ind_ev, i_ev = np.nonzero(present.T)          # t-major, i asc
        X = normalize_masked_data(combined_vals[i_ev, t_ind_ev],
                                  combined_mask[i_ev, t_ind_ev],
                                  data_min, data_max)
        M = combined_mask[i_ev, t_ind_ev]
        counts = np.bincount(t_ind_ev, minlength=len(times))
        time_ptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        return {
            "times": np.asarray(times, np.float64),
            "time_ptr": time_ptr,
            "X": X.reshape(len(X), D),
            "M": M.reshape(len(M), D),
            "obs_idx": i_ev.astype(np.int64),
            "batch_size": B,
            "times_val": None, "vals_val": None, "mask_val": None,
        }

    combined_vals = normalize_masked_data(combined_vals, combined_mask,
                                          data_min, data_max)

    times_val = vals_val = mask_val = None
    if data_type == "test":
        n_obs = len(times) // 2
        times_val = times[n_obs:]
        vals_val = combined_vals[:, n_obs:, :]
        mask_val = combined_mask[:, n_obs:, :]
        times = times[:n_obs]
        combined_vals = combined_vals[:, :n_obs, :]
        combined_mask = combined_mask[:, :n_obs, :]

    # vectorized event construction (the reference's O(T_u x B) python
    # double loop, physionet_LODE.py:497-509, is the host bottleneck)
    present = combined_mask.sum(-1) > 0                 # [B, T_obs]
    t_ind_ev, i_ev = np.nonzero(present.T)              # t-major, i asc
    X = list(combined_vals[i_ev, t_ind_ev])
    M = list(combined_mask[i_ev, t_ind_ev])
    obs_idx = list(i_ev)
    counts = np.bincount(t_ind_ev, minlength=len(times))
    time_ptr = list(np.concatenate([[0], np.cumsum(counts)]).astype(int))
    counter = int(time_ptr[-1])
    out_times = list(times)

    if data_type == "test" and eval_input_prob:
        # re-inject held-out points as inputs with given probability
        # (physionet_LODE.py:513-529); scoring still uses pre-jump values.
        # Conscious fix vs the reference: it appends a time_ptr entry for
        # EVERY held-out time, emitting a time when none was selected and
        # tripping its own `len(times)+1 == len(time_ptr)` assert; here the
        # pointer advances only when at least one point was selected.
        rs = np.random.RandomState(eval_input_seed)
        for t_ind, t in enumerate(times_val):
            first = True
            for i in range(B):
                if mask_val[i, t_ind].sum() > 0 and rs.rand() < eval_input_prob:
                    counter += 1
                    X.append(vals_val[i, t_ind])
                    M.append(mask_val[i, t_ind])
                    obs_idx.append(i)
                    if first:
                        out_times.append(t)
                        first = False
            if not first:
                time_ptr.append(counter)

    return {
        "times": np.asarray(out_times, np.float64),
        "time_ptr": np.asarray(time_ptr, np.int64),
        "X": (np.asarray(X, np.float32).reshape(len(X), D)
              if X else np.zeros((0, D), np.float32)),
        "M": (np.asarray(M, np.float32).reshape(len(M), D)
              if M else np.zeros((0, D), np.float32)),
        "obs_idx": np.asarray(obs_idx, np.int64),
        "batch_size": B,
        "times_val": times_val,
        "vals_val": vals_val,
        "mask_val": mask_val,
    }


def parse_datasets(root: str, n_samples: int = 8000,
                   quantization: float = 0.016, download: bool = False,
                   records: Optional[List[Tuple]] = None):
    """Combine set-a + set-b and split 80/20
    (``parse_datasets_LODE.py:131-186``).

    :param records: optional pre-built record list (e.g. from
        :func:`make_synthetic_records`) bypassing the download path.
    :return: dict with train_records, test_records, input_dim,
        data_min, data_max
    """
    if records is None:
        a = PhysioNetData(root, train=True, quantization=quantization,
                          download=download, n_samples=min(10_000, n_samples))
        b = PhysioNetData(root, train=False, quantization=quantization,
                          download=download, n_samples=min(10_000, n_samples))
        records = list(a.records) + list(b.records)
    from sklearn import model_selection
    train_r, test_r = model_selection.train_test_split(
        records, train_size=0.8, random_state=42, shuffle=True)
    data_min, data_max = get_data_min_max(records)
    return {
        "train_records": train_r,
        "test_records": test_r,
        "input_dim": records[0][2].shape[1],
        "data_min": data_min,
        "data_max": data_max,
    }


def compute_masked_likelihood_mse(mu, data, mask):
    """latent-ODE ``compute_masked_likelihood(..., mse)`` then global mean
    (``likelihood_eval_LODE.py:171-236``, call site
    ``physionet_train.py:459-466``): per (patient, dim) mean squared error
    over that patient's masked points (0 when none), averaged over dims then
    patients."""
    B, T, D = data.shape
    per = np.zeros((B, D))
    for i in range(B):
        for j in range(D):
            sel = mask[i, :, j] > 0
            if sel.any():
                per[i, j] = np.mean((mu[i, sel, j] - data[i, sel, j]) ** 2)
    return float(per.mean())


def max_batch_events(records, batch_size: int) -> int:
    """Static event-count bound for any ``batch_size``-record batch: at most
    one event per (record, record-time)."""
    lens = np.sort([len(r[1]) for r in records])[::-1]
    return int(lens[:batch_size].sum())


def max_union_grid_steps(records, delta_t: float, T: float) -> int:
    """Static scan length covering any batch of these records: all times are
    multiples of ``quantization/48`` = ``delta_t``, but float rounding can
    push them off-grid, so use the safe bound (see
    ``climate.ClimateDataset.max_grid_steps``)."""
    times = np.unique(np.concatenate([r[1] for r in records])) / 48.0
    times = times[times <= T + 1e-10]
    frac = times / delta_t
    # +1: a t=0 observation time adds a leading dt=0 jump step;
    # +4: float drift in the step accumulator can insert a rare fractional
    # step even for aligned times (same slack as ClimateDataset)
    n_grid = int(np.ceil(T / delta_t - 1e-9)) + 1
    if np.all(np.abs(frac - np.round(frac)) <= 1e-6):
        return n_grid + 4
    return n_grid + len(times) + 5


def prestack_train_records(records, data_min, data_max, delta_t, T,
                           max_steps):
    """ONE-TIME device-ready pre-stack of the training records — the
    round-3 fix for the PhysioNet host-collation gap (the reference, and
    round 2 here, re-collated every batch every epoch even though the
    dataset is static and only the permutation changes —
    ``physionet_train.py:325-353``, results/RESULTS.md).

    Per record: keep the rows with any observed coordinate, normalize them
    (same formula as :func:`collate_records`'s train path), and map each
    row's time to its step on a CANONICAL grid — the union grid of ALL
    record times plus t=0 (the leading dt=0 jump step is a no-op for rows
    without a t=0 observation). Batches are then built fully ON DEVICE by
    a gather + scatter (``training/steps.make_prestacked_step_fns``),
    removing the per-epoch host collation and event-stack transfer
    entirely.

    Documented deviation from the per-batch-grid path: AFTER a batch's
    last observation, the canonical grid still lands exactly on the other
    records' later observation times, while a per-batch grid steps plainly
    toward T — tail step boundaries can differ by up to one ``delta_t``
    (measured: 1 batch in 128 at the 8000-record scale; observation steps
    and events are identical, d_obs == 0). Both are valid clipped-Euler
    discretizations of the same flow (step sizes <= delta_t, exact landing
    on every observation); training trajectories can diverge chaotically
    from that batch without bias. Exact per-batch equality holds whenever
    the batch union grid equals the canonical one (pinned in
    tests/test_physionet.py).

    :return: dict with 'times'/'dt' [K] float32, 'k' [N, Emax] int32 (grid
        step per event, K = padding sentinel), 'X'/'M' [N, Emax, D]
        float32, 'n_ev' [N] — or None when the record times are NOT
        grid-aligned (an off-grid time inserts a record-dependent
        fractional step; callers must fall back to per-batch collation).
    """
    from njode_tpu.data.grid import build_union_grid

    all_tt = np.unique(np.concatenate([[0.0]]
                                      + [r[1] for r in records])) / 48.0
    frac = all_tt / delta_t
    if not np.all(np.abs(frac - np.round(frac)) <= 1e-6):
        return None
    g_times, g_dts, obs_step = build_union_grid(all_tt, delta_t, T,
                                                max_steps)
    K = len(g_times)
    D = records[0][2].shape[1]
    n_ev = np.array([int((r[3].sum(-1) > 0).sum()) for r in records])
    Emax = int(n_ev.max())
    N = len(records)
    k_all = np.full((N, Emax), K, np.int32)
    X_all = np.zeros((N, Emax, D), np.float32)
    M_all = np.zeros((N, Emax, D), np.float32)
    for i, (_, tt, vals, mask) in enumerate(
            (r[0], r[1], r[2], r[3]) for r in records):
        keep = mask.sum(-1) > 0
        tt_n = np.asarray(tt)[keep] / 48.0
        pos = np.searchsorted(all_tt, tt_n)
        steps = obs_step[pos]
        live = steps >= 0                 # beyond-T events -> stay sentinel
        e = int(keep.sum())
        k_all[i, :e] = np.where(live, steps, K)
        X_all[i, :e] = normalize_masked_data(vals[keep], mask[keep],
                                             data_min, data_max)
        M_all[i, :e] = mask[keep]
    return {"times": g_times.astype(np.float32),
            "dt": g_dts.astype(np.float32), "k": k_all, "X": X_all,
            "M": M_all, "n_ev": n_ev}
