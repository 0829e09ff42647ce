"""Shared machinery of the three vmap-grouped sweep paths
(``group_sweep`` — synthetic, ``physionet_group`` — repeats over the
record bank, ``climate_group`` — CV folds over the series bank): the
planner, param-value normalization, member slicing, and the per-member
trainer-parity artifact surfaces (metric CSV frames + flush)."""

from __future__ import annotations

import os

import jax
import numpy as np

from njode_tpu.utils.paths import makedirs


def plan_groups(params_list, group_key, min_group=2):
    """Partition a sweep into (groups, singles): ``groups`` is a list of
    index lists (each a vmappable group of >= ``min_group`` members
    sharing ``group_key``), ``singles`` the remaining indices in
    ascending order (ungroupable or lone runs -> the sequential path)."""
    buckets = {}
    singles = []
    for i, p in enumerate(params_list):
        k = group_key(p)
        if k is None:
            singles.append(i)
        else:
            buckets.setdefault(k, []).append(i)
    groups = []
    for idxs in buckets.values():
        if len(idxs) >= min_group:
            groups.append(idxs)
        else:
            singles.extend(idxs)
    return groups, sorted(singles)


def norm_val(k, v, nn_keys):
    """Hashable normal form of a param value for group keys (net specs
    to ((width, act), ...) tuples; lists to tuples recursively)."""
    if k in nn_keys:
        return tuple((int(w), str(a)) for w, a in v) if v else v
    if isinstance(v, (list, tuple)):
        return tuple(norm_val(k, x, nn_keys) for x in v)
    return v


def member_slice(tree_host, i):
    """Slice member i out of a HOST (numpy) stacked pytree. Device trees
    must be fetched first with ONE ``jax.device_get`` per save event — a
    per-leaf ``np.asarray(x[i])`` loop costs a full device round trip per
    leaf, which dominated a grouped study over the remote-TPU tunnel
    (287 s of 342 s, profiled — results/RESULTS.md)."""
    return jax.tree.map(lambda x: np.asarray(x[i]), tree_host)


class MemberArtifacts:
    """Per-member trainer-parity artifact surfaces: ``id-<model_id>/``
    dirs with last/best checkpoint slots and a ``metric_id-<id>.csv``
    accumulated through buffered rows + :meth:`flush` (the solo
    trainers' write cadence)."""

    def __init__(self, group_params, saved_models_path, columns):
        import pandas as pd
        self._pd = pd
        self.columns = list(columns)
        self.model_dirs, self.metric_files = [], []
        self.frames, self.rows = [], []
        for p in group_params:
            mdir = os.path.join(saved_models_path, f"id-{p['model_id']}")
            makedirs(os.path.join(mdir, "last_checkpoint"))
            makedirs(os.path.join(mdir, "best_checkpoint"))
            self.model_dirs.append(mdir)
            self.metric_files.append(os.path.join(
                mdir, f"metric_id-{p['model_id']}.csv"))
            self.frames.append(pd.DataFrame(columns=self.columns))
            self.rows.append([])

    def append(self, i, row):
        self.rows[i].append(row)

    def flush(self, i):
        self.frames[i] = self._pd.concat(
            [self.frames[i],
             self._pd.DataFrame(self.rows[i], columns=self.columns)],
            ignore_index=True)
        self.frames[i].to_csv(self.metric_files[i])
        self.rows[i] = []

    def flush_pending(self):
        for i in range(len(self.rows)):
            if self.rows[i]:
                self.flush(i)

    def ckpt_dir(self, i, slot):
        return os.path.join(self.model_dirs[i], slot)
