"""Hyperparameter-sweep orchestration.

Capability parity with ``/root/reference/NJODE/parallel_train.py``:
- :func:`train_switcher` (``:70-90``): dispatch on ``dataset`` —
  synthetic names & ``combined*`` -> the synthetic trainer, ``'climate'`` ->
  the climate trainer, ``'physionet'`` -> the PhysioNet trainer,
- :func:`get_parameter_array` (``:93-102``): cartesian grid expansion,
- :func:`parallel_training` (``:105-238``): id assignment/reuse against
  ``model_overview.csv`` (resume by ``model_ids`` list or ``first_id`` +
  params, with ``overwrite_params`` to e.g. extend epochs), then fan-out with
  crash capture and notification.

TPU-native execution note: the reference fans out with a joblib process pool
(27 CPU jobs). A single TPU chip serializes compute, so the default here is
an in-process sequential loop (``nb_jobs=1``) — each run is itself massively
parallel on the chip. ``nb_jobs>1`` uses joblib (suitable for CPU runs or
one-process-per-host multi-slice fan-out); on one chip it buys nothing.
"""

from __future__ import annotations

import json

import numpy as np

from njode_tpu.training import registry
from njode_tpu.utils.notifications import SBM, SEND
from njode_tpu.utils.paths import makedirs, saved_models_path as \
    default_saved_models_path

DEBUG = False
error_chat_id = None


def train_switcher(**params):
    """Dispatch a run to the right trainer by its 'dataset' param
    (``parallel_train.py:70-90``)."""
    if "dataset" not in params:
        raise KeyError('the "dataset" needs to be specified')
    ds = params["dataset"]
    if ds in ("BlackScholes", "Heston", "OrnsteinUhlenbeck",
              "HestonWOFeller", "sine_BlackScholes", "sine_Heston",
              "sine_OrnsteinUhlenbeck") or "combined" in ds:
        from njode_tpu.training import trainer
        return trainer.train(**params)
    if ds == "climate":
        from njode_tpu.training import climate_trainer
        return climate_trainer.train(**params)
    if ds == "physionet":
        from njode_tpu.training import physionet_trainer
        return physionet_trainer.train(**params)
    raise ValueError(f'the specified "dataset" {ds} is not supported')


def get_parameter_array(param_dict):
    """Cartesian expansion of a dict-of-lists into a list of param dicts
    (``parallel_train.py:93-102``)."""
    from sklearn.model_selection import ParameterGrid
    return list(ParameterGrid(param_dict))


def parallel_training(params=None, model_ids=None, nb_jobs=1, first_id=None,
                      saved_models_path=None, overwrite_params=None,
                      vmap_groups=False, group_mesh=None):
    """Run a sweep, reconciling model ids against the overview registry
    (``parallel_training``, ``parallel_train.py:105-238``).

    - ``params`` + ``first_id``: params[i] gets id ``first_id + i``; ids
      already registered resume with their *saved* description (params[i]
      is ignored except via ``overwrite_params``),
    - ``model_ids``: resume exactly those registered ids,
    - ids are pre-assigned before any fan-out, which is what makes the
      shared registry race-free (SURVEY §5 comm note).
    - ``vmap_groups=True``: partition the sweep into vmap-compatible
      same-architecture groups and train each group as ONE on-chip vmapped
      ensemble (training/group_sweep.py — the TPU-native replacement for
      the reference's 27-process joblib pool); ungroupable or lone runs
      fall back to the sequential path below. PhysioNet repeats (entries
      identical up to seed/repeat_seed) group too: one vmapped ensemble
      over the shared prestacked record bank
      (training/physionet_group.py). Climate cross-validation groups
      across FOLDS (entries identical up to data_index/seed/repeat_seed):
      one ensemble over the shared global series bank
      (training/climate_group.py).
    - ``group_mesh``: optional 1-D ``jax.sharding.Mesh`` — with
      ``vmap_groups``, each group's ENSEMBLE axis is sharded over it
      (E/N members per device, ghost-padded to a mesh multiple; see
      group_sweep._make_group_step_fns). This is the multi-chip form of
      the reference's multi-worker sweep dispatch. An execution-only
      resource: it never enters the registry descriptions, and the
      sequential fallback ignores it (pass ``mesh`` inside a param dict
      to data-parallelize a solo run instead).
    :return: list of per-run return values (0 on success)
    """
    if params is not None and "saved_models_path" in params[0]:
        saved_models_path = params[0]["saved_models_path"]
    saved_models_path = saved_models_path or default_saved_models_path
    makedirs(saved_models_path)
    import pandas as pd
    overview_file = registry.overview_file(saved_models_path)
    df_overview = registry.load_overview(saved_models_path)
    max_id = int(np.max(df_overview["id"].values)) if len(df_overview) else 0

    if model_ids is None and params is None:
        return 0
    # live runtime objects survive the registry JSON round trip below (the
    # trainers exclude them from their own descriptions too): without this
    # a records list / Mesh would come back as its str() form
    _LIVE_KEYS = ("records", "mesh")
    if model_ids is None:
        model_id = (max_id + 1) if first_id is None else first_id
        for i, param in enumerate(params):
            live = {k: param[k] for k in _LIVE_KEYS if k in param}
            if model_id in df_overview["id"].values:
                desc = (df_overview["description"].loc[
                    df_overview["id"] == model_id]).values[0]
                params_dict = json.loads(desc)
                params_dict["resume_training"] = True
                params_dict["model_id"] = model_id
                if overwrite_params:
                    params_dict.update(overwrite_params)
                    desc = json.dumps(params_dict, sort_keys=True,
                                      default=str)
                    df_overview.loc[df_overview["id"] == model_id,
                                    "description"] = desc
                    df_overview.to_csv(overview_file)
                params[i] = params_dict
            else:
                desc = json.dumps(
                    {k: v for k, v in param.items() if k not in _LIVE_KEYS},
                    sort_keys=True, default=str)
                app = pd.DataFrame([[model_id, desc]],
                                   columns=["id", "description"])
                df_overview = pd.concat([df_overview, app],
                                        ignore_index=True)
                df_overview.to_csv(overview_file)
                params_dict = json.loads(desc)
                params_dict["resume_training"] = False
                params_dict["model_id"] = model_id
                params[i] = params_dict
            params[i].update(live)
            model_id += 1
    else:
        params = []
        for model_id in model_ids:
            if model_id not in df_overview["id"].values:
                print(f"model_id={model_id} does not exist yet -> skip")
                continue
            desc = (df_overview["description"].loc[
                df_overview["id"] == model_id]).values[0]
            params_dict = json.loads(desc)
            params_dict["model_id"] = model_id
            params_dict["resume_training"] = True
            if overwrite_params:
                params_dict.update(overwrite_params)
                desc = json.dumps(params_dict, sort_keys=True, default=str)
                df_overview.loc[df_overview["id"] == model_id,
                                "description"] = desc
                df_overview.to_csv(overview_file)
            params.append(params_dict)

    for param in params:
        param["parallel"] = True
        param.setdefault("saved_models_path", saved_models_path)

    if SEND:
        SBM.send_notification(
            text=f"start parallel training - \nparams:\n\n{params}")

    def _solo(p):
        # per-run failure isolation: one bad config (e.g. a kernel
        # compile failure at an unprobed shape) must not zero a
        # multi-hour published-scale block — record the exception as
        # that run's return value and keep sweeping. (Deviation from
        # the reference, whose catch-all returns None for the whole
        # sweep — parallel_train.py:229-238; ours still does that for
        # planning-level errors via the outer except below.) Under
        # DEBUG the exception propagates unchanged.
        if DEBUG:
            return train_switcher(**p)
        try:
            return train_switcher(**p)
        except Exception as e:  # noqa: BLE001
            print(f"run id={p.get('model_id')} failed ({type(e).__name__}: "
                  f"{e}); continuing with the remaining runs", flush=True)
            return e

    def _run_all():
        if vmap_groups:
            from njode_tpu.training import climate_group, group_sweep, \
                physionet_group
            groups, singles = group_sweep.plan_groups(params)
            pads = group_sweep.plan_compile_sharing(params, groups)
            results = [None] * len(params)

            def _grouped_or_solo(idx, run_group):
                # a grouped failure (e.g. the vmapped ensemble exceeding
                # device memory where each member alone fits — measured:
                # 5x climate-400 folds asked 58G of 15.75G HBM) must not
                # abort the sweep: fall back to training that group's
                # members solo, exactly as a non-grouped sweep would
                try:
                    return run_group()
                except Exception as e:  # noqa: BLE001
                    ids = [params[i].get("model_id") for i in idx]
                    print(f"vmap group for ids {ids} failed ({e}); "
                          "falling back to solo training", flush=True)
                    return [_solo(params[i]) for i in idx]

            for gi, g in enumerate(groups):
                res_list = _grouped_or_solo(g, lambda g=g, gi=gi:
                                            group_sweep.train_group(
                                                [params[i] for i in g],
                                                pad_batches_to=pads.get(gi),
                                                mesh=group_mesh))
                for r_i, res in zip(g, res_list):
                    results[r_i] = res
            # PhysioNet repeats among the leftovers vmap-group too (same
            # records/split/test batch; only seed streams differ)
            sing_map = list(singles)
            for planner in (physionet_group, climate_group):
                pgroups, prem = planner.plan_groups(
                    [params[i] for i in sing_map])
                for g in pgroups:
                    real = [sing_map[i] for i in g]
                    res_list = _grouped_or_solo(
                        real, lambda real=real, planner=planner:
                        planner.train_group([params[i] for i in real],
                                            mesh=group_mesh))
                    for r_i, res in zip(real, res_list):
                        results[r_i] = res
                sing_map = [sing_map[i] for i in prem]
            for i in sing_map:
                results[i] = _solo(params[i])
            return results
        if nb_jobs <= 1:
            return [_solo(p) for p in params]
        from joblib import Parallel, delayed
        return Parallel(n_jobs=nb_jobs)(
            delayed(train_switcher)(**p) for p in params)

    if DEBUG:
        results = _run_all()
    else:
        try:
            results = _run_all()
        except Exception as e:
            if SEND:
                SBM.send_notification(
                    text=f"error in parallel training - \nerror:\n\n{e}",
                    chat_id=error_chat_id)
            else:
                print(f"error:\n\n{e}")
            return None
    if SEND:
        SBM.send_notification(
            text=f"finished parallel training - \nparams:\n\n{params}")
    return results
