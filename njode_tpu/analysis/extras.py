"""Analysis & reporting layer.

Capability parity with ``/root/reference/NJODE/extras.py``:
- :func:`plot_loss_diff` / :func:`plot_losses` (``extras.py:40-99``):
  (relative) eval-minus-optimal loss curves,
- :func:`generate_training_progress_gif` (``:102-127``): epoch plots -> GIF,
- :func:`plot_convergence_study` (``:130-231``): errorbar plot of min
  ``evaluation_mean_diff`` vs training_size/network_size,
- :func:`get_training_overview` (``:234-347``): join the model registry with
  each run's metric CSV, extracting description params (special keys
  ``network_size`` = first enc-layer width, ``activation_function_x``) and
  min/max/last/average aggregates with optional early stopping,
- :func:`plot_paths_from_checkpoint` (``:350-390``): re-enter the trainer in
  plot-only mode on best/last checkpoints,
- :func:`plot_loss_and_metric` (``:393-442``): stacked metric subplots,
- :func:`get_cross_validation` (``:445-536``): mean/std of target columns
  over models matching given param combinations.

The reference's hard telegram import (``extras.py:18``) is consciously fixed
with the print-fallback stub (utils/notifications.py).
"""

from __future__ import annotations

import json
import os

import numpy as np

from njode_tpu.utils import paths as path_cfg
from njode_tpu.utils.notifications import SBM, SEND  # noqa: F401
from njode_tpu.utils.paths import makedirs


def plot_loss_diff(path, filename, losses, xlab="epoch",
                   ylab=r"$[\Psi(Y) - \Psi(\hat{X})]/\Psi(\hat{X})$",
                   save_extras=None, fig_size=None):
    """Plot loss-difference curves; ``losses`` is a list of
    ``(epochs, loss_diff, legend_name)`` (``extras.py:40-69``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    save_extras = save_extras or {}
    plt.figure(figsize=fig_size) if fig_size else plt.figure()
    for t, loss_diff, name in losses:
        plt.plot(t, loss_diff, label=name)
    plt.legend()
    if xlab:
        plt.xlabel(xlab)
    if ylab:
        plt.ylabel(ylab)
    makedirs(path)
    out = os.path.join(path, filename)
    plt.savefig(out, **save_extras)
    plt.close()
    return out


def plot_losses(files, names, time_col="epoch", col1="eval_loss",
                col2="optimal_eval_loss", relative_error=True,
                filename="plot.pdf", path="./", save_extras=None, **kwargs):
    """(Relative) eval-loss minus optimal-loss curves from metric CSVs
    (``extras.py:72-99``)."""
    import pandas as pd
    save_extras = save_extras or {"bbox_inches": "tight", "pad_inches": 0.01}
    losses = []
    for file, name in zip(files, names):
        df = pd.read_csv(file, index_col=0)
        t = df[time_col].values
        loss = df[col1].values - df[col2].values
        if relative_error:
            loss = loss / df[col2].values
        losses.append([t, loss, name])
    return plot_loss_diff(path, filename, losses, save_extras=save_extras,
                          **kwargs)


def generate_training_progress_gif(model_id, which_path=1,
                                   saved_models_path=None, duration=0.5):
    """Collect the per-epoch path plots of a model into an animated GIF
    (``extras.py:102-127``).

    Reads ``epoch-<e>_path-<p>.png`` from the model's plots dir directly;
    ``.pdf`` plots are converted when pdf2image is importable (gated — it
    needs poppler, absent here; pass ``save_extras={'format': 'png'}`` /
    a ``.png`` filename template to the trainer to produce pngs natively).
    """
    import imageio.v2 as imageio
    base = saved_models_path or path_cfg.saved_models_path
    plot_dir = os.path.join(base, f"id-{model_id}", "plots")
    suffix = f"path-{which_path}"
    pngs = [f for f in sorted(os.listdir(plot_dir))
            if f"{suffix}.png" in f and "epoch-" in f]
    if not pngs:
        pdfs = [f for f in sorted(os.listdir(plot_dir))
                if f"{suffix}.pdf" in f and "epoch-" in f]
        if not pdfs:
            raise FileNotFoundError(
                f"no epoch-*_{suffix}.png/pdf plots in {plot_dir}")
        try:
            import pdf2image
        except ImportError as e:
            raise RuntimeError(
                "only pdf plots found but pdf2image/poppler is unavailable; "
                "re-run training with a .png plot filename template") from e
        for f in pdfs:
            im = pdf2image.convert_from_path(os.path.join(plot_dir, f), 100)
            out = os.path.join(plot_dir, f[:-3] + "png")
            for i in im:
                i.save(out, "PNG")
            pngs.append(f[:-3] + "png")
    pngs = sorted(pngs,
                  key=lambda s: int(s.split("epoch-")[1].split("_")[0]))
    images = [imageio.imread(os.path.join(plot_dir, f)) for f in pngs]
    # tight bounding boxes vary by a few pixels per frame: pad to a common
    # canvas (white) so the GIF writer can stack them
    h = max(im.shape[0] for im in images)
    w = max(im.shape[1] for im in images)
    padded = []
    for im in images:
        canvas = np.full((h, w) + im.shape[2:], 255, dtype=im.dtype)
        canvas[:im.shape[0], :im.shape[1]] = im
        padded.append(canvas)
    out = os.path.join(plot_dir, f"training-progress-path-{which_path}.gif")
    imageio.mimsave(out, padded, duration=duration)
    return out


def get_training_overview(
        path=None, ids_from=None, ids_to=None,
        params_extract_desc=("network_size", "training_size", "dataset",
                             "hidden_size"),
        val_test_params_extract=(
            ("max", "epoch", "epoch", "epochs_trained"),
            ("min", "evaluation_mean_diff", "evaluation_mean_diff",
             "eval_metric_min"),
            ("last", "evaluation_mean_diff", "evaluation_mean_diff",
             "eval_metric_last"),
            ("average", "evaluation_mean_diff", "evaluation_mean_diff",
             "eval_metric_average")),
        early_stop_after_epoch=0,
        save_file=None):
    """Join ``model_overview.csv`` with per-run metric CSVs
    (``extras.py:234-347``). See the reference docstring for the extract
    mini-language. Conscious fixes vs the reference (SURVEY §7 "document
    either way"): a missing metric COLUMN is reported with a warning naming
    the run and column (the reference swallows it blind,
    ``extras.py:320-344``), and unexpected exceptions propagate instead of
    being silently dropped; missing description params still yield ``None``
    cells (that part of the mini-language is a lookup, not an error)."""
    import pandas as pd
    path = path or path_cfg.saved_models_path
    df = pd.read_csv(os.path.join(path, "model_overview.csv"), index_col=0)
    if ids_from:
        df = df.loc[df["id"] >= ids_from]
    if ids_to:
        df = df.loc[df["id"] <= ids_to]

    for param in params_extract_desc:
        df[param] = None
    if val_test_params_extract:
        for l in val_test_params_extract:
            df[l[3]] = None

    for i in df.index:
        param_dict = json.loads(df.loc[i, "description"])
        values = []
        for param in params_extract_desc:
            try:
                if param == "network_size":
                    v = param_dict["enc_nn"][0][0]
                elif "activation_function" in param:
                    numb = int(param.split("_")[-1])
                    v = param_dict["enc_nn"][numb - 1][1]
                elif param in param_dict:
                    v = param_dict[param]
                else:
                    # solo-trained models nest extra kwargs under 'options'
                    # (sweep-registered descs are flat) — conscious extension
                    v = param_dict["options"][param]
                values.append(v)
            except (KeyError, IndexError, TypeError):
                # absent param in this run's description -> empty cell
                values.append(None)
        df.loc[i, list(params_extract_desc)] = values

        mid = df.loc[i, "id"]
        metric_file = os.path.join(path, f"id-{mid}", f"metric_id-{mid}.csv")
        df_metric = pd.read_csv(metric_file, index_col=0)
        if early_stop_after_epoch:
            df_metric = df_metric.loc[
                df_metric["epoch"] > early_stop_after_epoch]
        if val_test_params_extract:
            for l in val_test_params_extract:
                try:
                    if l[0] in ("min", "max"):
                        f = np.nanmin if l[0] == "min" else np.nanmax
                        ind = (df_metric.loc[df_metric[l[1]] ==
                                             f(df_metric[l[1]])]).index[0]
                        df.loc[i, l[3]] = df_metric.loc[ind, l[2]]
                    elif l[0] == "last":
                        df.loc[i, l[3]] = df_metric[l[1]].values[-1]
                    elif l[0] == "average":
                        df.loc[i, l[3]] = np.nanmean(df_metric[l[1]])
                except KeyError:
                    # the run never logged this column (e.g. trained
                    # without evaluate=True) — leave the cell empty but
                    # SAY so; the reference hides file corruption here
                    import warnings
                    warnings.warn(
                        f"model id-{mid}: metric column '{l[1]}'/'{l[2]}' "
                        f"not in {metric_file} -> '{l[3]}' left empty",
                        UserWarning, stacklevel=2)
                except IndexError:
                    import warnings
                    warnings.warn(
                        f"model id-{mid}: metric file {metric_file} has no "
                        f"rows (after early-stop filter) -> '{l[3]}' left "
                        "empty", UserWarning, stacklevel=2)

    if save_file is not False:
        if save_file is None:
            save_file = os.path.join(
                path, "model_overview-training_results.csv")
        df.to_csv(save_file)
    return df


def plot_convergence_study(path=None, ids_from=None, ids_to=None,
                           x_axis="training_size", x_log=False, y_log=False,
                           save_path=None, save_extras=None):
    """Errorbar plot of min ``evaluation_mean_diff`` over repeats vs
    training_size / network_size (``extras.py:130-231``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd
    path = path or path_cfg.saved_models_path
    save_path = save_path or os.path.join(path_cfg.data_path, "plots")
    save_extras = save_extras or {"bbox_inches": "tight", "pad_inches": 0.01}
    colors = plt.rcParams["axes.prop_cycle"].by_key()["color"]

    df = pd.read_csv(os.path.join(path, "model_overview.csv"), index_col=0)
    if ids_from:
        df = df.loc[df["id"] >= ids_from]
    if ids_to:
        df = df.loc[df["id"] <= ids_to]
    df["network_size"] = None
    df["training_size"] = None
    for i in df.index:
        pd_ = json.loads(df.loc[i, "description"])
        tsize = pd_.get("training_size",
                        pd_.get("options", {}).get("training_size"))
        df.loc[i, ["network_size", "training_size"]] = [
            pd_["enc_nn"][0][0], tsize]

    n_sizes = sorted(set(df["network_size"].values))
    t_sizes = sorted(set(df["training_size"].values))
    if x_axis == "training_size":
        x_axis_params, other_param_name, other_params = \
            t_sizes, "network_size", n_sizes
    else:
        x_axis = "network_size"
        x_axis_params, other_param_name, other_params = \
            n_sizes, "training_size", t_sizes

    means, stds = [], []
    for val2 in other_params:
        _m, _s = [], []
        for val1 in x_axis_params:
            losses = []
            ids = df.loc[(df[x_axis] == val1)
                         & (df[other_param_name] == val2), "id"]
            for mid in ids:
                metric_file = os.path.join(
                    path, f"id-{mid}", f"metric_id-{mid}.csv")
                dfm = pd.read_csv(metric_file, index_col=0)
                if "evaluation_mean_diff" not in dfm.columns:
                    # conscious fix: the reference KeyErrors opaquely here
                    raise ValueError(
                        f"model id-{mid} has no 'evaluation_mean_diff' "
                        f"column in {metric_file} — it was trained without "
                        "evaluate=True and cannot enter a convergence "
                        "study (available columns: "
                        f"{list(dfm.columns)})")
                losses.append(np.min(dfm["evaluation_mean_diff"]))
            # a (val1, val2) cell with no matching runs plots as a gap
            _m.append(np.mean(losses) if losses else np.nan)
            _s.append(np.std(losses) if losses else np.nan)
        means.append(_m)
        stds.append(_s)

    f = plt.figure()
    ax = f.add_subplot(1, 1, 1)
    for i, (mean, std, val2) in enumerate(zip(means, stds, other_params)):
        ax.errorbar(x_axis_params, mean, yerr=std,
                    label=f"{other_param_name}={val2}", ecolor="black",
                    capsize=4, capthick=1, marker=".",
                    color=colors[i % len(colors)])
    plt.xlabel(x_axis)
    plt.ylabel("eval metric")
    plt.legend()
    if x_log:
        ax.set_xscale("log")
    if y_log:
        ax.set_yscale("log")
    makedirs(save_path)
    save_file = os.path.join(save_path, f"convergence_{x_axis}.png")
    plt.savefig(save_file, **save_extras)
    plt.close()
    return save_file


def plot_paths_from_checkpoint(model_ids=(1,), which="best",
                               paths_to_plot=(0,), saved_models_path=None,
                               **options):
    """Re-enter the trainer in plot-only mode on saved checkpoints
    (``extras.py:350-390``)."""
    import pandas as pd
    from njode_tpu.training import trainer
    base = saved_models_path or path_cfg.saved_models_path
    overview = os.path.join(base, "model_overview.csv")
    if not os.path.exists(overview):
        print("No saved model_overview.csv file")
        return 1
    df = pd.read_csv(overview, index_col=0)
    for model_id in model_ids:
        if model_id not in df["id"].values:
            print(f"model_id={model_id} does not exist yet -> skip")
            continue
        desc = (df["description"].loc[df["id"] == model_id]).values[0]
        params_dict = json.loads(desc)
        # the solo-train registry stores the trainer's nested params_dict;
        # flatten it back into call kwargs (options dict -> **options)
        opts = params_dict.pop("options", {})
        params_dict.update(opts)
        params_dict.pop("optimal_eval_loss", None)
        params_dict["model_id"] = model_id
        params_dict["resume_training"] = True
        params_dict["plot_only"] = True
        params_dict["paths_to_plot"] = paths_to_plot
        params_dict["parallel"] = True
        params_dict["saved_models_path"] = base
        params_dict.update(options)
        if which in ("best", "both"):
            params_dict["load_best"] = True
            trainer.train(**params_dict)
        if which in ("last", "both"):
            params_dict["load_best"] = False
            trainer.train(**params_dict)
    return 0


def plot_loss_and_metric(model_ids=(1,), save_extras=None,
                         file_name="loss_and_metric-id{}.pdf",
                         time_col="epoch",
                         cols=("train_loss", "eval_loss",
                               "evaluation_mean_diff"),
                         names=("train_loss", "eval_loss", "eval_metric"),
                         saved_models_path=None):
    """Stacked subplots of metric columns per model (``extras.py:393-442``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd
    base = saved_models_path or path_cfg.saved_models_path
    save_extras = save_extras or {"bbox_inches": "tight", "pad_inches": 0.01}
    colors = plt.rcParams["axes.prop_cycle"].by_key()["color"]
    names = names or cols
    outs = []
    for model_id in model_ids:
        df = pd.read_csv(os.path.join(base, f"id-{model_id}",
                                      f"metric_id-{model_id}.csv"))
        t = df[time_col]
        fig, axes = plt.subplots(len(cols))
        for i, col in enumerate(cols):
            axes[i].plot(t, df[col].values, color=colors[i % len(colors)])
            axes[i].set(ylabel=names[i])
        axes[-1].set(xlabel=time_col)
        out = os.path.join(base, f"id-{model_id}",
                           file_name.format(model_id))
        plt.savefig(out, **save_extras)
        plt.close(fig)
        outs.append(out)
    return outs


def get_climate_cross_validation(early_stop_after_epoch=0, path=None,
                                 save_path=None):
    """Climate 5-fold CV with the reference's default parameter
    combinations (``extras.py:445-487``, README.md:207-211)."""
    combos = (
        {"network_size": 50, "activation_function_1": "tanh",
         "dropout_rate": 0.1, "hidden_size": 10, "dataset": "climate"},
        {"network_size": 200, "activation_function_1": "tanh",
         "dropout_rate": 0.1, "hidden_size": 10, "dataset": "climate"},
        {"network_size": 400, "activation_function_1": "tanh",
         "dropout_rate": 0.1, "hidden_size": 50, "dataset": "climate"},
        {"network_size": 50, "activation_function_1": "relu",
         "dropout_rate": 0.2, "hidden_size": 50, "dataset": "climate"},
        {"network_size": 100, "activation_function_1": "relu",
         "dropout_rate": 0.2, "hidden_size": 50, "dataset": "climate"},
        {"network_size": 400, "activation_function_1": "relu",
         "dropout_rate": 0.2, "hidden_size": 10, "dataset": "climate"},
    )
    return get_cross_validation(
        early_stop_after_epoch=early_stop_after_epoch,
        param_combinations=combos, path=path, save_path=save_path)


def get_cross_validation(
        params_extract_desc=("dataset", "network_size", "dropout_rate",
                             "hidden_size", "activation_function_1"),
        val_test_params_extract=(
            ("min", "eval_metric", "test_metric",
             "test_metric_evaluation_min"),
            ("min", "eval_metric", "eval_metric", "eval_metric_min")),
        target_col=("eval_metric_min", "test_metric_evaluation_min"),
        early_stop_after_epoch=0,
        param_combinations=(),
        save_path=None, path=None):
    """Mean/std of target columns over models matching each param
    combination (``extras.py:445-536``) — the climate 5-fold CV aggregator."""
    import pandas as pd
    path = path or path_cfg.saved_models_path
    save_path = save_path or os.path.join(path, "cross_val.csv")
    df = get_training_overview(
        path=path, params_extract_desc=params_extract_desc,
        val_test_params_extract=val_test_params_extract,
        early_stop_after_epoch=early_stop_after_epoch, save_file=False)

    data = []
    for pc in param_combinations:
        df_ = df.copy()
        name = json.dumps(pc, sort_keys=True)
        row = [name]
        for key in pc:
            df_ = df_.loc[df_[key] == pc[key]]
        for tc in target_col:
            vals = df_[tc]
            row += [np.mean(vals), np.std(vals)]
        data.append(row)

    columns = ["param_combination"]
    for tc in target_col:
        columns += [f"mean_{tc}", f"std_{tc}"]
    df_out = pd.DataFrame(data=data, columns=columns)
    df_out.to_csv(save_path)
    return df_out
