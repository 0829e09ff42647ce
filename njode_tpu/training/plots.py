"""Path plotting: predicted vs true conditional expectation.

Parity with ``plot_one_path_with_pred`` (``/root/reference/NJODE/train.py:673-796``):
true path, observed points, model prediction, true conditional expectation
(dotted), optional +-std band derived from the 'power-2' moment dims."""

from __future__ import annotations

import os

import numpy as np

from njode_tpu.utils.paths import makedirs


def plot_one_path_with_pred(
        batch_np, pred_t, pred_y, true_t, true_y, true_paths, observed_dates,
        delta_t, T, path_to_plot=(0,), save_path="", filename="plot_{}.pdf",
        plot_variance=False, functions=None, std_factor=1,
        model_name="NJODE", ylabels=None,
        save_extras=None):
    """Render per-path figures; returns the list of files written.

    :param pred_t/pred_y: model prediction grid [L] / [L, B, D_out]
    :param true_t/true_y: oracle cond-exp on the same grid
    :param true_paths: [B, D, T+1] raw paths; observed_dates: [B, T+1]
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.colors
    import matplotlib.pyplot as plt

    if model_name is None or model_name == "NJODE":
        model_name = "our model"
    save_extras = save_extras or {"bbox_inches": "tight", "pad_inches": 0.01}
    prop_cycle = plt.rcParams["axes.prop_cycle"]
    colors = prop_cycle.by_key()["color"]
    std_color = list(matplotlib.colors.to_rgb(colors[1])) + [0.5]
    makedirs(save_path)

    pred_y = np.asarray(pred_y)
    true_y = np.asarray(true_y)
    path_t_true_X = np.linspace(0.0, T, int(np.round(T / delta_t)) + 1)

    # variance band from the power-2 moment dims (``train.py:729-740``)
    path_std_pred = None
    if plot_variance and functions is not None and "power-2" in functions:
        which = int(np.argmax(np.array(functions) == "power-2"))
        dim = true_paths.shape[1]
        y2 = pred_y[:, :, dim * (which + 1):dim * (which + 2)]
        path_var_pred = y2 - np.power(pred_y[:, :, 0:dim], 2)
        if np.any(path_var_pred < 0):
            print("WARNING: some predicted cond. variances below 0 -> clip")
            path_var_pred = np.maximum(0, path_var_pred)
        path_std_pred = np.sqrt(path_var_pred)
    else:
        plot_variance = False

    files = []
    for i in path_to_plot:
        path_t_obs = [0.0]
        path_X_obs = [true_paths[i, :, 0]]
        for j, od in enumerate(observed_dates[i]):
            if od == 1:
                path_t_obs.append(path_t_true_X[j])
                path_X_obs.append(true_paths[i, :, j])
        path_t_obs = np.array(path_t_obs)
        path_X_obs = np.array(path_X_obs)

        dim = true_paths.shape[1]
        fig, axs = plt.subplots(dim)
        if dim == 1:
            axs = [axs]
        for j in range(dim):
            axs[j].plot(path_t_true_X, true_paths[i, j, :], label="true path",
                        color=colors[0])
            axs[j].scatter(path_t_obs, path_X_obs[:, j], label="observed",
                           color=colors[0])
            axs[j].plot(pred_t, pred_y[:, i, j], label=model_name,
                        color=colors[1])
            if plot_variance:
                axs[j].fill_between(
                    pred_t,
                    pred_y[:, i, j] - std_factor * path_std_pred[:, i, j],
                    pred_y[:, i, j] + std_factor * path_std_pred[:, i, j],
                    color=std_color)
            axs[j].plot(true_t, true_y[:, i, j],
                        label="true conditional expectation",
                        linestyle=":", color=colors[2])
            if ylabels:
                axs[j].set_ylabel(ylabels[j])
        plt.legend()
        plt.xlabel("$t$")
        out = os.path.join(save_path, filename.format(i))
        plt.savefig(out, **save_extras)
        plt.close(fig)
        files.append(out)
    return files
