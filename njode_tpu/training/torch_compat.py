"""Import reference (PyTorch) NJODE checkpoints into this framework.

The reference ships pretrained demo models as ``checkpt.tar`` =
``{epoch, weight, model_state_dict, optimizer_state_dict}``
(``/root/reference/NJODE/models.py:29-45``; files under
``data/saved_models/id-{1,2,3}/last_checkpoint/``). This module converts the
torch ``state_dict`` layout into our parameter pytree so those checkpoints
(and any user-trained reference checkpoints) load directly:

- ``ode_f.f.<i>``        -> params['ode_f'][k]     (``get_ffnn`` Sequential:
  Linear at indices 0, 3, 6, ... — act/dropout between, ``models.py:140-166``)
- ``encoder_map.ffnn.<i>`` -> params['encoder'][k]
- ``readout_map.ffnn.<i>`` -> params['readout'][k]
- ``obs_c.gru_d.*``      -> params['gru']          (``use_rnn`` jump GRU)

Weights are transposed (torch Linear stores ``[out, in]``; we use
``[in, out]``). The Adam state is not mapped — resuming an imported
checkpoint restarts the optimizer moments (epoch and loss-weight are kept).
"""

from __future__ import annotations

import os
import re
from collections import defaultdict

import numpy as np


def load_torch_checkpoint(path):
    """Read a reference ``checkpt.tar`` into numpy.

    :param path: the checkpoint directory or the .tar file itself
    :return: dict with 'epoch', 'weight', 'state' ({name: np.ndarray})
    """
    import torch
    if os.path.isdir(path):
        path = os.path.join(path, "checkpt.tar")
    ck = torch.load(path, map_location="cpu", weights_only=False)
    state = {k: v.detach().numpy() for k, v in
             ck["model_state_dict"].items()}
    return {"epoch": int(ck["epoch"]), "weight": float(ck["weight"]),
            "state": state}


def _collect_linears(state, prefix):
    """Gather ``<prefix>.<idx>.weight/bias`` Linears in index order as our
    layer-list format (weights transposed)."""
    layers = defaultdict(dict)
    pat = re.compile(rf"^{re.escape(prefix)}\.(\d+)\.(weight|bias)$")
    for name, arr in state.items():
        m = pat.match(name)
        if not m:
            continue
        idx, kind = int(m.group(1)), m.group(2)
        if kind == "weight":
            layers[idx]["w"] = np.ascontiguousarray(arr.T).astype(np.float32)
        else:
            layers[idx]["b"] = arr.astype(np.float32)
    return [layers[i] for i in sorted(layers)]


def njode_params_from_torch_state(state, use_rnn: bool = False):
    """Convert a reference NJODE ``state_dict`` into our parameter pytree."""
    params = {
        "ode_f": _collect_linears(state, "ode_f.f"),
        "encoder": _collect_linears(state, "encoder_map.ffnn"),
        "readout": _collect_linears(state, "readout_map.ffnn"),
    }
    for key, layers in params.items():
        if not layers:
            raise ValueError(f"no '{key}' layers found in torch state dict "
                             f"(keys: {sorted(state)[:5]}...)")
    if use_rnn:
        params["gru"] = {
            "w_ih": np.ascontiguousarray(
                state["obs_c.gru_d.weight_ih"].T).astype(np.float32),
            "w_hh": np.ascontiguousarray(
                state["obs_c.gru_d.weight_hh"].T).astype(np.float32),
        }
        if "obs_c.gru_d.bias_ih" in state:
            params["gru"]["b_ih"] = \
                state["obs_c.gru_d.bias_ih"].astype(np.float32)
            params["gru"]["b_hh"] = \
                state["obs_c.gru_d.bias_hh"].astype(np.float32)
    return params


def torch_state_from_njode_params(params):
    """Convert our parameter pytree into a reference ``state_dict``
    (inverse of :func:`njode_params_from_torch_state`): ``get_ffnn`` builds
    ``Linear [act, Dropout, Linear]*`` so Linear indices are 0, 3, 6, ...
    (``models.py:140-166``)."""
    import torch
    state = {}
    prefix = {"ode_f": "ode_f.f", "encoder": "encoder_map.ffnn",
              "readout": "readout_map.ffnn"}
    for name, pfx in prefix.items():
        for j, layer in enumerate(params[name]):
            idx = 3 * j
            state[f"{pfx}.{idx}.weight"] = torch.tensor(
                np.ascontiguousarray(np.asarray(layer["w"]).T))
            if "b" in layer:
                state[f"{pfx}.{idx}.bias"] = torch.tensor(
                    np.asarray(layer["b"]).copy())
    if "gru" in params:
        g = params["gru"]
        state["obs_c.gru_d.weight_ih"] = torch.tensor(
            np.ascontiguousarray(np.asarray(g["w_ih"]).T))
        state["obs_c.gru_d.weight_hh"] = torch.tensor(
            np.ascontiguousarray(np.asarray(g["w_hh"]).T))
        if "b_ih" in g:
            state["obs_c.gru_d.bias_ih"] = torch.tensor(
                np.asarray(g["b_ih"]).copy())
            state["obs_c.gru_d.bias_hh"] = torch.tensor(
                np.asarray(g["b_hh"]).copy())
    return state


def export_torch_checkpoint(params, out_dir, epoch, weight,
                            learning_rate: float = 1e-3):
    """Write a reference-format ``checkpt.tar`` from our parameters so the
    reference codebase can resume/evaluate models trained here
    (``models.save_checkpoint`` layout, ``models.py:29-45``; the optimizer
    state is a fresh torch Adam over the exported tensors)."""
    import torch

    from njode_tpu.utils.paths import makedirs

    state = torch_state_from_njode_params(params)
    opt = torch.optim.Adam([v for v in state.values()], lr=learning_rate,
                           weight_decay=0.0005)
    makedirs(out_dir)
    out = os.path.join(out_dir, "checkpt.tar")
    torch.save({"epoch": int(epoch), "weight": float(weight),
                "model_state_dict": state,
                "optimizer_state_dict": opt.state_dict()}, out)
    return out


def import_torch_checkpoint(torch_ckpt_path, out_dir, optimizer,
                            use_rnn: bool = False):
    """Convert a reference checkpoint directory into our msgpack layout.

    The optimizer state is freshly initialized from the converted params
    (the torch Adam moments are not mapped).
    :return: (params, epoch, weight)
    """
    import jax
    import jax.numpy as jnp

    from njode_tpu.training import checkpoints

    ck = load_torch_checkpoint(torch_ckpt_path)
    params = jax.tree.map(jnp.asarray,
                          njode_params_from_torch_state(ck["state"], use_rnn))
    opt_state = optimizer.init(params)
    checkpoints.save_checkpoint(out_dir, params, opt_state, ck["epoch"],
                                ck["weight"])
    return params, ck["epoch"], ck["weight"]
