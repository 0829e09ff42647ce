"""Checkpoint save/restore with the reference's last/best two-slot layout.

Parity with ``models.save_checkpoint``/``get_ckpt_model``
(``/root/reference/NJODE/models.py:29-67``): a checkpoint holds
{epoch, loss-weight, model params, optimizer state} so training resumes at
the exact point, including the loss-weight decay schedule position.

Serialization uses flax msgpack for the array pytrees plus a JSON sidecar
for scalars — a single self-contained directory per slot."""

from __future__ import annotations

import json
import os

from flax import serialization

from njode_tpu.utils.paths import makedirs

CKPT_FILE = "checkpt.msgpack"
META_FILE = "checkpt_meta.json"


def save_checkpoint(path, params, opt_state, epoch, weight):
    makedirs(path)
    state = {"params": params, "opt_state": opt_state}
    with open(os.path.join(path, CKPT_FILE), "wb") as f:
        f.write(serialization.to_bytes(state))
    with open(os.path.join(path, META_FILE), "w") as f:
        json.dump({"epoch": int(epoch), "weight": float(weight)}, f)


def load_checkpoint(path, params_like, opt_state_like):
    """Restore into the given pytree structures; returns
    (params, opt_state, epoch, weight)."""
    ckpt = os.path.join(path, CKPT_FILE)
    if not os.path.exists(ckpt):
        raise FileNotFoundError(f"Checkpoint {ckpt} does not exist.")
    with open(ckpt, "rb") as f:
        state = serialization.from_bytes(
            {"params": params_like, "opt_state": opt_state_like}, f.read())
    with open(os.path.join(path, META_FILE), "r") as f:
        meta = json.load(f)
    return state["params"], state["opt_state"], meta["epoch"], meta["weight"]
