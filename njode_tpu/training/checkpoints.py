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
    # a slot holds ONE backend: evict a stale orbax save so the loader's
    # backend dispatch cannot pair old weights with fresh metadata
    orbax_dir = os.path.join(path, ORBAX_DIR)
    if os.path.isdir(orbax_dir):
        import shutil
        shutil.rmtree(orbax_dir)
    state = {"params": params, "opt_state": opt_state}
    with open(os.path.join(path, CKPT_FILE), "wb") as f:
        f.write(serialization.to_bytes(state))
    with open(os.path.join(path, META_FILE), "w") as f:
        json.dump({"epoch": int(epoch), "weight": float(weight)}, f)


def load_checkpoint(path, params_like, opt_state_like):
    """Restore into the given pytree structures; returns
    (params, opt_state, epoch, weight). Reads the orbax layout when
    present, else the msgpack layout (slots hold exactly one backend —
    each saver evicts the other's files)."""
    wait_for_async_saves()
    if os.path.isdir(os.path.join(path, ORBAX_DIR)):
        return load_checkpoint_orbax(path, params_like, opt_state_like)
    ckpt = os.path.join(path, CKPT_FILE)
    if not os.path.exists(ckpt):
        raise FileNotFoundError(f"Checkpoint {ckpt} does not exist.")
    with open(ckpt, "rb") as f:
        state = serialization.from_bytes(
            {"params": params_like, "opt_state": opt_state_like}, f.read())
    with open(os.path.join(path, META_FILE), "r") as f:
        meta = json.load(f)
    return state["params"], state["opt_state"], meta["epoch"], meta["weight"]


# ---------------------------------------------------------------------------
# Orbax backend (optional): async-capable, multi-host-aware checkpointing
# (SURVEY §5 checkpoint/resume: "same id-keyed resume semantics on top of
# async Orbax checkpointing")
# ---------------------------------------------------------------------------

ORBAX_DIR = "orbax"
_async_ckptr = None


def _orbax():
    import orbax.checkpoint as ocp
    return ocp


def save_checkpoint_orbax(path, params, opt_state, epoch, weight,
                          async_save: bool = False):
    """Save in orbax format; with ``async_save`` the device-to-host copy
    happens immediately and the disk write proceeds in the background
    (call :func:`wait_for_async_saves` before reading it back)."""
    global _async_ckptr
    ocp = _orbax()
    makedirs(path)
    mp = os.path.join(path, CKPT_FILE)
    if os.path.exists(mp):
        os.remove(mp)
    target = os.path.abspath(os.path.join(path, ORBAX_DIR))
    state = {"params": params, "opt_state": opt_state}
    if async_save:
        if _async_ckptr is None:
            _async_ckptr = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler())
        _async_ckptr.save(target, args=_orbax().args.StandardSave(state),
                          force=True)
    else:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(target, state, force=True)
    with open(os.path.join(path, META_FILE), "w") as f:
        json.dump({"epoch": int(epoch), "weight": float(weight)}, f)


def wait_for_async_saves():
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def load_checkpoint_orbax(path, params_like, opt_state_like):
    ocp = _orbax()
    wait_for_async_saves()
    target = os.path.abspath(os.path.join(path, ORBAX_DIR))
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(
            target, {"params": params_like, "opt_state": opt_state_like})
    with open(os.path.join(path, META_FILE), "r") as f:
        meta = json.load(f)
    return state["params"], state["opt_state"], meta["epoch"], meta["weight"]
