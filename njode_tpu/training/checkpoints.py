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
    # an in-flight async orbax save to the same slot could recreate the
    # orbax dir after the eviction below — drain it first (mirrors
    # load_checkpoint)
    wait_for_async_saves()
    # a slot holds ONE backend: evict a stale orbax save so the loader's
    # backend dispatch cannot pair old weights with fresh metadata
    orbax_dir = os.path.join(path, ORBAX_DIR)
    if os.path.isdir(orbax_dir):
        import shutil
        shutil.rmtree(orbax_dir)
    # ONE overlapped device->host fetch up front: serialization walks the
    # pytree leaf by leaf, and on a remote-tunnel device each leaf fetch
    # is a full round trip (measured dominant in save-heavy loops)
    import jax
    state = jax.device_get({"params": params, "opt_state": opt_state})
    # atomic writes (tmp + fsync + rename): a kill mid-write must leave the
    # slot's previous checkpoint intact, not a truncated msgpack that makes
    # resume silently re-initialize ("Unpack failed" -> new model). The
    # fsync extends the guarantee to power loss / fs crash, where the
    # rename could otherwise be persisted before the data.
    ckpt_final = os.path.join(path, CKPT_FILE)
    tmp = ckpt_final + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(state))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, ckpt_final)
    meta_final = os.path.join(path, META_FILE)
    tmp = meta_final + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"epoch": int(epoch), "weight": float(weight)}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, meta_final)
    _fsync_dir(path)


def _fsync_dir(path):
    """fsync the directory so the renames themselves are durable."""
    try:
        fd = os.open(path, os.O_RDONLY)
    except OSError:
        return
    try:
        os.fsync(fd)
    except OSError:
        # best-effort durability: some filesystems (network/overlay
        # mounts) reject fsync on a directory fd — the checkpoint files
        # themselves are already fsynced and renamed, so don't fail the
        # save over the weaker rename-durability guarantee
        pass
    finally:
        os.close(fd)


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
_pending_meta = []   # (tmp_path, final_path) renames gated on async saves


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
    meta_final = os.path.join(path, META_FILE)
    if async_save:
        if _async_ckptr is None:
            _async_ckptr = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler())
        _async_ckptr.save(target, args=_orbax().args.StandardSave(state),
                          force=True)
        # the meta file must not pair fresh epoch/weight with an old (or
        # partial) payload if we crash mid-save: stage it under a temp name
        # and rename only once the async write has finished
        meta_tmp = meta_final + ".pending"
        with open(meta_tmp, "w") as f:
            json.dump({"epoch": int(epoch), "weight": float(weight)}, f)
        _pending_meta.append((meta_tmp, meta_final))
    else:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(target, state, force=True)
        with open(meta_final, "w") as f:
            json.dump({"epoch": int(epoch), "weight": float(weight)}, f)


def wait_for_async_saves():
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()
    while _pending_meta:
        tmp, final = _pending_meta.pop(0)
        if os.path.exists(tmp):
            os.replace(tmp, final)


def make_saver(options):
    """Checkpoint-save function selected by the trainer option surface:
    default msgpack; ``options['use_orbax']=True`` switches to the orbax
    backend, ``options['orbax_async']=True`` additionally makes the disk
    write asynchronous (device-to-host copy is immediate; trainers call
    :func:`wait_for_async_saves` before exiting). ``load_checkpoint``
    reads either layout transparently."""
    if options.get("use_orbax"):
        async_save = bool(options.get("orbax_async", False))

        def save(path, params, opt_state, epoch, weight):
            save_checkpoint_orbax(path, params, opt_state, epoch, weight,
                                  async_save=async_save)
        return save
    return save_checkpoint


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
