"""Checkpoint save/load.

The reference checkpoints {model, optimizer, scheduler, best_value} via
torchdistill `save_ckpt`/`load_ckpt` (SURVEY.md §5.4), with buffer-shape
plasticity for the data-dependent CDF tables. Here: flax msgpack for the
variables pytree + pickle for the (shape-plastic, host-numpy) coding tables
— tables are rebuilt from params by `update()` anyway, so storing them is an
optimization, exactly like the reference's `update_before_ckpt` contract.
"""
from __future__ import annotations

import pickle
from pathlib import Path

import flax.serialization
import jax

_TABLES_SUFFIX = '.tables.pkl'
_META_SUFFIX = '.meta.pkl'


def save_ckpt(path, variables, tables=None, meta=None):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(flax.serialization.to_bytes(
        jax.device_get(variables)))
    if tables is not None:
        Path(str(path) + _TABLES_SUFFIX).write_bytes(pickle.dumps(
            {k: t.state_dict() for k, t in tables.items()}
            if isinstance(tables, dict) else tables.state_dict()))
    if meta is not None:
        Path(str(path) + _META_SUFFIX).write_bytes(pickle.dumps(meta))


def load_ckpt(path, variables_template):
    """Restore variables into the template's structure. Returns
    (variables, tables_state_or_None, meta_or_None)."""
    path = Path(path)
    variables = flax.serialization.from_bytes(
        variables_template, path.read_bytes())
    tables = None
    tpath = Path(str(path) + _TABLES_SUFFIX)
    if tpath.exists():
        tables = pickle.loads(tpath.read_bytes())
    meta = None
    mpath = Path(str(path) + _META_SUFFIX)
    if mpath.exists():
        meta = pickle.loads(mpath.read_bytes())
    return variables, tables, meta


_TRAIN_SUFFIX = '.train_state'


def save_train_state(path, train_state, epoch: int, stage: str,
                     best_metric: float):
    """Persist the full box TrainState (params + batch_stats + optimizer
    state) for mid-training resume (reference `--start_epoch` +
    optimizer/scheduler restore, `image_classification.py:159-160`)."""
    path = Path(str(path) + _TRAIN_SUFFIX)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        'state': flax.serialization.to_state_dict(
            jax.device_get(train_state)),
        'epoch': epoch, 'stage': stage, 'best_metric': best_metric,
    }
    path.write_bytes(pickle.dumps(payload))


def load_train_state(path, train_state_template):
    """Returns (train_state, epoch, stage, best_metric) or None."""
    path = Path(str(path) + _TRAIN_SUFFIX)
    if not path.exists():
        return None
    payload = pickle.loads(path.read_bytes())
    state = flax.serialization.from_state_dict(train_state_template,
                                               payload['state'])
    return state, payload['epoch'], payload['stage'], payload['best_metric']


# ---------------------------------------------------------------------------
# Orbax backend (optional): async, multi-host-sharded variable checkpoints.
# The msgpack/pickle path above stays the default (single-host, dependency-
# light); Orbax is the right tool once params are sharded over a mesh —
# each host writes only its shards and restore honors the target sharding
# (SURVEY.md §7 design stance).
# ---------------------------------------------------------------------------

def save_ckpt_orbax(directory, variables, meta=None, async_save=False):
    """Save a variables pytree into `directory` via Orbax StandardSave.
    Writes into a temp sibling and atomically swaps on completion, so an
    interrupted save never destroys the previous checkpoint. `meta` is
    stored as a pickle sidecar (`<directory>.meta.pkl`) — independent of
    the Orbax tree, so restore works with or without it. Returns a handle
    whose `wait_until_finished()` finalizes the swap (a no-op object for
    sync saves)."""
    import shutil

    import orbax.checkpoint as ocp
    directory = Path(directory).absolute()
    if directory.exists() and not directory.is_dir():
        raise ValueError(f'{directory} exists and is not a directory')
    tmp = directory.with_name(directory.name + '.orbax-tmp')
    if tmp.exists():
        shutil.rmtree(tmp)
    ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler()) \
        if async_save else ocp.Checkpointer(ocp.StandardCheckpointHandler())
    ckptr.save(tmp, {'variables': jax.device_get(variables)})
    # The meta sidecar is staged to a tmp name and renamed only after the
    # variables directory swap in wait_until_finished(): writing it eagerly
    # would pair NEW meta (epoch/best_metric) with the OLD variables if the
    # process dies (or the caller never finalizes) before the swap.
    meta_final = Path(str(directory) + _META_SUFFIX)
    meta_tmp = Path(str(directory) + _META_SUFFIX + '.orbax-tmp')
    if meta is not None:
        meta_tmp.write_bytes(pickle.dumps(meta))

    class _Handle:
        def __init__(self, ckptr):
            self._ckptr = ckptr
            self._done = False

        def wait_until_finished(self):
            if self._done:
                return
            if hasattr(self._ckptr, 'wait_until_finished'):
                self._ckptr.wait_until_finished()
            if directory.exists():
                old = directory.with_name(directory.name + '.orbax-old')
                if old.exists():
                    shutil.rmtree(old)
                directory.rename(old)
                tmp.rename(directory)
                shutil.rmtree(old)
            else:
                tmp.rename(directory)
            if meta is not None:
                meta_tmp.rename(meta_final)  # atomic, after variables swap
            self._done = True

    handle = _Handle(ckptr)
    if not async_save:
        handle.wait_until_finished()
    return handle


def load_ckpt_orbax(directory, variables_template):
    """Restore (variables, meta_or_None) saved by `save_ckpt_orbax`.
    Restored arrays adopt the template leaves' shardings when the template
    holds sharded jax.Arrays (multi-host restore)."""
    import orbax.checkpoint as ocp
    directory = Path(directory).absolute()
    ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
    payload = ckptr.restore(
        directory, args=ocp.args.StandardRestore(
            {'variables': variables_template}))
    meta = None
    mpath = Path(str(directory) + _META_SUFFIX)
    if mpath.exists():
        meta = pickle.loads(mpath.read_bytes())
    return payload['variables'], meta
