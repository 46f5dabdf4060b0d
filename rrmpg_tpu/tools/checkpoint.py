"""Checkpoint / resume for long-running calibrations and ensembles.

The reference has no persistence at all -- interrupted fits restart from
scratch (SURVEY.md section 5).  Here any pytree of arrays (DE population +
PRNG key + generation counter, Monte-Carlo best-so-far, model parameter
dicts) round-trips through a single ``.npz`` file with atomic replacement,
so pod-scale runs survive preemption.
"""

import os
import tempfile

import numpy as np

_META_PREFIX = "__meta__"


def save_checkpoint(path, state, metadata=None):
    """Atomically write a flat dict of arrays (+ scalar metadata) to disk.

    Args:
        path: target filename (conventionally ``*.npz``).
        state: dict mapping names to arrays / array-likes (device arrays
            are fetched to host).
        metadata: (optional) dict of small scalars/strings stored alongside.
    """
    payload = {k: np.asarray(v) for k, v in state.items()}
    for k, v in (metadata or {}).items():
        payload[_META_PREFIX + k] = np.asarray(v)

    directory = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path):
    """Load a checkpoint written by :func:`save_checkpoint`.

    Returns:
        dict of arrays; metadata entries are returned under a
        ``'metadata'`` sub-dict.
    """
    with np.load(path, allow_pickle=False) as data:
        state = {}
        metadata = {}
        for k in data.files:
            if k.startswith(_META_PREFIX):
                metadata[k[len(_META_PREFIX):]] = data[k][()]
            else:
                state[k] = data[k]
    if metadata:
        state['metadata'] = metadata
    return state


def save_checkpoint_orbax(path, state):
    """Write a pytree checkpoint with Orbax (multi-host / pod runs).

    The ``.npz`` functions above are single-host; Orbax coordinates a
    distributed save in which every process writes its shards of sharded
    arrays and a single process commits atomically -- the right backend
    once calibrations span hosts.  The npz path remains the default for
    single-host runs (no extra dependency surface).

    Args:
        path: target checkpoint directory (created/overwritten).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def load_checkpoint_orbax(path, abstract_state=None):
    """Load an Orbax checkpoint written by :func:`save_checkpoint_orbax`.

    Args:
        abstract_state: (optional) pytree of ``jax.ShapeDtypeStruct`` (or
            arrays) with sharding annotations; when given, arrays restore
            directly into those shardings (each host reads only its
            shards).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if abstract_state is not None:
            return ckptr.restore(path, abstract_state)
        return ckptr.restore(path)
