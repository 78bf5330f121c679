"""Checkpoint save/load via orbax.

Reference: unicorn/utils/checkpoint.py:11-60 + trainer save/resume
(trainer.py:466-543): latest/best checkpoints, resume restoring
model+optimizer+epoch, shape-mismatch-tolerant partial loading for
cross-stage weight surgery.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


_async_ckptr = None


def save_checkpoint(ckpt_dir: str, state: dict, name: str = "latest",
                    blocking: bool = True):
    """state: a pytree dict (e.g. {'params':..., 'opt_state':..., 'epoch': n}).
    Writes <ckpt_dir>/<name>.

    blocking=False hands the (already host-copied) tree to an async orbax
    checkpointer so training continues while the write happens; call
    wait_for_checkpoints() (or issue the next save, which serializes on the
    previous one) before reading the files."""
    global _async_ckptr
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    state = jax.tree_util.tree_map(np.asarray, state)
    if blocking:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()
        return
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    _async_ckptr.save(path, args=ocp.args.StandardSave(state), force=True)


def wait_for_checkpoints():
    """Block until every non-blocking save_checkpoint has committed."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def load_checkpoint(ckpt_dir: str, name: str = "latest",
                    target: Optional[Any] = None) -> dict:
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    if not os.path.exists(path):
        # allow passing a direct path
        if os.path.exists(ckpt_dir) and name == "latest" and \
                os.path.exists(os.path.join(ckpt_dir, "_CHECKPOINT_METADATA")):
            path = os.path.abspath(ckpt_dir)
        else:
            raise FileNotFoundError(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(path, target)
    return ckptr.restore(path)


def load_matching(params, loaded, verbose: bool = True):
    """Copy leaves from `loaded` into `params` where paths exist and shapes
    match — the reference's shape-mismatch-tolerant loader
    (utils/checkpoint.py:11-33)."""
    flat_p = _flatten(params)
    flat_l = _flatten(loaded)
    n_ok, skipped = 0, []
    for k, v in flat_l.items():
        if k in flat_p and tuple(np.shape(v)) == tuple(np.shape(flat_p[k])):
            flat_p[k] = v
            n_ok += 1
        else:
            skipped.append("/".join(map(str, k)))
    if verbose and skipped:
        print(f"load_matching: copied {n_ok}, skipped {len(skipped)} keys "
              f"(first: {skipped[:5]})")
    return _unflatten(flat_p)


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat):
    out = {}
    for k, v in flat.items():
        d = out
        for p in k[:-1]:
            d = d.setdefault(p, {})
        d[k[-1]] = v
    return out
