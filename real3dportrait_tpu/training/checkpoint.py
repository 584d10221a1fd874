"""Step-indexed checkpointing with milestone retention and partial restore.

Keeps the reference's checkpoint semantics (`utils/commons/trainer.py:511-567`
and `utils/commons/ckpt_utils.py`): ``model_ckpt_steps_<N>.ckpt`` files,
atomic ``.part`` + rename writes, keep-newest-K plus every milestone, a
best-val copy, and cross-model partial restore by dotted module prefix with
shape-mismatch skipping — the mechanism the training curriculum depends on
(img2plane -> secc2plane -> torso init chains).

Serialization is flax msgpack over a host-gathered pytree; works for any
mapping of {params, ema, opt_state, step, ...}.
"""

from __future__ import annotations

import glob
import os
import re

import jax
import numpy as np
from flax import serialization


def _ckpt_path(work_dir: str, step: int) -> str:
    return os.path.join(work_dir, f"model_ckpt_steps_{step}.ckpt")


def get_all_ckpts(work_dir: str) -> list[str]:
    """Newest-first checkpoint list (`ckpt_utils.py:20`)."""
    paths = glob.glob(os.path.join(work_dir, "model_ckpt_steps_*.ckpt"))
    return sorted(paths, key=lambda p: -_step_of(p))


def _step_of(path: str) -> int:
    m = re.search(r"model_ckpt_steps_(\d+)\.ckpt", path)
    return int(m.group(1)) if m else -1


def get_last_checkpoint(work_dir: str) -> tuple[dict | None, str | None]:
    """(state, path) of the newest checkpoint (`ckpt_utils.py:7`)."""
    ckpts = get_all_ckpts(work_dir)
    if not ckpts:
        return None, None
    return load_checkpoint(ckpts[0]), ckpts[0]


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def save_checkpoint(
    work_dir: str,
    step: int,
    state,
    num_keep: int = 3,
    milestone_interval: int = 100000,
    not_save_keys: tuple[str, ...] = (),
) -> str:
    """Atomic save + retention pruning (`trainer.py:511-541`).

    ``not_save_keys``: model names excluded from the checkpoint (frozen
    teachers, perceptual nets — the reference's ``not_save_modules``).
    Matched against top-level keys AND against model names inside
    ``params``/``variables``/``opt_states`` sub-dicts.
    """
    os.makedirs(work_dir, exist_ok=True)
    host_state = jax.device_get(state)
    if not_save_keys and isinstance(host_state, dict):
        drop = set(not_save_keys)
        host_state = {k: v for k, v in host_state.items() if k not in drop}
        for group in ("params", "variables", "opt_states"):
            if isinstance(host_state.get(group), dict):
                host_state[group] = {
                    k: v for k, v in host_state[group].items() if k not in drop
                }
    payload = serialization.msgpack_serialize(host_state)
    path = _ckpt_path(work_dir, step)
    tmp = path + ".part"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)

    # prune: keep num_keep newest plus milestone steps (`trainer.py:517-523`)
    for old in get_all_ckpts(work_dir)[num_keep:]:
        s = _step_of(old)
        if milestone_interval and s % milestone_interval == 0:
            continue
        os.remove(old)
    return path


def save_best(work_dir: str, state, val: float) -> str:
    path = os.path.join(work_dir, "model_ckpt_best.ckpt")
    tmp = path + ".part"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(jax.device_get(state)))
    os.replace(tmp, path)
    return path


# --- partial restore ---------------------------------------------------------


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (str(k),))
    else:
        yield prefix, tree


def _set_path(tree: dict, path: tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def partial_load(target: dict, source: dict, prefix_map: dict[str, str] | None = None,
                 strict_shapes: bool = False, verbose: bool = False) -> tuple[dict, dict]:
    """Copy leaves from ``source`` into ``target`` where dotted paths match.

    ``prefix_map``: optional {source_prefix: target_prefix} renames — the
    equivalent of `ckpt_utils.load_ckpt`'s ``model_name`` prefix selection.
    Shape mismatches are skipped (or raise if ``strict_shapes``). Returns
    (new_target, stats dict).
    """
    import copy

    target = copy.deepcopy(target)
    src_leaves = {".".join(p): v for p, v in _flatten(source)}
    stats = {"loaded": 0, "shape_mismatch": 0, "missing": 0}
    for path, tgt_leaf in list(_flatten(target)):
        dotted = ".".join(path)
        src_key = dotted
        if prefix_map:
            for sp, tp in prefix_map.items():
                if dotted.startswith(tp):
                    src_key = sp + dotted[len(tp):]
                    break
        if src_key not in src_leaves:
            stats["missing"] += 1
            continue
        src_leaf = src_leaves[src_key]
        if np.shape(src_leaf) != np.shape(tgt_leaf):
            if strict_shapes:
                raise ValueError(f"shape mismatch at {dotted}: "
                                 f"{np.shape(src_leaf)} vs {np.shape(tgt_leaf)}")
            stats["shape_mismatch"] += 1
            if verbose:
                print(f"| skip {dotted}: {np.shape(src_leaf)} != {np.shape(tgt_leaf)}")
            continue
        _set_path(target, path, np.asarray(src_leaf))
        stats["loaded"] += 1
    return target, stats
