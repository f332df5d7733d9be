"""Checkpoint / resume for filter states, solutions, and PMMH chains.

The reference has no checkpoint subsystem (nothing long-running; see
SURVEY.md §5) — its de-facto resume format is the solution object with the
full per-step history, plus `reset!(f; x0)` to restart a filter.  Here all
states/solutions are pytrees of arrays, so checkpointing is structural:

- :func:`save_pytree` / :func:`load_pytree` — `.npz`-backed, no extra
  dependencies; leaf paths are flattened to names.
- :func:`resume_state` — rebuild a filter state pytree from a saved
  checkpoint (the `reset!(f; x0=...)` analogue for long PMMH chains or
  streaming estimation).

Orbax integration (async, sharded, multi-host) is deliberately a thin
optional path — see :func:`save_pytree`'s ``use_orbax`` flag.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_paths(tree):
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in leaves_with_paths:
        name = "/".join(str(getattr(k, "name", getattr(k, "idx", k))) for k in path)
        out[name or "leaf"] = np.asarray(leaf)
    return out


def save_pytree(path: str, tree: Any, *, use_orbax: bool = False) -> None:
    """Serialize a state/solution pytree to ``path``.

    Default backend is a flat ``.npz`` of the leaves (portable, no deps);
    ``use_orbax=True`` delegates to orbax-checkpoint when installed
    (sharded arrays, async IO).
    """
    if use_orbax:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), tree)
        ckptr.wait_until_finished()
        return
    np.savez(path, **_flatten_with_paths(tree))


def load_pytree(path: str, like: Any, *, use_orbax: bool = False) -> Any:
    """Restore a pytree saved by :func:`save_pytree`; ``like`` provides the
    structure (any pytree with the same treedef, e.g. `f.init(key)`)."""
    if use_orbax:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path), target=like)
    data = np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
    flat = _flatten_with_paths(like)
    names = list(flat.keys())
    leaves, treedef = jax.tree_util.tree_flatten(like)
    new_leaves = [jnp.asarray(data[name]) for name in names]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def resume_state(f, path: str, key=None) -> Any:
    """Load a saved filter state for filter ``f`` (structure inferred from
    ``f.init``)."""
    try:
        proto = f.init()
    except TypeError:
        proto = f.init(jax.random.PRNGKey(0) if key is None else key)
    return load_pytree(path, proto)
