"""Checkpointing: params/opt/trainer-state -> npz + JSON treedef.

Replaces the reference's per-iteration exp/$dir/$iter.mdl model dumps
(Kaldi binary token streams, ref: base/io-funcs + AmNnet::Write) with
flattened-pytree npz archives; resume restores params, NG state and the
deterministic data-iterator position (SURVEY.md §5.3/5.4).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _flatten(tree: Any):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, str(treedef)


def save_checkpoint(path: str, params: Any, opt: Any = None,
                    meta: Dict = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays = {}
    p_leaves, _ = jax.tree_util.tree_flatten(params)
    for i, leaf in enumerate(p_leaves):
        arrays[f"p{i}"] = np.asarray(leaf)
    if opt is not None:
        o_leaves, _ = jax.tree_util.tree_flatten(opt)
        for i, leaf in enumerate(o_leaves):
            arrays[f"o{i}"] = np.asarray(leaf)
    arrays["meta"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_checkpoint(path: str, params_template: Any,
                    opt_template: Any = None
                    ) -> Tuple[Any, Any, Dict]:
    """Restores into the structure of the given templates."""
    z = np.load(path)
    p_leaves, p_def = jax.tree_util.tree_flatten(params_template)
    new_p = [np.asarray(z[f"p{i}"]) for i in range(len(p_leaves))]
    params = jax.tree_util.tree_unflatten(p_def, new_p)
    opt = None
    if opt_template is not None:
        o_leaves, o_def = jax.tree_util.tree_flatten(opt_template)
        new_o = [np.asarray(z[f"o{i}"]) for i in range(len(o_leaves))]
        opt = jax.tree_util.tree_unflatten(o_def, new_o)
    meta = json.loads(bytes(z["meta"]).decode()) if "meta" in z else {}
    return params, opt, meta
