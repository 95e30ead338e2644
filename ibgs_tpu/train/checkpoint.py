"""Checkpoint save/restore.

Artifacts mirror the reference layout (SURVEY §5):
  * `point_cloud/iteration_N/point_cloud.ply` — model-only PLY with plane
    fields, interoperable with the reference tooling;
  * `chkpnt<N>.npz` — full training state (params + Adam moments + stats +
    side nets), a flat-key pytree snapshot;
  * `cfg_args.json` — config reproducibility (written by the driver).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ibgs_tpu.data import ply


def save_ply_snapshot(model, path):
    alive = np.asarray(model.alive)
    p = jax.tree.map(lambda x: np.asarray(x)[alive], model.params)
    ply.save_gaussian_ply(
        path, p.xyz, p.normal, p.offset, p.sh_dc, p.sh_rest,
        p.opacity_logit, p.log_scale, p.quat)


def save_state(state, iteration: int, path: str):
    flat, treedef = jax.tree.flatten(state)
    np.savez_compressed(
        path,
        __iteration=iteration,
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)},
    )


def load_state(template, path: str):
    """Restore into the same pytree structure as `template`."""
    data = np.load(path)
    flat, treedef = jax.tree.flatten(template)
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(flat))]
    return jax.tree.unflatten(treedef, leaves), int(data["__iteration"])
