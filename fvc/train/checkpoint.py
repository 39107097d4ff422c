"""Checkpointing — orbax-backed with the reference's tolerant-loading modes.

Reference: torch.save dicts {epoch, state_dict, score, stats} with _ckpt/_best
pairs (train.py:416-424) and the tolerant loaders at models.py:431-458:
- load_whatever: shape-matched subset (load_state_dict_whatever)
- load_only:     keyword-filtered subset (load_state_dict_only)
- load_with_copy: mirror source weights into backup_* decoders
  (load_state_dict_with_copy — the MCVC init-from-SSF path)
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(directory: str, step: int, payload: Any, *,
                    best: bool = False):
    """payload: any pytree (params/opt_state/metadata)."""
    directory = os.path.abspath(directory)
    name = "best" if best else f"ckpt_{step}"
    path = os.path.join(directory, name)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, reference: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), reference)


def restore_raw(path: str) -> Any:
    """Restore a checkpoint into ITS OWN saved structure (no reference tree)
    as HOST numpy arrays. Needed to graft across model variants whose
    pytrees differ — e.g. the MCVC views=1/resilience=0 pretrain into a
    views=V/resilience=1 model (load_state_dict_with_copy,
    models.py:442-448). Restoring without explicit numpy RestoreArgs would
    use the checkpoint's SAVED shardings, which fail on a different backend
    ("Device TFRT_CPU_0 was not found" when a CPU-saved checkpoint is read
    from a TPU-backend process)."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path).item_metadata
    tree = meta.tree if hasattr(meta, "tree") else meta
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
    return ckptr.restore(path, restore_args=restore_args)


def latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    # the directory may itself BE an orbax checkpoint (exported/pretrained
    # dirs like pretrained_lsvc_l2/) rather than a run dir of ckpt_N steps
    if os.path.exists(os.path.join(directory, "_CHECKPOINT_METADATA")):
        return directory
    best = os.path.join(directory, "best")
    cands = sorted(
        (d for d in os.listdir(directory) if d.startswith("ckpt_")),
        key=lambda d: int(d.split("_")[1]))
    if cands:
        return os.path.join(directory, cands[-1])
    return best if os.path.isdir(best) else None


# ---------------------------------------------------------------------------
# Tolerant cross-model weight grafting (pytree versions of models.py:431-458)
# ---------------------------------------------------------------------------

def _flatten(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(k): v for k, v in flat}, treedef


def load_whatever(target, source):
    """Copy every source leaf whose path exists in target with matching shape
    (load_state_dict_whatever, models.py:431-440)."""
    src, _ = _flatten(source)

    def merge(path, leaf):
        key = jax.tree_util.keystr(path)
        if key in src and np.shape(src[key]) == np.shape(leaf):
            return _cast_like(src[key], leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(merge, target)


def _cast_like(value, leaf):
    """Match the target leaf's dtype (a bf16-policy checkpoint grafted into
    an f32 model would otherwise poison mixed-dtype convs)."""
    dt = getattr(leaf, "dtype", None)
    return value if dt is None else jnp.asarray(value, dt)


def load_only(target, source, keyword: str):
    """Copy only leaves whose path contains `keyword`
    (load_state_dict_only, models.py:450-455)."""
    src, _ = _flatten(source)

    def merge(path, leaf):
        key = jax.tree_util.keystr(path)
        if keyword in key and key in src and np.shape(src[key]) == np.shape(leaf):
            return _cast_like(src[key], leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(merge, target)


def load_with_copy(target, source, *, backup_map=(
        ("backup_img_decoder", "img_decoder"),
        ("backup_res_decoder", "res_decoder"))):
    """load_whatever + mirror donor decoders into backup_* decoders
    (load_state_dict_with_copy, models.py:442-448 — the MCVC-from-SSF seed)."""
    out = load_whatever(target, source)
    src, _ = _flatten(source)

    def merge(path, leaf):
        key = jax.tree_util.keystr(path)
        for backup, donor in backup_map:
            if backup in key:
                donor_key = key.replace(backup, donor)
                if donor_key in src and np.shape(src[donor_key]) == np.shape(leaf):
                    return _cast_like(src[donor_key], leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(merge, out)
