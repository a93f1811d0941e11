"""Checkpoint/resume.

Two formats:
* orbax — native training state {params, opt_state, step} + metadata, the
  production path (replaces torch.save dicts, train_epi_control.py:650-661).
  Unlike the reference, optimizer state restores too (the reference comments
  that restore out, :378).
* reference-format .ckpt — torch dict {epoch, global_step,
  unet_trainable_dict} so checkpoints interop with the PyTorch reference
  in both directions.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from cvd_tpu.io.key_mapping import export_torch_state
from cvd_tpu.train.state import TrainState, trainable_mask


def save_orbax(path: str, state: TrainState, metadata: Optional[dict] = None) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            path,
            {
                "params": state.params,
                "opt_state": state.opt_state,
                "step": state.step,
                "metadata": metadata or {},
            },
        )


def restore_orbax(path: str, state: TrainState) -> Tuple[TrainState, dict]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
        "metadata": None,
    }
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, template)
    return (
        state.replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        ),
        restored["metadata"] or {},
    )


def save_reference_ckpt(
    path: str, unet_params: Dict, epoch: int, global_step: int
) -> None:
    """Write the trainable subset as a reference-compatible torch ckpt
    (train_epi_control.py:654-660)."""
    import torch
    from flax import traverse_util

    mask = trainable_mask(unet_params)
    tree = unet_params["params"] if "params" in unet_params else unet_params
    mtree = mask["params"] if "params" in mask else mask
    flat = traverse_util.flatten_dict(tree)
    mflat = traverse_util.flatten_dict(mtree)
    trainable = traverse_util.unflatten_dict(
        {k: v for k, v in flat.items() if mflat[k]}
    )
    torch_state = export_torch_state(trainable)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save(
        {
            "epoch": epoch,
            "global_step": global_step,
            "unet_trainable_dict": {
                k: torch.from_numpy(np.asarray(v)) for k, v in torch_state.items()
            },
        },
        path,
    )
