"""Train state: AdamW over the epi/sync/auxiliary subset, rest frozen.

Mirrors train_epi_control.py:245-281: freeze everything, re-enable params
whose (torch-layout) name contains 'epi_modules', 'sync' or 'auxiliary',
AdamW (betas, eps, weight decay from config), grad-norm clipping, and a
diffusers-style LR schedule (constant or cosine with warmup).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct, traverse_util

TRAINABLE_SUBSTRINGS = ("epi_modules", "sync", "auxiliary")


def trainable_mask(params: Dict, substrings=TRAINABLE_SUBSTRINGS) -> Dict:
    """Pytree of bools: True where the param path matches the trainable set."""
    tree = params["params"] if "params" in params else params
    flat = traverse_util.flatten_dict(tree)
    mask = {
        k: any(s in "/".join(map(str, k)) for s in substrings) for k in flat
    }
    out = traverse_util.unflatten_dict(mask)
    return {"params": out} if "params" in params else out


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # the substrings the optimizer's multi_transform labels were built from;
    # train_step derives its stop_gradient mask from THIS field so the two
    # masks cannot diverge (round-3 advisor finding: a custom value passed
    # to create_train_state but not to train_step would silently zero grads
    # for params the optimizer considers trainable)
    trainable_substrings: Tuple[str, ...] = struct.field(
        pytree_node=False, default=TRAINABLE_SUBSTRINGS
    )

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def lr_schedule(
    name: str, learning_rate: float, warmup_steps: int, total_steps: int
) -> optax.Schedule:
    if name == "constant":
        if warmup_steps <= 0:
            return optax.constant_schedule(learning_rate)
        return optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, warmup_steps),
             optax.constant_schedule(learning_rate)],
            [warmup_steps],
        )
    if name == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, total_steps
        )
    raise ValueError(name)


def create_train_state(
    params: Dict,
    learning_rate: float = 1e-4,
    adam_beta1: float = 0.9,
    adam_beta2: float = 0.999,
    adam_weight_decay: float = 1e-2,
    adam_epsilon: float = 1e-8,
    max_grad_norm: float = 1.0,
    scheduler: str = "constant",
    warmup_steps: int = 0,
    total_steps: int = 100_000,
    trainable_substrings=TRAINABLE_SUBSTRINGS,
    frozen_dtype=None,
) -> TrainState:
    """frozen_dtype: store FROZEN float leaves in this dtype (bf16 for the
    production mixed-precision setup) while trainable leaves are kept/upcast
    to f32 masters. Frozen weights receive no updates and the bf16-compute
    modules cast them at use anyway, so an f32 frozen master is pure HBM
    waste — at CVD scale, dropping it saves ~2.4 GiB of the 6.4 GiB UNet
    (the reference's AMP autocast reads the same weights in fp16,
    train_epi_control.py:589-599)."""
    mask = trainable_mask(params, trainable_substrings)
    if frozen_dtype is not None:
        # close over the bool mask: it must stay concrete Python bools
        # (jitting over it would trace the leaves and `if keep` would raise)
        def _cast(tree):
            def leaf(p, keep):
                if not jnp.issubdtype(p.dtype, jnp.floating):
                    return p
                return p.astype(jnp.float32 if keep else frozen_dtype)

            return jax.tree_util.tree_map(leaf, tree, mask)

        params = jax.jit(_cast)(params)
    labels = jax.tree_util.tree_map(
        lambda t: "trainable" if t else "frozen", mask
    )
    schedule = lr_schedule(scheduler, learning_rate, warmup_steps, total_steps)
    inner = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(
            schedule,
            b1=adam_beta1,
            b2=adam_beta2,
            eps=adam_epsilon,
            weight_decay=adam_weight_decay,
        ),
    )
    # multi_transform: frozen leaves get a hard zero update (optax.masked
    # would pass their raw gradients through as updates)
    tx = optax.multi_transform(
        {"trainable": inner, "frozen": optax.set_to_zero()}, labels
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
        trainable_substrings=tuple(trainable_substrings),
    )
