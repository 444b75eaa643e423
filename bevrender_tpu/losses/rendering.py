"""Rendering losses: MSE / L1 / cross-entropy (loss/mse_loss.py,
loss/l1_loss.py, loss/cross_entropy_loss.py).

Each loss also exists as a class with the reference's uniform
``get_loss(input, target)`` duck-type (SURVEY section 2.3)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((pred - target) ** 2)


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


def cross_entropy_loss(pred: jax.Array, target: jax.Array, class_axis: int = 1) -> jax.Array:
    """Soft-label cross entropy over ``class_axis`` — the semantics of
    ``torch.nn.CrossEntropyLoss()(input, target)`` with probability targets
    (the reference feeds same-shaped float tensors, loss/cross_entropy_loss.py:23-29).
    """
    logp = jax.nn.log_softmax(pred, axis=class_axis)
    return jnp.mean(-jnp.sum(target * logp, axis=class_axis))


class MSELoss:
    def get_loss(self, pred, target):
        return mse_loss(pred, target)


class L1Loss:
    def get_loss(self, pred, target):
        return l1_loss(pred, target)


class CrossEntropyLoss:
    def get_loss(self, pred, target):
        return cross_entropy_loss(pred, target)
