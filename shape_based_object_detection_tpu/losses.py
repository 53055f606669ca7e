"""Detection losses (components C14/C15, SURVEY.md §2), fused into train_step.

- ``multibox_loss`` (SSD, Liu et al. 2016 eq. 1): softmax cross-entropy with a
  background class + SmoothL1 on positives, with hard-negative mining at
  ``neg_pos_ratio``:1 implemented via the double-argsort rank trick so the
  whole thing stays a static-shape XLA program.
- ``focal_loss`` (RetinaNet, Lin et al. 2017 eq. 4/5): sigmoid focal CE over
  all non-ignored anchors + SmoothL1 on positives, normalized by #positives.

Both consume the MatchResult label convention: -1 ignore / 0 background /
1..C foreground.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from shape_based_object_detection_tpu.config import LossConfig
from shape_based_object_detection_tpu.ops.matching import MatchResult

Metrics = Dict[str, jnp.ndarray]


def smooth_l1(x: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Elementwise Huber/SmoothL1 with transition at ``beta``.

    ``beta == 0`` is pure L1 (the torch reference special-cases it too):
    with the where-form, the untaken 0.5*ax*ax/0 branch has an infinite
    derivative and jnp.where's VJP would turn 0 * inf into NaN gradients.
    """
    ax = jnp.abs(x)
    if beta <= 0:
        return ax
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def multibox_loss(
    cls_logits: jnp.ndarray,  # (B, A, C+1), class 0 = background
    reg_preds: jnp.ndarray,  # (B, A, 4)
    match: MatchResult,  # batched: fields (B, A, ...)
    cfg: LossConfig,
) -> Tuple[jnp.ndarray, Metrics]:
    cls_t, reg_t, pos = match.cls_targets, match.reg_targets, match.positive
    b, a = cls_t.shape

    num_pos = pos.sum(axis=1)  # (B,)
    n_pos_total = jnp.maximum(num_pos.sum(), 1.0)

    # --- localization: SmoothL1 over positives, summed then /N_pos ---------
    loc = smooth_l1(reg_preds - reg_t, cfg.smooth_l1_beta).sum(-1)  # (B, A)
    loc_loss = jnp.where(pos, loc, 0.0).sum() / n_pos_total

    # --- confidence: CE everywhere, then positives + hardest negatives -----
    safe_t = jnp.clip(cls_t, 0, None)  # ignore rows get bg CE, masked later
    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, safe_t[..., None], axis=-1)[..., 0]  # (B, A)

    neg_mask = cls_t == 0
    neg_ce = jnp.where(neg_mask, ce, -jnp.inf)
    # double-argsort rank: rank[i] = position of anchor i in descending-CE order
    order = jnp.argsort(-neg_ce, axis=1)
    rank = jnp.argsort(order, axis=1)
    num_neg = jnp.minimum(
        (cfg.neg_pos_ratio * num_pos).astype(jnp.int32),
        neg_mask.sum(axis=1).astype(jnp.int32),
    )
    hard_neg = jnp.logical_and(neg_mask, rank < num_neg[:, None])

    conf_loss = (
        jnp.where(pos, ce, 0.0).sum() + jnp.where(hard_neg, ce, 0.0).sum()
    ) / n_pos_total

    total = conf_loss + cfg.box_loss_weight * loc_loss
    return total, {
        "loss": total,
        "loss_cls": conf_loss,
        "loss_box": loc_loss,
        "num_pos": num_pos.sum().astype(jnp.float32),
    }


def sigmoid_focal_ce(
    logits: jnp.ndarray, targets_onehot: jnp.ndarray, alpha: float, gamma: float
) -> jnp.ndarray:
    """Per-element focal BCE, numerically stable (log-sigmoid form)."""
    import optax

    p = jax.nn.sigmoid(logits)
    ce = optax.sigmoid_binary_cross_entropy(logits, targets_onehot)
    p_t = p * targets_onehot + (1.0 - p) * (1.0 - targets_onehot)
    alpha_t = alpha * targets_onehot + (1.0 - alpha) * (1.0 - targets_onehot)
    return alpha_t * jnp.power(1.0 - p_t, gamma) * ce


def focal_loss(
    cls_logits: jnp.ndarray,  # (B, A, C) — sigmoid per class, no background
    reg_preds: jnp.ndarray,  # (B, A, 4)
    match: MatchResult,
    cfg: LossConfig,
) -> Tuple[jnp.ndarray, Metrics]:
    cls_t, reg_t, pos = match.cls_targets, match.reg_targets, match.positive
    num_classes = cls_logits.shape[-1]

    num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)

    onehot = jax.nn.one_hot(jnp.clip(cls_t, 1, None) - 1, num_classes,
                            dtype=cls_logits.dtype)
    onehot = onehot * (cls_t > 0)[..., None]  # background rows -> all zeros
    fl = sigmoid_focal_ce(cls_logits, onehot, cfg.focal_alpha, cfg.focal_gamma)
    not_ignored = (cls_t >= 0)[..., None]
    cls_loss = jnp.where(not_ignored, fl, 0.0).sum() / num_pos

    loc = smooth_l1(reg_preds - reg_t, cfg.smooth_l1_beta).sum(-1)
    loc_loss = jnp.where(pos, loc, 0.0).sum() / num_pos

    total = cls_loss + cfg.box_loss_weight * loc_loss
    return total, {
        "loss": total,
        "loss_cls": cls_loss,
        "loss_box": loc_loss,
        "num_pos": num_pos,
    }


def detection_loss(
    cls_logits: jnp.ndarray,
    reg_preds: jnp.ndarray,
    match: MatchResult,
    cfg: LossConfig,
) -> Tuple[jnp.ndarray, Metrics]:
    """Dispatch on LossConfig.kind ('multibox' for SSD, 'focal' for RetinaNet)."""
    if cfg.kind == "multibox":
        return multibox_loss(cls_logits, reg_preds, match, cfg)
    if cfg.kind == "focal":
        return focal_loss(cls_logits, reg_preds, match, cfg)
    raise ValueError(f"unknown loss kind {cfg.kind!r}")
