"""Loss tests (components C14/C15): torch-golden value parity."""

import numpy as np
import jax.numpy as jnp
import torch

from shape_based_object_detection_tpu.config import LossConfig
from shape_based_object_detection_tpu import losses as L
from shape_based_object_detection_tpu.ops.matching import MatchResult
from tests.golden import torch_ops as G


def _fake_match(rng, b, a, c):
    """Random but structurally valid batched MatchResult."""
    cls_t = rng.choice([-1, 0, 1, 2, c], size=(b, a), p=[0.05, 0.75, 0.08, 0.08, 0.04])
    cls_t = cls_t.astype(np.int32)
    reg_t = rng.normal(size=(b, a, 4)).astype(np.float32)
    pos = cls_t > 0
    reg_t[~pos] = 0.0
    return MatchResult(
        matched_gt_idx=jnp.zeros((b, a), jnp.int32),
        cls_targets=jnp.asarray(cls_t),
        reg_targets=jnp.asarray(reg_t),
        positive=jnp.asarray(pos),
        quality=jnp.zeros((b, a)),
    ), cls_t, reg_t


def test_smooth_l1_matches_torch(rng):
    x = rng.normal(size=(100,)).astype(np.float32) * 3
    ours = np.asarray(L.smooth_l1(jnp.asarray(x), beta=1.0))
    t = torch.from_numpy(x)
    gold = torch.where(t.abs() < 1, 0.5 * t * t, t.abs() - 0.5).numpy()
    np.testing.assert_allclose(ours, gold, rtol=1e-5, atol=1e-6)


def test_multibox_loss_matches_torch(rng):
    b, a, c = 2, 64, 4
    match, cls_t, reg_t = _fake_match(rng, b, a, c)
    logits = rng.normal(size=(b, a, c + 1)).astype(np.float32)
    preds = rng.normal(size=(b, a, 4)).astype(np.float32)

    cfg = LossConfig(kind="multibox", neg_pos_ratio=3.0, smooth_l1_beta=1.0)
    total, m = L.multibox_loss(jnp.asarray(logits), jnp.asarray(preds), match, cfg)
    gold_total, gold_conf, gold_loc = G.multibox_loss(
        torch.from_numpy(logits), torch.from_numpy(preds),
        torch.from_numpy(cls_t), torch.from_numpy(reg_t),
    )
    np.testing.assert_allclose(float(total), float(gold_total), rtol=1e-4)
    np.testing.assert_allclose(float(m["loss_cls"]), float(gold_conf), rtol=1e-4)
    np.testing.assert_allclose(float(m["loss_box"]), float(gold_loc), rtol=1e-4)


def test_focal_loss_matches_torch(rng):
    b, a, c = 2, 64, 6
    match, cls_t, reg_t = _fake_match(rng, b, a, c)
    logits = rng.normal(size=(b, a, c)).astype(np.float32)
    preds = rng.normal(size=(b, a, 4)).astype(np.float32)

    cfg = LossConfig(kind="focal", focal_alpha=0.25, focal_gamma=2.0)
    total, m = L.focal_loss(jnp.asarray(logits), jnp.asarray(preds), match, cfg)
    gold_total, gold_fl, gold_loc = G.focal_loss(
        torch.from_numpy(logits), torch.from_numpy(preds),
        torch.from_numpy(cls_t), torch.from_numpy(reg_t),
    )
    np.testing.assert_allclose(float(total), float(gold_total), rtol=1e-4)
    np.testing.assert_allclose(float(m["loss_cls"]), float(gold_fl), rtol=1e-4)
    np.testing.assert_allclose(float(m["loss_box"]), float(gold_loc), rtol=1e-4)


def test_losses_are_differentiable(rng):
    import jax

    b, a, c = 1, 32, 3
    match, _, _ = _fake_match(rng, b, a, c)
    logits = jnp.asarray(rng.normal(size=(b, a, c + 1)).astype(np.float32))
    preds = jnp.asarray(rng.normal(size=(b, a, 4)).astype(np.float32))

    g = jax.grad(
        lambda lg, pr: L.multibox_loss(lg, pr, match, LossConfig())[0],
        argnums=(0, 1),
    )(logits, preds)
    assert np.isfinite(np.asarray(g[0])).all()
    assert np.isfinite(np.asarray(g[1])).all()

    logits_f = jnp.asarray(rng.normal(size=(b, a, c)).astype(np.float32))
    gf = jax.grad(
        lambda lg, pr: L.focal_loss(lg, pr, match, LossConfig(kind="focal"))[0],
        argnums=(0, 1),
    )(logits_f, preds)
    assert np.isfinite(np.asarray(gf[0])).all()


def test_focal_loss_ignores_ignore_band(rng):
    """Anchors labeled -1 must contribute zero cls loss."""
    b, a, c = 1, 16, 3
    cls_t = np.zeros((b, a), np.int32)
    cls_t[0, :8] = -1
    match = MatchResult(
        matched_gt_idx=jnp.zeros((b, a), jnp.int32),
        cls_targets=jnp.asarray(cls_t),
        reg_targets=jnp.zeros((b, a, 4)),
        positive=jnp.zeros((b, a), bool),
        quality=jnp.zeros((b, a)),
    )
    logits = np.zeros((b, a, c), np.float32)
    logits[0, :8] = 100.0  # huge activations in ignore band
    base = np.zeros((b, a, c), np.float32)

    l_ign, _ = L.focal_loss(jnp.asarray(logits), jnp.zeros((b, a, 4)), match,
                            LossConfig(kind="focal"))
    l_base, _ = L.focal_loss(jnp.asarray(base), jnp.zeros((b, a, 4)), match,
                             LossConfig(kind="focal"))
    np.testing.assert_allclose(float(l_ign), float(l_base), rtol=1e-6)


def test_smooth_l1_beta_zero_is_l1_with_finite_grads():
    """beta=0 (pure L1) used to produce NaN gradients through the untaken
    where-branch's 0.5*x*x/0 (review finding)."""
    import jax

    from shape_based_object_detection_tpu.losses import smooth_l1

    x = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0])
    np.testing.assert_allclose(np.asarray(smooth_l1(x, beta=0.0)),
                               np.abs(np.asarray(x)))
    g = np.asarray(jax.grad(lambda v: smooth_l1(v, beta=0.0).sum())(x))
    assert np.isfinite(g).all()
    # sign(x) away from 0; at 0 JAX's abs picks a valid subgradient in [-1,1]
    np.testing.assert_allclose(g[[0, 1, 3, 4]], [-1, -1, 1, 1])
    assert -1.0 <= g[2] <= 1.0
