"""Training loop (component C17, SURVEY.md §2/§3.1).

One jitted ``train_step(state, batch, rng)`` is the whole hot path:
on-device augmentation -> forward -> matching -> loss -> grad -> update, with
the state donated (params update in place in HBM). Under a data-parallel mesh
the same function runs SPMD; XLA inserts the gradient all-reduce.

The optimizer is the family-standard SGD + momentum with warmup + step decay
and global-norm clipping, built as an optax chain.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from shape_based_object_detection_tpu.config import ExperimentConfig
from shape_based_object_detection_tpu.data.augment import augment_batch
from shape_based_object_detection_tpu.losses import detection_loss
from shape_based_object_detection_tpu.ops.matching import match_batch


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any  # trainable collection ('params')
    extra_vars: Any  # frozen collections (batch_stats etc.), not optimized
    opt_state: Any
    rng: jax.Array
    # EMA of params (TrainConfig.ema_decay > 0), else None (empty subtree —
    # checkpoints and shardings pass through unchanged when disabled)
    ema_params: Any = None


def make_lr_schedule(cfg) -> optax.Schedule:
    """Linear warmup then piecewise step decay (the family's schedule).

    ``lr_decay_steps`` are GLOBAL step numbers: join_schedules passes
    (step - warmup_steps) into the post-warmup schedule, so the piecewise
    boundaries must be shifted by -warmup_steps to fire where named."""
    warmup_steps = max(1, cfg.warmup_steps)
    bad = [int(s) for s in cfg.lr_decay_steps if int(s) <= warmup_steps]
    if bad:
        # max(1, s - warmup) would silently collapse these onto one boundary
        # and run the whole training at the wrong LR — fail loud instead.
        raise ValueError(
            f"lr_decay_steps {bad} fall at or before warmup_steps="
            f"{warmup_steps}; decay boundaries are GLOBAL step numbers and "
            "must be greater than the warmup length")
    boundaries = {int(s) - warmup_steps: cfg.lr_decay_factor
                  for s in cfg.lr_decay_steps}
    decay = optax.piecewise_constant_schedule(cfg.base_lr, boundaries)
    warmup = optax.linear_schedule(0.0, cfg.base_lr, warmup_steps)
    return optax.join_schedules([warmup, decay], [warmup_steps])


def decay_mask(params):
    """True for conv/dense kernels only: biases and norm scales (L2Norm, BN)
    are excluded from weight decay (standard practice — decaying them skews
    the effective learning dynamics without regularizing capacity)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: getattr(path[-1], "key", None) == "kernel"
        and x.ndim >= 2,
        params,
    )


def make_optimizer(cfg) -> optax.GradientTransformation:
    schedule = make_lr_schedule(cfg)
    parts = [optax.clip_by_global_norm(cfg.grad_clip_norm)]
    if cfg.optimizer == "sgd":
        if cfg.weight_decay:
            parts.append(optax.add_decayed_weights(cfg.weight_decay,
                                                   mask=decay_mask))
        parts.append(optax.sgd(
            schedule, momentum=cfg.momentum, nesterov=False,
            accumulator_dtype=getattr(cfg, "momentum_dtype", "") or None))
    elif cfg.optimizer == "adamw":
        # decoupled decay through adamw itself (its default weight_decay is
        # NONZERO and unmasked — always override it with ours + the mask)
        parts.append(optax.adamw(schedule, weight_decay=cfg.weight_decay,
                                 mask=decay_mask))
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    tx = optax.chain(*parts)
    if getattr(cfg, "grad_accum_steps", 1) > 1:
        # micro-batch accumulation: updates are zero until every k-th step,
        # where the optimizer sees the mean gradient of the last k batches
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx


def create_train_state(
    module, variables, cfg: ExperimentConfig, rng: Optional[jax.Array] = None
) -> TrainState:
    # Copy leaves: train_step donates the state, which would otherwise
    # invalidate the caller's `variables` buffers on the first step.
    params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                    variables["params"])
    extra = jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True),
        {k: v for k, v in variables.items() if k != "params"},
    )
    tx = make_optimizer(cfg.train)
    if rng is None:
        rng = jax.random.PRNGKey(cfg.train.seed)
    ema = (jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
           if cfg.train.ema_decay > 0 else None)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        extra_vars=extra,
        opt_state=tx.init(params),
        rng=rng,
        ema_params=ema,
    )


def make_loss_fn(module, anchors: jnp.ndarray, cfg: ExperimentConfig):
    """loss_fn(params, extra_vars, images, boxes, labels, valid) ->
    (loss, (metrics, new_extra_vars)) — the differentiable core shared by the
    plain and pipelined train steps."""
    variances = cfg.model.anchors.variances

    train_bn = getattr(cfg.model, "train_bn", False)
    if train_bn:
        # BN in batch-stats mode: apply returns (outputs, mutated collections);
        # the updated batch_stats ride out through the aux and replace
        # state.extra_vars after the step (gradients don't flow into them).
        def fwd(variables, x):
            return module.apply(variables, x, train=True,
                                mutable=["batch_stats"])
    else:
        def fwd(variables, x):
            return module.apply(variables, x), None
    apply_fn = fwd
    model_remat = getattr(getattr(module, "cfg", None), "remat", False)
    if cfg.train.remat and not model_remat:
        # Legacy whole-forward jax.checkpoint. NOTE: this barely lowers PEAK
        # memory (the backward recomputes the entire forward and then holds
        # the same activations); the effective lever is ModelConfig.remat
        # (segment-wise nn.remat inside the model), which train_cli promotes
        # this flag to. Kept so a module built without model-level remat
        # still gets the old behavior (test_train.py loss-parity oracle).
        apply_fn = jax.checkpoint(fwd)

    def loss_fn(params, extra_vars, images, boxes, labels, valid):
        x = images
        (cls_logits, box_offsets), mutated = apply_fn(
            {"params": params, **extra_vars}, x)
        new_extra = ({**extra_vars, **jax.lax.stop_gradient(mutated)}
                     if mutated else extra_vars)
        match = match_batch(anchors, boxes, labels, valid, cfg.match, variances)
        loss, metrics = detection_loss(cls_logits, box_offsets, match, cfg.loss)
        return loss, (metrics, new_extra)

    return loss_fn


def _grad_and_update(loss_fn, tx, cfg, state, rng, images, boxes, labels,
                     valid):
    """value_and_grad -> optimizer -> EMA -> new TrainState. Shared tail of
    every train-step variant (the semantics live in one place)."""
    (loss, (metrics, extra_vars)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params, state.extra_vars, images, boxes, labels, valid)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    d = cfg.train.ema_decay
    if d > 0:
        ema = jax.tree_util.tree_map(lambda e, p: d * e + (1.0 - d) * p,
                                     state.ema_params, params)
        if cfg.train.grad_accum_steps > 1:
            # EMA tracks OPTIMIZER updates, not micro-steps: under
            # accumulation, params only change when MultiSteps' inner
            # counter wraps to 0; folding unchanged params into the EMA
            # every micro-step would silently raise the effective decay
            # to d^k per update.
            applied = opt_state.mini_step == 0
            ema = jax.tree_util.tree_map(
                lambda e_new, e_old: jnp.where(applied, e_new, e_old),
                ema, state.ema_params)
    else:
        ema = state.ema_params
    metrics = dict(metrics)
    metrics["grad_norm"] = optax.global_norm(grads)
    new_state = state.replace(
        step=state.step + 1, params=params, opt_state=opt_state, rng=rng,
        ema_params=ema, extra_vars=extra_vars,
    )
    return new_state, metrics


def make_train_step(
    module,
    anchors: jnp.ndarray,
    cfg: ExperimentConfig,
    augment: bool = True,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict]]:
    """Builds the jitted, donated train step.

    batch dict fields: images (B,S,S,3) uint8, boxes (B,G,4) normalized xyxy,
    labels (B,G) int32 (1-based), valid (B,G) bool.
    """
    tx = make_optimizer(cfg.train)
    loss_fn = make_loss_fn(module, anchors, cfg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        rng, step_rng = jax.random.split(state.rng)
        if augment:
            images, boxes, labels, valid = augment_batch(
                step_rng, batch["images"], batch["boxes"], batch["labels"],
                batch["valid"], cfg.data, cfg.model.image_size,
            )
        else:
            from shape_based_object_detection_tpu.utils.image import (
                normalize_images,
            )

            images = normalize_images(batch["images"], cfg.data.mean, cfg.data.std)
            boxes, labels, valid = batch["boxes"], batch["labels"], batch["valid"]

        return _grad_and_update(loss_fn, tx, cfg, state, rng,
                                images, boxes, labels, valid)

    return train_step


def make_train_step_pipelined(
    module,
    anchors: jnp.ndarray,
    cfg: ExperimentConfig,
):
    """Software-pipelined train step: augmentation runs one batch AHEAD.

    The plain step (make_train_step) computes augment(batch_i) -> forward ->
    backward as one dependent chain, so the memory-bound augment stage sits
    serially in front of the MXU-bound convs (~13% of step time, round-2
    profile). Here step i's program instead (a) consumes the ALREADY
    augmented ``carry`` for grad+update and (b) augments raw batch i+1 into
    the next carry. The two subgraphs share no data, so XLA's latency-hiding
    scheduler is free to interleave the augment's HBM traffic under the conv
    compute — software pipelining at the program level, no second program or
    host round-trip involved (on a single TensorCore, separately dispatched
    programs would just serialize).

    Returns ``(prime, step)``:
      prime(state, batch)             -> (state, carry)   # augment batch 0
      step(state, carry, next_batch)  -> (state, carry', metrics)

    The driver loop feeds batch i+1 to step i; the final step may be fed any
    batch (its augmented carry is simply dropped). Loss semantics are
    identical to the plain step; only the rng->batch pairing shifts by one
    (batch i+1 is augmented with step i's rng draw), so losses match the
    plain step's distribution, not its bitstream.
    """
    tx = make_optimizer(cfg.train)
    loss_fn = make_loss_fn(module, anchors, cfg)
    size = cfg.model.image_size

    def _augment(rng, batch):
        return augment_batch(rng, batch["images"], batch["boxes"],
                             batch["labels"], batch["valid"], cfg.data, size)

    @jax.jit
    def prime(state: TrainState, batch):
        rng, step_rng = jax.random.split(state.rng)
        return state.replace(rng=rng), _augment(step_rng, batch)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(state: TrainState, carry, next_batch):
        rng, step_rng = jax.random.split(state.rng)
        new_carry = _augment(step_rng, next_batch)
        images, boxes, labels, valid = carry
        new_state, metrics = _grad_and_update(
            loss_fn, tx, cfg, state, rng, images, boxes, labels, valid)
        return new_state, new_carry, metrics

    return prime, step


def make_eval_step(module, anchors: jnp.ndarray, cfg: ExperimentConfig,
                   use_ema: bool = False, out_sharding=None):
    """Jitted forward + postprocess for validation (one program, no host loop).

    ``use_ema=True`` evaluates the EMA weights (requires ema_decay > 0).
    ``out_sharding`` (e.g. a replicated NamedSharding) constrains the output
    Detections: under multi-host sharded eval the inputs are data-sharded
    over the global mesh, and a replicated output makes every host able to
    read the FULL detection set directly (XLA inserts the all-gather) —
    no separate host-side collective needed."""
    from shape_based_object_detection_tpu.detection import postprocess
    from shape_based_object_detection_tpu.utils.image import normalize_images

    @jax.jit
    def eval_step(state: TrainState, images):
        if use_ema and state.ema_params is None:
            # None is static under jit, so this raises a clear error at the
            # first call instead of an opaque flax tree error inside apply.
            raise ValueError(
                "use_ema=True but this TrainState has no EMA params — "
                "train with TrainConfig.ema_decay > 0 (or --ema-decay)")
        params = state.ema_params if use_ema else state.params
        x = normalize_images(images, cfg.data.mean, cfg.data.std)
        cls_logits, box_offsets = module.apply(
            {"params": params, **state.extra_vars}, x
        )
        det = postprocess(cls_logits, box_offsets, anchors, cfg.model)
        if out_sharding is not None:
            det = jax.lax.with_sharding_constraint(
                det, jax.tree_util.tree_map(lambda _: out_sharding, det))
        return det

    return eval_step
