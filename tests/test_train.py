"""Training-loop tests (components C17/C18): step mechanics, overfit
integration (SURVEY.md §4 item 5), checkpoint roundtrip, LR schedule."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shape_based_object_detection_tpu import config as config_lib
from shape_based_object_detection_tpu import train as train_lib
from shape_based_object_detection_tpu.models.factory import build_model


@pytest.fixture(scope="module")
def tiny_setup():
    model_cfg = config_lib.tiny_test_model("retinanet")
    cfg = config_lib.ExperimentConfig(
        model=model_cfg,
        data=dataclasses.replace(
            config_lib.DataConfig(batch_size=2, max_boxes=4),
            photometric=False, expand=False, random_crop=False, hflip=False,
        ),
        train=dataclasses.replace(
            config_lib.TrainConfig(), base_lr=0.01, warmup_steps=5,
            weight_decay=0.0, total_steps=1000, lr_decay_steps=(500,),
        ),
        match=config_lib.MatchConfig(pos_threshold=0.4, neg_threshold=0.4),
        loss=config_lib.LossConfig(kind="focal"),
    )
    module, variables, anchors = build_model(model_cfg)
    # one shared compiled step (augment=False) for every test in this module
    step_fn = train_lib.make_train_step(module, anchors, cfg, augment=False)
    return cfg, module, variables, anchors, step_fn


def _fake_batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    b = cfg.data.batch_size
    g = cfg.data.max_boxes
    s = cfg.model.image_size
    return {
        "images": rng.integers(0, 255, (b, s, s, 3), dtype=np.uint8),
        "boxes": np.tile(np.asarray([0.25, 0.25, 0.7, 0.7], np.float32),
                         (b, g, 1)),
        "labels": np.full((b, g), 1, np.int32),
        "valid": np.tile(np.asarray([True] + [False] * (g - 1)), (b, 1)),
    }


def test_train_step_runs_and_updates(tiny_setup):
    cfg, module, variables, anchors, step_fn = tiny_setup
    state = train_lib.create_train_state(module, variables, cfg)
    batch = _fake_batch(cfg)
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    state, metrics = step_fn(state, batch)
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["num_pos"]) > 0
    # step 1 runs at warmup lr(0)=0; step 2 must move the params
    state, metrics = step_fn(state, batch)
    p1 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    assert not np.allclose(p0, p1)


def test_overfit_synthetic(tiny_setup):
    """Loss on a fixed batch must drop substantially — the end-to-end
    gradient-correctness oracle."""
    cfg, module, variables, anchors, step_fn = tiny_setup
    state = train_lib.create_train_state(module, variables, cfg)
    batch = _fake_batch(cfg)
    losses = []
    for _ in range(40):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, f"no overfit: {losses[0]} -> {losses[-1]}"
    assert all(np.isfinite(losses))


def test_train_step_with_augmentation(tiny_setup):
    cfg, module, variables, anchors, _ = tiny_setup
    aug_cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, photometric=True, expand=True,
                                      random_crop=True, hflip=True))
    state = train_lib.create_train_state(module, variables, aug_cfg)
    step_fn = train_lib.make_train_step(module, anchors, aug_cfg, augment=True)
    state, metrics = step_fn(state, _fake_batch(aug_cfg))
    assert np.isfinite(float(metrics["loss"]))


def test_lr_schedule():
    cfg = dataclasses.replace(
        config_lib.TrainConfig(), base_lr=1.0, warmup_steps=10,
        lr_decay_steps=(100, 200), lr_decay_factor=0.1)
    sched = train_lib.make_lr_schedule(cfg)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(5)), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(sched(50)), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(sched(150)), 0.1, atol=1e-6)
    np.testing.assert_allclose(float(sched(250)), 0.01, atol=1e-6)
    # decay boundaries fire at the GLOBAL steps they name, not
    # warmup_steps later (join_schedules offsets the inner schedule)
    np.testing.assert_allclose(float(sched(99)), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 0.1, atol=1e-6)
    np.testing.assert_allclose(float(sched(200)), 0.01, atol=1e-6)


def test_checkpoint_roundtrip(tiny_setup, tmp_path):
    from shape_based_object_detection_tpu.checkpoint import CheckpointManager

    cfg, module, variables, anchors, _ = tiny_setup
    state = train_lib.create_train_state(module, variables, cfg)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2, async_save=False)
    mgr.save(state, step=3)
    mgr.wait()

    template = train_lib.create_train_state(
        module, jax.tree_util.tree_map(jnp.zeros_like, variables), cfg)
    restored = mgr.restore_latest(template)
    assert restored is not None
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    mgr.close()


def test_eval_step(tiny_setup):
    cfg, module, variables, anchors, _ = tiny_setup
    state = train_lib.create_train_state(module, variables, cfg)
    eval_fn = train_lib.make_eval_step(module, anchors, cfg)
    batch = _fake_batch(cfg)
    det = eval_fn(state, jnp.asarray(batch["images"]))
    assert det.boxes.shape[0] == cfg.data.batch_size
    assert det.boxes.shape[1] == cfg.model.detect.max_detections


def test_train_step_with_remat(tiny_setup):
    """jax.checkpoint path (config #5 memory lever) must match no-remat loss."""
    cfg, module, variables, anchors, step_fn = tiny_setup
    remat_cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, remat=True))
    remat_step = train_lib.make_train_step(module, anchors, remat_cfg,
                                           augment=False)
    batch = _fake_batch(cfg)
    s1 = train_lib.create_train_state(module, variables, cfg)
    s2 = train_lib.create_train_state(module, variables, remat_cfg)
    _, m1 = step_fn(s1, batch)
    _, m2 = remat_step(s2, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]),
                               rtol=1e-4)


def test_train_step_with_segmented_remat(tiny_setup):
    """ModelConfig.remat (per-block nn.remat — the R101-640 capstone's memory
    lever): identical param tree to the plain model, and a train step from the
    same init matches the no-remat loss/grads (remat is gradient-exact)."""
    cfg, module, variables, anchors, step_fn = tiny_setup
    remat_cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, remat=True),
        train=dataclasses.replace(cfg.train, remat=True),
    )
    remat_module, remat_vars, _ = build_model(remat_cfg.model)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(remat_vars))
    # make_loss_fn must pick the segmented path (no double-checkpoint): the
    # module's own cfg carries remat, so the legacy whole-fwd wrap is skipped
    remat_step = train_lib.make_train_step(remat_module, anchors, remat_cfg,
                                           augment=False)
    batch = _fake_batch(cfg)
    s1 = train_lib.create_train_state(module, variables, cfg)
    s2 = train_lib.create_train_state(remat_module, variables, remat_cfg)
    _, m1 = step_fn(s1, batch)
    _, m2 = remat_step(s2, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]),
                               rtol=1e-4)


def test_ssd_segmented_remat_parity():
    """SSD-family ModelConfig.remat (vgg.py per-stage nn.remat segments +
    checkpointed extras — the round-4 advisor gap: the train_cli remat
    promotion used to silently no-op for SSD): identical param tree to the
    plain model, identical forward, and a train step from the same init
    matches the no-remat loss/grads."""
    model_cfg = config_lib.tiny_test_model("ssd")
    cfg = config_lib.ExperimentConfig(
        model=model_cfg,
        data=dataclasses.replace(
            config_lib.DataConfig(batch_size=2, max_boxes=4),
            photometric=False, expand=False, random_crop=False, hflip=False,
        ),
        train=dataclasses.replace(
            config_lib.TrainConfig(), base_lr=0.01, warmup_steps=5,
            weight_decay=0.0, total_steps=1000, lr_decay_steps=(500,),
        ),
        match=config_lib.MatchConfig(pos_threshold=0.4, neg_threshold=0.4),
        loss=config_lib.LossConfig(kind="multibox"),
    )
    module, variables, anchors = build_model(model_cfg)
    remat_cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(model_cfg, remat=True),
        train=dataclasses.replace(cfg.train, remat=True),
    )
    remat_module, remat_vars, _ = build_model(remat_cfg.model)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(remat_vars))
    batch = _fake_batch(cfg)
    step_fn = train_lib.make_train_step(module, anchors, cfg, augment=False)
    remat_step = train_lib.make_train_step(remat_module, anchors, remat_cfg,
                                           augment=False)
    s1 = train_lib.create_train_state(module, variables, cfg)
    s2 = train_lib.create_train_state(remat_module, variables, remat_cfg)
    _, m1 = step_fn(s1, batch)
    _, m2 = remat_step(s2, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]),
                               rtol=1e-4)


def test_momentum_dtype_bfloat16(tiny_setup):
    """TrainConfig.momentum_dtype="bfloat16" (the optimizer-HBM lever,
    tools/profile_backward.py): the SGD trace is stored bf16, params stay
    f32 master weights, and the update direction matches f32-momentum
    within bf16 rounding."""
    cfg, module, variables, anchors, step_fn = tiny_setup
    m16_cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, momentum_dtype="bfloat16"))
    m16_step = train_lib.make_train_step(module, anchors, m16_cfg,
                                         augment=False)
    batch = _fake_batch(cfg)
    s1 = train_lib.create_train_state(module, variables, cfg)
    s2 = train_lib.create_train_state(module, variables, m16_cfg)
    trace16 = [l for l in jax.tree_util.tree_leaves(s2.opt_state)
               if hasattr(l, "dtype") and l.dtype == jnp.bfloat16]
    assert trace16, "momentum accumulator should be bfloat16"
    for _ in range(3):
        s1, m1 = step_fn(s1, batch)
        s2, m2 = m16_step(s2, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-3)
    p1 = np.asarray(jax.tree_util.tree_leaves(s1.params)[0])
    p2 = np.asarray(jax.tree_util.tree_leaves(s2.params)[0])
    assert p2.dtype == np.float32  # master weights unaffected
    np.testing.assert_allclose(p1, p2, rtol=0, atol=2e-2)
    assert not np.allclose(p1, np.asarray(
        jax.tree_util.tree_leaves(variables["params"])[0]))


def test_train_step_bfloat16(tiny_setup):
    """bf16 compute path trains: finite loss + finite grads."""
    cfg, module, variables, anchors, _ = tiny_setup
    bf16_model = dataclasses.replace(cfg.model, dtype="bfloat16",
                                     precision="default")
    bf16_cfg = dataclasses.replace(cfg, model=bf16_model)
    module16, variables16, anchors16 = build_model(bf16_model)
    state = train_lib.create_train_state(module16, variables16, bf16_cfg)
    step = train_lib.make_train_step(module16, anchors16, bf16_cfg,
                                     augment=False)
    state, metrics = step(state, _fake_batch(bf16_cfg))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    # params stay fp32 (mixed precision: bf16 compute, fp32 master weights)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.dtype == jnp.float32


def test_ema_tracks_params(tiny_setup):
    """ema = d*ema + (1-d)*params each step; eval can run from EMA weights."""
    cfg, module, variables, anchors, _ = tiny_setup
    d = 0.5
    ema_cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=d))
    step_fn = train_lib.make_train_step(module, anchors, ema_cfg,
                                        augment=False)
    state = train_lib.create_train_state(module, variables, ema_cfg)
    assert state.ema_params is not None
    batch = _fake_batch(cfg)

    p0 = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), state.params)
    state, _ = step_fn(state, batch)
    state, _ = step_fn(state, batch)  # warmup lr(0)=0: params move on step 2

    # closed form after two steps from ema0=p0: d^2*p0 + d(1-d)*p1 + (1-d)*p2
    leaf = lambda t: np.asarray(jax.tree_util.tree_leaves(t)[0])
    # re-derive p1 by replaying: ema after s1 = d*p0+(1-d)*p1
    # (just check the invariant that ema lies strictly between p0 and params)
    e = leaf(state.ema_params)
    p_now = leaf(state.params)
    p_start = leaf(p0)
    moved = np.abs(p_now - p_start).max()
    assert moved > 0
    assert np.abs(e - p_start).max() < moved  # EMA lags params
    assert np.abs(e - p_now).max() > 0  # but is not params either

    # eval from EMA weights compiles and runs
    eval_ema = train_lib.make_eval_step(module, anchors, ema_cfg, use_ema=True)
    det = eval_ema(state, jnp.asarray(batch["images"]))
    assert bool(np.all(np.isfinite(np.asarray(det.scores))))


def test_ema_checkpoint_roundtrip(tiny_setup, tmp_path):
    from shape_based_object_detection_tpu.checkpoint import CheckpointManager

    cfg, module, variables, anchors, _ = tiny_setup
    ema_cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=0.9))
    step_fn = train_lib.make_train_step(module, anchors, ema_cfg,
                                        augment=False)
    state = train_lib.create_train_state(module, variables, ema_cfg)
    state, _ = step_fn(state, _fake_batch(cfg))

    mgr = CheckpointManager(str(tmp_path / "ck"), async_save=False)
    mgr.save(state, 1)
    mgr.wait()
    template = train_lib.create_train_state(module, variables, ema_cfg)
    restored = mgr.restore_latest(template)
    mgr.close()
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(restored.ema_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0]))


def test_weight_decay_excludes_bias_and_norm(tiny_setup):
    """Decay applies to conv/dense kernels only; with zero grads (after
    warmup) biases/norm scales must be exactly unchanged while kernels move."""
    cfg, module, variables, anchors, _ = tiny_setup
    mask = train_lib.decay_mask(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(mask)
    names = {jax.tree_util.keystr(p).rsplit("'", 2)[-2]: v for p, v in flat}
    assert names.get("kernel") in (True, False)  # structure sanity
    kernels = [v for p, v in flat
               if jax.tree_util.keystr(p).endswith("'kernel']")]
    non_kernels = [v for p, v in flat
                   if not jax.tree_util.keystr(p).endswith("'kernel']")]
    assert kernels and all(v is True or v == True for v in kernels)
    assert non_kernels and all(not v for v in non_kernels)

    wd_cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, weight_decay=1e-2,
                                       warmup_steps=1))
    tx = train_lib.make_optimizer(wd_cfg.train)
    params = variables["params"]
    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    opt_state = tx.init(params)
    # step 1 (lr=0 warmup), step 2 (lr>0): decay shows on step 2
    for _ in range(2):
        updates, opt_state = tx.update(zero_grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    leaves = jax.tree_util.tree_leaves_with_path(params)
    orig = dict(jax.tree_util.tree_leaves_with_path(variables["params"]))
    for path, leaf in leaves:
        same = np.array_equal(np.asarray(leaf),
                              np.asarray(dict(orig.items())[path]))
        if jax.tree_util.keystr(path).endswith("'kernel']") and leaf.ndim >= 2:
            nonzero = float(jnp.abs(leaf).max()) > 0
            if nonzero:
                assert not same, f"kernel {path} not decayed"
        else:
            assert same, f"non-kernel {path} was decayed"


def test_adamw_weight_decay_also_masked(tiny_setup):
    """optax.adamw's own (nonzero, unmasked) default decay must be overridden:
    with zero grads, biases stay exactly put while kernels decay."""
    cfg, module, variables, anchors, _ = tiny_setup
    tcfg = dataclasses.replace(cfg.train, optimizer="adamw",
                               weight_decay=1e-2, warmup_steps=1)
    tx = train_lib.make_optimizer(tcfg)
    params = variables["params"]
    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    opt_state = tx.init(params)
    for _ in range(2):
        updates, opt_state = tx.update(zero_grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    orig = dict(jax.tree_util.tree_leaves_with_path(variables["params"]))
    changed = unchanged = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        same = np.array_equal(np.asarray(leaf), np.asarray(orig[path]))
        if jax.tree_util.keystr(path).endswith("'kernel']") and leaf.ndim >= 2:
            if float(jnp.abs(leaf).max()) > 0 and not same:
                changed += 1
        else:
            assert same, f"non-kernel {path} decayed by adamw"
            unchanged += 1
    assert changed > 5 and unchanged > 5


def test_grad_accumulation_matches_big_batch(tiny_setup):
    """2 micro-steps at batch B with grad_accum_steps=2 == 1 step at 2B
    (same mean gradient reaches the optimizer; params update only on the
    2nd micro-step)."""
    cfg, module, variables, anchors, _ = tiny_setup
    base_train = dataclasses.replace(cfg.train, warmup_steps=0, base_lr=0.01,
                                     grad_clip_norm=1e9, weight_decay=0.0)

    big = _fake_batch(dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, batch_size=4)), seed=7)
    half_a = {k: v[:2] for k, v in big.items()}
    half_b = {k: v[2:] for k, v in big.items()}

    # reference: one step on the concatenated batch
    cfg_big = dataclasses.replace(
        cfg, train=base_train,
        data=dataclasses.replace(cfg.data, batch_size=4))
    step_big = train_lib.make_train_step(module, anchors, cfg_big,
                                         augment=False)
    s_big = train_lib.create_train_state(module, variables, cfg_big)
    s_big, _ = step_big(s_big, big)

    # accumulated: two micro-steps of half the batch
    cfg_acc = dataclasses.replace(
        cfg, train=dataclasses.replace(base_train, grad_accum_steps=2))
    step_acc = train_lib.make_train_step(module, anchors, cfg_acc,
                                         augment=False)
    s_acc = train_lib.create_train_state(module, variables, cfg_acc)
    p0 = np.asarray(jax.tree_util.tree_leaves(s_acc.params)[0]).copy()
    s_acc, _ = step_acc(s_acc, half_a)
    p_mid = np.asarray(jax.tree_util.tree_leaves(s_acc.params)[0])
    np.testing.assert_array_equal(p0, p_mid)  # no update on micro-step 1
    s_acc, _ = step_acc(s_acc, half_b)

    for a, b in zip(jax.tree_util.tree_leaves(s_acc.params),
                    jax.tree_util.tree_leaves(s_big.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_train_bn_updates_batch_stats(tiny_setup):
    """train_bn=True: backbone BN runs in batch-stats mode and the running
    statistics move each step (VERDICT r1 missing #4 / SURVEY §3.1)."""
    cfg, module, variables, anchors, _ = tiny_setup
    bn_model = dataclasses.replace(cfg.model, train_bn=True)
    bn_cfg = dataclasses.replace(cfg, model=bn_model)
    bn_module, bn_vars, bn_anchors = build_model(bn_model)
    step_fn = train_lib.make_train_step(bn_module, bn_anchors, bn_cfg,
                                        augment=False)
    state = train_lib.create_train_state(bn_module, bn_vars, bn_cfg)
    means0 = np.concatenate([
        np.ravel(x) for x in jax.tree_util.tree_leaves(
            state.extra_vars["batch_stats"])
    ]).copy()
    state, metrics = step_fn(state, _fake_batch(bn_cfg))
    assert np.isfinite(float(metrics["loss"]))
    means1 = np.concatenate([
        np.ravel(x) for x in jax.tree_util.tree_leaves(
            state.extra_vars["batch_stats"])
    ])
    assert not np.allclose(means0, means1), "batch_stats must update"
    # and params still train
    state, _ = step_fn(state, _fake_batch(bn_cfg))
    assert int(state.step) == 2


def test_frozen_bn_keeps_batch_stats(tiny_setup):
    """Default train_bn=False: batch_stats are bit-identical after a step."""
    cfg, module, variables, anchors, step_fn = tiny_setup
    state = train_lib.create_train_state(module, variables, cfg)
    stats0 = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), state.extra_vars)
    state, _ = step_fn(state, _fake_batch(cfg))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        state.extra_vars, stats0)


def test_checkpoint_ema_structure_mismatch_both_ways(tiny_setup, tmp_path):
    """restore_latest adapts the EMA subtree to the saved structure in both
    directions (ADVICE r1: orbax StandardRestore raises on mismatch)."""
    from shape_based_object_detection_tpu.checkpoint import CheckpointManager

    cfg, module, variables, anchors, _ = tiny_setup
    ema_cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=0.9))

    # EMA-trained checkpoint, restored with a non-EMA template
    d1 = str(tmp_path / "ema_ckpt")
    ckpt = CheckpointManager(d1, async_save=False)
    ema_state = train_lib.create_train_state(module, variables, ema_cfg)
    ckpt.save(ema_state, 3)
    ckpt.wait()
    plain_template = train_lib.create_train_state(module, variables, cfg)
    assert plain_template.ema_params is None
    restored = CheckpointManager(d1, async_save=False).restore_latest(
        plain_template)
    assert restored is not None and restored.ema_params is not None
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(ema_state.params)[0]))

    # non-EMA checkpoint, restored with an EMA template
    d2 = str(tmp_path / "plain_ckpt")
    ckpt2 = CheckpointManager(d2, async_save=False)
    plain_state = train_lib.create_train_state(module, variables, cfg)
    ckpt2.save(plain_state, 5)
    ckpt2.wait()
    ema_template = train_lib.create_train_state(module, variables, ema_cfg)
    restored2 = CheckpointManager(d2, async_save=False).restore_latest(
        ema_template)
    assert restored2 is not None and restored2.ema_params is None


def test_best_keeper_rejects_nan_and_is_ordered(tmp_path):
    """A NaN metric never becomes best_value (it would poison every later
    comparison), and best.json is written atomically before the save."""
    import json
    import os

    import numpy as np

    from shape_based_object_detection_tpu.checkpoint import BestCheckpointKeeper

    keeper = BestCheckpointKeeper(str(tmp_path / "best"))
    state = {"w": np.zeros(3, np.float32)}
    assert not keeper.maybe_save(state, 1, float("nan"))
    assert keeper.best_step == -1  # NaN rejected outright
    assert keeper.maybe_save(state, 2, 0.4)
    assert not keeper.maybe_save(state, 3, 0.3)  # worse value rejected
    meta = json.loads((tmp_path / "best" / "best.json").read_text())
    assert meta == {"step": 2, "value": 0.4}
    assert not os.path.exists(str(tmp_path / "best" / "best.json.tmp"))
    keeper.close()


def test_lr_decay_at_or_before_warmup_raises():
    """Boundaries <= warmup used to collapse onto one key and silently run
    the whole training at the wrong LR (review finding)."""
    import pytest
    from shape_based_object_detection_tpu.train import make_lr_schedule

    cfg = dataclasses.replace(config_lib.TrainConfig(), warmup_steps=5000,
                              lr_decay_steps=(2000, 3000))
    with pytest.raises(ValueError, match="warmup"):
        make_lr_schedule(cfg)


def test_eval_step_use_ema_without_ema_raises():
    """use_ema=True on a state trained with ema_decay=0 must raise a clear
    error, not an opaque flax tree error (review finding)."""
    import pytest
    from shape_based_object_detection_tpu.models.factory import build_model
    from shape_based_object_detection_tpu.train import (
        create_train_state, make_eval_step)

    cfg = config_lib.get_config("tiny_ssd")
    module, variables, anchors = build_model(cfg.model)
    state = create_train_state(module, variables, cfg)  # ema_decay=0
    eval_step = make_eval_step(module, anchors, cfg, use_ema=True)
    s = cfg.model.image_size
    with pytest.raises(ValueError, match="EMA"):
        eval_step(state, jnp.zeros((1, s, s, 3), jnp.uint8))


def test_pipelined_step_matches_plain(tiny_setup):
    """make_train_step_pipelined: prime() performs exactly the rng split the
    plain step would, so the update computed from the consumed carry is
    bit-identical to make_train_step(augment=True) on the same batch — the
    pipelining only shifts WHEN augmentation runs, never its semantics.
    (Measured on chip: the pipelined program is ~3% SLOWER than the fused
    step — see BASELINE.md augmentation-pipelining ablation — so the fused
    step remains the default; this variant is kept as the recorded
    experiment.)"""
    cfg, module, variables, anchors, _ = tiny_setup
    batch = _fake_batch(cfg)

    plain = train_lib.make_train_step(module, anchors, cfg, augment=True)
    s_plain = train_lib.create_train_state(module, variables, cfg)
    s_plain, m_plain = plain(s_plain, dict(batch))

    prime, pstep = train_lib.make_train_step_pipelined(module, anchors, cfg)
    s_pipe = train_lib.create_train_state(module, variables, cfg)
    s_pipe, carry = prime(s_pipe, dict(batch))
    s_pipe, carry2, m_pipe = pstep(s_pipe, carry, dict(batch))

    assert float(m_plain["loss"]) == float(m_pipe["loss"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        s_plain.params, s_pipe.params)
    # the next carry is a fresh augmented batch with the right structure
    assert carry2[0].shape == carry[0].shape
