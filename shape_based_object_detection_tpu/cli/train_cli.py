"""Training entry point (the reference's ``train.py`` analog, SURVEY.md §3.1).

    python -m shape_based_object_detection_tpu.cli.train_cli \
        --config config3_ssd512_voc_train --steps 1000 --data-root /data/VOC2007
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import jax
import numpy as np


def build_dataset(cfg, args, include_ignore: bool = False):
    """``include_ignore=True`` (eval protocol) makes the dataset carry its
    ignore-region flags: COCO crowd annotations / VOC difficult objects.
    Training leaves it False so neither ever becomes a positive."""
    from shape_based_object_detection_tpu.data.synthetic import SyntheticDetection
    from shape_based_object_detection_tpu.data.voc import VOCDetection
    from shape_based_object_detection_tpu.data.coco import CocoDetection

    size = cfg.model.image_size
    lb = cfg.data.letterbox
    dec = cfg.data.decode_backend
    if args.data_root.startswith("synthetic://"):
        # explicit synthetic root ("synthetic://<seed-name>[?k=v&...]"):
        # works with ANY config's dataset kind (e.g. --val-root
        # synthetic://val while training a VOC preset on synthetic data);
        # distinct names seed distinct splits so train and val never share
        # images. Query parameters size the benchmark — e.g.
        # "synthetic://train?n=4000&max_objects=8&aspect_std=0.6&
        # color_jitter=0.1" is a VOC-scale split (n images; the remaining
        # generator knobs default to the tiny test values).
        import zlib
        from urllib.parse import parse_qsl

        name, _, query = args.data_root.removeprefix(
            "synthetic://").partition("?")
        params = dict(parse_qsl(query, strict_parsing=bool(query)))
        known = {"n": int, "max_objects": int, "classes": int,
                 "aspect_std": float, "color_jitter": float,
                 "area_lo": float, "area_hi": float, "class_aspect": float}
        bad = sorted(set(params) - set(known))
        if bad:
            raise SystemExit(
                f"unknown synthetic:// parameter(s) {bad}; "
                f"known: {sorted(known)}")
        kw = {k: known[k](v) for k, v in params.items()}
        # crc32, not hash(): str hashing is per-process randomized and the
        # split must be reproducible across runs. Seeded by the NAME only,
        # so n=4000 extends (not reshuffles) the n=64 split.
        seed = zlib.crc32(name.encode()) % (2**31)
        return SyntheticDetection(
            size=size,
            num_images=kw.pop("n", max(64, cfg.data.batch_size * 4)),
            num_classes=kw.pop("classes", cfg.model.num_classes),
            seed=seed, **kw)
    if args.data_root and cfg.data.dataset == "voc":
        return VOCDetection(args.data_root, split=args.split, image_size=size,
                            letterbox=lb, include_difficult=include_ignore,
                            decode_backend=dec)
    if args.data_root and cfg.data.dataset == "coco":
        return CocoDetection(args.data_root, args.ann_file, image_size=size,
                             letterbox=lb, include_crowd=include_ignore,
                             decode_backend=dec)
    return SyntheticDetection(size=size, num_images=max(64, cfg.data.batch_size * 4),
                              num_classes=cfg.model.num_classes)


def main(argv=None):
    from shape_based_object_detection_tpu.utils.cache import (
        enable_compilation_cache,
    )

    # persistent XLA cache: warm restarts of the big detection
    # programs load in ~ms instead of recompiling for minutes
    enable_compilation_cache()
    from shape_based_object_detection_tpu import config as config_lib
    from shape_based_object_detection_tpu.models.factory import build_model
    from shape_based_object_detection_tpu import train as train_lib
    from shape_based_object_detection_tpu.checkpoint import CheckpointManager
    from shape_based_object_detection_tpu.data.pipeline import Loader
    from shape_based_object_detection_tpu.parallel import (
        batch_sharding, initialize_multihost, replicated_sharding,
    )
    from shape_based_object_detection_tpu.parallel.mesh import make_mesh_for_batch
    from shape_based_object_detection_tpu.utils.metrics import MetricsLogger

    p = argparse.ArgumentParser()
    p.add_argument("--config", default="config3_ssd512_voc_train")
    p.add_argument("--data-root", default="")
    p.add_argument("--ann-file", default="")
    p.add_argument("--split", default="train")
    p.add_argument("--steps", type=int, default=0, help="override total steps")
    p.add_argument("--batch-size", type=int, default=0)
    p.add_argument("--checkpoint-dir", default="")
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--tb-dir", default="",
                   help="write TensorBoard scalars (loss terms, lr, img/s)")
    p.add_argument("--eval-every", type=int, default=0,
                   help="run VOC-mAP eval every N steps (on --val-root if "
                        "given, else a sample of the train stream)")
    p.add_argument("--val-root", default="",
                   help="validation dataset root: enables val-split eval and "
                        "best-mAP checkpoint tracking (kept under "
                        "<checkpoint-dir>/best)")
    p.add_argument("--val-ann-file", default="")
    p.add_argument("--val-split", default="val")
    p.add_argument("--val-batches", type=int, default=0,
                   help="cap on val batches per eval (0 = the whole split)")
    p.add_argument("--workers", type=int, default=4,
                   help="data-loader workers: threads for --loader threads, "
                        "processes for --loader grain (0 = serial/in-proc)")
    p.add_argument("--loader", choices=["threads", "grain", "cache", "device"],
                   default="threads",
                   help="input pipeline: 'threads' = built-in thread-pool "
                        "Loader; 'grain' = grain with multi-process workers; "
                        "'cache' = pre-decode the dataset once into a memmap "
                        "cache (see --cache-dir), then vectorized gathers; "
                        "'device' = the memmap cache staged entirely in "
                        "device HBM, batches gathered on device (zero "
                        "per-step H2D — for hosts whose transfer path, not "
                        "the chip, bounds training; needs the dataset to "
                        "fit in HBM)")
    p.add_argument("--cache-dir", default="",
                   help="--loader cache location (default "
                        "<checkpoint-dir>/data_cache)")
    p.add_argument("--init-params", default="",
                   help="initialize model variables from an orbax params "
                        "checkpoint (tools/convert_checkpoint.py output — "
                        "the pretrained-backbone fine-tune path, SURVEY.md "
                        "§3.5/C21); a resumable checkpoint in "
                        "--checkpoint-dir still takes precedence")
    p.add_argument("--ema-decay", type=float, default=-1.0,
                   help="override TrainConfig.ema_decay (e.g. 0.999; "
                        "detect_cli --ema serves the averaged weights)")
    p.add_argument("--num-processes", type=int, default=0)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--coordinator", default="")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="SECTION.KEY=VALUE",
                   help="config override, e.g. --set model.image_size=512 "
                        "--set data.letterbox=true (JSON-parsed values)")
    p.add_argument("--dump-config", default="",
                   help="write the fully-resolved experiment config as JSON "
                        "(re-runnable via --config <file>.json) and exit if "
                        "no --steps given")
    args = p.parse_args(argv)

    if args.num_processes > 1:
        initialize_multihost(args.coordinator, args.num_processes, args.process_id)

    # --config accepts a preset name or a JSON config file (the reference's
    # per-run JSON style); --set applies dotted overrides on top
    cfg = config_lib.resolve_config(args.config, args.overrides)
    if args.steps:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, total_steps=args.steps))
    if args.batch_size:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, batch_size=args.batch_size))
    if args.checkpoint_dir:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           checkpoint_dir=args.checkpoint_dir))
    if args.ema_decay >= 0:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           ema_decay=args.ema_decay))

    if cfg.train.remat and not cfg.model.remat:
        # promote to segment-wise model remat (the effective memory lever;
        # see ModelConfig.remat; honored by both families — resnet.py
        # per-block nn.remat, vgg.py/ssd.py per-stage segments) — train.py
        # then skips its legacy whole-forward jax.checkpoint. Runs before
        # --dump-config so the dumped JSON records the effective value.
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, remat=True))

    if args.dump_config:
        config_lib.save_config_file(cfg, args.dump_config)
        print(f"wrote resolved config to {args.dump_config}")
        if not args.steps:
            return

    module, variables, anchors = build_model(cfg.model)
    if args.init_params:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        variables = ckptr.restore(os.path.abspath(args.init_params), variables)
        print(f"initialized params from {args.init_params}")
    state = train_lib.create_train_state(module, variables, cfg)
    train_step = train_lib.make_train_step(module, anchors, cfg)

    mesh = make_mesh_for_batch(cfg.data.batch_size, cfg=cfg.mesh)
    data_shard = batch_sharding(mesh, cfg.mesh)

    ckpt = CheckpointManager(cfg.train.checkpoint_dir, cfg.train.keep_checkpoints)
    try:
        restored = ckpt.restore_latest(state)
    except ValueError as e:
        # Only the orbax tree-structure mismatch gets the friendly wrapper
        # (its raw dump is unreadable); IO/corruption errors propagate as-is
        # so users don't delete a recoverable run on bad advice.
        if "do not match" not in str(e):
            raise
        raise SystemExit(
            f"checkpoint in {cfg.train.checkpoint_dir!r} does not match the "
            f"--config {args.config!r} model/optimizer structure (it was "
            "likely written by a different config). Use a matching --config "
            "or a fresh --checkpoint-dir.\n"
            f"original error: {type(e).__name__}: {str(e)[:500]}")
    if restored is not None:
        state = restored
        # Reconcile the EMA subtree with THIS run's config: restore_latest
        # structure-matches whatever the checkpoint held, which can disagree
        # with --ema-decay (resuming a non-EMA checkpoint with EMA on, or
        # vice versa). train_step requires ema_params iff ema_decay > 0.
        if cfg.train.ema_decay > 0 and state.ema_params is None:
            # real copies, not aliases: the donated train_step must not see
            # the same buffer as both params and ema_params
            import jax.numpy as jnp

            state = state.replace(
                ema_params=jax.tree_util.tree_map(jnp.copy, state.params))
            print("checkpoint had no EMA weights; starting EMA from the "
                  "restored params")
        elif cfg.train.ema_decay <= 0 and state.ema_params is not None:
            state = state.replace(ema_params=None)
            print("checkpoint had EMA weights but ema_decay=0; dropping them "
                  "for this run")
        print(f"restored checkpoint at step {int(state.step)}")
    # place state on the mesh (restored checkpoints land on one device)
    state = jax.device_put(state, replicated_sharding(mesh))

    dataset = build_dataset(cfg, args)
    loader_kwargs = dict(
        seed=cfg.train.seed, host_id=jax.process_index(),
        num_hosts=jax.process_count(), workers=args.workers,
    )
    per_host_bs = cfg.data.batch_size // max(1, jax.process_count())
    if args.loader == "grain":
        from shape_based_object_detection_tpu.data.grain_pipeline import (
            GrainLoader,
        )

        loader = GrainLoader(dataset, per_host_bs, cfg.data.max_boxes,
                             **loader_kwargs)
    elif args.loader in ("cache", "device"):
        from shape_based_object_detection_tpu.data.cache import (
            CacheLoader, DeviceCacheLoader, MemmapDetection, build_cache,
        )

        cache_dir = args.cache_dir or os.path.join(
            cfg.train.checkpoint_dir, "data_cache")
        build_cache(dataset, cache_dir, cfg.data.max_boxes,
                    workers=max(1, args.workers))
        cls = DeviceCacheLoader if args.loader == "device" else CacheLoader
        loader = cls(MemmapDetection(cache_dir), per_host_bs,
                     cfg.data.max_boxes, **loader_kwargs)
    else:
        loader = Loader(dataset, per_host_bs, cfg.data.max_boxes,
                        **loader_kwargs)
    logger = MetricsLogger(log_every=args.log_every,
                           tensorboard_dir=args.tb_dir or None)
    # Multi-host eval is SHARDED: each host feeds its slice of the global
    # batch and the eval program's output is constrained REPLICATED, so
    # every host reads the full detection set (XLA inserts the all-gather)
    # and computes the identical metric — eval wall-clock divides by the
    # pod size instead of every host redundantly evaluating the whole split.
    multiproc = jax.process_count() > 1
    eval_step = (train_lib.make_eval_step(
        module, anchors, cfg,
        out_sharding=replicated_sharding(mesh) if multiproc else None)
        if args.eval_every else None)

    # val-split eval + best-mAP tracking (component C18): a separate
    # held-out loader and a single best checkpoint under <ckpt>/best
    val_loader = None
    best_keeper = None
    if args.eval_every and args.val_root:
        from shape_based_object_detection_tpu.checkpoint import (
            BestCheckpointKeeper,
        )

        val_args = argparse.Namespace(
            data_root=args.val_root, ann_file=args.val_ann_file or args.ann_file,
            split=args.val_split)
        val_dataset = build_dataset(cfg, val_args, include_ignore=True)
        # per-HOST batch size + host sharding: multi-host, each host loads
        # only its slice (see the sharded-eval note above); single-host this
        # is the plain full-split loader at the training batch size
        if args.loader == "device":
            # transfer-bound host: stage the val split device-side too (an
            # eval pass otherwise re-ships the whole split every
            # --eval-every steps)
            from shape_based_object_detection_tpu.data.cache import (
                DeviceCacheLoader, MemmapDetection, build_cache,
            )

            val_cache_dir = (args.cache_dir or os.path.join(
                cfg.train.checkpoint_dir, "data_cache")) + "_val"
            build_cache(val_dataset, val_cache_dir, cfg.data.max_boxes,
                        workers=max(1, args.workers))
            val_loader = DeviceCacheLoader(
                MemmapDetection(val_cache_dir), per_host_bs,
                cfg.data.max_boxes, shuffle=False,
                host_id=jax.process_index(),
                num_hosts=jax.process_count())
        else:
            val_loader = Loader(val_dataset, per_host_bs,
                                cfg.data.max_boxes, shuffle=False,
                                workers=args.workers,
                                host_id=jax.process_index(),
                                num_hosts=jax.process_count())
        best_keeper = BestCheckpointKeeper(
            os.path.join(cfg.train.checkpoint_dir, "best"))

    # Train-sample eval (no --val-root) gets its OWN small Loader: reusing
    # the training loader would race its in-flight device_batches() producer
    # thread on loaders with a shared stream (grain) and silently consume
    # training batches.
    train_sample_loader = None
    if args.eval_every and val_loader is None:
        train_sample_loader = Loader(dataset, per_host_bs, cfg.data.max_boxes,
                                     shuffle=False, workers=0,
                                     host_id=jax.process_index(),
                                     num_hosts=jax.process_count())

    def run_eval(state):
        import types

        from shape_based_object_detection_tpu.eval import Evaluator

        use_val = val_loader is not None
        src = val_loader if use_val else train_sample_loader
        cap = args.val_batches if (use_val and args.val_batches) else (
            0 if use_val else 5)
        ev = Evaluator(area_scale=cfg.model.image_size)
        nproc = jax.process_count()
        # the batch's flag channel is COCO crowd (crowd-IoU ignore) or VOC
        # difficult (plain ignore) depending on the dataset kind
        flag_kw = ("gt_crowd" if cfg.data.dataset == "coco" else "gt_ignore")

        def host_rows(x, n_valid):
            """Global (nproc*per_host_bs, ...) array -> the real (unpadded)
            rows, preserving the process-major global row order. Every host's
            padded-tail shard has the SAME n_valid (shards are truncated to
            equal length), so the slice is uniform."""
            x = np.asarray(x)
            x = x.reshape((nproc, -1) + x.shape[1:])[:, :n_valid]
            return x.reshape((-1,) + x.shape[2:])

        # batches_padded: full split coverage incl. the ragged tail
        for i, (b, n_valid) in enumerate(src.batches_padded()):
            if nproc > 1:
                # sharded eval: this host's slice -> global batch; output is
                # replicated (make_eval_step out_sharding), so the full
                # detection set is host-readable everywhere
                from jax.experimental import multihost_utils

                images = jax.make_array_from_process_local_data(
                    data_shard, b.images)
                det = eval_step(state, images)
                gt_b, gt_l, gt_v, gt_c = multihost_utils.process_allgather(
                    (b.boxes, b.labels, b.valid, b.crowd), tiled=True)
            else:
                # shard over local devices: same memory footprint as a
                # train step (replicating a full batch per device OOMs at
                # config-#5 scale)
                det = eval_step(state, jax.device_put(b.images, data_shard))
                gt_b, gt_l, gt_v, gt_c = b.boxes, b.labels, b.valid, b.crowd
            det_np = types.SimpleNamespace(
                boxes=host_rows(det.boxes, n_valid),
                scores=host_rows(det.scores, n_valid),
                labels=host_rows(det.labels, n_valid),
                valid=host_rows(det.valid, n_valid))
            ev.add_batch(det_np, host_rows(gt_b, n_valid),
                         host_rows(gt_l, n_valid) - 1,
                         host_rows(gt_v, n_valid),
                         **{flag_kw: host_rows(gt_c, n_valid)})
            if cap and i + 1 >= cap:
                break
        return ev.voc()["mAP"]

    # Graceful preemption (SURVEY.md §5 failure recovery): on SIGTERM/SIGINT
    # (pod preemption, scheduler eviction) finish the in-flight step, save a
    # checkpoint, and exit 0 — the restart resumes from it. A second signal
    # falls back to the default handler (hard kill).
    import signal

    preempted = {"flag": False}

    def _on_signal(signum, frame):
        preempted["flag"] = True
        signal.signal(signum, signal.SIG_DFL)
        print(f"received signal {signum}: checkpointing and exiting after "
              "the current step (send again to kill)", flush=True)

    try:
        for _sig in (signal.SIGTERM, signal.SIGINT):
            signal.signal(_sig, _on_signal)
    except ValueError:
        pass  # main() called off the main thread: no preemption hook

    step = int(state.step)
    # Resume mid-run at the right position in the data schedule: epoch 0
    # here would replay already-seen shuffles (over-representing early
    # epochs). The skipped prefix of the resumed epoch is fetched and
    # discarded once — host-side cost only, paid once per restart.
    spe = loader.steps_per_epoch()
    epoch = step // spe if spe else 0
    skip = step % spe if spe else 0
    # stream-based loaders (grain) ignore the epoch arg — one persistent
    # stream serves all epochs — so a resume must skip the WHOLE consumed
    # prefix, not just the position within the current epoch
    if step and not hasattr(loader, "_epoch_indices"):
        skip = epoch * spe + skip
    if step and (epoch or skip):
        print(f"resuming data schedule at epoch {epoch}, batch {skip}")
    nonfinite_steps = 0
    # Lagged metrics consumption: materializing a step's metrics the moment
    # it is dispatched would synchronize host and device EVERY step (the
    # scalar D2H readback is one host<->device RTT, serial with the loop —
    # ruinous on a tunneled chip where RTT rivals the step time). A small
    # fixed lag keeps a few steps in flight; every value, meter, TB scalar
    # and log line is identical, just consumed _METRIC_LAG steps later. The
    # divergence guard fires with the same lag — params are equally
    # poisoned either way, and resume-from-checkpoint is the recovery path.
    import collections

    _METRIC_LAG = 4
    pending: collections.deque = collections.deque()

    def _pack_metrics(metrics):
        """One tiny stacked array per step instead of N loose device
        scalars: every scalar comes back to the host in a SINGLE D2H
        readback. On a remote/tunneled runtime each readback is a full
        round trip, so reading 6 scalars per step costs 6 RTTs — measured
        on the capstone run as the dominant per-step cost (the device
        loader had already removed the batch H2D)."""
        import jax.numpy as jnp

        keys = [k for k in sorted(metrics) if getattr(
            metrics[k], "shape", None) == ()]
        packed = jnp.stack([metrics[k].astype(jnp.float32) for k in keys])
        rest = {k: v for k, v in metrics.items() if k not in keys}
        return keys, packed, rest

    def _consume_metrics():
        nonlocal nonfinite_steps
        s, (keys, packed, rest) = pending.popleft()
        m = dict(zip(keys, np.asarray(packed)))  # ONE readback
        m.update(rest)
        # 3 consecutive non-finite losses = the run is destroyed (params
        # are inf/NaN); abort with the recovery path, don't train garbage.
        if not np.isfinite(float(np.asarray(m["loss"]))):
            nonfinite_steps += 1
            if nonfinite_steps >= 3:
                raise SystemExit(
                    f"loss non-finite for {nonfinite_steps} consecutive "
                    f"steps at step {s} — training has diverged. "
                    "Resume from the last checkpoint in "
                    f"{cfg.train.checkpoint_dir!r} with a lower "
                    "train.base_lr (or enable train.grad_clip_norm).")
        else:
            nonfinite_steps = 0
        line = logger.update(s, m, batch_size=cfg.data.batch_size)
        if line:
            print(line, flush=True)

    while step < cfg.train.total_steps:
        batch_iter = loader.device_batches(epoch, sharding=data_shard)
        if skip:
            import itertools

            batch_iter = itertools.islice(batch_iter, skip, None)
            skip = 0
        for batch in batch_iter:
            state, metrics = train_step(state, batch._asdict())
            step += 1
            pending.append((step, _pack_metrics(metrics)))
            if len(pending) > _METRIC_LAG:
                _consume_metrics()
            if preempted["flag"]:
                while pending:
                    _consume_metrics()
                ckpt.save(state, step)
                ckpt.wait()
                loader.close()
                print(f"preempted: checkpoint saved at step {step}",
                      flush=True)
                return
            if step % cfg.train.checkpoint_every == 0:
                ckpt.save(state, step)
            if eval_step is not None and step % args.eval_every == 0:
                while pending:  # eval syncs anyway; keep log lines ordered
                    _consume_metrics()
                val_map = run_eval(state)
                which = "val" if val_loader is not None else "train-sample"
                line = f"step {step}  voc-mAP({which})={val_map:.4f}"
                if best_keeper is not None and best_keeper.maybe_save(
                        state, step, val_map):
                    line += "  [new best]"
                print(line, flush=True)
            if step >= cfg.train.total_steps:
                break
        epoch += 1
    while pending:
        _consume_metrics()
    ckpt.save(state, step)
    ckpt.wait()
    loader.close()
    if val_loader is not None:
        val_loader.close()
    if train_sample_loader is not None:
        train_sample_loader.close()
    print(f"done at step {step}")


if __name__ == "__main__":
    main()
