"""One-time PTQ calibration for the static-scale int8 serving tier.

Runs the float forward over N batches of a dataset, records each eligible
conv's input abs-max (quantize.calibrate_activation_scales), and writes the
scales JSON consumed by ``--quantize full --act-scales`` (eval/detect CLIs,
tools/export_model.py) and ``Predictor(quantize="full",
activation_scales=...)``. Static scales remove the on-chip per-batch abs-max
reductions that serialize the dynamic-int8 path at batch 1.

    python tools/calibrate_scales.py --config config2_retinanet_r50_infer \
        --checkpoint-dir /ckpt --batches 8 --out scales.json
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from shape_based_object_detection_tpu.utils.platform import (
    honor_jax_platforms_env,
)

honor_jax_platforms_env()


def main(argv=None):
    from shape_based_object_detection_tpu import config as config_lib
    from shape_based_object_detection_tpu.cli.train_cli import build_dataset
    from shape_based_object_detection_tpu.data.pipeline import Loader
    from shape_based_object_detection_tpu.models.factory import build_model
    from shape_based_object_detection_tpu.quantize import (
        calibrate_activation_scales, save_activation_scales,
    )

    p = argparse.ArgumentParser()
    p.add_argument("--config", default="config2_retinanet_r50_infer")
    p.add_argument("--data-root", default="")
    p.add_argument("--ann-file", default="")
    p.add_argument("--split", default="val")
    p.add_argument("--dataset", default="",
                   help="override the preset's dataset kind")
    p.add_argument("--checkpoint-dir", default="")
    p.add_argument("--batches", type=int, default=8,
                   help="number of calibration batches (abs-max reduced "
                        "over all of them)")
    p.add_argument("--out", required=True)
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="SECTION.KEY=VALUE")
    args = p.parse_args(argv)

    import dataclasses

    cfg = config_lib.resolve_config(args.config, args.overrides)
    if args.dataset:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, dataset=args.dataset))
    if cfg.model.remat:
        # Calibration is pure inference: model.remat (a training-memory
        # lever) wraps blocks in nn.remat's lifted trace, and the recording
        # interceptor's captured amaxes would leak tracers out of that
        # scope (UnexpectedTracerError — hit by the R101 capstone's
        # resolved config, which trains with remat=true). Param tree is
        # identical either way, so dropping the flag is numerics-neutral.
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, remat=False))
    module, variables, anchors = build_model(cfg.model)
    if args.checkpoint_dir:
        from shape_based_object_detection_tpu.cli.common import (
            restore_checkpoint_variables,
        )

        variables = restore_checkpoint_variables(
            cfg, module, variables, args.checkpoint_dir)

    dataset = build_dataset(cfg, args)
    loader = Loader(dataset, cfg.data.batch_size, cfg.data.max_boxes,
                    shuffle=False)

    def batches():
        for i, batch in enumerate(loader.batches()):
            if i >= args.batches:
                return
            yield batch.images

    amaxes = calibrate_activation_scales(module, variables, batches(),
                                         cfg.data)
    save_activation_scales(args.out, amaxes)
    print(f"wrote {args.out}: {len(amaxes)} conv scales from "
          f"{min(args.batches, len(dataset) // cfg.data.batch_size)} "
          f"batches of {args.config}")


if __name__ == "__main__":
    main()
