"""Convert torch checkpoints into framework params (component C21 CLI).

Supports two input layouts:
- framework-mirror state_dicts (the golden-model naming) -> full conversion
- torchvision classification VGG-16 -> backbone merge + fc6/fc7 decimation
  surgery (SSD models only)

    python tools/convert_checkpoint.py --model ssd300 --torch-ckpt vgg16.pth \
        --mode vgg_backbone --out /tmp/ssd300_params
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shape_based_object_detection_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()


def main(argv=None):
    import torch
    import orbax.checkpoint as ocp

    from shape_based_object_detection_tpu import config as config_lib
    from shape_based_object_detection_tpu.models.factory import build_model
    from shape_based_object_detection_tpu.utils.torch_convert import (
        torch_state_dict_to_flax,
    )
    from shape_based_object_detection_tpu.utils.vgg_surgery import (
        load_pretrained_vgg_into_flax,
    )

    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ssd300")
    p.add_argument("--torch-ckpt", required=True)
    p.add_argument("--mode", choices=["mirror", "vgg_backbone"],
                   default="mirror")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    cfg = config_lib.get_config(args.model)
    module, variables, _ = build_model(cfg.model)

    sd = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    if args.mode == "mirror":
        variables = torch_state_dict_to_flax(sd, variables)
    else:
        variables = load_pretrained_vgg_into_flax(sd, variables)

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.out), variables)
    ckptr.wait_until_finished()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
