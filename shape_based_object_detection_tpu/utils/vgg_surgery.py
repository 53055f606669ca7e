"""VGG fc6/fc7 -> conv6/conv7 decimation surgery (component C21, SURVEY.md §2).

Classification VGG-16 checkpoints ship fc6 (4096 x 512*7*7) and fc7
(4096 x 4096) dense layers; SSD replaces them with a dilated 3x3 conv6 and a
1x1 conv7 (Liu et al. 2016 §3: "convert fc6 and fc7 to convolutional layers,
subsample parameters"). The surgery:

  fc6 weight  (4096, 25088) -> view (4096, 512, 7, 7)
              -> decimate output 4096->1024 (every 4th), spatial 7x7 -> 3x3
                 (every 3rd tap) => conv6 kernel (3, 3, 512, 1024), HWIO
  fc7 weight  (4096, 4096)  -> view (4096, 4096, 1, 1)
              -> decimate both 4096->1024      => conv7 kernel (1, 1, 1024, 1024)

Biases decimate the same way. torchvision is not installed here, so this
operates on raw torch-checkpoint arrays (numpy) and produces flax-layout
kernels directly.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def decimate(arr: np.ndarray, steps) -> np.ndarray:
    """Keep every steps[d]-th entry along each dim (None = keep all)."""
    out = arr
    for d, s in enumerate(steps):
        if s is not None:
            out = np.take(out, np.arange(0, out.shape[d], s), axis=d)
    return out


def vgg_fc_to_ssd_convs(
    fc6_weight: np.ndarray,  # (4096, 25088) torch layout (out, in)
    fc6_bias: np.ndarray,  # (4096,)
    fc7_weight: np.ndarray,  # (4096, 4096)
    fc7_bias: np.ndarray,  # (4096,)
) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """Returns {'conv6': (kernel HWIO, bias), 'conv7': (kernel HWIO, bias)}."""
    in_ch = fc6_weight.shape[1] // 49  # 512 for standard VGG-16
    w6 = fc6_weight.reshape(fc6_weight.shape[0], in_ch, 7, 7)  # (O, I, 7, 7)
    w6 = decimate(w6, [4, None, 3, 3])  # (1024, 512, 3, 3)
    b6 = decimate(fc6_bias, [4])
    w7 = fc7_weight.reshape(fc7_weight.shape[0], fc7_weight.shape[1], 1, 1)
    w7 = decimate(w7, [4, 4, None, None])  # (1024, 1024, 1, 1)
    b7 = decimate(fc7_bias, [4])
    # OIHW -> HWIO (flax)
    return {
        "conv6": (np.transpose(w6, (2, 3, 1, 0)), b6),
        "conv7": (np.transpose(w7, (2, 3, 1, 0)), b7),
    }


def load_pretrained_vgg_into_flax(state_dict, flax_variables):
    """Merge a torch *classification* VGG-16 state_dict (features.* / fc)
    into SSD flax params: conv layers map 1:1 (by position), fc6/fc7 get the
    decimation surgery. Unmatched SSD layers (extras, heads, l2norm) keep
    their fresh initialization. Returns a new variables dict."""
    import jax.numpy as jnp

    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in state_dict.items()}
    # torchvision VGG16 features conv order matches our naming order:
    conv_names = [
        "conv1_1", "conv1_2", "conv2_1", "conv2_2",
        "conv3_1", "conv3_2", "conv3_3",
        "conv4_1", "conv4_2", "conv4_3",
        "conv5_1", "conv5_2", "conv5_3",
    ]
    feat_keys = sorted(
        {k.rsplit(".", 1)[0] for k in sd if k.startswith("features.") and
         k.endswith(".weight")},
        key=lambda s: int(s.split(".")[1]),
    )
    params = dict(flax_variables["params"])
    vgg = {k: dict(v) for k, v in params["vgg"].items()}
    for name, key in zip(conv_names, feat_keys):
        w = np.transpose(sd[f"{key}.weight"], (2, 3, 1, 0))
        b = sd[f"{key}.bias"]
        assert vgg[name]["kernel"].shape == w.shape, (name, w.shape)
        vgg[name] = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}

    fc_keys = sorted(
        {k.rsplit(".", 1)[0] for k in sd if k.startswith("classifier.") and
         k.endswith(".weight")},
        key=lambda s: int(s.split(".")[1]),
    )
    if len(fc_keys) < 2:
        # A features-only checkpoint would silently leave conv6/conv7 at
        # fresh init (half-pretrained trunk, degraded accuracy) — fail loud.
        raise ValueError(
            "state_dict has no classifier.{0,3}.* fc6/fc7 keys — cannot run "
            "the fc->conv decimation surgery; conv6/conv7 would stay "
            f"randomly initialized (found classifier keys: {fc_keys})")
    surg = vgg_fc_to_ssd_convs(
        sd[f"{fc_keys[0]}.weight"], sd[f"{fc_keys[0]}.bias"],
        sd[f"{fc_keys[1]}.weight"], sd[f"{fc_keys[1]}.bias"],
    )
    for name in ("conv6", "conv7"):
        k, b = surg[name]
        assert vgg[name]["kernel"].shape == k.shape, (name, k.shape)
        vgg[name] = {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}

    params["vgg"] = vgg
    out = dict(flax_variables)
    out["params"] = params
    return out
