"""Serving quickstart: the three production inference surfaces.

1. `Predictor` — in-process fixed-batch serving with submit/poll overlap.
2. int8 weight-only quantized Predictor (small-batch latency configuration).
3. AOT export -> `.sbdx` StableHLO artifact -> load and run with NO model
   code (what a fleet serving binary would ship).

Runs on CPU or TPU with a tiny model so it finishes in ~a minute:

    python examples/serving_quickstart.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shape_based_object_detection_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import numpy as np


def main():
    from shape_based_object_detection_tpu import config as config_lib
    from shape_based_object_detection_tpu import export as export_lib
    from shape_based_object_detection_tpu.serving import Predictor

    cfg = config_lib.get_config("tiny_retinanet")
    rng = np.random.default_rng(0)
    images = [rng.integers(0, 255, (240, 320, 3)).astype(np.uint8)
              for _ in range(3)]

    # 1. plain Predictor: pads to the compiled batch, returns per-image
    #    detections in original pixel coordinates
    pred = Predictor(cfg, batch_size=4, min_score=0.0)
    for i, det in enumerate(pred.predict(images)):
        print(f"predictor  image {i}: {len(det.scores)} detections")

    # submit/poll overlap: device runs batch N while the host prepares N+1
    pred.submit(images)
    # ... host-side work here ...
    results = pred.poll()
    print(f"submit/poll: {sum(len(r.scores) for r in results)} detections")

    # 2. the same surface with int8 weight-only quantized params, and the
    #    full-int8 mode (dynamic-int8 activations on the MXU as well)
    qpred = Predictor(cfg, batch_size=4, min_score=0.0, quantize=True)
    qdet = qpred.predict(images)
    print(f"quantized  : {sum(len(r.scores) for r in qdet)} detections")
    fpred = Predictor(cfg, batch_size=4, min_score=0.0, quantize="full")
    fdet = fpred.predict(images)
    print(f"full-int8  : {sum(len(r.scores) for r in fdet)} detections")

    # 3. AOT export: a self-contained .sbdx blob (weights + whole detect()
    #    program as versioned StableHLO); loading needs no config/model code
    blob = export_lib.export_from_config(cfg, batch_size=2,
                                         platforms=("cpu",), quantize=True)
    path = os.path.join(tempfile.mkdtemp(), "tiny.sbdx")
    export_lib.save_artifact(blob, path)
    loaded = export_lib.load_artifact(path)
    size = loaded.header["image_size"]
    batch = np.stack([np.zeros((size, size, 3), np.uint8)] * 2)
    det = loaded(batch)
    print(f"artifact   : {path} ({len(blob)/1e6:.1f} MB, "
          f"quantized={loaded.header['quantized']}), "
          f"output boxes {tuple(det.boxes.shape)}")


if __name__ == "__main__":
    main()
