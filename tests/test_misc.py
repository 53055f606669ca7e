"""Coordinate mapping, grain adapter, serving Predictor, compile stability."""

import numpy as np
import jax
import jax.numpy as jnp

from shape_based_object_detection_tpu.ops import boxes as B


def test_boxes_to_original_plain():
    boxes = jnp.asarray([[0.1, 0.2, 0.5, 0.8]])
    out = np.asarray(B.boxes_to_original(boxes, orig_h=200, orig_w=100))
    np.testing.assert_allclose(out[0], [10, 40, 50, 160])


def test_boxes_to_original_letterboxed():
    # 200h x 100w image letterboxed into a square: content occupies left half
    boxes = jnp.asarray([[0.1, 0.2, 0.4, 0.8]])
    out = np.asarray(B.boxes_to_original(boxes, orig_h=200, orig_w=100,
                                         letterboxed=True))
    np.testing.assert_allclose(out[0], [20, 40, 80, 160])
    # boxes reaching into the padding clip to the image
    wide = jnp.asarray([[0.1, 0.2, 0.9, 0.8]])
    out2 = np.asarray(B.boxes_to_original(wide, orig_h=200, orig_w=100,
                                          letterboxed=True))
    assert out2[0, 2] == 100.0


def test_grain_pipeline_adapter():
    from shape_based_object_detection_tpu.data.synthetic import SyntheticDetection
    from shape_based_object_detection_tpu.data.grain_pipeline import (
        make_grain_iterator,
    )

    ds = SyntheticDetection(size=32, num_images=12)
    batches = list(make_grain_iterator(ds, batch_size=4, max_boxes=6,
                                       num_epochs=1, shuffle=False))
    assert len(batches) == 3
    assert batches[0].images.shape == (4, 32, 32, 3)
    assert batches[0].boxes.shape == (4, 6, 4)
    # host sharding splits the index space
    b0 = list(make_grain_iterator(ds, 2, 6, num_epochs=1, shuffle=False,
                                  host_id=0, num_hosts=2))
    b1 = list(make_grain_iterator(ds, 2, 6, num_epochs=1, shuffle=False,
                                  host_id=1, num_hosts=2))
    assert len(b0) == len(b1) == 3


def test_metrics_logger():
    from shape_based_object_detection_tpu.utils.metrics import MetricsLogger

    logger = MetricsLogger(log_every=2)
    assert logger.update(1, {"loss": 1.0}, batch_size=4) is None
    line = logger.update(2, {"loss": 3.0}, batch_size=4)
    assert line is not None and "loss=2.0000" in line


def test_nan_debug_mode():
    from shape_based_object_detection_tpu.utils.debug import nan_debug_mode

    with nan_debug_mode():
        assert jax.config.jax_debug_nans
        try:
            jax.jit(lambda x: x / 0.0 * 0.0)(jnp.float32(1.0))
            raised = False
        except FloatingPointError:
            raised = True
        assert raised
    assert not jax.config.jax_debug_nans


def test_compile_once_helper():
    from shape_based_object_detection_tpu.utils.debug import assert_compiles_once

    f = jax.jit(lambda x: x * 2)
    assert_compiles_once(
        f,
        (jnp.zeros((4, 4)),),
        (jnp.ones((4, 4)),),  # same shape -> same program
    )


def test_torch_convert_roundtrip(rng):
    """flax -> torch state_dict -> flax is the identity (converter inverse)."""
    import torch

    from shape_based_object_detection_tpu import config as config_lib
    from shape_based_object_detection_tpu.models.factory import build_model
    from shape_based_object_detection_tpu.utils.torch_convert import (
        flax_params_to_torch_state_dict, torch_state_dict_to_flax,
    )

    cfg = config_lib.tiny_test_model("retinanet")
    module, variables, _ = build_model(cfg)
    sd = flax_params_to_torch_state_dict(variables)
    assert any(k.endswith(".weight") for k in sd)
    back = torch_state_dict_to_flax(
        {k: torch.from_numpy(v.copy()) for k, v in sd.items()}, variables)
    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_benchmark_fn():
    from shape_based_object_detection_tpu.utils.metrics import benchmark_fn

    f = jax.jit(lambda x: x * 2)
    out = benchmark_fn(f, jnp.ones((8, 8)), warmup=1, iters=3)
    assert out["seconds_per_call"] > 0
    assert out["calls_per_sec"] > 0


def test_package_import_initializes_no_backend():
    """Importing the package must not create a JAX backend client: on the
    axon runtime, import-time backend init means creating a TPU client in
    every subprocess that touches the library (observed hanging in
    make_c_api_client). Regression guard for the module-level jnp-constant
    landmine (data/augment.py)."""
    import subprocess
    import sys

    prog = (
        "import shape_based_object_detection_tpu\n"
        "import shape_based_object_detection_tpu.data.augment\n"
        "import shape_based_object_detection_tpu.detection\n"
        "from jax._src import xla_bridge\n"
        "assert not xla_bridge._backends, xla_bridge._backends\n"
        "print('clean-import')\n"
    )
    r = subprocess.run([sys.executable, "-c", prog], capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "clean-import" in r.stdout


def test_benchmark_fn_warmup_zero():
    """warmup=0 (cold-compile measurement) must not NameError (review
    finding)."""
    from shape_based_object_detection_tpu.utils.metrics import benchmark_fn

    out = benchmark_fn(jax.jit(lambda x: x + 1), jnp.ones((4,)),
                       warmup=0, iters=2)
    assert out["seconds_per_call"] > 0


def test_compilation_cache_repoints_on_new_dir(tmp_path):
    """A second enable_compilation_cache(dir2) call must actually re-point
    the jax config at dir2, not return an unconfigured path (review
    finding)."""
    from shape_based_object_detection_tpu.utils import cache as cache_lib

    p1 = cache_lib.enable_compilation_cache(str(tmp_path / "a"))
    assert jax.config.jax_compilation_cache_dir == p1
    p2 = cache_lib.enable_compilation_cache(str(tmp_path / "b"))
    assert p2 != p1
    assert jax.config.jax_compilation_cache_dir == p2
