"""Pallas TPU kernel for anchor<->GT matching (component C13 hot path).

The jnp matcher (ops/matching.py) materializes the (A, G) quality matrix in
HBM, reads it back for three reductions, then GATHERS per-anchor matched GT
rows from tiny (G,) tables — and those vmapped small-table gathers lower to
a slow TPU path (measured ~10 ms of a 15 ms match at RetinaNet-512 b16
shapes, B=16, A=49k, G=100). This kernel computes quality tiles on the fly
in VMEM (G on the 128-wide sublanes, an anchor tile on the lanes) and emits
everything the assignment epilogue needs, with no (A, G) HBM traffic and no
gathers:

  best_q  (B, A)    — max_g quality      (per-anchor match quality)
  best_g  (B, A)    — argmax_g quality   (per-anchor matched GT, first-max)
  gt_a    (B, G)    — argmax_a quality   (per-GT best anchor, force-match)
  label   (B, A)    — matched GT's class label
  reg     (B, A, 4) — encoded (cx cy w h) offsets to the matched GT

Matched-row values are extracted with the iota/one-hot reduction trick (as
in ops/nms_pallas.py) instead of gathers; the per-GT reductions accumulate
across anchor tiles in the resident output block (the grid iterates anchor
tiles innermost, so the (b, :) block stays in VMEM for the whole sweep) with
strict-greater updates preserving jnp.argmax's first-index tie semantics.
All arithmetic replicates ops/matching.py + ops/boxes.py op-for-op, so
assignments are bit-identical between backends (tests cross-check).

The remaining epilogue (force-match fix-ups for <=G anchors per image,
thresholding) is O(A) elementwise + O(G) scatters in ops/matching.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-8
_LANES = 128

# Anchor-tile size: bigger tiles amortize grid/dispatch overhead (measured
# 1x v5e, B=16 A=49k gp=128: TA 512 -> 5.82 ms, 1024 -> 5.35, 2048 -> 4.75,
# 3072 -> 4.61, 4096 -> VMEM OOM at the 16 MB scoped limit, 19.1 MB). The
# kernel's live VMEM scales with gp*TA (~40 B/element from that OOM
# datapoint incl. double buffering), so the tile adapts to the padded GT
# count with a conservative budget instead of a fixed constant.
_VMEM_BUDGET_BYTES = 14 * 1024 * 1024
_BYTES_PER_QELEM = 40


def _pick_tile_a(gp: int) -> int:
    for ta in (2048, 1024, 512):
        if _BYTES_PER_QELEM * gp * ta <= _VMEM_BUDGET_BYTES:
            return ta
    return 256

# anchor pack rows (16, A): xyxy corners, area, log w/h, cxcywh
_A_X0, _A_Y0, _A_X1, _A_Y1, _A_AREA, _A_LW, _A_LH = range(7)
_A_CX, _A_CY, _A_W, _A_H = range(7, 11)
_A_ROWS = 16
# gt pack cols (B, G, 16): xyxy, area, log w/h, valid, cxcywh, label
_G_X0, _G_Y0, _G_X1, _G_Y1, _G_AREA, _G_LW, _G_LH, _G_VALID = range(8)
_G_CX, _G_CY, _G_W, _G_H, _G_LABEL = range(8, 13)
_G_COLS = 16


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _match_kernel(anc_ref, gt_ref, bq_ref, bg_ref, gq_ref, ga_ref, lbl_ref,
                  reg_ref, *, shape_weight: float, tau: float, a_real: int,
                  tile_a: int, vc: float, vs: float):
    ia = pl.program_id(1)
    anc = anc_ref[:, :]  # (16, TA)
    ax0, ay0 = anc[_A_X0:_A_X0 + 1], anc[_A_Y0:_A_Y0 + 1]  # (1, TA)
    ax1, ay1 = anc[_A_X1:_A_X1 + 1], anc[_A_Y1:_A_Y1 + 1]
    a_area = anc[_A_AREA:_A_AREA + 1]
    a_lw, a_lh = anc[_A_LW:_A_LW + 1], anc[_A_LH:_A_LH + 1]
    g = gt_ref[0]  # (Gp, 16)
    gx0, gy0 = g[:, _G_X0:_G_X0 + 1], g[:, _G_Y0:_G_Y0 + 1]  # (Gp, 1)
    gx1, gy1 = g[:, _G_X1:_G_X1 + 1], g[:, _G_Y1:_G_Y1 + 1]
    g_area = g[:, _G_AREA:_G_AREA + 1]
    g_lw, g_lh = g[:, _G_LW:_G_LW + 1], g[:, _G_LH:_G_LH + 1]
    g_valid = g[:, _G_VALID:_G_VALID + 1]

    iw = jnp.clip(jnp.minimum(ax1, gx1) - jnp.maximum(ax0, gx0), 0.0, None)
    ih = jnp.clip(jnp.minimum(ay1, gy1) - jnp.maximum(ay0, gy0), 0.0, None)
    inter = iw * ih  # (Gp, TA)
    q = inter / jnp.maximum(a_area + g_area - inter, _EPS)
    if shape_weight > 0.0:
        d = jnp.abs(a_lw - g_lw) + jnp.abs(a_lh - g_lh)
        q = (1.0 - shape_weight) * q + shape_weight * jnp.exp(-d / tau)
    q = jnp.where(g_valid > 0.0, q, -1.0)

    gp, ta = q.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (gp, ta), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (gp, ta), 0)
    # padding anchors (beyond the real anchor count) must never win a per-GT
    # argmax; -2 keeps them below the -1 invalid-GT floor too
    q = jnp.where(ia * tile_a + lane < a_real, q, -2.0)

    # per-anchor reductions over the GT (sublane) axis; ties -> lowest index
    col_max = jnp.max(q, axis=0, keepdims=True)  # (1, TA)
    best_g = jnp.min(jnp.where(q == col_max, row, gp), axis=0,
                     keepdims=True)  # (1, TA)
    bq_ref[0, 0, :] = col_max[0, :]
    bg_ref[0, 0, :] = best_g[0, :].astype(jnp.int32)

    # matched-GT values via one-hot reduction (no gathers on TPU)
    onehot = (row == best_g).astype(jnp.float32)  # (Gp, TA), one 1 per column

    def pick(col):
        return jnp.sum(onehot * g[:, col:col + 1], axis=0, keepdims=True)

    lbl_ref[0, 0, :] = pick(_G_LABEL)[0, :].astype(jnp.int32)

    # encode the matched box against the anchor (ops/boxes.py encode_boxes,
    # variances (vc, vs)) entirely in VMEM
    a_cx, a_cy = anc[_A_CX:_A_CX + 1], anc[_A_CY:_A_CY + 1]
    a_w, a_h = anc[_A_W:_A_W + 1], anc[_A_H:_A_H + 1]
    m_cx, m_cy = pick(_G_CX), pick(_G_CY)  # (1, TA)
    m_w, m_h = pick(_G_W), pick(_G_H)
    sw = jnp.maximum(a_w, _EPS)
    sh = jnp.maximum(a_h, _EPS)
    reg_ref[0, :, 0] = ((m_cx - a_cx) / (sw * vc))[0, :]
    reg_ref[0, :, 1] = ((m_cy - a_cy) / (sh * vc))[0, :]
    reg_ref[0, :, 2] = (jnp.log(jnp.maximum(m_w, _EPS) / sw) / vs)[0, :]
    reg_ref[0, :, 3] = (jnp.log(jnp.maximum(m_h, _EPS) / sh) / vs)[0, :]

    # per-GT reductions over the anchor (lane) axis, accumulated across tiles
    row_max = jnp.max(q, axis=1, keepdims=True)  # (Gp, 1)
    local_a = jnp.min(jnp.where(q == row_max, lane, ta), axis=1)  # (Gp,)
    tile_arg = (ia * tile_a + local_a).astype(jnp.int32)
    tile_max = row_max[:, 0]

    @pl.when(ia == 0)
    def _():
        gq_ref[0, 0, :] = tile_max
        ga_ref[0, 0, :] = tile_arg

    @pl.when(ia > 0)
    def _():
        prev = gq_ref[0, 0, :]
        better = tile_max > prev  # strict: earlier tile wins ties
        gq_ref[0, 0, :] = jnp.where(better, tile_max, prev)
        ga_ref[0, 0, :] = jnp.where(better, tile_arg, ga_ref[0, 0, :])


def _pack_boxes_xyxy(xyxy: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) xyxy -> (..., 7) [x0 y0 x1 y1 area log_w log_h], f32."""
    xyxy = xyxy.astype(jnp.float32)
    w = xyxy[..., 2] - xyxy[..., 0]
    h = xyxy[..., 3] - xyxy[..., 1]
    area = jnp.clip(w, 0.0, None) * jnp.clip(h, 0.0, None)
    log_w = jnp.log(jnp.maximum(w, _EPS))
    log_h = jnp.log(jnp.maximum(h, _EPS))
    return jnp.concatenate(
        [xyxy, area[..., None], log_w[..., None], log_h[..., None]], axis=-1)


@functools.partial(jax.jit, static_argnames=("shape_weight", "tau",
                                             "variances", "interpret"))
def match_reductions_pallas(
    anchors_cxcywh: jnp.ndarray,  # (A, 4)
    gt_boxes_xyxy: jnp.ndarray,  # (B, G, 4)
    gt_labels: jnp.ndarray,  # (B, G) int32
    gt_valid: jnp.ndarray,  # (B, G) bool
    shape_weight: float = 0.0,
    tau: float = 1.0,
    variances=(0.1, 0.2),
    interpret: bool = False,
):
    """Fused match reductions + matched-value extraction. Returns
    (best_q, best_g, gt_a, matched_label, reg_targets) of shapes
    (B, A), (B, A) i32, (B, G) i32, (B, A) i32, (B, A, 4) — numerically
    identical to reducing ops/matching.py's quality matrix and encoding the
    gathered matches (first-index tie-breaking)."""
    from shape_based_object_detection_tpu.ops import boxes as box_ops

    b, g_n = gt_valid.shape
    a_n = anchors_cxcywh.shape[0]
    gp = _round_up(max(g_n, _LANES), _LANES)
    tile_a = _pick_tile_a(gp)
    ap = _round_up(max(a_n, tile_a), tile_a)

    # area from the xyxy corners (exactly box_area(cxcywh_to_xyxy(a)), as the
    # jnp IoU path computes it) but log w/h from the ORIGINAL cxcywh extents
    # (as the jnp shape_similarity path does) — keeps both terms bit-identical
    # to ops/matching.py so tie-breaking can never diverge between backends
    anchors_f = anchors_cxcywh.astype(jnp.float32)
    anc7 = _pack_boxes_xyxy(box_ops.cxcywh_to_xyxy(anchors_f))  # (A, 7)
    a_wh = anchors_f[:, 2:4]
    anc7 = anc7.at[:, _A_LW:_A_LH + 1].set(jnp.log(jnp.maximum(a_wh, _EPS)))
    anc_pack = jnp.concatenate([anc7, anchors_f], axis=-1)  # (A, 11)
    anc_pack = jnp.pad(anc_pack, ((0, ap - a_n), (0, _A_ROWS - 11))).T

    gt7 = _pack_boxes_xyxy(gt_boxes_xyxy)  # (B, G, 7)
    gt_pack = jnp.concatenate([
        gt7,
        gt_valid[..., None].astype(jnp.float32),
        box_ops.xyxy_to_cxcywh(gt_boxes_xyxy.astype(jnp.float32)),
        gt_labels[..., None].astype(jnp.float32),
    ], axis=-1)  # (B, G, 13)
    gt_pack = jnp.pad(gt_pack,
                      ((0, 0), (0, gp - g_n), (0, _G_COLS - 13)))

    kernel = functools.partial(
        _match_kernel, shape_weight=float(shape_weight), tau=float(tau),
        a_real=a_n, tile_a=tile_a, vc=float(variances[0]),
        vs=float(variances[1]))
    n_tiles = ap // tile_a
    vmem = pltpu.VMEM
    best_q, best_g, _gt_q, gt_a, label, reg = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((_A_ROWS, tile_a), lambda i, j: (0, j),
                         memory_space=vmem),
            pl.BlockSpec((1, gp, _G_COLS), lambda i, j: (i, 0, 0),
                         memory_space=vmem),
        ],
        out_specs=[
            # (B, 1, N) with block (1, 1, tile): TPU lowering needs the
            # block's second-to-last dim to be 8-divisible or span the array
            pl.BlockSpec((1, 1, tile_a), lambda i, j: (i, 0, j),
                         memory_space=vmem),
            pl.BlockSpec((1, 1, tile_a), lambda i, j: (i, 0, j),
                         memory_space=vmem),
            pl.BlockSpec((1, 1, gp), lambda i, j: (i, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, 1, gp), lambda i, j: (i, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, 1, tile_a), lambda i, j: (i, 0, j),
                         memory_space=vmem),
            pl.BlockSpec((1, tile_a, 4), lambda i, j: (i, j, 0),
                         memory_space=vmem),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, ap), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, ap), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, gp), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, gp), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, ap), jnp.int32),
            jax.ShapeDtypeStruct((b, ap, 4), jnp.float32),
        ],
        interpret=interpret,
    )(anc_pack, gt_pack)
    return (best_q[:, 0, :a_n], best_g[:, 0, :a_n], gt_a[:, 0, :g_n],
            label[:, 0, :a_n], reg[:, :a_n, :])
