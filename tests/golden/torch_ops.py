"""Torch-CPU golden implementations of the numeric contracts (SURVEY.md §4).

The reference repo was unreadable (empty mount — SURVEY.md §0), so these are
independent, straightforward torch implementations of the SSD/RetinaNet-family
math (Liu et al. 2016; Lin et al. 2017), written to be obviously correct
(python loops allowed — they only run in tests). The JAX framework must match
them within the BASELINE parity bar (box-IoU 0.99 / score 1e-3).
"""

from __future__ import annotations

import torch


def cxcywh_to_xyxy(b: torch.Tensor) -> torch.Tensor:
    cx, cy, w, h = b.unbind(-1)
    return torch.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def xyxy_to_cxcywh(b: torch.Tensor) -> torch.Tensor:
    x0, y0, x1, y1 = b.unbind(-1)
    return torch.stack([(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], -1)


def iou_matrix(a: torch.Tensor, b: torch.Tensor) -> torch.Tensor:
    """(N,4) x (M,4) xyxy -> (N,M)."""
    lt = torch.max(a[:, None, :2], b[None, :, :2])
    rb = torch.min(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = ((a[:, 2] - a[:, 0]).clamp(min=0) * (a[:, 3] - a[:, 1]).clamp(min=0))
    area_b = ((b[:, 2] - b[:, 0]).clamp(min=0) * (b[:, 3] - b[:, 1]).clamp(min=0))
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / union.clamp(min=1e-8)


def encode(gt_cxcywh: torch.Tensor, anchors: torch.Tensor, variances=(0.1, 0.2)):
    vc, vs = variances
    t_cxcy = (gt_cxcywh[..., :2] - anchors[..., :2]) / (anchors[..., 2:] * vc)
    t_wh = torch.log(gt_cxcywh[..., 2:] / anchors[..., 2:]) / vs
    return torch.cat([t_cxcy, t_wh], -1)


def decode(offsets: torch.Tensor, anchors: torch.Tensor, variances=(0.1, 0.2)):
    vc, vs = variances
    cxcy = anchors[..., :2] + offsets[..., :2] * vc * anchors[..., 2:]
    wh = anchors[..., 2:] * torch.exp(offsets[..., 2:] * vs)
    return torch.cat([cxcy, wh], -1)


def shape_similarity(a_cxcywh: torch.Tensor, b_cxcywh: torch.Tensor, tau=1.0):
    la = torch.log(a_cxcywh[:, 2:].clamp(min=1e-8))
    lb = torch.log(b_cxcywh[:, 2:].clamp(min=1e-8))
    d = (la[:, None, :] - lb[None, :, :]).abs().sum(-1)
    return torch.exp(-d / tau)


def nms(boxes_xyxy: torch.Tensor, scores: torch.Tensor, iou_threshold: float):
    """Classic greedy NMS; returns keep indices in score order."""
    order = scores.argsort(descending=True)
    keep = []
    suppressed = torch.zeros(len(boxes_xyxy), dtype=torch.bool)
    for i in order.tolist():
        if suppressed[i]:
            continue
        keep.append(i)
        ious = iou_matrix(boxes_xyxy[i : i + 1], boxes_xyxy)[0]
        suppressed |= ious >= iou_threshold
    return torch.tensor(keep, dtype=torch.long)


def match_anchors(
    anchors_cxcywh: torch.Tensor,
    gt_xyxy: torch.Tensor,
    gt_labels: torch.Tensor,
    pos_t: float,
    neg_t: float,
    shape_weight: float = 0.0,
    shape_tau: float = 1.0,
    force_match: bool = True,
):
    """Sequential-reference matcher. Returns (cls_targets, best_gt, quality)."""
    a_xyxy = cxcywh_to_xyxy(anchors_cxcywh)
    gt_cxcywh = xyxy_to_cxcywh(gt_xyxy)
    q = iou_matrix(a_xyxy, gt_xyxy)
    if shape_weight > 0:
        q = (1 - shape_weight) * q + shape_weight * shape_similarity(
            anchors_cxcywh, gt_cxcywh, shape_tau
        )
    best_q, best_g = q.max(dim=1)
    if force_match and len(gt_xyxy) > 0:
        for g in range(len(gt_xyxy)):
            a_star = q[:, g].argmax()
            best_g[a_star] = g
            best_q[a_star] = 2.0
    labels = gt_labels[best_g].clone()
    labels[best_q < pos_t] = -1  # provisional ignore
    labels[best_q < neg_t] = 0
    return labels, best_g, best_q


def multibox_loss(
    cls_logits: torch.Tensor,  # (B, A, C+1)
    reg_preds: torch.Tensor,  # (B, A, 4)
    cls_targets: torch.Tensor,  # (B, A) in {-1, 0, 1..C}
    reg_targets: torch.Tensor,  # (B, A, 4)
    neg_pos_ratio: float = 3.0,
    beta: float = 1.0,
):
    pos = cls_targets > 0
    n_pos = pos.sum().clamp(min=1).float()

    diff = (reg_preds - reg_targets).abs()
    sl1 = torch.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    loc = sl1.sum(-1)[pos].sum() / n_pos

    logp = torch.log_softmax(cls_logits, dim=-1)
    ce = -logp.gather(-1, cls_targets.clamp(min=0)[..., None].long())[..., 0]
    conf = ce[pos].sum()
    for b in range(cls_logits.shape[0]):
        neg = cls_targets[b] == 0
        k = int(min(neg_pos_ratio * pos[b].sum().item(), neg.sum().item()))
        if k > 0:
            conf = conf + ce[b][neg].topk(k).values.sum()
    conf = conf / n_pos
    return conf + loc, conf, loc


def focal_loss(
    cls_logits: torch.Tensor,  # (B, A, C)
    reg_preds: torch.Tensor,
    cls_targets: torch.Tensor,  # (B, A) in {-1, 0, 1..C}
    reg_targets: torch.Tensor,
    alpha: float = 0.25,
    gamma: float = 2.0,
    beta: float = 1.0,
):
    c = cls_logits.shape[-1]
    pos = cls_targets > 0
    n_pos = pos.sum().clamp(min=1).float()

    onehot = torch.zeros_like(cls_logits)
    fg = cls_targets > 0
    onehot[fg] = torch.nn.functional.one_hot(
        (cls_targets[fg] - 1).long(), c
    ).float()
    p = torch.sigmoid(cls_logits)
    bce = torch.nn.functional.binary_cross_entropy_with_logits(
        cls_logits, onehot, reduction="none"
    )
    p_t = p * onehot + (1 - p) * (1 - onehot)
    a_t = alpha * onehot + (1 - alpha) * (1 - onehot)
    fl = a_t * (1 - p_t) ** gamma * bce
    fl = fl[(cls_targets >= 0)].sum() / n_pos

    diff = (reg_preds - reg_targets).abs()
    sl1 = torch.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    loc = sl1.sum(-1)[pos].sum() / n_pos
    return fl + loc, fl, loc
