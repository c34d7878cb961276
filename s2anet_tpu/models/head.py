"""S2ANet head: FAM -> anchor refinement -> AlignConv -> ORConv -> ODM.

TPU-first re-design of /root/reference/models/head.py:55-726:

  * the network forward (:class:`S2ANetHead`) is a flax module whose conv
    stacks are shared across the 5 FPN levels (RetinaNet-style, as in the
    reference) and whose per-level anchor grids constant-fold at trace time;
  * the loss (:func:`compute_s2anet_loss`) replaces the reference's
    per-image / per-gt Python loops (head.py:439-546) with batched masked
    tensor ops over padded gt arrays — one fixed-shape program end to end;
  * inference decoding (:func:`s2anet_get_bboxes`, head.py:648-726) uses
    fixed-K top-k prefilters and the masked on-device NMS, so a whole batch
    decodes inside one jit region.

Only ODM outputs feed inference; FAM participates in the loss only
(head.py:656-658).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.deform_conv import align_conv_offsets, deform_conv2d
from ..ops.pallas.deform_kernel import MARGIN as HAT_MARGIN
from ..ops.pallas.deform_kernel import deform_conv2d_hat, hat_kernel_supported
from ..ops.nms_rotated import multiclass_nms_rotated
from ..ops.orn import rotate_arf, rotation_invariant_pooling
from ..ops.rbox import rboxes_decode, rboxes_encode
from .anchors import grid_anchors
from .assigner import assign_labels
from .losses import focal_loss_with_logits, smooth_l1_loss

_conv_init = nn.initializers.normal(0.01)


def _spatial_hat(hat, mesh, clamp: float):
    """Wrap a hat-deform callable for HEIGHT-sharded inputs (spatial whole-
    image inference, parallel/spatial.py) via shard_map + halo exchange.

    With offsets clamped to ``c`` cells, an output row r samples only rows
    within ``r +- (c + 2)`` (kernel pad 1 + bilinear support 1), so each
    shard needs a ``c + 2``-row halo from its neighbors: two ``ppermute``s
    move the boundary rows, the kernel runs per shard on the extended
    block (halo output rows, computed against dummy offsets, are sliced
    off), and edge shards' missing halos arrive as ppermute zero-fill —
    exactly the kernel's zero-pad image-boundary semantics. Levels whose
    per-shard height is at most the halo all-gather instead (stride >= 64
    maps are tiny). GSPMD cannot partition the Pallas custom call at all —
    this manual region is what keeps the 4-5x hat win in spatial mode.
    """
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    n = mesh.devices.size
    halo = int(math.ceil(clamp)) + 2

    def body(xs, os, wt):
        hs = xs.shape[1]
        if hs <= halo:
            # shard too thin for a one-hop halo: rebuild the full (tiny)
            # level on every shard and keep this shard's output rows
            xf = jax.lax.all_gather(xs, axis, axis=1, tiled=True)
            of = jax.lax.all_gather(os, axis, axis=1, tiled=True)
            yf = hat(xf, of, wt)
            row0 = jax.lax.axis_index(axis) * hs
            return jax.lax.dynamic_slice_in_dim(yf, row0, hs, axis=1)
        up = jax.lax.ppermute(xs[:, -halo:], axis,
                              [(i, i + 1) for i in range(n - 1)])
        dn = jax.lax.ppermute(xs[:, :halo], axis,
                              [(i + 1, i) for i in range(n - 1)])
        xext = jnp.concatenate([up, xs, dn], axis=1)
        # halo output rows get zero offsets (any in-window dummy works:
        # their outputs are sliced off); offsets may be [B,H,W,KK,2] or
        # flat [B,H,W,KK*2], so pad axis 1 rank-generically
        oext = jnp.pad(os, ((0, 0), (halo, halo))
                       + ((0, 0),) * (os.ndim - 2))
        return hat(xext, oext, wt)[:, halo:-halo]

    spec = P(None, axis, None, None)
    return jax.shard_map(body, mesh=mesh, in_specs=(spec, spec, P()),
                         out_specs=spec, check_vma=False)


def _bias_init_with_prob(prob: float) -> float:
    return -math.log((1 - prob) / prob)


class _ConvStack(nn.Module):
    """N x (3x3 conv + ReLU)."""

    feat_channels: int
    n: int
    dtype: Optional[Any] = None
    quant: str = "none"       # int8 PTQ mode (ops/quant.py)
    range_slots: int = 1      # per-call-site activation ranges (FPN levels)

    @nn.compact
    def __call__(self, x, slot: int = 0):
        from ..ops.quant import conv_ctor

        quantized = self.quant in ("calib", "int8")
        Conv = conv_ctor(self.quant, self.range_slots)
        dtype = self.dtype if self.dtype is not None else x.dtype
        for i in range(self.n):
            conv = Conv(self.feat_channels, (3, 3), padding="SAME",
                        kernel_init=_conv_init, dtype=dtype,
                        name=f"conv{i}")
            x = conv(x, slot) if quantized else conv(x)
            x = nn.relu(x)
        return x


class S2ANetHead(nn.Module):
    num_classes: int = 15
    feat_channels: int = 256
    stacked_convs: int = 2
    with_orconv: bool = True
    n_orientations: int = 8
    featmap_strides: Sequence[int] = (8, 16, 32, 64, 128)
    anchor_scales: Sequence[float] = (4.0,)
    anchor_ratios: Sequence[float] = (1.0,)
    anchor_angles: Sequence[float] = (0.0,)
    # computation dtype for all head convs; None = each call computes in the
    # incoming feature dtype (bf16 train/eval path, f32 in parity tests)
    dtype: Optional[Any] = None
    # AlignConv implementation: "gather" = XLA bilinear patch-gather
    # (ops/deform_conv.py), "hat" = Pallas hat-matmul kernel with exact
    # gather fallback via lax.cond (ops/pallas/deform_kernel.py), "auto" =
    # hat on TPU, gather elsewhere
    deform_impl: str = "auto"
    # clamp AlignConv sampling offsets to +-N cells (0 = off); see
    # ModelConfig.align_offset_clamp for the rationale
    align_offset_clamp: float = 0.0
    # on a >1-device mesh GSPMD cannot partition the hat kernel's Pallas
    # custom call; when set, the hat AlignConv runs under a jax.shard_map
    # over the mesh's (leading) axis on the batch dim — AlignConv is
    # per-image, so the batch split needs no halos or collectives
    deform_mesh: Optional[Any] = None
    # the inputs are HEIGHT-sharded over deform_mesh instead of batch-
    # sharded (spatial whole-image inference, parallel/spatial.py): the
    # hat kernel runs under a halo-exchange shard_map (:func:`_spatial_hat`).
    # Requires 0 < align_offset_clamp <= margin-2 (the halo bound).
    deform_spatial: bool = False
    # int8 PTQ mode (ops/quant.py); `quant_scope` selects WHICH head parts
    # quantize: "head_stacks" (FAM/ODM conv stacks), "heads" (the 1x1/3x3
    # prediction heads), "orconv" (the ARF conv, whose per-output-channel
    # weight scales absorb the rotation exactly). All quantized activation
    # ranges are PER FPN LEVEL (the stacks are weight-shared across levels;
    # a union range would grid every level by the loudest one). The
    # AlignConv always stays float — the deformable sampling rides the
    # bf16 hat kernel.
    quant: str = "none"
    quant_scope: Sequence[str] = ("backbone", "neck", "head_stacks")

    def setup(self):
        from ..ops.quant import conv_ctor, scope_has

        nlv = len(self.featmap_strides)
        q_on = self.quant in ("calib", "int8")
        q_stacks = self.quant if scope_has(self.quant_scope, "head_stacks") else "none"
        q_heads = self.quant if scope_has(self.quant_scope, "heads") else "none"
        Conv = conv_ctor(q_heads, range_slots=nlv)
        fc = self.feat_channels
        nc = self.num_classes
        self.fam_reg_ls = _ConvStack(fc, self.stacked_convs, dtype=self.dtype, quant=q_stacks, range_slots=nlv, name="fam_reg_ls")
        self.fam_cls_ls = _ConvStack(fc, self.stacked_convs, dtype=self.dtype, quant=q_stacks, range_slots=nlv, name="fam_cls_ls")
        # FAM output heads are 1x1, ODM heads are 3x3 (head.py:205-227)
        self.fam_reg_head = Conv(5, (1, 1), kernel_init=_conv_init,
                                 dtype=self.dtype, name="fam_reg_head")
        self.fam_cls_head = Conv(
            nc, (1, 1), kernel_init=_conv_init,
            bias_init=nn.initializers.constant(_bias_init_with_prob(0.01)),
            dtype=self.dtype, name="fam_cls_head")

        # AlignConv deformable weights, HWIO, no bias (dcn DeformConv parity)
        self.align_weight = self.param(
            "align_weight", _conv_init, (3, 3, fc, fc), jnp.float32
        )

        if self.with_orconv:
            n_or = self.n_orientations
            # ORConv2d(fc, fc//8, arf_config=(1, 8)): 1 input orientation,
            # 8 rotated copies -> fc output channels (head.py:214-215).
            self.or_weight = self.param(
                "or_weight", _conv_init,
                (fc // n_or, fc, 1, 3, 3), jnp.float32,
            )
            self.or_bias = self.param(
                "or_bias", nn.initializers.zeros, (fc,), jnp.float32
            )
            if q_on and scope_has(self.quant_scope, "orconv"):
                # PER-LEVEL activation ranges for the int8 ORConv (the conv
                # itself is functional — the ARF rotation generates its
                # kernel — so the range variables live on the head; +-inf
                # init makes the first calib fold take the batch range)
                self.or_act_min = self.variable(
                    "quant", "or_act_min",
                    lambda: jnp.full((nlv,), jnp.inf, jnp.float32))
                self.or_act_max = self.variable(
                    "quant", "or_act_max",
                    lambda: jnp.full((nlv,), -jnp.inf, jnp.float32))
        else:
            self.or_conv = nn.Conv(fc, (3, 3), padding="SAME",
                                   kernel_init=_conv_init, dtype=self.dtype,
                                   name="or_conv")

        self.odm_reg_ls = _ConvStack(fc, self.stacked_convs, dtype=self.dtype, quant=q_stacks, range_slots=nlv, name="odm_reg_ls")
        self.odm_cls_ls = _ConvStack(fc, self.stacked_convs, dtype=self.dtype, quant=q_stacks, range_slots=nlv, name="odm_cls_ls")
        self.odm_reg_head = Conv(5, (3, 3), padding="SAME",
                                 kernel_init=_conv_init, dtype=self.dtype,
                                 name="odm_reg_head")
        self.odm_cls_head = Conv(
            nc, (3, 3), padding="SAME", kernel_init=_conv_init,
            bias_init=nn.initializers.constant(_bias_init_with_prob(0.01)),
            dtype=self.dtype, name="odm_cls_head")

    def _qcall(self, mod, x, lvl):
        """Call a prediction-head conv, passing the level as the activation-
        range slot when the conv is quantized."""
        from ..ops.quant import QuantConv

        return mod(x, lvl) if isinstance(mod, QuantConv) else mod(x)

    def level_anchors(self, featmap_size, stride):
        """Static [H*W*A, 5] anchor grid for one level (constant under jit)."""
        return jnp.asarray(
            grid_anchors(featmap_size, stride, self.anchor_scales,
                         self.anchor_ratios, self.anchor_angles)
        )

    def __call__(self, feats, train: bool = False):
        """Run the head on the FPN pyramid.

        Args:
          feats: tuple of ``[B, H_l, W_l, C]`` feature maps, one per stride.
          train: reserved phase flag (AlignConv sampling layout experiments
            select on it; both phases currently use the "tap" layout — the
            "batched" single-gather wins isolated, 24.9 vs 28.0 ms at P3,
            but its 604 MB samples transient loses composed e2e, 107.5 vs
            110.1 chips/s — see BENCH.md).

        Returns:
          dict with per-level lists:
            fam_cls / odm_cls: ``[B, H, W, num_classes]`` logits
            fam_bbox / odm_bbox: ``[B, H, W, 5]`` deltas
            init_anchors: ``[H*W, 5]`` (shared across the batch)
            refine_anchors: ``[B, H*W, 5]`` decoded FAM anchors (stop-grad)
        """
        out = {k: [] for k in ("fam_cls", "fam_bbox", "odm_cls", "odm_bbox",
                               "init_anchors", "refine_anchors")}
        for lvl, (x, stride) in enumerate(zip(feats, self.featmap_strides)):
            b, h, w, _ = x.shape
            fam_bbox = self._qcall(self.fam_reg_head,
                                   self.fam_reg_ls(x, lvl), lvl)
            fam_cls = self._qcall(self.fam_cls_head,
                                  self.fam_cls_ls(x, lvl), lvl)

            anchors = self.level_anchors((h, w), stride)  # [H*W, 5]
            # refine anchors by decoding detached FAM deltas (head.py:324-331)
            deltas = jax.lax.stop_gradient(fam_bbox).reshape(b, h * w, 5)
            refine = rboxes_decode(
                jnp.broadcast_to(anchors[None], (b, h * w, 5)),
                deltas.astype(jnp.float32),
                wh_ratio_clip=1e-6,
            )

            offsets = align_conv_offsets(refine, (h, w), float(stride))
            if self.align_offset_clamp > 0:
                c = self.align_offset_clamp
                offsets = jnp.clip(offsets, -c, c)
            impl = self.deform_impl
            if impl == "auto":
                # experiment override (A/B without config edits), else hat
                # on TPU — but only after a cached trial compile proves the
                # Pallas kernel is accepted by this environment's compiler
                # (remote TPU compile services have rejected valid Mosaic
                # programs before; see BENCH.md) — gather elsewhere
                impl = os.environ.get("S2A_DEFORM_IMPL", "") or (
                    "hat" if hat_kernel_supported() else "gather")
            if impl == "hat":
                # a clamp of <= margin-2 cells proves every tap window-local,
                # so the exactness cond AND the gather fallback branch (whose
                # backward's scatter transients XLA would still reserve HBM
                # for) can be dropped from the program
                uncond = 0.0 < self.align_offset_clamp <= HAT_MARGIN - 2
                hat = functools.partial(
                    deform_conv2d_hat,
                    interpret=jax.default_backend() == "cpu",
                    unconditional=uncond,
                )  # offsets are stop-gradient (hat VJP returns zeros)
                mesh = self.deform_mesh
                if mesh is not None and mesh.devices.size > 1:
                    if self.deform_spatial:
                        if not uncond:
                            raise ValueError(
                                "deform_spatial (height-sharded hat "
                                "AlignConv) needs 0 < align_offset_clamp "
                                f"<= {HAT_MARGIN - 2} to bound the halo; "
                                "unclamped offsets must use the gather "
                                "path (parallel/spatial.py pins it)"
                            )
                        hat = _spatial_hat(hat, mesh,
                                           self.align_offset_clamp)
                    else:
                        from jax.sharding import PartitionSpec as P

                        spec = P(mesh.axis_names[0])
                        # check_vma=False: the per-shard body is
                        # collective-free and its pallas_call out_shape
                        # carries no vma annotation
                        hat = jax.shard_map(
                            hat, mesh=mesh,
                            in_specs=(spec, spec, P()), out_specs=spec,
                            check_vma=False,
                        )
                align = nn.relu(
                    hat(x, offsets.astype(x.dtype),
                        self.align_weight.astype(x.dtype))
                )
            else:
                align = nn.relu(
                    deform_conv2d(x, offsets.astype(x.dtype),
                                  self.align_weight.astype(x.dtype),
                                  offset_grad=False)  # offsets stop-gradient
                )
            if self.with_orconv:
                from ..ops.quant import scope_has

                q_or = scope_has(self.quant_scope, "orconv")
                w_arf = rotate_arf(self.or_weight, self.n_orientations)
                # OIHW -> HWIO for lax conv
                w_hwio = w_arf.transpose(2, 3, 1, 0)
                if self.quant == "int8" and q_or:
                    from ..ops.quant import int8_conv

                    # the ARF-expanded kernel quantizes like any other:
                    # each rotated copy is its own output channel, so the
                    # per-output-channel scales absorb the rotation exactly;
                    # ranges are per level (the weights are level-shared)
                    or_feat = int8_conv(
                        align, w_hwio, self.or_act_min.value[lvl],
                        self.or_act_max.value[lvl], dtype=x.dtype,
                    )
                else:
                    if self.quant == "calib" and q_or:
                        from ..ops.quant import fold_batch_range

                        fold_batch_range(self.or_act_min, self.or_act_max,
                                         align, slot=lvl)
                    or_feat = jax.lax.conv_general_dilated(
                        align, w_hwio.astype(x.dtype), (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                or_feat = or_feat + self.or_bias.astype(x.dtype)
                odm_cls_feat = rotation_invariant_pooling(
                    or_feat, self.n_orientations
                )
            else:
                or_feat = self.or_conv(align)
                odm_cls_feat = or_feat

            odm_cls = self._qcall(self.odm_cls_head,
                                  self.odm_cls_ls(odm_cls_feat, lvl), lvl)
            odm_bbox = self._qcall(self.odm_reg_head,
                                   self.odm_reg_ls(or_feat, lvl), lvl)

            out["fam_cls"].append(fam_cls)
            out["fam_bbox"].append(fam_bbox)
            out["odm_cls"].append(odm_cls)
            out["odm_bbox"].append(odm_bbox)
            out["init_anchors"].append(anchors)
            out["refine_anchors"].append(refine)
        return out


# =====================================================================
# Loss — pure function over head outputs + padded targets
# =====================================================================
def _level_loss(bbox_pred, cls_pred, anchors, assign, gt_boxes, gt_classes,
                num_classes, fl_gamma, fl_alpha, smooth_beta):
    """Masked per-level loss.

    Args:
      bbox_pred: [B, A_l, 5]    cls_pred: [B, A_l, nc]
      anchors:   [B, A_l, 5]    assign:   [B, A_l] int codes
      gt_boxes:  [B, G, 5]      gt_classes: [B, G]
    Returns (cls_loss_sum, reg_loss_sum) scalars (unnormalized sums —
    parity with BCE-sum focal + sum smooth-L1, head.py:139-156).
    """
    pos = assign >= 0
    neg = assign == -1
    gt_idx = jnp.clip(assign, 0, None)
    matched_boxes = jnp.take_along_axis(gt_boxes, gt_idx[..., None], axis=1)
    matched_cls = jnp.take_along_axis(gt_classes, gt_idx, axis=1)

    anchors = anchors.astype(jnp.float32)
    # Non-positive slots would encode padded gt rows (w=h=0 -> log(0) = -inf,
    # and inf * 0-mask = NaN in the backward pass). Substitute the anchor
    # itself: encode(anchor, anchor) == 0, so masked slots stay loss- and
    # grad-free. (The JAX answer to DDP find_unused_parameters.)
    matched_boxes = jnp.where(pos[..., None], matched_boxes, anchors)

    reg_targets = rboxes_encode(anchors, matched_boxes)
    reg_loss = smooth_l1_loss(bbox_pred.astype(jnp.float32), reg_targets,
                              smooth_beta)
    reg_loss = (reg_loss * pos).sum()

    cls_targets = jax.nn.one_hot(matched_cls, num_classes,
                                 dtype=jnp.float32) * pos[..., None]
    cls_w = (pos | neg).astype(jnp.float32)
    cls_loss = focal_loss_with_logits(cls_pred.astype(jnp.float32),
                                      cls_targets, fl_gamma, fl_alpha)
    cls_loss = (cls_loss * cls_w[..., None]).sum()
    return cls_loss, reg_loss


def compute_s2anet_loss(
    outputs,
    gt_boxes,
    gt_classes,
    gt_mask,
    imgs_size=(1024, 1024),
    num_classes: int = 15,
    fl_gamma: float = 2.0,
    fl_alpha: float = 0.5,
    smooth_beta: float = 1.0 / 9.0,
    odm_balance: float = 1.0,
    reg_balance: float = 1.0,
    fpn_balance=(1.0, 1.0, 1.0, 1.0, 1.0),
    iou_impl: str = "xla",
):
    """Total S2ANet loss over a batch.

    Args:
      outputs: dict from :class:`S2ANetHead.__call__`.
      gt_boxes:   ``[B, G, 5]`` padded gt rboxes, pixels/radians.
      gt_classes: ``[B, G]`` int class ids.
      gt_mask:    ``[B, G]`` bool.

    Returns:
      (total_loss, loss_items[4]) with items
      (fam_cls, fam_reg, odm_cls, odm_reg) — normalization follows
      head.py:419-431: sums divided by max(total positives, batch_size),
      each computed across ALL levels and the whole batch.
    """
    b = gt_boxes.shape[0]
    num_levels = len(outputs["fam_cls"])
    level_sizes = [a.shape[0] for a in outputs["init_anchors"]]

    init_all = jnp.concatenate(outputs["init_anchors"], axis=0)  # [A, 5]
    refine_all = jnp.concatenate(outputs["refine_anchors"], axis=1)  # [B, A, 5]
    refine_all = jax.lax.stop_gradient(refine_all)

    # Adaptive gt capacity, decided at BATCH level: under vmap a lax.cond
    # becomes a select (both branches execute), so the tier dispatch must sit
    # outside the vmap. Padded gt rows are a suffix, hence assigning against
    # the first-k slots is exact whenever every image has <= k real gts.
    g_cap = gt_boxes.shape[1]

    def assign_with(k):
        def run(_):
            fam, _ = jax.vmap(
                lambda gtb, gtm: assign_labels(
                    init_all, gtb, gtm, imgs_size=imgs_size, gt_tier=0,
                    iou_impl=iou_impl,
                )
            )(gt_boxes[:, :k], gt_mask[:, :k])
            odm, _ = jax.vmap(
                lambda anc, gtb, gtm: assign_labels(
                    anc, gtb, gtm, imgs_size=imgs_size, gt_tier=0,
                    iou_impl=iou_impl,
                )
            )(refine_all, gt_boxes[:, :k], gt_mask[:, :k])
            return fam, odm

        return run

    gt_tier = 64
    if 0 < gt_tier < g_cap:
        n_max = gt_mask.sum(-1).max()
        fam_assign, odm_assign = jax.lax.cond(
            n_max <= gt_tier, assign_with(gt_tier), assign_with(g_cap),
            operand=None,
        )
    else:
        fam_assign, odm_assign = assign_with(g_cap)(None)

    fam_total_pos = jnp.maximum((fam_assign >= 0).sum(), b).astype(jnp.float32)
    odm_total_pos = jnp.maximum((odm_assign >= 0).sum(), b).astype(jnp.float32)

    fam_cls_loss = fam_reg_loss = odm_cls_loss = odm_reg_loss = 0.0
    start = 0
    for lvl in range(num_levels):
        n = level_sizes[lvl]
        sl = slice(start, start + n)
        start += n

        fam_bbox = outputs["fam_bbox"][lvl].reshape(b, n, 5)
        fam_cls = outputs["fam_cls"][lvl].reshape(b, n, num_classes)
        init_anc = jnp.broadcast_to(outputs["init_anchors"][lvl][None], (b, n, 5))
        c, r = _level_loss(fam_bbox, fam_cls, init_anc, fam_assign[:, sl],
                           gt_boxes, gt_classes, num_classes,
                           fl_gamma, fl_alpha, smooth_beta)
        fam_cls_loss += fpn_balance[lvl] * c
        fam_reg_loss += fpn_balance[lvl] * r

        odm_bbox = outputs["odm_bbox"][lvl].reshape(b, n, 5)
        odm_cls = outputs["odm_cls"][lvl].reshape(b, n, num_classes)
        refine_anc = outputs["refine_anchors"][lvl]
        c, r = _level_loss(odm_bbox, odm_cls, refine_anc, odm_assign[:, sl],
                           gt_boxes, gt_classes, num_classes,
                           fl_gamma, fl_alpha, smooth_beta)
        odm_cls_loss += fpn_balance[lvl] * c
        odm_reg_loss += fpn_balance[lvl] * r

    fam_cls_loss = fam_cls_loss / fam_total_pos
    fam_reg_loss = fam_reg_loss / fam_total_pos * reg_balance
    odm_cls_loss = odm_cls_loss / odm_total_pos * odm_balance
    odm_reg_loss = odm_reg_loss / odm_total_pos * odm_balance * reg_balance

    total = fam_cls_loss + fam_reg_loss + odm_cls_loss + odm_reg_loss
    items = jnp.stack([fam_cls_loss, fam_reg_loss, odm_cls_loss, odm_reg_loss])
    return total, items


# =====================================================================
# Inference decode + NMS — pure function over head outputs
# =====================================================================
def s2anet_get_bboxes(
    outputs,
    score_thr: float = 0.05,
    iou_thr: float = 0.5,
    max_before_nms_per_level: int = 2000,
    max_per_img: int = 2000,
    pre_nms_cap: int = 4096,
):
    """Decode ODM predictions and run multiclass rotated NMS, batched.

    Parity: head.py:648-726 — sigmoid scores, per-level top-k prefilter,
    concat levels, decode against refined anchors, multiclass NMS.

    Returns:
      det_boxes ``[B, max_per_img, 6]``, det_labels ``[B, max_per_img]``,
      det_valid ``[B, max_per_img]``.
    """
    num_classes = outputs["odm_cls"][0].shape[-1]
    b = outputs["odm_cls"][0].shape[0]

    scores_cat, deltas_cat, anchors_cat = [], [], []
    for lvl in range(len(outputs["odm_cls"])):
        cls = outputs["odm_cls"][lvl].reshape(b, -1, num_classes)
        bbox = outputs["odm_bbox"][lvl].reshape(b, -1, 5)
        anc = outputs["refine_anchors"][lvl]
        n = cls.shape[1]
        scores = jax.nn.sigmoid(cls.astype(jnp.float32))
        if 0 < max_before_nms_per_level < n:
            top = scores.max(axis=-1)  # [B, n]
            # TPU top_k is sort-based; approx_max_k (two-pass bucketed
            # reduce on TPU, exact fallback elsewhere) trades exactness of
            # the *prefilter* (recall ~0.95 per level, only among
            # sub-threshold stragglers once the cap is generous) for VPU
            # time. Experiment knob, off by default — the reference
            # prefilter is exact (head.py:664).
            if os.environ.get("S2A_APPROX_TOPK", "") not in ("", "0"):
                _, idx = jax.lax.approx_max_k(top, max_before_nms_per_level)
            else:
                _, idx = jax.lax.top_k(top, max_before_nms_per_level)
            scores = jnp.take_along_axis(scores, idx[..., None], axis=1)
            bbox = jnp.take_along_axis(bbox, idx[..., None], axis=1)
            anc = jnp.take_along_axis(anc, idx[..., None], axis=1)
        scores_cat.append(scores)
        deltas_cat.append(bbox.astype(jnp.float32))
        anchors_cat.append(anc)

    scores = jnp.concatenate(scores_cat, axis=1)
    deltas = jnp.concatenate(deltas_cat, axis=1)
    anchors = jnp.concatenate(anchors_cat, axis=1)
    boxes = rboxes_decode(anchors, deltas)  # [B, N, 5]

    def _single(args):
        bx, sc = args
        return multiclass_nms_rotated(
            bx, sc, score_thr, iou_thr, max_per_img=max_per_img,
            pre_nms_cap=pre_nms_cap,
        )

    # lax.map (not vmap): keeps the per-image [K, K] IoU matrix in its natural
    # {1,0} layout — vmapping gives it a batch-minor layout that XLA pads 32x
    # (8 GB for batch 4, K=4096). NMS is the cheap tail; sequencing it per
    # image costs little and bounds memory at one K x K buffer.
    return jax.lax.map(_single, (boxes, scores))
