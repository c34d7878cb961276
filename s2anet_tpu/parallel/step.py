"""Jit-compiled train / eval steps, single-chip or data-parallel over a mesh.

One traced program covers forward, assignment, loss, backward, optimizer, EMA
and (for eval) decode + NMS — nothing leaves the device per step, unlike the
reference's loop which syncs loss items and detections to host every
iteration (train.py:376-381, head.py:436, val.py:278-282).

Gradient semantics: the loss normalizes by positives counted over the GLOBAL
batch, so the data-parallel step computes bit-identical math to a single
device with the same global batch. (The reference approximates this by
multiplying the loss by WORLD_SIZE so DDP's mean-allreduce turns into a sum —
train.py:348-349 — but its positives count stays per-process; global-batch
jit semantics is the exact version.)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..models.head import compute_s2anet_loss, s2anet_get_bboxes
from ..train.state import TrainState, ema_update
from .mesh import batch_sharding, replicated


def resolve_iou_impl(model_cfg) -> str:
    """Resolve the assignment-IoU backend ("auto" -> Pallas on TPU)."""
    impl = getattr(model_cfg, "assign_iou_impl", "auto") if model_cfg else "auto"
    if impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return impl


def _pin_deform_for_mesh(model, mesh):
    """Attach the mesh so the hat AlignConv stays fast on >1-device meshes.

    The hat-matmul AlignConv is a Pallas custom call, which GSPMD cannot
    partition — on a >1-device mesh it would all-gather the batch-sharded
    activations around every AlignConv. But AlignConv is per-image, so the
    head instead runs the kernel under ``jax.shard_map`` over the mesh's
    batch axis (models/head.py) — per-shard Pallas calls, no halos, no
    collectives. The gather path needs nothing: XLA partitions it natively.
    """
    if (mesh is not None and mesh.devices.size > 1
            and getattr(model, "deform_impl", None) in ("auto", "hat")):
        model = model.clone(deform_mesh=mesh)
    if (mesh is not None and mesh.devices.size > 1
            and hasattr(model, "bn_mesh")):
        # same GSPMD limitation for the Pallas BN moment kernels: on a
        # >1-device mesh the train-mode stats run under shard_map + psum
        # (models/bn.py) to keep exact global-batch statistics
        model = model.clone(bn_mesh=mesh)
    return model


def make_train_step(
    model,
    tx,
    imgs_size,
    num_classes: int,
    model_cfg=None,
    ema_decay: float = 0.9999,
    ema_ramp: int = 2000,
    accumulate: int = 1,
    compute_dtype=jnp.bfloat16,
    mesh=None,
    donate: bool = True,
):
    """Build the jitted train step.

    Returns ``step(state, batch) -> (state, loss_items)`` where batch is a
    dict with ``imgs [B,H,W,3] float (0..1)``, ``gt_boxes [B,G,5]``,
    ``gt_classes [B,G]``, ``gt_mask [B,G]``. With a mesh, the batch is
    sharded on axis 0 and the state replicated.
    """
    model = _pin_deform_for_mesh(model, mesh)
    loss_kwargs = {"iou_impl": resolve_iou_impl(model_cfg)}
    if model_cfg is not None:
        loss_kwargs.update(
            fl_gamma=model_cfg.fl_gamma,
            fl_alpha=model_cfg.fl_alpha,
            smooth_beta=model_cfg.smooth_beta,
            odm_balance=model_cfg.odm_balance,
            reg_balance=model_cfg.reg_balance,
            fpn_balance=tuple(model_cfg.fpn_balance),
        )

    def step(state: TrainState, batch):
        imgs = batch["imgs"].astype(compute_dtype)

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                imgs,
                train=True,
                mutable=["batch_stats"],
            )
            total, items = compute_s2anet_loss(
                out,
                batch["gt_boxes"],
                batch["gt_classes"],
                batch["gt_mask"],
                imgs_size=imgs_size,
                num_classes=num_classes,
                **loss_kwargs,
            )
            return total, (items, mut["batch_stats"])

        grads, (items, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            batch_stats=new_bs,
        )
        state = ema_update(state, new_params, new_bs, ema_decay, ema_ramp,
                           accumulate=accumulate)
        return state, items

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, bsh),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(
    model,
    model_cfg=None,
    compute_dtype=jnp.bfloat16,
    mesh=None,
    use_ema: bool = True,
    max_per_img: Optional[int] = None,
    with_loss: bool = False,
    imgs_size=None,
    num_classes: Optional[int] = None,
    quant_vars=None,
):
    """Build the jitted eval step: forward + decode + NMS, batched.

    Returns ``eval_step(state, imgs) -> (det_boxes [B,K,6], det_labels [B,K],
    det_valid [B,K])``.

    With ``with_loss=True`` (the reference computes the 4 losses during val,
    val.py:255) the step instead takes the full batch dict (imgs + padded gt)
    and returns ``(det_boxes, det_labels, det_valid, loss_items[4])``;
    ``imgs_size`` and ``num_classes`` are required in that mode.
    """
    model = _pin_deform_for_mesh(model, mesh)
    post_kwargs = {}
    if model_cfg is not None:
        post_kwargs = dict(
            score_thr=model_cfg.score_thr,
            iou_thr=model_cfg.nms_iou_thr,
            max_before_nms_per_level=model_cfg.max_before_nms_per_level,
            max_per_img=max_per_img or model_cfg.max_per_img,
            pre_nms_cap=model_cfg.pre_nms_cap,
        )
    elif max_per_img:
        post_kwargs = dict(max_per_img=max_per_img)

    loss_kwargs = {"iou_impl": resolve_iou_impl(model_cfg)}
    if with_loss and model_cfg is not None:
        loss_kwargs.update(
            fl_gamma=model_cfg.fl_gamma,
            fl_alpha=model_cfg.fl_alpha,
            smooth_beta=model_cfg.smooth_beta,
            odm_balance=model_cfg.odm_balance,
            reg_balance=model_cfg.reg_balance,
            fpn_balance=tuple(model_cfg.fpn_balance),
        )

    def forward(state: TrainState, imgs):
        params = state.ema_params if use_ema else state.params
        bstats = state.ema_batch_stats if use_ema else state.batch_stats
        variables = {"params": params, "batch_stats": bstats}
        if quant_vars is not None:
            # calibrated int8 activation ranges (ops/quant.py) — host
            # scalars closed over here, so they fold into the compiled
            # program as constants
            variables["quant"] = quant_vars
        return model.apply(
            variables,
            imgs.astype(compute_dtype),
            train=False,
        )

    if not with_loss:
        def eval_step(state: TrainState, imgs):
            return s2anet_get_bboxes(forward(state, imgs), **post_kwargs)
        out_sh = lambda bsh, rep: (bsh, bsh, bsh)  # noqa: E731
    else:
        def eval_step(state: TrainState, batch):
            out = forward(state, batch["imgs"])
            dets = s2anet_get_bboxes(out, **post_kwargs)
            _, items = compute_s2anet_loss(
                out,
                batch["gt_boxes"],
                batch["gt_classes"],
                batch["gt_mask"],
                imgs_size=imgs_size,
                num_classes=num_classes,
                **loss_kwargs,
            )
            return dets + (items,)
        out_sh = lambda bsh, rep: (bsh, bsh, bsh, rep)  # noqa: E731

    if mesh is None:
        return jax.jit(eval_step)

    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    in_batch = bsh if not with_loss else {
        "imgs": bsh, "gt_boxes": bsh, "gt_classes": bsh, "gt_mask": bsh,
    }
    return jax.jit(
        eval_step,
        in_shardings=(rep, in_batch),
        out_shardings=out_sh(bsh, rep),
    )
