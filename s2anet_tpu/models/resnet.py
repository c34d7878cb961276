"""ResNet backbones in flax (NHWC), feature-pyramid taps C3/C4/C5.

Functional re-design of the reference's hand-written torch ResNet
(/root/reference/models/backbone.py:8-354): identical topology (so torchvision
weights import 1:1 through :mod:`s2anet_tpu.models.torch_import`) but NHWC
layout for TPU conv efficiency and flax BatchNorm running statistics.

Stage freezing (backbone.py:324-344) is realized the JAX way: frozen stages
run their BatchNorm in inference mode (``frozen_stages`` here) and the
optimizer masks their gradients (see ``s2anet_tpu.train.optim.freeze_mask``) —
parameters stay immutable without mutating module state.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.quant import conv_ctor

Dtype = Optional[Any]

ARCH_SETTINGS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}

_he_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class _FoldedBias(nn.Module):
    """What is left of a BatchNorm after serving-time weight folding
    (models/fold.py): the scale lives in the preceding conv's kernel, so
    only a per-channel bias add remains (XLA fuses it into the conv
    epilogue). Declares the single ``bias`` param the fold writes."""

    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],),
                          jnp.float32)
        return x + bias.astype(self.dtype if self.dtype is not None
                               else x.dtype)


class SampledBatchNorm(nn.Module):
    """BatchNorm whose training statistics come from the first
    ``stats_images`` images of the batch (normalization, running-average
    updates and parameters are identical to ``nn.BatchNorm``).

    Why: the BN-stat reductions are the largest non-MXU block of the train
    step (39 ms of 183.6 — BENCH.md round-3 trace): with batch stats over
    the full batch, every BN re-reads its conv's entire output from HBM.
    Estimating the stats from a k-image PREFIX cuts that pass's bytes by
    B/k with whole-image (tile-aligned) slices that XLA can actually skip
    (row-strided subsampling would still touch every (8, 128) tile).

    Semantics: this is *small-batch BN*, the thing the reference computes
    anyway — torch DDP without SyncBN derives BN stats from the PER-GPU
    batch (global 8 over 4 GPUs = stats over 2 images;
    /root/reference/train.py DDP path), while this repo's default is exact
    global-batch stats. ``stats_images=2`` therefore reproduces the
    reference's statistical regime; it is still gated on the synthetic
    train->val acceptance (BENCH.md) before any preset ships it.

    Parameter/stats tree matches ``nn.BatchNorm`` exactly ("scale",
    "bias"; "mean", "var"), so checkpoints are interchangeable.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = None
    stats_images: int = 2

    @nn.compact
    def __call__(self, x):
        feats = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feats,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feats,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feats,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feats,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            k = max(1, min(self.stats_images, x.shape[0]))
            xs = x[:k].astype(jnp.float32)
            mean = xs.mean(axis=(0, 1, 2))
            # E[x^2] - E[x]^2, like flax's _compute_stats (one pass over xs)
            var = jnp.maximum(
                (xs * xs).mean(axis=(0, 1, 2)) - mean * mean, 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        dtype = self.dtype if self.dtype is not None else x.dtype
        mul = (scale * jax.lax.rsqrt(var + self.epsilon)).astype(dtype)
        return (x.astype(dtype) - mean.astype(dtype)) * mul \
            + bias.astype(dtype)


def _BatchNorm(use_running_average: bool, name: str, dtype: Dtype = None,
               fold: bool = False, stats_images: int = 0,
               impl: str = "xla", mesh=None):
    """BatchNorm matching torch defaults (eps 1e-5, torch momentum 0.1).

    ``dtype`` is the computation dtype (activations); parameters and the
    batch statistics stay float32 (flax computes stats in >= float32).
    ``fold=True`` (inference only, after :func:`..models.fold.
    fold_bn_variables`) swaps in the residual bias-add. ``stats_images>0``
    swaps in :class:`SampledBatchNorm` (identical trees). ``impl`` selects
    the TRAINING-mode statistics backend: "xla" (flax nn.BatchNorm),
    "pallas" (models/bn.py PallasBatchNorm — single-read Pallas moment
    kernels + closed-form custom-VJP backward), or "auto" (pallas on TPU
    when its trial compile passes, xla otherwise). All three share one
    parameter/stats tree.
    """
    if fold:
        return _FoldedBias(dtype=dtype, name=name)
    if stats_images > 0:
        return SampledBatchNorm(
            use_running_average=use_running_average,
            momentum=0.9,
            epsilon=1e-5,
            dtype=dtype,
            stats_images=stats_images,
            name=name,
        )
    if not use_running_average and impl != "xla":
        import jax as _jax

        from ..ops.pallas.moments import moments_kernel_supported
        from .bn import PallasBatchNorm

        if impl == "pallas" or (impl == "auto" and moments_kernel_supported()):
            return PallasBatchNorm(
                use_running_average=False,
                momentum=0.9,
                epsilon=1e-5,
                dtype=dtype,
                mesh=mesh,
                # explicit "pallas" off-TPU = interpret mode (tests); "auto"
                # never selects pallas off-TPU
                interpret=_jax.default_backend() != "tpu",
                name=name,
            )
    return nn.BatchNorm(
        use_running_average=use_running_average,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )


def _stem_s2d_conv(x, kernel):
    """7x7/stride-2/pad-3 conv via space-to-depth — exact reformulation.

    A 3-channel 7x7 stem pads its input to 128 lanes (42x waste) and runs the
    MXU at K=3. Rewriting y[p] = sum_d W[d] x[2p+d-3] with d = 2e+r gives a
    4x4 stride-1 VALID conv over the factor-2 space-to-depth input (12
    channels) with a zero-padded, re-laid-out kernel — bit-exact up to fp
    reassociation, and ~4x less layout padding. Falls back to the plain conv
    for odd spatial sizes.

    Args:
      x: [B, H, W, C] (C=3 for the stem, but general).
      kernel: [7, 7, C, Cout].
    """
    import jax

    b, h, w, c = x.shape
    cout = kernel.shape[-1]
    if h % 2 or w % 2:
        return jax.lax.conv_general_dilated(
            x, kernel, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    # zero-pad kernel 7 -> 8 taps, relayout to [4, 4, (ry rx c), cout]
    wp = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
    k2 = wp.reshape(4, 2, 4, 2, c, cout).transpose(0, 2, 1, 3, 4, 5)
    k2 = k2.reshape(4, 4, 4 * c, cout)
    # pad input left 3 / right 5 (even total), space-to-depth by 2
    xp = jnp.pad(x, ((0, 0), (3, 5), (3, 5), (0, 0)))
    hs, ws = (h + 8) // 2, (w + 8) // 2
    xs = xp.reshape(b, hs, 2, ws, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(b, hs, ws, 4 * c)
    y = jax.lax.conv_general_dilated(
        xs, k2, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [B, h/2 + 1, w/2 + 1, cout]
    return y[:, : h // 2, : w // 2]


class _StemConv(nn.Module):
    """Stem conv with the standard torch-compatible parameter layout
    (``kernel`` [7,7,3,64], imported 1:1 from torchvision) computed through
    the space-to-depth formulation."""

    features: int = 64
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", _he_init, (7, 7, x.shape[-1], self.features),
            jnp.float32,
        )
        dtype = self.dtype if self.dtype is not None else x.dtype
        return _stem_s2d_conv(x.astype(dtype), kernel.astype(dtype))


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    train: bool = False
    dtype: Dtype = None
    quant: str = "none"
    fold_bn: bool = False
    bn_stats_images: int = 0
    bn_impl: str = "xla"      # training BN stats backend (see _BatchNorm)
    bn_mesh: Any = None       # mesh for cross-shard stats (models/bn.py)

    @nn.compact
    def __call__(self, x):
        Conv = conv_ctor(self.quant)
        residual = x
        y = Conv(self.planes, (3, 3), (self.stride, self.stride),
                 [(1, 1), (1, 1)],
                 use_bias=False, kernel_init=_he_init, dtype=self.dtype, name="conv1")(x)
        y = _BatchNorm(not self.train, "bn1", self.dtype, self.fold_bn,
                        self.bn_stats_images if self.train else 0,
                        self.bn_impl, self.bn_mesh)(y)
        y = nn.relu(y)
        y = Conv(self.planes, (3, 3), (1, 1), [(1, 1), (1, 1)],
                 use_bias=False, kernel_init=_he_init, dtype=self.dtype, name="conv2")(y)
        y = _BatchNorm(not self.train, "bn2", self.dtype, self.fold_bn,
                        self.bn_stats_images if self.train else 0,
                        self.bn_impl, self.bn_mesh)(y)
        if self.downsample:
            residual = Conv(self.planes, (1, 1), (self.stride, self.stride),
                            use_bias=False, kernel_init=_he_init,
                            dtype=self.dtype, name="downsample_conv")(x)
            residual = _BatchNorm(not self.train, "downsample_bn", self.dtype, self.fold_bn,
                        self.bn_stats_images if self.train else 0,
                        self.bn_impl, self.bn_mesh)(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    train: bool = False
    expansion: int = 4
    dtype: Dtype = None
    quant: str = "none"
    fold_bn: bool = False
    bn_stats_images: int = 0
    bn_impl: str = "xla"      # training BN stats backend (see _BatchNorm)
    bn_mesh: Any = None       # mesh for cross-shard stats (models/bn.py)

    @nn.compact
    def __call__(self, x):
        Conv = conv_ctor(self.quant)
        residual = x
        y = Conv(self.planes, (1, 1), use_bias=False,
                 kernel_init=_he_init, dtype=self.dtype, name="conv1")(x)
        y = _BatchNorm(not self.train, "bn1", self.dtype, self.fold_bn,
                        self.bn_stats_images if self.train else 0,
                        self.bn_impl, self.bn_mesh)(y)
        y = nn.relu(y)
        y = Conv(self.planes, (3, 3), (self.stride, self.stride),
                 [(1, 1), (1, 1)],
                 use_bias=False, kernel_init=_he_init, dtype=self.dtype, name="conv2")(y)
        y = _BatchNorm(not self.train, "bn2", self.dtype, self.fold_bn,
                        self.bn_stats_images if self.train else 0,
                        self.bn_impl, self.bn_mesh)(y)
        y = nn.relu(y)
        y = Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                 kernel_init=_he_init, dtype=self.dtype, name="conv3")(y)
        y = _BatchNorm(not self.train, "bn3", self.dtype, self.fold_bn,
                        self.bn_stats_images if self.train else 0,
                        self.bn_impl, self.bn_mesh)(y)
        if self.downsample:
            residual = Conv(self.planes * self.expansion, (1, 1),
                            (self.stride, self.stride), use_bias=False,
                            kernel_init=_he_init, dtype=self.dtype,
                            name="downsample_conv")(x)
            residual = _BatchNorm(not self.train, "downsample_bn", self.dtype, self.fold_bn,
                        self.bn_stats_images if self.train else 0,
                        self.bn_impl, self.bn_mesh)(residual)
        return nn.relu(y + residual)


class ResNetBackbone(nn.Module):
    """Feature extractor: stem + 4 stages, returning (C3, C4, C5).

    Attributes:
      arch: one of ARCH_SETTINGS.
      frozen_stages: stages (0=stem+layer1 boundary semantics of the reference:
        index i freezes ``backbone[:i+1]``) whose BatchNorm always runs in
        inference mode. -1 freezes nothing (the reproduced-70.7 setting,
        detector.py:20).
      norm_eval: force ALL BatchNorms to inference mode during training.
      out_indices: which of (C1..C5) to return; default (2, 3, 4) -> C3..C5.
    """

    arch: str = "resnet50"
    frozen_stages: int = -1
    norm_eval: bool = False
    out_indices: Sequence[int] = (2, 3, 4)
    # explicit per-block rematerialization: save only block boundaries and
    # recompute block internals in the backward. The 1024^2 train step runs
    # at the HBM cliff, where XLA's ad-hoc spilling/remat is worse than a
    # structured policy; measured on v5e (see BENCH.md)
    remat: bool = False
    # computation dtype; None = compute in the INPUT's dtype (bf16 images ->
    # bf16 MXU convs + bf16 activations, the TPU-native training config;
    # f32 in tests -> exact f32)
    dtype: Dtype = None
    # int8 PTQ inference mode for the block convs: "none" | "calib" | "int8"
    # (ops/quant.py); the stem stays float (12-ch s2d input, negligible cost)
    quant: str = "none"
    # serving-time conv+BN weight folding (models/fold.py): apply only with
    # variables rewritten by fold_bn_variables(); inference only
    fold_bn: bool = False
    # >0: train-time BN statistics from the first k images of the batch
    # (SampledBatchNorm) — the reference's per-GPU-batch regime; 0 = exact
    # full-batch stats (the parity default)
    bn_stats_images: int = 0
    # training BN statistics backend: "auto" (Pallas moment kernels on TPU,
    # flax nn.BatchNorm elsewhere) | "xla" | "pallas" — see models/bn.py
    bn_impl: str = "auto"
    # mesh for cross-shard (global-batch) BN stats on >1-device meshes: the
    # Pallas moment kernels run under shard_map + psum there (GSPMD cannot
    # partition a pallas_call); set by parallel.step like deform_mesh
    bn_mesh: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.fold_bn and train:
            raise ValueError(
                "fold_bn is a serving-time transform: the folded model has "
                "no BatchNorm statistics to train (models/fold.py)"
            )
        dtype = self.dtype if self.dtype is not None else x.dtype
        block_kind, layer_cfg = ARCH_SETTINGS[self.arch]
        block = BasicBlock if block_kind == "basic" else Bottleneck
        if self.remat:
            block = nn.remat(block)
        expansion = 1 if block_kind == "basic" else 4

        def bn_train(stage_idx: int) -> bool:
            if not train or self.norm_eval:
                return False
            return stage_idx > self.frozen_stages

        outs = []
        # C1: 7x7/2 stem
        y = _StemConv(64, dtype=dtype, name="conv1")(x)
        y = _BatchNorm(not bn_train(0), "bn1", dtype, self.fold_bn,
                       self.bn_stats_images if bn_train(0) else 0,
                       self.bn_impl, self.bn_mesh)(y)
        y = nn.relu(y)
        if 0 in self.out_indices:
            outs.append(y)

        # C2: maxpool + layer1
        y = nn.max_pool(y, (3, 3), (2, 2), [(1, 1), (1, 1)])
        planes = 64
        in_ch = 64
        for stage, n_blocks in enumerate(layer_cfg):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                down = b == 0 and (stride != 1 or in_ch != planes * expansion)
                y = block(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    downsample=down,
                    train=bn_train(stage + 1),
                    dtype=dtype,
                    quant=self.quant,
                    fold_bn=self.fold_bn,
                    bn_stats_images=self.bn_stats_images,
                    bn_impl=self.bn_impl,
                    bn_mesh=self.bn_mesh,
                    name=f"layer{stage + 1}_{b}",
                )(y)
                in_ch = planes * expansion
            if (stage + 1) in self.out_indices:
                outs.append(y)
            planes *= 2
        return tuple(outs)


def stage_channels(arch: str, out_indices=(2, 3, 4)):
    """Output channel counts for the requested taps."""
    kind, _ = ARCH_SETTINGS[arch]
    exp = 1 if kind == "basic" else 4
    chans = {0: 64, 1: 64 * exp, 2: 128 * exp, 3: 256 * exp, 4: 512 * exp}
    return [chans[i] for i in out_indices]
