"""Serving-time conv+BN weight folding.

The reference fuses conv+BN for deployment (``fuse_conv_and_bn``,
/root/reference/utils/torch_utils.py:206-230): at inference BatchNorm is a
per-channel affine with frozen constants, so its scale can be folded into
the preceding conv's WEIGHTS at load time (zero runtime cost) and its shift
becomes a plain bias. TPU-native version: a pure variables->variables
rewrite plus a model flag (``ResNetBackbone.fold_bn``) that swaps each
BatchNorm for a bias-add — the scale multiply disappears from the compiled
program instead of being a fused-but-still-executed epilogue per conv.

Composes with int8 PTQ (ops/quant.py): the folded gamma/sigma lands inside
the per-output-channel weight scales for free, and the dequantize chain
shrinks to scale + bias + ReLU.

Numerics: exact up to one float32 reassociation per channel (the fold is
computed in f64 on host to keep even that negligible).
"""

from __future__ import annotations

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

# conv module name -> its BatchNorm partner, within the same parent module
# (models/resnet.py block/stem naming)
BN_PARTNERS = {
    "conv1": "bn1",
    "conv2": "bn2",
    "conv3": "bn3",
    "downsample_conv": "downsample_bn",
}
_CONV_FOR_BN = {v: k for k, v in BN_PARTNERS.items()}


def fold_bn_variables(variables, eps: float = 1e-5):
    """Fold every (conv, bn) pair's BN affine+running stats into the conv
    kernel, for inference.

    Returns new ``variables`` whose ``params`` have rescaled conv kernels
    and, per folded BN, a single ``bias`` param (replacing scale/bias);
    the folded BNs' ``batch_stats`` entries are removed. Apply the result
    with a model built with ``fold_bn=True``.

    Unpaired BNs (none exist in this model family) are left untouched and
    will fail loudly at apply time rather than silently misfold.
    """
    params = flatten_dict(variables["params"])
    stats = flatten_dict(variables.get("batch_stats", {}))
    new_params = dict(params)
    new_stats = dict(stats)

    folded = 0
    for path in list(params):
        if path[-1] != "scale":
            continue
        bn_path = path[:-1]
        conv_name = _CONV_FOR_BN.get(bn_path[-1])
        if conv_name is None:
            continue
        kernel_path = bn_path[:-1] + (conv_name, "kernel")
        if kernel_path not in params or bn_path + ("mean",) not in stats:
            continue
        gamma = np.asarray(params[bn_path + ("scale",)], np.float64)
        beta = np.asarray(params[bn_path + ("bias",)], np.float64)
        mean = np.asarray(stats[bn_path + ("mean",)], np.float64)
        var = np.asarray(stats[bn_path + ("var",)], np.float64)
        kernel = np.asarray(params[kernel_path], np.float64)

        r = gamma / np.sqrt(var + eps)               # [cout]
        new_params[kernel_path] = (kernel * r).astype(np.float32)
        del new_params[bn_path + ("scale",)]
        new_params[bn_path + ("bias",)] = (beta - mean * r).astype(np.float32)
        del new_stats[bn_path + ("mean",)]
        del new_stats[bn_path + ("var",)]
        folded += 1

    if not folded:
        return variables
    out = dict(variables)
    out["params"] = unflatten_dict(new_params)
    out["batch_stats"] = unflatten_dict(new_stats)
    # return DEVICE arrays: the fold math runs in host numpy, but numpy
    # leaves passed as jit arguments are re-uploaded on EVERY call (a 12x
    # serving slowdown through the TPU tunnel — BENCH.md round-4 log);
    # jnp.asarray pins each leaf once and is a no-op for jax arrays
    import jax
    import jax.numpy as jnp
    return jax.tree_util.tree_map(jnp.asarray, out)


def fold_bn_for_eval(model, variables, eps: float = 1e-5):
    """Convenience: (model, variables) -> (folded model clone, folded vars).

    No-op (returns the inputs) when the model has no ``fold_bn`` switch.
    """
    if not hasattr(model, "fold_bn"):
        return model, variables
    return model.clone(fold_bn=True), fold_bn_variables(variables, eps=eps)
