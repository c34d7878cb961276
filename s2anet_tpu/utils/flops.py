"""Exact analytic FLOP counting by walking a jaxpr.

XLA's ``compiled.cost_analysis()["flops"]`` is backend-dependent and, on the
TPU PJRT plugin, undercounts convolutions by a large factor (round-2 BENCH
recorded 65 GFLOP/chip for a model whose P3 head alone runs >150 GFLOP of
3x3/256 convs — the basis of the misleading "8% MFU" figure). This module
counts matmul/conv FLOPs *symbolically* from the traced jaxpr instead: every
``dot_general`` and ``conv_general_dilated`` contributes ``2 x MACs``
computed from its static shapes, recursing through pjit / scan (x length) /
while (x1) / cond (max over branches) / custom-vjp call primitives.

Only MXU work is counted (elementwise VPU ops are "free" at the roofline
level); this matches the convention of the public MFU literature
(jax-ml.github.io/scaling-book): MFU = model matmul FLOP rate / peak.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import numpy as np


def _prod(xs) -> int:
    out = 1
    for x in xs:
        out *= int(x)
    return out


def _dot_general_flops(eqn) -> int:
    (lhs_c, rhs_c), (lhs_b, _rhs_b) = eqn.params["dimension_numbers"]
    lhs, rhs = (v.aval.shape for v in eqn.invars[:2])
    k = _prod(lhs[d] for d in lhs_c)
    b = _prod(lhs[d] for d in lhs_b)
    m = _prod(
        lhs[d] for d in range(len(lhs)) if d not in set(lhs_c) | set(lhs_b)
    )
    n = _prod(rhs) // max(k * b, 1)
    return 2 * b * m * n * k


def _conv_flops(eqn) -> int:
    dn = eqn.params["dimension_numbers"]
    rhs = eqn.invars[1].aval.shape
    out = eqn.outvars[0].aval.shape
    kernel_spatial = _prod(rhs[d] for d in dn.rhs_spec[2:])
    cin_per_group = int(rhs[dn.rhs_spec[1]])  # already Cin/groups in the aval
    return 2 * _prod(out) * kernel_spatial * cin_per_group


def count_jaxpr_flops(jaxpr) -> int:
    """Total matmul+conv FLOPs (2 x MACs) of a (Closed)Jaxpr, recursively."""
    if hasattr(jaxpr, "jaxpr"):  # ClosedJaxpr
        jaxpr = jaxpr.jaxpr
    total = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_general_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            total += int(eqn.params["length"]) * count_jaxpr_flops(
                eqn.params["jaxpr"]
            )
        elif name == "while":
            # one iteration (trip counts are dynamic); callers that know the
            # trip count should scale externally. NMS/assignment loops here
            # carry no matmuls, so this is exact for this codebase.
            total += count_jaxpr_flops(eqn.params["body_jaxpr"])
        elif name == "cond":
            total += max(
                (count_jaxpr_flops(b) for b in eqn.params["branches"]),
                default=0,
            )
        elif name == "pallas_call":
            # the kernel body executes once per grid step — the generic
            # fallback would count it once and undercount by the grid size
            # (e.g. 256x for the hat deform kernel at P3)
            grid = getattr(eqn.params.get("grid_mapping"), "grid", ()) or ()
            total += _prod(int(g) for g in grid) * count_jaxpr_flops(
                eqn.params["jaxpr"]
            )
        else:
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                sub = eqn.params.get(key) if eqn.params else None
                if sub is not None:
                    total += count_jaxpr_flops(sub)
                    break
    return total


def count_fn_flops(fn, *args, dce: bool = True, **kwargs) -> int:
    """FLOPs of ``fn(*args, **kwargs)`` by tracing it (no compile, no run).

    With ``dce=True`` (default) equations not contributing to the function's
    outputs are dropped first, matching what XLA actually executes (e.g. the
    FAM classification branch is dead at inference and must not inflate MFU).
    """
    closed = jax.make_jaxpr(lambda *a: fn(*a, **kwargs))(*args)
    jaxpr = closed.jaxpr
    if dce:
        try:
            from jax._src.interpreters import partial_eval as pe

            jaxpr, _ = pe.dce_jaxpr(jaxpr, [True] * len(jaxpr.outvars))
        except Exception:
            pass  # internal API moved — fall back to the un-DCEd count
    return count_jaxpr_flops(jaxpr)


def measure_matmul_peak(dtype=None, k: int = 4096, iters: int = 32) -> float:
    """Measured MXU peak (FLOP/s) via scan-length-differenced matmuls.

    Differencing two scan lengths inside one jit region removes dispatch and
    transfer overhead — on a tunneled device a single ``block_until_ready``
    matmul timing can undercount peak by 2x.
    """
    import time

    import jax.numpy as jnp

    dtype = dtype or jnp.bfloat16
    a = jnp.ones((k, k), dtype)

    def make(n):
        @jax.jit
        def f(a):
            def body(c, _):
                return jnp.tanh(c @ a), ()
            out, _ = jax.lax.scan(body, a, (), length=n)
            return out[0, 0]
        return f

    n0, n1 = iters, 3 * iters
    f0, f1 = make(n0), make(n1)
    float(f0(a)), float(f1(a))  # compile + warm
    t = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f0(a))
        t1 = time.perf_counter()
        float(f1(a))
        t.append((time.perf_counter() - t1) - (t1 - t0))
    dt = min(t)
    return (n1 - n0) * 2 * k**3 / dt
