#!/usr/bin/env python
"""int8 quant-scope A/B bench on one chip (the bench.py methodology).

Measures the float serving rate once, then the int8 rate for each quant
scope increment (comma-separated scope sets), all through the identical
differenced-scan program (backbone + FPN + head + decode + NMS, bf16,
batch 8, 1024^2, BN folded — exactly what `val.py --quant int8` runs).

Round-4 context: expanding the quant set from {backbone, neck, head_stacks}
(194 chips/s, 1.19x float) to everything regressed int8 to ~1.0x float —
this tool exists so every scope increment gets its own on-chip number and
the shipped default stays the measured argmax (VERDICT round-4 item 1).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SCOPES = [
    "backbone,neck,head_stacks",            # round-3 known-good set
    "backbone,neck,head_stacks,orconv",
    "backbone,neck,head_stacks,heads",
    "backbone,neck,head_stacks,orconv,heads",  # round-4 full set
    "backbone,neck",
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--scopes", default=";".join(DEFAULT_SCOPES),
                   help="semicolon-separated scope sets (each a comma list)")
    p.add_argument("--forms", default="",
                   help="comma list of int8 formulations to A/B per scope "
                        "(zppad,border); default: the active int8_form()")
    p.add_argument("--skip-float", action="store_true",
                   help="reuse a known float rate (print ratios vs 1.0)")
    p.add_argument("--no-fold", action="store_true",
                   help="skip conv+BN folding (the round-3 measurement "
                        "condition; product default folds)")
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from s2anet_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    from s2anet_tpu.models.detector import S2ANet
    from s2anet_tpu.models.fold import fold_bn_for_eval
    from s2anet_tpu.models.head import s2anet_get_bboxes
    from s2anet_tpu.ops.quant import calibrate
    from s2anet_tpu.utils.config import ModelConfig

    batch, size, n_long = args.batch, args.size, 6
    mc = ModelConfig(backbone=args.backbone)
    post_kwargs = dict(
        score_thr=mc.score_thr, iou_thr=mc.nms_iou_thr,
        max_before_nms_per_level=mc.max_before_nms_per_level,
        max_per_img=mc.max_per_img, pre_nms_cap=mc.pre_nms_cap,
    )
    model = S2ANet(backbone_name=args.backbone, num_classes=15)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.uniform(size=(n_long, batch, size, size, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3), jnp.bfloat16),
                           train=False)
    if not args.no_fold:
        model, variables = fold_bn_for_eval(model, variables)

    def rate(mdl, vs):
        @jax.jit
        def fn(vs, imgs):
            def body(c, im):
                out = mdl.apply(vs, im, train=False)
                det_boxes, _, _ = s2anet_get_bboxes(out, **post_kwargs)
                return c + det_boxes.sum().astype(jnp.float32), ()
            s, _ = jax.lax.scan(body, 0.0, imgs)
            return s

        # the tunnel's remote compile service intermittently drops the
        # response mid-body (jax.errors.JaxRuntimeError INTERNAL) — retry
        # the compile a few times rather than losing the whole sweep
        t0 = time.perf_counter()
        lowered = fn.lower(vs, imgs)
        for attempt in range(4):
            try:
                fn = lowered.compile()
                break
            except Exception as e:  # noqa: BLE001 — remote-compile flake
                if attempt == 3 or "INTERNAL" not in str(e):
                    raise
                print(f"  (compile flake, retry {attempt + 1}: "
                      f"{str(e)[:80]})", file=sys.stderr)
                time.sleep(5)
        float(fn(vs, imgs))
        compile_s = time.perf_counter() - t0
        t1s, t2s = [], []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(fn(vs, imgs))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            r1, r2 = fn(vs, imgs), fn(vs, imgs)
            float(r1), float(r2)
            t2s.append(time.perf_counter() - t0)
        dt = min(t2s) - min(t1s)
        return n_long * batch / dt, compile_s

    if args.skip_float:
        f_rate, f_compile = 1.0, 0.0
        print("float: skipped (rates below are absolute chips/s)")
    else:
        f_rate, f_compile = rate(model, variables)
        print(f"float: {f_rate:.1f} chips/s (compile {f_compile:.1f}s)",
              flush=True)

    from s2anet_tpu.ops import quant as quant_mod

    forms = [f.strip() for f in args.forms.split(",") if f.strip()] or [
        quant_mod.int8_form()]
    for scope_str in args.scopes.split(";"):
        scope = tuple(s.strip() for s in scope_str.split(",") if s.strip())
        mdl = model.clone(quant_scope=scope)
        qranges = calibrate(mdl, variables, imgs[:1])
        vars_q = dict(variables)
        vars_q["quant"] = qranges
        for form in forms:
            os.environ["S2A_INT8_FORM"] = form
            q_rate, q_compile = rate(mdl.clone(quant="int8"), vars_q)
            rel = (f" ({q_rate / f_rate:.2f}x float)"
                   if not args.skip_float else "")
            print(f"int8 [{scope_str}] form={form}: {q_rate:.1f} chips/s"
                  f"{rel} (compile {q_compile:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
