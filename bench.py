#!/usr/bin/env python
"""End-to-end inference throughput benchmark on one TPU chip.

Measures the BASELINE.json headline: 1024x1024-chip detection throughput
(chips/sec/chip) for S2ANet R-50-FPN — backbone + FPN + FAM/ODM head with
AlignConv deformable sampling and ARF conv + decode + multiclass rotated NMS,
all inside one jit region, bf16 compute, batch 8 (the reference eval protocol
is fp16 batch 16, val.py:437-440; batch has little effect at this size).

Methodology: the whole pipeline is scanned over n batches *inside one jit
region*, and ONE compiled program is timed at one call vs two back-to-back
calls — the difference is the pure device time of one program execution
(the second launch's host dispatch overlaps the first's device run). This
removes host->device dispatch and transfer overhead (which on tunneled
devices can exceed the compute itself) and measures pure device throughput,
the number that governs production serving where weights stay resident.
Earlier rounds differenced two scan LENGTHS (two separate XLA programs);
one program halves the cold compile and removes cross-program variance —
measured rates agree (BENCH.md round-4 log).

``vs_baseline`` normalizes against 25 chips/sec — the reference PyTorch
implementation publishes no latency numbers; 25/s is the typical measured
fp16 batch-16 figure for torch S2ANet R-50-FPN at 1024^2 on a V100-class GPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_CHIPS_PER_SEC = 25.0


def _bench_loader(size: int, batch: int, n_imgs: int = 24):
    """Measure host input-pipeline throughput on a synthetic on-disk dataset.

    Returns (cold_rate, packed_rate) imgs/s:
      cold   — PNG decode + letterbox + augment + batch assembly;
      packed — same pipeline served from the pre-decoded mmap shard
               (``cache_images='packed'``), i.e. the warm-epoch rate.
    Worker kind: forked processes when the host has >1 core, threads
    otherwise (both paths produce identical batches).
    """
    import os
    import tempfile
    import time as _time
    from pathlib import Path

    import cv2
    import numpy as np

    from s2anet_tpu.data.dota import BatchLoader, DotaDataset

    rng = np.random.default_rng(0)
    root = Path(tempfile.mkdtemp(prefix="bench_loader_")) / "images"
    (root.parent / "labels").mkdir(parents=True)
    root.mkdir()
    for i in range(n_imgs):
        img = rng.integers(0, 255, (size, size, 3), np.uint8)
        cv2.imwrite(str(root / f"im{i:03d}.png"), img)
        lines = []
        for _ in range(20):
            cx, cy = rng.uniform(0.2, 0.8, 2)
            w, h = rng.uniform(0.02, 0.08, 2)
            lines.append(
                "3 " + " ".join(
                    f"{v:.6f}" for v in
                    (cx - w, cy - h, cx + w, cy - h,
                     cx + w, cy + h, cx - w, cy + h)
                )
            )
        (root.parent / "labels" / f"im{i:03d}.txt").write_text("\n".join(lines))
    mode = "process" if (os.cpu_count() or 1) > 1 else "thread"

    def rate(cache):
        ds = DotaDataset(root, img_size=size, augment=True, max_gt=64,
                         cache_images=cache)
        loader = BatchLoader(ds, batch, shuffle=True, drop_last=True,
                             mode=mode)
        for _ in loader:  # warm the pools + page cache
            pass
        t0 = _time.perf_counter()
        n = 0
        for b in loader:
            n += len(b["imgs"])
        return n / (_time.perf_counter() - t0)

    return rate(""), rate("packed")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from s2anet_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    from s2anet_tpu.models.detector import S2ANet
    from s2anet_tpu.models.head import s2anet_get_bboxes

    from s2anet_tpu.utils.config import ModelConfig

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    size = 1024
    n_long = 6
    model = S2ANet(backbone_name="resnet50", num_classes=15)
    # NMS/decode params = the product defaults (config.py ModelConfig), so the
    # bench measures exactly what `val.py` runs
    mc = ModelConfig()
    post_kwargs = dict(
        score_thr=mc.score_thr,
        iou_thr=mc.nms_iou_thr,
        max_before_nms_per_level=mc.max_before_nms_per_level,
        max_per_img=mc.max_per_img,
        pre_nms_cap=mc.pre_nms_cap,
    )

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.uniform(size=(n_long, batch, size, size, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    print(f"init (batch={batch}, {size}x{size}, "
          f"{jax.devices()[0].platform})...", file=sys.stderr)
    # record which deformable-conv path this bench actually measures: the
    # default config is deform_impl="auto" = Pallas hat kernel iff its
    # trial compile passes on this backend, else the XLA gather path
    import os as _os

    from s2anet_tpu.ops.pallas.deform_kernel import hat_kernel_supported

    _impl = _os.environ.get("S2A_DEFORM_IMPL", "") or (
        "hat" if hat_kernel_supported() else "gather")
    print(f"deform impl: {_impl}", file=sys.stderr)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3), jnp.bfloat16),
                           train=False)
    # serving-time conv+BN weight folding (models/fold.py) — the val.py /
    # predict.py load-time default (ModelConfig.fold_bn=True), so the bench
    # keeps measuring exactly what standalone inference runs
    from s2anet_tpu.models.fold import fold_bn_for_eval

    model, variables = fold_bn_for_eval(model, variables)

    def make_scan(n, mdl):
        @jax.jit
        def fn(variables, imgs):
            def body(c, im):
                out = mdl.apply(variables, im, train=False)
                det_boxes, det_labels, det_valid = s2anet_get_bboxes(
                    out, **post_kwargs
                )
                return c + det_boxes.sum().astype(jnp.float32), ()
            s, _ = jax.lax.scan(body, 0.0, imgs)
            return s
        return fn

    def differenced_rate(mdl, vs):
        """chips/s from ONE compiled scan program timed at one vs two
        back-to-back calls (see module docstring); returns
        (chips_per_sec, compile_s)."""
        f = make_scan(n_long, mdl)
        t0 = time.perf_counter()
        f = f.lower(vs, imgs).compile()
        float(f(vs, imgs))
        compile_s = time.perf_counter() - t0
        t1s, t2s = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(vs, imgs))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            r1 = f(vs, imgs)
            r2 = f(vs, imgs)
            float(r1), float(r2)
            t2s.append(time.perf_counter() - t0)
        # host-timing jitter can squeeze dt toward 0 (or negative) and emit
        # inf/negative rates into the headline JSON; the two-call wall must
        # exceed the one-call wall by a sane fraction of the device time
        for _ in range(4):
            dt = min(t2s) - min(t1s)
            if dt > 0.25 * min(t1s):
                break
            t0 = time.perf_counter()
            float(f(vs, imgs))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            r1, r2 = f(vs, imgs), f(vs, imgs)
            float(r1), float(r2)
            t2s.append(time.perf_counter() - t0)
        else:
            raise RuntimeError(
                f"differenced timing unstable: one-call min {min(t1s):.4f}s "
                f"vs two-call min {min(t2s):.4f}s — dispatch jitter exceeds "
                "the device time; re-run on a quieter host/tunnel")
        return n_long * batch / dt, compile_s

    chips_per_sec, compile_s = differenced_rate(model, variables)
    print(f"compile+first: {compile_s:.1f}s", file=sys.stderr)

    # --- int8 PTQ serving rate (the `val.py --quant int8` path) ---
    # calibrate per-tensor activation ranges on one synthetic batch, then
    # run the quantized program through the same differenced scan. Reported
    # as extra JSON keys; the headline stays float (the reference protocol
    # is fp16 eval — int8 is a beyond-reference serving mode, accuracy-
    # checked against the converged synthetic checkpoint in BENCH.md).
    int8_chips_per_sec = None
    try:
        from s2anet_tpu.ops.quant import calibrate

        # per-module scope: S2A_QUANT_SCOPE env (comma list) for A/B runs,
        # default = the config default (the measured argmax)
        scope = tuple(
            s.strip() for s in _os.environ.get(
                "S2A_QUANT_SCOPE", ",".join(mc.quant_scope)
            ).split(",") if s.strip()
        )
        model_q = model.clone(quant_scope=scope)
        qranges = calibrate(model_q, variables, imgs[:1])
        vars_q = dict(variables)
        vars_q["quant"] = qranges
        int8_chips_per_sec, compile_q = differenced_rate(
            model_q.clone(quant="int8"), vars_q)
        print(f"int8 (scope={','.join(scope)}): "
              f"{int8_chips_per_sec:.1f} chips/s "
              f"({int8_chips_per_sec / chips_per_sec:.2f}x float; "
              f"compile {compile_q:.1f}s)", file=sys.stderr)
    except Exception as e:
        print(f"int8 bench: skipped ({e})", file=sys.stderr)

    # --- MFU diagnostic (stderr): model FLOP rate vs measured matmul peak ---
    # FLOPs counted analytically from the jaxpr (2 x MACs over every
    # dot/conv): XLA's cost_analysis undercounts convs ~7x on this backend
    # (65 vs 445 GFLOP/chip) and produced round-2's misleading "8% MFU".
    try:
        from s2anet_tpu.utils.flops import count_fn_flops, measure_matmul_peak

        # MFU numerator = the model's ALGORITHMIC FLOPs, traced on the
        # gather deform path: the hat kernel generates its bilinear-sampling
        # matrix as extra MXU matmuls, and counting those implementation
        # FLOPs would inflate MFU without more useful work done (same
        # convention as excluding remat recompute FLOPs)
        model_nominal = model.clone(deform_impl="gather")

        def one_batch(v, im):
            out = model_nominal.apply(v, im, train=False)
            return s2anet_get_bboxes(out, **post_kwargs)

        per_chip_flops = count_fn_flops(
            one_batch, variables, imgs[0]
        ) / batch
        peak = measure_matmul_peak()
        mfu = (per_chip_flops * chips_per_sec) / peak
        print(
            f"model {per_chip_flops / 1e9:.0f} GFLOP/chip (analytic), "
            f"measured matmul peak {peak / 1e12:.1f} TFLOP/s, "
            f"MFU {100 * mfu:.1f}%",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"mfu: skipped ({e})", file=sys.stderr)

    # --- host loader throughput (stderr): is the device rate feedable? ---
    # NOTE: scales with host cores — production TPU-VM hosts have 100+;
    # a 1-core tunnel host will report a bound far below the device rate.
    try:
        import os

        ncpu = os.cpu_count() or 1
        cold_rate, packed_rate = _bench_loader(size, batch)
        print(
            f"host loader: cold {cold_rate:.1f} imgs/s, packed-cache "
            f"{packed_rate:.1f} imgs/s on {ncpu} host core(s) "
            f"(~{cold_rate / ncpu:.1f}/{packed_rate / ncpu:.1f} per core; "
            f"device rate {chips_per_sec:.1f}/s needs ~"
            f"{max(1, round(chips_per_sec / max(packed_rate / ncpu, 1e-9)))} "
            "cores warm)",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"loader bench: skipped ({e})", file=sys.stderr)

    result = {
        "metric": "s2anet_r50_1024_infer_throughput_e2e",
        "value": round(chips_per_sec, 2),
        "unit": "chips/sec/chip",
        "vs_baseline": round(chips_per_sec / BASELINE_CHIPS_PER_SEC, 3),
    }
    if int8_chips_per_sec is not None:
        result["int8_chips_per_sec"] = round(int8_chips_per_sec, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
