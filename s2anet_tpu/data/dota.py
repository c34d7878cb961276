"""DOTA dataset + batch loader (host-side, NumPy; feeds the jit'd steps).

Replaces the reference's torch Dataset/DataLoader stack
(/root/reference/utils/datasets_rotation.py:92-768) with a thread-prefetched
NumPy pipeline producing fixed-shape batches:

  * YOLO-rotated label files: ``cls x1 y1 ... y4`` normalized (verify +
    memory cache, mirroring the .cache mechanism at datasets_rotation.py:294-327);
  * augmentation: fliplr / flipud / 90-degree rotation / HSV (the 70.7 recipe);
  * polygons convert to (x, y, w, h, theta) once per sample via the exact
    min-area-rect (datasets_rotation.py:516 uses cv2.minAreaRect);
  * output: ``imgs [B, S, S, 3] float32 in [0, 1]`` (RGB) and padded targets
    ``gt_boxes [B, G, 5]`` (pixels/radians), ``gt_classes [B, G]``,
    ``gt_mask [B, G]`` — the static shapes the masked assigner consumes;
  * per-host sharding for multi-process data parallelism (the
    DistributedSampler analogue, datasets_rotation.py:111).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

from ..ops.rbox import poly_to_rbox_np
from . import augment as A

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")


def load_dota_label(path) -> np.ndarray:
    """YOLO-rotated label file -> [N, 9] (cls, x1..y4 normalized)."""
    path = Path(path)
    if not path.exists():
        return np.zeros((0, 9), np.float32)
    rows = []
    for line in path.read_text().splitlines():
        parts = line.split()
        if len(parts) != 9:
            continue
        rows.append([float(v) for v in parts])
    if not rows:
        return np.zeros((0, 9), np.float32)
    arr = np.array(rows, np.float32)
    # validity guards (verify_image_label, datasets_rotation.py:667-713)
    arr = arr[(arr[:, 1:] >= 0).all(1) & (arr[:, 1:] <= 1).all(1)]
    return arr


def _img2label(img_path: Path) -> Path:
    parts = list(img_path.parts)
    for i in range(len(parts) - 1, -1, -1):
        if parts[i] == "images":
            parts[i] = "labels"
            return Path(*parts).with_suffix(".txt")
    return img_path.with_suffix(".txt")


class DotaDataset:
    """Index of (image, label) pairs with on-the-fly augmentation."""

    def __init__(
        self,
        source,
        img_size: int = 1024,
        max_gt: int = 512,
        augment: bool = False,
        fliplr: float = 0.5,
        flipud: float = 0.0,
        rot90: bool = True,
        hsv=(0.0, 0.0, 0.0),
        mosaic: float = 0.0,
        mixup: float = 0.0,
        translate: float = 0.0,
        scale: float = 0.0,
        pad_value: int = 114,
        class_names: Optional[Sequence[str]] = None,
        verify: bool = False,
        cache_images: str = "",        # "" | "ram" | "disk" | "packed"
        cache_labels: bool = True,
    ):
        self.img_size = img_size
        self.max_gt = max_gt
        self.augment = augment
        self.fliplr = fliplr
        self.flipud = flipud
        self.rot90 = rot90
        self.hsv = hsv
        self.mosaic = mosaic
        self.mixup = mixup
        self.translate = translate
        self.scale = scale
        self.pad_value = pad_value
        self.class_names = class_names

        src = Path(source)
        if src.is_dir():
            self.img_files = sorted(
                p for p in src.rglob("*") if p.suffix.lower() in IMG_EXTS
            )
        else:  # txt list of image paths (data yaml style)
            self.img_files = [
                Path(line.strip())
                for line in src.read_text().splitlines()
                if line.strip()
            ]
        if verify:
            # drop unreadable images up front (verify_image_label analogue,
            # datasets_rotation.py:667-713 — fail-safe instead of mid-epoch
            # crashes; corrupt files are reported, not silently restored)
            ok = []
            dropped = 0
            for p in self.img_files:
                try:
                    from PIL import Image

                    with Image.open(p) as im:
                        im.verify()
                    ok.append(p)
                except Exception:
                    dropped += 1
            if dropped:
                import logging

                logging.getLogger(__name__).warning(
                    "DotaDataset: dropped %d unreadable images", dropped
                )
            self.img_files = ok
        self.label_files = [_img2label(p) for p in self.img_files]
        self.labels = self._load_labels(cache_labels)
        self.cache_images = cache_images
        self._img_cache = (
            [None] * len(self.img_files) if cache_images == "ram" else None
        )
        self._pack = None
        if cache_images == "packed" and self.img_files:
            # one mmap-able pre-decoded shard: warm epochs skip PNG decode
            # entirely and read at page-cache speed (packed_cache.py)
            from .packed_cache import PackedImageCache

            self._pack = PackedImageCache(self.img_files)
            self._pack.build()

    # -- label cache (datasets_rotation.py:294-327: hash-validated .cache) --
    def _cache_key(self) -> str:
        import hashlib

        h = hashlib.sha1()
        for p in self.label_files:
            try:
                st = p.stat()
                h.update(f"{p}:{st.st_mtime_ns}:{st.st_size}|".encode())
            except OSError:
                h.update(f"{p}:missing|".encode())
        return h.hexdigest()

    def _load_labels(self, use_cache: bool):
        cache_path = None
        if use_cache and self.img_files:
            cache_path = self.img_files[0].parent / "labels.cache.npz"
            key = self._cache_key()
            try:
                z = np.load(cache_path, allow_pickle=False)
                if str(z["key"]) == key:
                    flat, offs = z["flat"], z["offsets"]
                    return [
                        flat[offs[i]:offs[i + 1]].reshape(-1, 9)
                        for i in range(len(self.img_files))
                    ]
            except Exception:
                pass
        labels = [load_dota_label(p) for p in self.label_files]
        if cache_path is not None:
            try:
                flat = (np.concatenate([l.reshape(-1) for l in labels])
                        if labels else np.zeros((0,), np.float32))
                offs = np.zeros(len(labels) + 1, np.int64)
                np.cumsum([l.size for l in labels], out=offs[1:])
                np.savez(cache_path, key=np.str_(key), flat=flat, offsets=offs)
            except Exception:
                pass  # read-only dataset dir — cache is best-effort
        return labels

    def __len__(self):
        return len(self.img_files)

    def shapes(self) -> np.ndarray:
        """Per-image original (h0, w0), header-read once and disk-cached —
        powers rect batching (the reference caches shapes in its label
        .cache, datasets_rotation.py:294-327)."""
        if getattr(self, "_shapes", None) is not None:
            return self._shapes
        cache_path = (self.img_files[0].parent / "shapes.cache.npz"
                      if self.img_files else None)
        key = self._shape_key()
        if cache_path is not None:
            try:
                z = np.load(cache_path, allow_pickle=False)
                if str(z["key"]) == key:
                    self._shapes = z["shapes"]
                    return self._shapes
            except Exception:
                pass
        from PIL import Image

        shapes = np.zeros((len(self.img_files), 2), np.int32)
        for i, p in enumerate(self.img_files):
            try:
                with Image.open(p) as im:
                    shapes[i] = (im.size[1], im.size[0])
            except Exception:
                shapes[i] = (self.img_size, self.img_size)
        self._shapes = shapes
        if cache_path is not None:
            try:
                np.savez(cache_path, key=np.str_(key), shapes=shapes)
            except Exception:
                pass
        return shapes

    def _shape_key(self) -> str:
        # one fingerprint rule for every image-derived cache (shapes +
        # packed store): see packed_cache._content_key
        from .packed_cache import _content_key

        return _content_key(self.img_files)

    def load_image(self, i: int) -> np.ndarray:
        """Decode (or fetch cached) image i, BGR uint8.

        ``cache_images="ram"`` keeps decoded arrays resident (the reference's
        --cache ram, datasets_rotation.py:360-388); ``"disk"`` stores raw
        .npy sidecars so later epochs skip PNG decode; ``"packed"`` serves
        zero-copy views from the single pre-decoded mmap shard."""
        import cv2

        if self._img_cache is not None and self._img_cache[i] is not None:
            return self._img_cache[i]
        if self._pack is not None:
            return self._pack.get(i)
        path = self.img_files[i]
        if self.cache_images == "disk":
            npy = path.with_suffix(".npy")
            try:
                # serve the sidecar only when it is newer than the source
                # image — regenerated/re-chipped images must not yield stale
                # cached pixels
                if npy.stat().st_mtime >= path.stat().st_mtime:
                    return np.load(npy)
            except OSError:
                pass
        img = cv2.imread(str(path))
        if img is None:
            raise FileNotFoundError(path)
        if self._img_cache is not None:
            self._img_cache[i] = img
        elif self.cache_images == "disk":
            try:
                np.save(path.with_suffix(".npy"), img)
            except Exception:
                pass
        return img

    def _load_fitted(self, i: int, target_shape=None):
        """Image letterboxed to ``target_shape`` (default: square img_size)
        + pixel-space polygons + classes."""
        img = self.load_image(i)  # BGR uint8
        h0, w0 = img.shape[:2]
        label = self.labels[i]
        cls = label[:, 0].astype(np.int32)
        polys = label[:, 1:].copy()
        polys[:, 0::2] *= w0
        polys[:, 1::2] *= h0
        tgt = tuple(target_shape or (self.img_size, self.img_size))
        if (h0, w0) != tgt:
            img, ratio, pad = A.letterbox(img, tgt, self.pad_value)
            polys = A.scale_polys(polys, ratio, pad)
        return img, polys, cls, (h0, w0)

    def get_sample(self, i: int, rng: Optional[np.random.Generator] = None,
                   target_shape=None) -> Dict:
        rng = rng or np.random.default_rng()
        img, polys, cls, (h0, w0) = self._load_fitted(i, target_shape)

        if self.augment and rng.uniform() < self.mosaic:
            others = [
                self._load_fitted(int(rng.integers(0, len(self))))[:3]
                for _ in range(3)
            ]
            canvas, polys, cls = A.mosaic4(
                [(img, polys, cls)] + list(others), self.img_size,
                self.pad_value, rng,
            )
            # 2s x 2s mosaic -> scale-preserving center crop back to s x s
            # (the reference's border=-s/2 warp, datasets_rotation.py:655-660)
            img, polys, cls = A.mosaic_center_crop(
                canvas, polys, cls, self.img_size
            )

        if self.augment and rng.uniform() < self.mixup:
            j = int(rng.integers(0, len(self)))
            img2, polys2, cls2, _ = self._load_fitted(j)
            img, polys, cls = A.mixup(img, polys, cls, img2, polys2, cls2, rng)

        if self.augment and (self.translate or self.scale):
            img, polys = A.random_perspective_rotation(
                img, polys, degrees=0.0, translate=self.translate,
                scale=self.scale, rng=rng,
            )

        if self.augment:
            if any(self.hsv):
                img = A.hsv_augment(img, *self.hsv, rng=rng)
            if self.rot90:
                img, polys = A.rot90_image_and_polys(
                    img, polys, int(rng.integers(0, 4))
                )
            if rng.uniform() < self.fliplr:
                polys = A.fliplr_polys(img.shape[1], polys)
                img = img[:, ::-1]
            if rng.uniform() < self.flipud:
                polys = A.flipud_polys(img.shape[0], polys)
                img = img[::-1]
            keep = A.filter_polys_center_inside(
                polys, img.shape[0], img.shape[1]
            )
            polys, cls = polys[keep], cls[keep]

        rboxes = (
            poly_to_rbox_np(polys).astype(np.float32)
            if len(polys)
            else np.zeros((0, 5), np.float32)
        )
        # drop degenerate boxes (zero side)
        ok = (rboxes[:, 2] > 1e-3) & (rboxes[:, 3] > 1e-3)
        rboxes, cls = rboxes[ok], cls[ok]

        g = self.max_gt
        n = min(len(rboxes), g)
        gt_boxes = np.zeros((g, 5), np.float32)
        gt_classes = np.zeros((g,), np.int32)
        gt_mask = np.zeros((g,), bool)
        gt_boxes[:n] = rboxes[:n]
        gt_classes[:n] = cls[:n]
        gt_mask[:n] = True

        # one copy total: BGR->RGB view, then astype materializes contiguous
        # float32 (flip/rot90 upstream stay views), scaled in place
        rgb = img[:, :, ::-1].astype(np.float32)
        rgb *= 1.0 / 255.0
        return {
            "imgs": rgb,
            "gt_boxes": gt_boxes,
            "gt_classes": gt_classes,
            "gt_mask": gt_mask,
            "path": str(self.img_files[i]),
            "orig_shape": (h0, w0),
            "img_shape": tuple(img.shape[:2]),
        }


class BatchLoader:
    """Shuffling, sharded, prefetched batch iterator (threads or processes).

    Per-host sharding (``shard``/``num_shards``) is the jax.process analogue
    of DistributedSampler; epoch-seeded shuffling mirrors
    sampler.set_epoch (train.py:311-312).

    ``mode="process"`` runs the decode+augment workers as forked PROCESSES
    writing straight into shared-memory batch slots — cv2/numpy hold the GIL
    for much of a sample's host work, so threads stop scaling after a few
    cores while a TPU-VM host has ~100; processes + shm make the loader
    scale with cores (the DataLoader(num_workers=N) analogue,
    datasets_rotation.py:120-128). Falls back to threads when fork is
    unavailable. Batch order and augmentation randomness are IDENTICAL in
    both modes (the rng is seeded per batch index, not per worker).
    """

    def __init__(
        self,
        dataset: DotaDataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        shard: int = 0,
        num_shards: int = 1,
        drop_last: bool = True,
        num_workers: Optional[int] = None,   # None = auto per mode
        prefetch: int = 4,
        mode: str = "thread",                # "thread" | "process"
        rect: bool = False,
        rect_stride: int = 32,
        rect_pad: float = 0.5,
    ):
        import os

        if num_workers is None:
            cores = os.cpu_count() or 1
            num_workers = cores if mode == "process" else min(4, cores)
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.shard = shard
        self.num_shards = num_shards
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = max(prefetch, 2)
        self.mode = mode
        # rect batching (reference val.py:219 rect=True, pad=0.5;
        # datasets_rotation.py:250-420): images ordered by aspect ratio,
        # each batch letterboxed to its own minimal shape rounded up to
        # rect_stride — a handful of static shapes, so only a handful of
        # compiled programs. Eval-only (mutually exclusive with shuffle).
        self.rect = rect
        self.rect_stride = rect_stride
        self.rect_pad = rect_pad
        if rect:
            assert not shuffle, "rect batching is shape-ordered (eval only)"
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.ds) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self):
        idx = np.arange(len(self.ds))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        # equalized shard lengths: every shard yields exactly
        # len(ds) // num_shards samples, so multi-host training runs the
        # same step count on every process (unequal lengths would deadlock
        # the collectives mid-epoch)
        return idx[self.shard:: self.num_shards][: len(self.ds) // self.num_shards]

    def _batch_plan(self):
        """List of (batch_indices, target_shape_or_None)."""
        idx = self._indices()
        nb = len(self)
        if not self.rect:
            return [
                (idx[i * self.batch_size:(i + 1) * self.batch_size], None)
                for i in range(nb)
            ]
        # shape-ordered batches with per-batch minimal letterbox shape
        # (datasets_rotation.py:250-420 semantics, stride = max feature
        # stride so every level sees whole cells)
        shapes = self.ds.shapes()[idx].astype(np.float64)  # (h0, w0)
        ar = shapes[:, 0] / shapes[:, 1]
        idx = idx[np.argsort(ar, kind="stable")]
        ar = np.sort(ar, kind="stable")
        s, st, pad = self.ds.img_size, self.rect_stride, self.rect_pad
        plan = []
        for i in range(nb):
            sl = slice(i * self.batch_size, (i + 1) * self.batch_size)
            bi = idx[sl]
            mini, maxi = float(ar[sl].min()), float(ar[sl].max())
            shape = [1.0, 1.0]
            if maxi < 1:
                shape = [maxi, 1.0]
            elif mini > 1:
                shape = [1.0, 1.0 / mini]
            tgt = tuple(
                int(np.ceil(v * s / st + pad) * st) for v in shape
            )
            plan.append((bi, tgt))
        return plan

    def __iter__(self):
        from concurrent.futures import ThreadPoolExecutor

        batches = self._batch_plan()
        nb = len(batches)
        rng_seed = self.seed * 100003 + self.epoch

        if self.mode == "process" and self.num_workers > 1 and nb:
            import multiprocessing as mp

            if "fork" in mp.get_all_start_methods():
                yield from self._iter_processes(batches, rng_seed)
                return
            # no fork (non-POSIX): fall through to the thread path

        def load(args):
            bi, (batch_idx, tshape) = args
            rng = np.random.default_rng(rng_seed + bi)
            samples = [
                self.ds.get_sample(int(j), rng, target_shape=tshape)
                for j in batch_idx
            ]
            out = {
                k: np.stack([s[k] for s in samples])
                for k in ("imgs", "gt_boxes", "gt_classes", "gt_mask")
            }
            out["paths"] = [s["path"] for s in samples]
            out["orig_shapes"] = [s["orig_shape"] for s in samples]
            out["img_shapes"] = [s["img_shape"] for s in samples]
            return out

        if self.num_workers <= 1:
            for args in enumerate(batches):
                yield load(args)
            return

        with ThreadPoolExecutor(self.num_workers) as pool:
            futures = []
            it = iter(enumerate(batches))
            for _ in range(min(self.prefetch, nb)):
                futures.append(pool.submit(load, next(it)))
            k = 0
            while futures:
                batch = futures.pop(0).result()
                try:
                    futures.append(pool.submit(load, next(it)))
                except StopIteration:
                    pass
                yield batch

    # ------------------------------------------------------ process mode
    def _img_capacity(self) -> int:
        """Max pixels per image a slot must hold (rect shapes can exceed
        the square size by up to one stride, reference rect semantics)."""
        s = self.ds.img_size
        if not self.rect:
            return s * s
        m = int(np.ceil(s / self.rect_stride + self.rect_pad)
                * self.rect_stride)
        return m * m

    def _slot_layout(self):
        b, g = self.batch_size, self.ds.max_gt
        cap = self._img_capacity()
        sizes = [b * cap * 3 * 4, b * g * 5 * 4, b * g * 4, b * g]
        offs = np.cumsum([0] + sizes)
        return offs, int(offs[-1])

    def _slot_views(self, buf):
        """Per-slot shared-memory views: (imgs_flat, gt_boxes, gt_classes,
        gt_mask). Images are stored flat; the consumer reshapes to the
        batch's target shape."""
        b, g = self.batch_size, self.ds.max_gt
        cap = self._img_capacity()
        offs, _ = self._slot_layout()
        return (
            np.frombuffer(buf, np.float32, b * cap * 3, offs[0]),
            np.frombuffer(buf, np.float32, b * g * 5, offs[1]).reshape(b, g, 5),
            np.frombuffer(buf, np.int32, b * g, offs[2]).reshape(b, g),
            np.frombuffer(buf, bool, b * g, offs[3]).reshape(b, g),
        )

    def _iter_processes(self, batches, rng_seed):
        import multiprocessing as mp
        from multiprocessing import shared_memory

        ctx = mp.get_context("fork")
        nb = len(batches)
        nslots = min(max(self.prefetch, self.num_workers), nb)
        nworkers = min(self.num_workers, nslots)

        _, slot_bytes = self._slot_layout()
        shms = [shared_memory.SharedMemory(create=True, size=slot_bytes)
                for _ in range(nslots)]
        task_q = ctx.Queue()
        res_q = ctx.Queue()
        workers = [
            ctx.Process(
                target=_batch_worker,
                args=(self, [sh.name for sh in shms], task_q, res_q, rng_seed),
                daemon=True,
            )
            for _ in range(nworkers)
        ]
        for w in workers:
            w.start()
        try:
            submitted = 0
            for slot in range(nslots):
                task_q.put((submitted, slot) + tuple(batches[submitted]))
                submitted += 1
            expected = 0
            ready = {}
            s = self.ds.img_size
            while expected < nb:
                bi, slot, b, paths, orig_shapes, img_shapes, err = res_q.get()
                if err is not None:
                    raise RuntimeError(f"loader worker failed:\n{err}")
                ready[bi] = (slot, b, paths, orig_shapes, img_shapes)
                while expected in ready:
                    slot, b, paths, orig_shapes, img_shapes = ready.pop(
                        expected)
                    imgs_f, boxes_v, cls_v, mask_v = self._slot_views(
                        shms[slot].buf)
                    th, tw = img_shapes[0] if img_shapes else (s, s)
                    out = {
                        # copy out before slot reuse
                        "imgs": np.array(
                            imgs_f[: b * th * tw * 3]
                        ).reshape(b, th, tw, 3),
                        "gt_boxes": np.array(boxes_v[:b]),
                        "gt_classes": np.array(cls_v[:b]),
                        "gt_mask": np.array(mask_v[:b]),
                        "paths": paths,
                        "orig_shapes": orig_shapes,
                        "img_shapes": img_shapes,
                    }
                    del imgs_f, boxes_v, cls_v, mask_v
                    if submitted < nb:
                        task_q.put(
                            (submitted, slot) + tuple(batches[submitted]))
                        submitted += 1
                    expected += 1
                    yield out
        finally:
            for _ in workers:
                task_q.put(None)
            for w in workers:
                w.join(timeout=5)
                if w.is_alive():
                    w.terminate()
            for sh in shms:
                try:
                    sh.close()
                    sh.unlink()
                except Exception:
                    pass


def _batch_worker(loader: "BatchLoader", shm_names, task_q, res_q, rng_seed):
    """Forked worker: load batches into shared-memory slots until sentinel."""
    import traceback
    from multiprocessing import shared_memory

    try:
        import cv2

        cv2.setNumThreads(0)  # one decode per worker; no nested thread pools
    except Exception:
        pass
    shms = [shared_memory.SharedMemory(name=n) for n in shm_names]
    views = [loader._slot_views(sh.buf) for sh in shms]
    while True:
        task = task_q.get()
        if task is None:
            break
        bi, slot, batch_idx, tshape = task
        try:
            rng = np.random.default_rng(rng_seed + bi)
            imgs_f, boxes_v, cls_v, mask_v = views[slot]
            paths, orig_shapes, img_shapes = [], [], []
            for k, j in enumerate(batch_idx):
                s = loader.ds.get_sample(int(j), rng, target_shape=tshape)
                n = s["imgs"].size
                imgs_f[k * n:(k + 1) * n] = s["imgs"].ravel()
                boxes_v[k] = s["gt_boxes"]
                cls_v[k] = s["gt_classes"]
                mask_v[k] = s["gt_mask"]
                paths.append(s["path"])
                orig_shapes.append(s["orig_shape"])
                img_shapes.append(s["img_shape"])
            res_q.put((bi, slot, len(batch_idx), paths, orig_shapes,
                       img_shapes, None))
        except Exception:
            res_q.put((bi, slot, 0, [], [], [], traceback.format_exc()))
    for sh in shms:
        sh.close()
