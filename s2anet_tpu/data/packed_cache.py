"""Packed pre-decoded image cache: one mmap-able shard file per dataset.

The reference's ``--cache disk`` writes one ``.npy`` sidecar per image
(/root/reference/utils/datasets_rotation.py:368-388) — better than PNG
decode, but still one open()+read() per image and one filesystem entry per
sample. For a production host feeding a TPU chip the right format is a
single packed shard:

  * ``images.pack.bin`` — all decoded BGR uint8 images back to back,
    page-aligned, written once on the first pass;
  * ``images.pack.idx.npz`` — offsets + shapes + a content key (per-source
    mtime/size hash, so re-chipped datasets invalidate automatically).

Warm epochs then cost one ``np.memmap`` view per image — zero syscalls,
zero decode, zero copies until augmentation materializes the crop; the OS
page cache holds the hot set and readahead streams the rest at disk speed.
"""

from __future__ import annotations

import hashlib
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_ALIGN = 4096  # page alignment for each image record


def _content_key(paths: Sequence[Path]) -> str:
    h = hashlib.sha1()
    for p in paths:
        try:
            st = Path(p).stat()
            h.update(f"{p}:{st.st_mtime_ns}:{st.st_size}|".encode())
        except OSError:
            h.update(f"{p}:missing|".encode())
    return h.hexdigest()


class PackedImageCache:
    """Build-once / mmap-forever decoded-image store."""

    def __init__(self, img_files: Sequence[Path], cache_dir: Optional[Path] = None):
        self.img_files = [Path(p) for p in img_files]
        base = Path(cache_dir) if cache_dir else (
            self.img_files[0].parent if self.img_files else Path(".")
        )
        self.bin_path = base / "images.pack.bin"
        self.idx_path = base / "images.pack.idx.npz"
        self._mm = None
        self._offsets = None
        self._shapes = None

    # ------------------------------------------------------------- build
    def valid(self) -> bool:
        """True when the pack exists and matches the current source images."""
        try:
            z = np.load(self.idx_path, allow_pickle=False)
            if str(z["key"]) != _content_key(self.img_files):
                return False
            need = int(z["offsets"][-1])
            return self.bin_path.stat().st_size >= need
        except Exception:
            return False

    def build(self, decode=None, workers: int = 0) -> None:
        """Decode every image once and write the pack (idempotent)."""
        import cv2

        if self.valid():
            return
        decode = decode or (lambda p: cv2.imread(str(p)))
        n = len(self.img_files)
        offsets = np.zeros(n + 1, np.int64)
        shapes = np.zeros((n, 3), np.int32)

        def _sizes(img):
            return ((img.nbytes + _ALIGN - 1) // _ALIGN) * _ALIGN

        with open(self.bin_path, "wb") as f:
            pos = 0
            for i, p in enumerate(self.img_files):
                img = decode(p)
                if img is None:
                    raise FileNotFoundError(p)
                img = np.ascontiguousarray(img, dtype=np.uint8)
                shapes[i] = img.shape
                offsets[i] = pos
                f.write(img.tobytes())
                pad = _sizes(img) - img.nbytes
                if pad:
                    f.write(b"\0" * pad)
                pos += _sizes(img)
            offsets[n] = pos
        np.savez(
            self.idx_path,
            key=np.str_(_content_key(self.img_files)),
            offsets=offsets,
            shapes=shapes,
        )
        self._mm = None  # re-open on next get

    # -------------------------------------------------------------- read
    def _ensure_open(self):
        if self._mm is None:
            z = np.load(self.idx_path, allow_pickle=False)
            self._offsets = z["offsets"]
            self._shapes = z["shapes"]
            self._mm = np.memmap(self.bin_path, dtype=np.uint8, mode="r")

    def get(self, i: int) -> np.ndarray:
        """Image i as a zero-copy BGR uint8 view into the pack."""
        self._ensure_open()
        h, w, c = (int(v) for v in self._shapes[i])
        off = int(self._offsets[i])
        return self._mm[off: off + h * w * c].reshape(h, w, c)

    def __len__(self):
        return len(self.img_files)

    def __getstate__(self):
        # picklable / fork-safe: the memmap re-opens lazily in each process
        d = dict(self.__dict__)
        d["_mm"] = None
        d["_offsets"] = None
        d["_shapes"] = None
        return d
