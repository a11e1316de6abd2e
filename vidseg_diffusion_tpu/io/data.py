"""Datasets + host→device prefetch.

Counterpart of sgm/data/ (StableDataModuleFromConfig webdataset shim,
MNIST/CIFAR toy modules — training-only in the reference, dataset.py:8-17)
plus the TPU-native piece the reference lacks: a double-buffered
host→device prefetch iterator so VSPW frame ingest overlaps with compute
(SURVEY.md §7.7).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import jax
import numpy as np


def prefetch_to_device(
    iterator: Iterator,
    size: int = 2,
    device=None,
) -> Iterator:
    """Double-buffered host→HBM prefetch: a background thread stages the
    next `size` batches onto the device while the current one computes."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def producer():
        try:
            for item in iterator:
                q.put(jax.device_put(item, device))
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item


class VideoFolderDataset:
    """Iterates (frames [T,H,W,3] in [-1,1], names, video_name) over a VSPW-
    style root of <video>/origin frame folders."""

    def __init__(
        self,
        root: str,
        video_names: Optional[Sequence[str]] = None,
        subdir: str = "origin",
    ):
        self.root = root
        self.subdir = subdir
        if video_names is None:
            video_names = sorted(
                d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
            )
        self.video_names = list(video_names)

    def __len__(self):
        return len(self.video_names)

    def __iter__(self):
        from vidseg_diffusion_tpu.io.video import list_video_frames, load_frames

        for name in self.video_names:
            d = os.path.join(self.root, name, self.subdir)
            if not os.path.isdir(d):
                d = os.path.join(self.root, name)
            paths = list_video_frames(d)
            frames, fnames, ori_hw = load_frames(paths)
            yield frames, fnames, name, ori_hw


def synthetic_image_dataset(
    n: int, shape=(32, 32, 3), num_classes: int = 10, seed: int = 0
):
    """Toy in-memory dataset (MNIST/CIFAR stand-in; the reference's toy data
    modules download via torchvision, unavailable offline)."""
    rng = np.random.RandomState(seed)
    x = rng.rand(n, *shape).astype(np.float32) * 2.0 - 1.0
    y = rng.randint(0, num_classes, n)
    return x, y


def batch_iterator(x: np.ndarray, y: np.ndarray, batch: int, seed: int = 0):
    rng = np.random.RandomState(seed)
    n = x.shape[0]
    while True:
        idx = rng.permutation(n)
        for s in range(0, n - batch + 1, batch):
            sel = idx[s : s + batch]
            yield x[sel], y[sel]
