"""ShardedTarDataset: webdataset-semantics streaming reader
(counterpart of the reference's sdata/webdataset shim, sgm/data/dataset.py:8-17)."""

import io
import os
import tarfile

import numpy as np
import pytest

from vidseg_diffusion_tpu.io.data import (
    ShardedTarDataset,
    batched,
    brace_expand,
)


def _write_shard(path, keys, px=4):
    from PIL import Image

    with tarfile.open(path, "w") as tf:
        for i, key in enumerate(keys):
            img = Image.fromarray(
                np.full((px, px, 3), i * 10 % 255, np.uint8)
            )
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            data = buf.getvalue()
            ti = tarfile.TarInfo(f"{key}.png")
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
            cls = str(i % 3).encode()
            ti = tarfile.TarInfo(f"{key}.cls")
            ti.size = len(cls)
            tf.addfile(ti, io.BytesIO(cls))


def test_brace_expand():
    assert brace_expand("s-{000..002}.tar") == [
        "s-000.tar", "s-001.tar", "s-002.tar",
    ]
    assert brace_expand("plain.tar") == ["plain.tar"]


def test_grouping_and_decoding(tmp_path):
    shard = str(tmp_path / "s-000.tar")
    _write_shard(shard, [f"k{i:03d}" for i in range(5)])
    samples = list(ShardedTarDataset([shard]))
    assert len(samples) == 5
    assert samples[0]["__key__"] == "k000"
    assert samples[0]["png"].shape == (4, 4, 3)
    assert samples[2]["cls"] == 2
    keys = [s["__key__"] for s in samples]
    assert keys == sorted(keys)


def test_multi_shard_pattern_and_batching(tmp_path):
    for i in range(3):
        _write_shard(
            str(tmp_path / f"s-{i:03d}.tar"),
            [f"s{i}k{j}" for j in range(4)],
        )
    ds = ShardedTarDataset(str(tmp_path / "s-{000..002}.tar"))
    batches = list(batched(iter(ds), 4))
    assert len(batches) == 3
    assert batches[0]["png"].shape == (4, 4, 4, 3)
    assert batches[0]["cls"].shape == (4,)


def test_reservoir_shuffle_is_seeded_permutation(tmp_path):
    shard = str(tmp_path / "s-000.tar")
    keys = [f"k{i:03d}" for i in range(20)]
    _write_shard(shard, keys)
    a = [s["__key__"] for s in ShardedTarDataset([shard], shuffle=8, seed=1)]
    b = [s["__key__"] for s in ShardedTarDataset([shard], shuffle=8, seed=1)]
    c = [s["__key__"] for s in ShardedTarDataset([shard], shuffle=8, seed=2)]
    assert a == b                      # deterministic
    assert sorted(a) == sorted(keys)   # a permutation
    assert a != sorted(keys)           # actually shuffled
    assert a != c                      # seed-dependent


def test_repeat(tmp_path):
    shard = str(tmp_path / "s-000.tar")
    _write_shard(shard, ["a", "b"])
    it = iter(ShardedTarDataset([shard], repeat=True))
    got = [next(it)["__key__"] for _ in range(5)]
    assert got == ["a", "b", "a", "b", "a"]
