"""Host-side input pipeline: sharded record streaming -> device batches.

TPU-native replacement for the reference's ``tf.data`` graph
(tfdataset.get_a_dataset/load_dataset, tfdataset.py:193-304,517-917).  The
host only decodes bytes and assembles fixed-shape float32 batches; everything
from the waveform onward (normalize, mixup, STFT, mel) runs on device in one
jit graph (see :mod:`audio_training_tpu.data.preprocess`).

Semantics replicated from the reference:
* shard-file shuffle unless deterministic (tfdataset.py:193-197)
* a 4096-sample shuffle buffer (tfdataset.py:836-839)
* uniform interleaving of multiple source datasets (sample_from_datasets,
  tfdataset.py:843-848)
* corrupt-record skipping (ignore_errors, tfdataset.py:226)
* NaN/Inf sample filtering (filter_nan_samples, tfdataset.py:297-312)
* label one-hot with remap + generic-bird extra hit (tfdataset.py:546-578)
* mixup via a second, independently-shuffled stream instance
  (tfdataset.py:468-480)
* double-buffered host->device prefetch (prefetch AUTOTUNE, tfdataset.py:505)
"""

from __future__ import annotations

import json
import logging
import random
from dataclasses import dataclass
from pathlib import Path
from typing import Iterator, Optional

import jax
import numpy as np

from audio_training_tpu.data.schema import decode_sample
from audio_training_tpu.data.tfrecord import read_tfrecords
from audio_training_tpu.taxonomy.labels import LabelSpace

log = logging.getLogger(__name__)

SHUFFLE_BUFFER = 4096


def find_shards(data_dir: str | Path, split: str | None = None) -> list[Path]:
    d = Path(data_dir)
    if split is not None:
        d = d / split
    return sorted(d.glob("*.tfrecord"))


def load_meta(data_dir: str | Path) -> dict:
    """training-meta.json written by the dataset builder (build.py:795-814)."""
    return json.loads((Path(data_dir) / "training-meta.json").read_text())


@dataclass
class SampleBatch:
    raw: np.ndarray  # (B, samples) float32
    labels: np.ndarray  # (B, num_labels) float32


class RecordStream:
    """Infinite (or single-epoch) stream of decoded (raw, one_hot) samples
    from one dataset directory."""

    def __init__(
        self,
        shards: list[Path],
        label_space: LabelSpace,
        samples_per_clip: int,
        seed: int = 0,
        deterministic: bool = False,
        shuffle: bool = True,
        loop: bool = True,
        keep_unlabeled: bool = False,
        cache: bool = False,
        verify_crc: bool = False,
    ):
        if not shards:
            raise ValueError("no shard files found")
        self.shards = list(shards)
        self.space = label_space
        self.samples_per_clip = samples_per_clip
        self.rng = random.Random(seed)
        self.deterministic = deterministic
        self.shuffle = shuffle and not deterministic
        self.loop = loop
        self.keep_unlabeled = keep_unlabeled
        # .cache() parity (tfdataset.py:830-833): decoded samples are kept in
        # RAM after the first pass, so later epochs never touch gzip again.
        self.cache = cache
        self.verify_crc = verify_crc
        self._cached: list[tuple[np.ndarray, np.ndarray]] | None = None
        self._tag_index = {l: i for i, l in enumerate(label_space.source_labels)}

    def _one_hot(self, tags: list[str]) -> Optional[np.ndarray]:
        ids = [self._tag_index[t] for t in tags if t in self._tag_index]
        y = self.space.one_hot(ids)
        if y.sum() == 0 and not self.keep_unlabeled:
            return None
        return y

    def _decode_one(self, rec) -> Optional[tuple[np.ndarray, np.ndarray]]:
        try:
            s = decode_sample(rec)
        except Exception:
            return None  # ignore_errors parity (tfdataset.py:226)
        raw = s.raw
        if raw.size != self.samples_per_clip:
            if raw.size == 0:
                return None
            if raw.size < self.samples_per_clip:
                raw = np.pad(raw, (0, self.samples_per_clip - raw.size))
            else:
                raw = raw[: self.samples_per_clip]
        if not np.isfinite(raw).all():
            return None  # NaN/Inf filter (tfdataset.py:297-312)
        y = self._one_hot(s.tags)
        if y is None:
            return None
        return raw, y

    def _iter_decoded(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        if self.cache and self._cached is not None:
            while True:
                order = (
                    self.rng.sample(self._cached, len(self._cached))
                    if self.shuffle
                    else self._cached
                )
                yield from order
                if not self.loop:
                    return
        filling = [] if self.cache else None
        while True:
            order = list(self.shards)
            if self.shuffle:
                self.rng.shuffle(order)
            for shard in order:
                for rec in read_tfrecords(
                    shard, verify_crc=self.verify_crc, skip_errors=True
                ):
                    item = self._decode_one(rec)
                    if item is None:
                        continue
                    if filling is not None:
                        filling.append(item)
                    yield item
            if filling is not None:
                self._cached = filling
                filling = None
                if self.loop:
                    yield from self._iter_decoded()
                    return
            if not self.loop:
                return

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        if not self.shuffle:
            yield from self._iter_decoded()
            return
        # shuffle buffer (tf.data .shuffle(4096) parity)
        buf: list[tuple[np.ndarray, np.ndarray]] = []
        for item in self._iter_decoded():
            if len(buf) < SHUFFLE_BUFFER:
                buf.append(item)
                continue
            idx = self.rng.randrange(len(buf))
            yield buf[idx]
            buf[idx] = item
        self.rng.shuffle(buf)
        yield from buf

    def count(self) -> int:
        """Number of usable samples (one pass, decode-light)."""
        n = 0
        for shard in self.shards:
            for rec in read_tfrecords(shard, skip_errors=True):
                try:
                    s = decode_sample(rec, want_raw=False)
                except Exception:
                    continue
                if self._one_hot(s.tags) is not None:
                    n += 1
        return n


def interleave(
    streams: list[Iterator], weights: list[float] | None, seed: int = 0
) -> Iterator:
    """sample_from_datasets equivalent: draw each element from a randomly
    chosen stream (uniform unless weights given); a finished stream drops
    out (stop_on_empty_dataset=False, tfdataset.py:843-848)."""
    rng = random.Random(seed)
    streams = list(streams)
    weights = list(weights) if weights else [1.0] * len(streams)
    while streams:
        i = rng.choices(range(len(streams)), weights=weights)[0]
        try:
            yield next(streams[i])
        except StopIteration:
            del streams[i]
            del weights[i]


class BatchLoader:
    """Assemble fixed-shape batches and prefetch them to device.

    When ``mix_stream`` is given, each step also yields a partner batch from
    the second, independently shuffled pipeline instance — the host half of
    the reference's mixup zip (tfdataset.py:468-480).
    """

    def __init__(
        self,
        stream: Iterator[tuple[np.ndarray, np.ndarray]],
        batch_size: int,
        num_labels: int,
        samples_per_clip: int,
        mix_stream: Iterator[tuple[np.ndarray, np.ndarray]] | None = None,
        prefetch: int = 2,
        device=None,
        sharding=None,
    ):
        self.stream = stream
        self.mix_stream = mix_stream
        self.batch_size = batch_size
        self.num_labels = num_labels
        self.samples_per_clip = samples_per_clip
        self.prefetch = prefetch
        self.device = device
        self.sharding = sharding

    def _next_batch(self, stream) -> Optional[SampleBatch]:
        raw = np.empty((self.batch_size, self.samples_per_clip), np.float32)
        y = np.empty((self.batch_size, self.num_labels), np.float32)
        for i in range(self.batch_size):
            try:
                r, lbl = next(stream)
            except StopIteration:
                return None  # drop remainder (fixed shapes for jit)
            raw[i] = r
            y[i] = lbl
        return SampleBatch(raw, y)

    def _put(self, arr: np.ndarray):
        if self.sharding is not None:
            return jax.device_put(arr, self.sharding)
        if self.device is not None:
            return jax.device_put(arr, self.device)
        return jax.device_put(arr)

    def __iter__(self):
        import collections

        queue = collections.deque()

        def produce():
            b = self._next_batch(self.stream)
            if b is None:
                return None
            out = [self._put(b.raw), self._put(b.labels)]
            if self.mix_stream is not None:
                b2 = self._next_batch(self.mix_stream)
                if b2 is None:
                    return None
                out += [self._put(b2.raw), self._put(b2.labels)]
            return tuple(out)

        for _ in range(self.prefetch):
            item = produce()
            if item is None:
                break
            queue.append(item)
        while queue:
            item = queue.popleft()
            nxt = produce()
            if nxt is not None:
                queue.append(nxt)
            yield item


def build_training_stream(
    data_dirs: list[str | Path],
    split: str,
    label_space: LabelSpace,
    samples_per_clip: int,
    batch_size: int,
    seed: int = 0,
    augment: bool = False,
    deterministic: bool = False,
    weights: list[float] | None = None,
    sharding=None,
    cache: bool | None = None,
) -> BatchLoader:
    """End-to-end loader for one split over one or more dataset dirs
    (main/second/human dataset merging, audiomodel.py:1582-1644)."""

    # cache rule parity (tfdataset.py:830-833): non-train splits always cache;
    # train caching is opt-in (the full corpus may not fit in RAM).
    cache = cache if cache is not None else (split != "train")

    def make(seed_offset: int) -> Iterator:
        streams = []
        for i, d in enumerate(data_dirs):
            shards = find_shards(d, split)
            streams.append(
                iter(
                    RecordStream(
                        shards,
                        label_space,
                        samples_per_clip,
                        seed=seed + seed_offset + i * 97,
                        deterministic=deterministic,
                        loop=augment,  # training streams loop; eval is 1 pass
                        cache=cache,
                    )
                )
            )
        if len(streams) == 1:
            return streams[0]
        return interleave(streams, weights, seed=seed + seed_offset)

    mix = make(7919) if augment else None
    return BatchLoader(
        make(0),
        batch_size=batch_size,
        num_labels=label_space.num_labels,
        samples_per_clip=samples_per_clip,
        mix_stream=mix,
        sharding=sharding,
    )
