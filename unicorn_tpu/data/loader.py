"""Batching data loader with background prefetch (host side).

Replaces the reference's torch DataLoader + CUDA prefetcher stack
(unicorn/data/dataloading.py:26-121, data_prefetcher.py:15-173): a simple
thread-prefetched numpy batcher. Device transfer happens in the train loop
via jax.device_put with the mesh sharding (parallel/mesh.shard_batch), which
double-buffers naturally because dispatch is async.
"""
from __future__ import annotations

import queue
import random
import threading

import numpy as np


def seed_everything(seed: int):
    random.seed(seed)
    np.random.seed(seed % (2 ** 31))


class _RankMixin:
    """Rank-disjoint sampling for multi-host DP (the reference's
    DistributedSampler role, unicorn/data/samplers.py): each host must draw a
    DIFFERENT slice of the data or the global batch holds process_count copies
    of the same images. Sampling-style loaders (Uni/Inst) decorrelate by
    re-seeding both their own RNG and the process-global `random`/np.random
    streams the omni samplers use; DetLoader additionally strides its epoch
    order `rank::world`."""

    def set_rank(self, rank: int, world: int):
        base = getattr(self, "_seed", 0) + 7919 * rank
        seed_everything(base)
        self._rng = random.Random(base + 1)
        if hasattr(self, "_order"):
            self._order = list(range(len(self.dataset)))[rank::world]
            self._pos = 0
        return self


class UniLoader(_RankMixin):
    """Iterates (images (B,2,H,W,3), targets (B,2,M,6), task_ids (B,)) batches
    from an OmniDatasetPlus via a 2-frame transform.

    The alternating-task protocol matters: all samples in one batch share the
    same task (reference trainer alternates tasks every alter_step iters,
    trainer.py:454-460); `alter_every` flips the task internally.
    """

    def __init__(self, dataset, transform, batch_size: int, input_size,
                 alter_every: int = 1, prefetch: int = 2, seed: int = 0,
                 workers: int = 1):
        """workers > 1 runs that many transform threads (cv2/numpy release
        the GIL, so they scale on multi-core hosts — the reference's
        num_workers DataLoader role). Sampling + task alternation stay under
        one lock so the batch-level task protocol is preserved; batch
        ORDER across workers is nondeterministic, so keep workers=1 where
        bit-reproducibility matters (tests, seeded runs)."""
        self.dataset = dataset
        self.transform = transform
        self.batch_size = batch_size
        self.input_size = tuple(input_size)
        self.base_input_size = tuple(input_size)
        self.alter_every = alter_every
        self.prefetch = prefetch
        self.workers = max(1, int(workers))
        self._count = 0
        self._seed = seed
        self._rng = random.Random(seed)
        self._lock = threading.Lock()
        self._q: queue.Queue = queue.Queue(maxsize=max(prefetch, self.workers))
        self._threads: list = []
        self._stop = threading.Event()

    def _sample_batch(self):
        """Draw one batch's sample specs + flips under the lock, then load
        (decode images, read annotations) OUTSIDE it so the heavy I/O and the
        transforms both run in parallel across workers. Datasets without the
        sample_spec/load_spec split (e.g. test doubles) fall back to loading
        under the lock."""
        split = hasattr(self.dataset, "sample_spec")
        with self._lock:
            if split:
                specs = [self.dataset.sample_spec(0)
                         for _ in range(self.batch_size)]
            else:
                items = [self.dataset.pull_item(0)
                         for _ in range(self.batch_size)]
            flips = [self._rng.random() < 0.5 for _ in range(self.batch_size)]
            size = self.input_size
            self._count += 1
            if self.alter_every > 0 and self._count % self.alter_every == 0:
                self.dataset.alter_task()
        if split:
            items = [self.dataset.load_spec(s) for s in specs]
        return items, flips, size

    def _make_batch(self):
        items, flips, size = self._sample_batch()
        imgs, tgts, tids = [], [], []
        for (frames, task), flip in zip(items, flips):
            f_imgs, f_tgts = [], []
            for (img, res) in frames:
                im_t, lab_t = self.transform(img, res, size, joint=True,
                                             flip=flip)
                f_imgs.append(im_t)
                f_tgts.append(lab_t)
            imgs.append(np.stack(f_imgs))
            tgts.append(np.stack(f_tgts))
            tids.append(task)
        return (np.stack(imgs), np.stack(tgts),
                np.asarray(tids, np.int32))

    def _worker(self):
        # Build each batch ONCE and retry the put with the same batch on
        # queue.Full: rebuilding on Full would silently discard batches whose
        # construction had side effects (sampler RNG draws, task alternation,
        # DetLoader's strided epoch order) and burn host CPU re-decoding.
        batch = None
        while not self._stop.is_set():
            if batch is None:
                batch = self._make_batch()
            try:
                self._q.put(batch, timeout=1.0)
                batch = None
            except queue.Full:
                continue

    def set_input_size(self, size):
        """Multiscale training: future batches letterbox to `size` (the
        reference's random input-resize every 10 iters, trainer.py:449-453;
        here each distinct size is its own cached XLA compile)."""
        self.input_size = tuple(size)

    def start(self):
        if not self._threads:
            for _ in range(self.workers):
                t = threading.Thread(target=self._worker, daemon=True)
                t.start()
                self._threads.append(t)
        return self

    def stop(self):
        self._stop.set()

    def __iter__(self):
        self.start()
        return self

    def __next__(self):
        return self._q.get()


class UniMaskLoader(UniLoader):
    """Mask-stage batches: (images (B,2,H,W,3), targets (B,2,M,6),
    task_ids (B,), masks (B,2,M,Hm,Wm)). Sub-datasets yield 3-tuples
    (img, res, masks) per frame; the TrainTransformIns handles mask warps.

    4-task joint training (reference MosaicDetectionUni4tasks,
    mosaicdetection_uni.py:136-201): frames may also be 2-tuples (img, res)
    for the box tasks (SOT/MOT) — pair with TrainTransform4Tasks, which
    returns masks=None for those; the loader zero-fills so the batch stays
    static-shaped (mask losses are already gated on task id)."""

    def _make_batch(self):
        items, flips, size = self._sample_batch()
        imgs, tgts, tids, mks = [], [], [], []
        for (frames, task), flip in zip(items, flips):
            f_imgs, f_tgts, f_masks = [], [], []
            for data in frames:
                if len(data) == 3:
                    img, res, masks = data
                else:
                    (img, res), masks = data, None
                out = self.transform(img, res, masks, size, joint=True,
                                     flip=flip)
                im_t, lab_t, m_t = out
                if m_t is None:  # box-task sample in a 4-task batch
                    d = getattr(self.transform, "trans_inst",
                                self.transform).d_rate
                    m_t = np.zeros((lab_t.shape[0], size[0] // d,
                                    size[1] // d), np.float32)
                f_imgs.append(im_t)
                f_tgts.append(lab_t)
                f_masks.append(m_t)
            imgs.append(np.stack(f_imgs))
            tgts.append(np.stack(f_tgts))
            mks.append(np.stack(f_masks))
            tids.append(task)
        return (np.stack(imgs), np.stack(tgts),
                np.asarray(tids, np.int32), np.stack(mks))


class DetLoader(_RankMixin):
    """Detection batches: (images (B,H,W,3), labels (B,M,5))."""

    def __init__(self, dataset, batch_size: int, prefetch: int = 2, seed: int = 0,
                 shuffle: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.prefetch = prefetch
        self.shuffle = shuffle
        self._seed = seed
        self._rng = random.Random(seed)
        self._order = list(range(len(dataset)))
        self._pos = 0
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._thread = None
        self._stop = threading.Event()

    def _next_index(self):
        if self._pos == 0 and self.shuffle:
            self._rng.shuffle(self._order)
        idx = self._order[self._pos]
        self._pos = (self._pos + 1) % len(self._order)
        return idx

    def _make_batch(self):
        imgs, labels = [], []
        for _ in range(self.batch_size):
            img, lab, _, _ = self.dataset[self._next_index()]
            imgs.append(img)
            labels.append(lab)
        return np.stack(imgs), np.stack(labels)

    def _worker(self):
        # Build-once/retry-put (see UniLoader._worker): a discarded batch here
        # would skip samples from the strided rank-disjoint epoch order.
        batch = None
        while not self._stop.is_set():
            if batch is None:
                batch = self._make_batch()
            try:
                self._q.put(batch, timeout=1.0)
                batch = None
            except queue.Full:
                continue

    def start(self):
        if self._thread is None:
            self._thread = threading.Thread(target=self._worker, daemon=True)
            self._thread.start()
        return self

    def stop(self):
        self._stop.set()

    def __iter__(self):
        self.start()
        return self

    def __next__(self):
        return self._q.get()


class InstLoader(_RankMixin):
    """Instance-seg batches: (images (B,H,W,3), labels (B,M,6),
    masks (B,M,Hm,Wm)) from a dataset exposing pull_item_omni (single frame
    used) + TrainTransformIns."""

    def __init__(self, dataset, transform, batch_size: int, input_size,
                 prefetch: int = 2, seed: int = 0):
        self.dataset = dataset
        self.transform = transform
        self.batch_size = batch_size
        self.input_size = tuple(input_size)
        self._seed = seed
        self._rng = random.Random(seed)
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._thread = None
        self._stop = threading.Event()

    def set_input_size(self, size):
        self.input_size = tuple(size)

    def _make_batch(self):
        imgs, labs, mks = [], [], []
        for _ in range(self.batch_size):
            idx = self._rng.randint(0, len(self.dataset) - 1)
            (img, res, masks) = self.dataset.pull_item_omni(idx, 1)[0]
            im_t, lab_t, m_t = self.transform(img, res, masks, self.input_size)
            imgs.append(im_t)
            labs.append(lab_t)
            mks.append(m_t)
        return np.stack(imgs), np.stack(labs), np.stack(mks)

    def _worker(self):
        # Build-once/retry-put (see UniLoader._worker): rebuilding on Full
        # would waste RNG draws and host decode work on discarded batches.
        batch = None
        while not self._stop.is_set():
            if batch is None:
                batch = self._make_batch()
            try:
                self._q.put(batch, timeout=1.0)
                batch = None
            except queue.Full:
                continue

    def start(self):
        if self._thread is None:
            self._thread = threading.Thread(target=self._worker, daemon=True)
            self._thread.start()
        return self

    def stop(self):
        self._stop.set()

    def __iter__(self):
        self.start()
        return self

    def __next__(self):
        return self._q.get()
