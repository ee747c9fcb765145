"""Host-side batching loader with background prefetch.

Replaces torch DataLoader workers (/root/reference/dataset/dataloader.py)
with a thread pool: PIL decode and numpy crop/fovea release the GIL, so
threads keep the device fed without multiprocessing overhead. Batches are
stacked NHWC numpy arrays ready for ``jax.device_put`` (optionally sharded
over a data-parallel mesh by the caller).
"""

from __future__ import annotations

import queue
import threading
from collections.abc import Iterator
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

import numpy as np

_WORKER_DS = None


def _worker_init(ds):
    global _WORKER_DS
    _WORKER_DS = ds


def _worker_get(i):
    return _WORKER_DS[int(i)]


class Loader:
    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        num_workers: int = 4,
        drop_last: bool = True,
        prefetch: int = 2,
        seed: int = 0,
        processes: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.processes = processes
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self) -> Iterator[list[int]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        for i in range(0, len(order), self.batch_size):
            idx = order[i : i + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                return
            yield list(idx)

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            if self.processes:
                # sidesteps the GIL for the numpy/fovea sample assembly;
                # the dataset is shipped once per worker via the initializer
                pool = ProcessPoolExecutor(
                    self.num_workers, initializer=_worker_init,
                    initargs=(self.dataset,),
                )
                get = _worker_get
            else:
                pool = ThreadPoolExecutor(self.num_workers)
                get = self.dataset.__getitem__
            with pool:
                try:
                    for idx in self._batches():
                        if stop.is_set():
                            return
                        samples = list(pool.map(get, idx))
                        batch = {
                            k: np.stack([s[k] for s in samples]) for k in samples[0]
                        }
                        q.put(batch)
                finally:
                    q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()


def get_dataloader(args) -> dict[str, Loader]:
    """Reference-compatible dispatch (/root/reference/dataset/dataloader.py:5-30):
    train loader shuffled at args.batch_size, eval/test at batch 1."""
    name = args.dataset.lower()
    if name == "reds":
        from crfp_tpu.data import reds as mod
    elif name in ("vimeo7", "vimeo"):
        from crfp_tpu.data import vimeo as mod
    elif name == "procedural":
        # generated structured-content clips — the no-REDS-in-container
        # path for end-to-end train/eval/test (crfp_tpu/data/procedural.py)
        from crfp_tpu.data import procedural as mod
    else:
        raise SystemExit(f"Dataset '{args.dataset}' is not implemented")
    # training doesn't need LR_sr (y_only-only) or the pre-multiplied fovea
    # image: the model blends fvs*mk on device, so HR serves as fvs directly
    minimal = not getattr(args, "y_only", False)
    return {
        "train": Loader(
            mod.TrainSet(args, minimal=minimal), batch_size=args.batch_size,
            shuffle=True, num_workers=args.num_workers,
        ),
        "eval": Loader(mod.EvalSet(args), batch_size=1, num_workers=args.num_workers),
        "test": Loader(mod.TestSet(args), batch_size=1, num_workers=args.num_workers),
    }
