"""Multiprocess fan-out for offline preprocessing.

Equivalent of `utils/commons/multiprocess_utils.py:84`
(multiprocess_run_tqdm): map a function over items with a worker pool,
yielding (index, result) as they complete, with optional ordered collection.
Used to parallelize per-video preprocessing on the host.
"""

from __future__ import annotations

from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor, as_completed
from typing import Callable, Iterable, Iterator


def parallel_map(
    fn: Callable,
    items: Iterable,
    num_workers: int = 4,
    ordered: bool = True,
    use_threads: bool = False,
    desc: str = "",
) -> list:
    """Run ``fn(item)`` over items with a pool; returns results in order.

    ``use_threads`` for IO-bound or non-picklable work (cv2 capture handles);
    processes otherwise.
    """
    items = list(items)
    pool_cls = ThreadPoolExecutor if use_threads else ProcessPoolExecutor
    results: list = [None] * len(items)
    done = 0
    with pool_cls(max_workers=num_workers) as pool:
        futures = {pool.submit(fn, it): i for i, it in enumerate(items)}
        for fut in as_completed(futures):
            i = futures[fut]
            results[i] = fut.result()
            done += 1
            if desc and done % max(len(items) // 10, 1) == 0:
                print(f"| {desc}: {done}/{len(items)}", flush=True)
    return results


def iter_parallel(
    fn: Callable,
    items: Iterable,
    num_workers: int = 4,
    use_threads: bool = True,
) -> Iterator[tuple[int, object]]:
    """Yield (index, result) as they complete (unordered)."""
    items = list(items)
    pool_cls = ThreadPoolExecutor if use_threads else ProcessPoolExecutor
    with pool_cls(max_workers=num_workers) as pool:
        futures = {pool.submit(fn, it): i for i, it in enumerate(items)}
        for fut in as_completed(futures):
            yield futures[fut], fut.result()
