"""Bounded FIFO with raising and non-raising operations.

Parity with the reference's BoundedQueue contract
(/root/reference/stencilflow/bounded_queue.py:24-185): hard ``maxsize``,
``enqueue``/``dequeue`` that raise on overflow/underflow (the mechanism by
which simulation proves buffer bounds), ``try_*`` variants, indexed ``peek``,
bulk import/export, and the ``swap_out`` marker the memory optimizer flips
when a buffer is spilled to slow memory.
"""
from __future__ import annotations

from collections import deque
from typing import Any, List, Sequence


class QueueOverflow(RuntimeError):
    pass


class QueueUnderflow(RuntimeError):
    pass


class BoundedQueue:
    def __init__(self, name: str, maxsize: int,
                 collection: Sequence[Any] = ()):
        if maxsize < 1:
            maxsize = 1  # reference clamps to >= 1 (bounded_queue.py:41)
        self.name = name
        self.maxsize = maxsize
        self.queue = deque(maxlen=None)
        self.swap_out = False  # set by the optimizer: lives in slow memory
        self.import_data(collection)

    # -- size ----------------------------------------------------------------
    def size(self) -> int:
        return len(self.queue)

    def is_empty(self) -> bool:
        return not self.queue

    def is_full(self) -> bool:
        return len(self.queue) >= self.maxsize

    # -- bulk ----------------------------------------------------------------
    def import_data(self, collection: Sequence[Any]) -> None:
        data = list(collection)
        if len(data) > self.maxsize:
            raise QueueOverflow(
                f"{self.name}: import of {len(data)} items exceeds "
                f"maxsize {self.maxsize}")
        self.queue = deque(data)

    def export_data(self) -> List[Any]:
        return list(self.queue)

    # -- raising ops ---------------------------------------------------------
    def enqueue(self, item: Any) -> None:
        if self.is_full():
            raise QueueOverflow(
                f"{self.name}: enqueue on full queue (maxsize "
                f"{self.maxsize}) — buffer size assumption violated")
        self.queue.append(item)

    def dequeue(self) -> Any:
        if not self.queue:
            raise QueueUnderflow(f"{self.name}: dequeue on empty queue")
        return self.queue.popleft()

    # -- non-raising ops -----------------------------------------------------
    def try_enqueue(self, item: Any) -> bool:
        if self.is_full():
            return False
        self.queue.append(item)
        return True

    def try_dequeue(self) -> Any:
        return self.queue.popleft() if self.queue else None

    def peek(self, index: int) -> Any:
        """Item at ``index`` (0 = oldest); raises on out-of-range."""
        try:
            return self.queue[index]
        except IndexError:
            raise QueueUnderflow(
                f"{self.name}: peek({index}) with size {self.size()}")

    def try_peek_last(self) -> Any:
        return self.queue[-1] if self.queue else None
