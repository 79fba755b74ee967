"""Serving runtime: native page allocator + block-table helpers."""

import numpy as np

from .page_allocator import (
    NativePageAllocator,
    PageAllocator,
    PageAllocatorError,
    PyPageAllocator,
)

__all__ = [
    "PageAllocator",
    "NativePageAllocator",
    "PyPageAllocator",
    "PageAllocatorError",
    "gather_block_tables",
]


def gather_block_tables(alloc, sids, pages_per_seq):
    """Assemble the fixed-shape (len(sids), pages_per_seq) int32 block-table
    array `ops.paged` caches consume from live allocator sequences, plus the
    (len(sids),) seq_lens. Unused table slots repeat the last valid page
    (never page 0 of another sequence), so a clamped gather stays in-bounds
    and reads only the sequence's own data."""
    tables = np.zeros((len(sids), pages_per_seq), np.int32)
    lens = np.zeros((len(sids),), np.int32)
    for i, sid in enumerate(sids):
        t = alloc.block_table(sid)
        assert len(t) <= pages_per_seq, (len(t), pages_per_seq)
        if len(t):
            tables[i, :len(t)] = t
            tables[i, len(t):] = t[-1]
        lens[i] = alloc.seq_len(sid)
    return tables, lens
