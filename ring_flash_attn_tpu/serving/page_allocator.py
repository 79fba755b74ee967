"""Page allocator for the paged KV cache: native C++ core, ctypes-bound.

`ops/paged.py` gives the TPU kernels a page-pool cache driven by int32
block tables; this module is the host-side runtime that OWNS those tables:
a fixed pool of unit pages with refcounting, O(1) LIFO alloc/free,
and copy-on-write forking (beam search / prefix sharing). The reference
has no serving runtime; this plays the role vLLM's block manager plays
for its paged attention, as a native component per the framework's
native-runtime policy (csrc/page_allocator.cpp).

The C++ core compiles on first use with g++ (cached in csrc/); when no
compiler is available, `PyPageAllocator` — the same algorithm in Python,
used as the differential-testing oracle — is substituted transparently.

COW contract: `append_token` returns `(page, cow)` where `cow` is None or
`(src_page, dst_page)`; on a COW the caller must copy the first
`(len-1) % page_size` tokens of src to dst on device before using the
table — `ops.paged.copy_page` does exactly that.
"""

import ctypes
import os
import subprocess
import tempfile
import warnings

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "csrc")
_LIB = None
_LIB_TRIED = False


def _build_and_load():
    """Compile csrc/page_allocator.cpp to a cached .so and ctypes-load it."""
    src = os.path.join(_CSRC, "page_allocator.cpp")
    lib_path = os.path.join(_CSRC, "_page_allocator.so")
    if not os.path.exists(lib_path) or (
        os.path.getmtime(lib_path) < os.path.getmtime(src)
    ):
        with tempfile.TemporaryDirectory() as td:
            tmp = os.path.join(td, "_page_allocator.so")
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src,
                 "-o", tmp],
                check=True, capture_output=True, text=True,
            )
            os.replace(tmp, lib_path)
    lib = ctypes.CDLL(lib_path)
    i32, i64, p = ctypes.c_int32, ctypes.c_int64, ctypes.c_void_p
    ip = ctypes.POINTER(ctypes.c_int32)
    lib.pa_create.restype = p
    lib.pa_create.argtypes = [i32, i32]
    lib.pa_destroy.argtypes = [p]
    lib.pa_num_free_pages.restype = i32
    lib.pa_num_free_pages.argtypes = [p]
    lib.pa_alloc_seq.restype = i32
    lib.pa_alloc_seq.argtypes = [p, i64]
    lib.pa_append_token.restype = i32
    lib.pa_append_token.argtypes = [p, i32, ip, ip]
    lib.pa_fork_seq.restype = i32
    lib.pa_fork_seq.argtypes = [p, i32]
    lib.pa_cow_tail.restype = i32
    lib.pa_cow_tail.argtypes = [p, i32, ip, ip]
    lib.pa_alloc_prefix_seq.restype = i32
    lib.pa_alloc_prefix_seq.argtypes = [p, i32, i64, i64]
    lib.pa_free_seq.restype = i32
    lib.pa_free_seq.argtypes = [p, i32]
    lib.pa_seq_len.restype = i64
    lib.pa_seq_len.argtypes = [p, i32]
    lib.pa_block_table.restype = i32
    lib.pa_block_table.argtypes = [p, i32, ip, i32]
    lib.pa_page_refcount.restype = i32
    lib.pa_page_refcount.argtypes = [p, i32]
    return lib


def _native_lib():
    global _LIB, _LIB_TRIED
    if not _LIB_TRIED:
        _LIB_TRIED = True
        try:
            _LIB = _build_and_load()
        except Exception as e:  # noqa: BLE001 — no compiler / bad toolchain
            warnings.warn(
                f"native page allocator unavailable ({type(e).__name__}: "
                f"{e}); using the Python implementation", stacklevel=2,
            )
            _LIB = None
    return _LIB


class PageAllocatorError(RuntimeError):
    pass


class NativePageAllocator:
    """ctypes facade over csrc/page_allocator.cpp (see module docstring)."""

    def __init__(self, num_pages, page_size, _lib=None):
        self._lib = _lib or _native_lib()
        if self._lib is None:
            raise PageAllocatorError("native library unavailable")
        self._h = self._lib.pa_create(num_pages, page_size)
        if not self._h:
            raise PageAllocatorError((num_pages, page_size))
        self.num_pages = num_pages
        self.page_size = page_size

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.pa_destroy(self._h)
            self._h = None

    @property
    def free_pages(self):
        return int(self._lib.pa_num_free_pages(self._h))

    def alloc_seq(self, n_tokens):
        sid = self._lib.pa_alloc_seq(self._h, n_tokens)
        if sid < 0:
            raise PageAllocatorError(
                f"out of pages allocating {n_tokens} tokens "
                f"({self.free_pages} pages free)"
            )
        return int(sid)

    def append_token(self, sid):
        src = ctypes.c_int32()
        dst = ctypes.c_int32()
        page = self._lib.pa_append_token(
            self._h, sid, ctypes.byref(src), ctypes.byref(dst)
        )
        if page < 0:
            raise PageAllocatorError(f"append failed for seq {sid}")
        cow = (int(src.value), int(dst.value)) if src.value >= 0 else None
        return int(page), cow

    def fork_seq(self, sid):
        nid = self._lib.pa_fork_seq(self._h, sid)
        if nid < 0:
            raise PageAllocatorError(f"fork failed for seq {sid}")
        return int(nid)

    def cow_tail(self, sid):
        """Eagerly COW a shared tail page (see csrc/page_allocator.cpp —
        needed at fork time because the driver's pending device write
        targets the tail, aligned or not): returns (src, dst) to copy on
        device, or None if nothing was needed."""
        src = ctypes.c_int32()
        dst = ctypes.c_int32()
        if self._lib.pa_cow_tail(
            self._h, sid, ctypes.byref(src), ctypes.byref(dst)
        ) != 0:
            raise PageAllocatorError(f"cow_tail failed for seq {sid}")
        return (int(src.value), int(dst.value)) if src.value >= 0 else None

    def alloc_prefix_seq(self, src_sid, prefix_tokens, total_tokens):
        """New sequence of total_tokens sharing the first
        prefix_tokens // page_size FULL pages with src (read-only,
        refcounted); the rest allocated fresh. See csrc."""
        nid = self._lib.pa_alloc_prefix_seq(
            self._h, src_sid, prefix_tokens, total_tokens
        )
        if nid < 0:
            raise PageAllocatorError(
                f"prefix alloc failed (src {src_sid}, prefix "
                f"{prefix_tokens}, total {total_tokens}, "
                f"{self.free_pages} pages free)"
            )
        return int(nid)

    def free_seq(self, sid):
        if self._lib.pa_free_seq(self._h, sid) != 0:
            raise PageAllocatorError(f"free failed for seq {sid}")

    def seq_len(self, sid):
        n = self._lib.pa_seq_len(self._h, sid)
        if n < 0:
            raise PageAllocatorError(f"dead seq {sid}")
        return int(n)

    def block_table(self, sid):
        cap = self.num_pages
        out = (ctypes.c_int32 * cap)()
        n = self._lib.pa_block_table(self._h, sid, out, cap)
        if n < 0:
            raise PageAllocatorError(f"dead seq {sid}")
        return np.frombuffer(out, np.int32, n).copy()

    def page_refcount(self, page):
        return int(self._lib.pa_page_refcount(self._h, page))


class PyPageAllocator:
    """Pure-Python twin of the native allocator — same algorithm, used as
    the differential-testing oracle and the no-compiler fallback."""

    def __init__(self, num_pages, page_size):
        self.num_pages = num_pages
        self.page_size = page_size
        self._free = list(range(num_pages - 1, -1, -1))
        self._ref = [0] * num_pages
        self._seqs = {}  # sid -> [pages, length]
        self._free_sids = []
        self._next_sid = 0

    @property
    def free_pages(self):
        return len(self._free)

    def _pop_page(self):
        if not self._free:
            raise PageAllocatorError("out of pages")
        p = self._free.pop()
        self._ref[p] = 1
        return p

    def _unref(self, p):
        self._ref[p] -= 1
        if self._ref[p] == 0:
            self._free.append(p)

    def _new_sid(self):
        if self._free_sids:
            return self._free_sids.pop()
        sid = self._next_sid
        self._next_sid += 1
        return sid

    def alloc_seq(self, n_tokens):
        need = -(-n_tokens // self.page_size)
        if need > len(self._free):
            raise PageAllocatorError("out of pages")
        sid = self._new_sid()
        self._seqs[sid] = [[self._pop_page() for _ in range(need)], n_tokens]
        return sid

    def _get(self, sid):
        try:
            return self._seqs[sid]
        except KeyError:
            raise PageAllocatorError(f"dead seq {sid}") from None

    def append_token(self, sid):
        pages, length = self._get(sid)
        off = length % self.page_size
        cow = None
        if off == 0 or not pages:
            page = self._pop_page()
            pages.append(page)
        else:
            tail = pages[-1]
            if self._ref[tail] > 1:
                page = self._pop_page()
                self._ref[tail] -= 1
                pages[-1] = page
                cow = (tail, page)
            else:
                page = tail
        self._seqs[sid][1] = length + 1
        return page, cow

    def fork_seq(self, sid):
        pages, length = self._get(sid)
        nid = self._new_sid()
        self._seqs[nid] = [list(pages), length]
        for p in pages:
            self._ref[p] += 1
        return nid

    def cow_tail(self, sid):
        pages, _length = self._get(sid)
        if not pages:
            return None
        tail = pages[-1]
        if self._ref[tail] <= 1:
            return None
        page = self._pop_page()
        self._ref[tail] -= 1
        pages[-1] = page
        return (tail, page)

    def alloc_prefix_seq(self, src_sid, prefix_tokens, total_tokens):
        pages, length = self._get(src_sid)
        if prefix_tokens < 0 or total_tokens < prefix_tokens:
            raise PageAllocatorError((prefix_tokens, total_tokens))
        if prefix_tokens > length:
            raise PageAllocatorError((prefix_tokens, length))
        shared = prefix_tokens // self.page_size
        need_total = -(-total_tokens // self.page_size)
        fresh = need_total - shared
        if fresh > len(self._free):
            raise PageAllocatorError("out of pages")
        nid = self._new_sid()
        new_pages = list(pages[:shared])
        for p in new_pages:
            self._ref[p] += 1
        new_pages.extend(self._pop_page() for _ in range(fresh))
        self._seqs[nid] = [new_pages, total_tokens]
        return nid

    def free_seq(self, sid):
        self._get(sid)
        pages, _ = self._seqs.pop(sid)
        for p in pages:
            self._unref(p)
        self._free_sids.append(sid)

    def seq_len(self, sid):
        return self._get(sid)[1]

    def block_table(self, sid):
        return np.asarray(self._get(sid)[0], np.int32)

    def page_refcount(self, page):
        return self._ref[page]


def PageAllocator(num_pages, page_size):
    """The production entry point: native when the toolchain allows,
    Python otherwise — identical semantics either way."""
    if _native_lib() is not None:
        return NativePageAllocator(num_pages, page_size)
    return PyPageAllocator(num_pages, page_size)
