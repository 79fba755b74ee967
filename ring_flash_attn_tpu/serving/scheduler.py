"""Continuous-batching decode scheduler over the native page allocator.

The TPU decode kernels want STATIC shapes: a fixed number of batch lanes,
fixed block-table width. This scheduler provides vLLM-style continuous
batching under that constraint:

- a fixed pool of `max_batch` decode lanes; each step runs the decode
  kernel once over all lanes (empty lanes carry seq_len=0 — the kernels'
  dead-row handling returns zeros for them, so no recompilation ever
  happens as requests come and go);
- admission is page-gated: a request enters a lane only when the allocator
  can hold its prompt plus `reserve` tokens; otherwise it waits FIFO;
- finished requests free their pages immediately, and waiting requests are
  admitted the same step (the "continuous" part — no draining barriers);
- forks (beam search / n-best sampling) go through the allocator's
  copy-on-write: the device-side page copies are surfaced per step in
  `StepPlan.cow` for `ops.paged.copy_pages`.

The scheduler is pure host-side bookkeeping (lists + the C++ allocator);
it never touches device arrays. The driving loop owns the cache and model:

    plan = sched.begin_step()            # admissions + lane map
    cache = copy_pages(cache, *plan.cow) # execute COW copies, if any
    cache = cache._replace(block_tables=plan.block_tables,
                           seq_lens=plan.seq_lens)
    ... run prefill for plan.admitted, decode for plan.running ...
    sched.commit(req_id, done=...)       # per generated token

See tests/test_serving_scheduler.py for the full lifecycle driven against
the real paged cache and a dense oracle.
"""

from collections import deque
from dataclasses import dataclass, field

import numpy as np

from .page_allocator import PageAllocatorError


@dataclass
class Request:
    req_id: int
    prompt_len: int
    max_new_tokens: int
    seq: int = -1           # allocator sequence id once admitted
    lane: int = -1          # decode lane once admitted
    generated: int = 0
    done: bool = False
    prefix_of: int = -1     # req id whose prompt prefix this one shares
    prefix_len: int = 0     # tokens of that prefix present in THIS prompt
    shared_len: int = 0     # page-aligned tokens actually shared (set at
                            # admission; 0 if the source was gone by then)


@dataclass
class StepPlan:
    """What the driving loop must do this step."""
    admitted: list          # requests newly admitted (need prefill)
    running: list           # requests occupying lanes (need a decode step)
    cow: tuple              # (src_pages, dst_pages) int32 arrays, may be empty
    block_tables: np.ndarray  # (max_batch, pages_per_seq) int32
    seq_lens: np.ndarray      # (max_batch,) int32; 0 = dead lane
    finished: list = field(default_factory=list)


class DecodeScheduler:
    def __init__(self, allocator, pages_per_seq, max_batch, reserve=0):
        """reserve: pages kept free per admitted request beyond its prompt
        (headroom so running requests don't starve mid-generation)."""
        self.alloc = allocator
        self.pages_per_seq = pages_per_seq
        self.max_batch = max_batch
        self.reserve = reserve
        self.waiting = deque()
        self.lanes = [None] * max_batch   # Request or None
        self._pending_cow = []            # (src, dst) accumulated pre-step
        self._requests = {}

    # ---- client surface ----

    def submit(self, req_id, prompt_len, max_new_tokens,
               prefix_of=None, prefix_len=0):
        """Queue a request. prefix_of/prefix_len declare that this
        prompt's first prefix_len tokens are IDENTICAL to request
        prefix_of's prompt prefix: at admission the page-aligned part of
        that prefix is shared read-only (refcounted full pages, no
        copies) and the driver may skip recomputing it. Best-effort — if
        the source has already retired by admission time, the request is
        allocated normally and shared_len stays 0."""
        assert req_id not in self._requests
        assert max_new_tokens >= 1, "a request must generate at least 1 token"
        need = -(-prompt_len // self.alloc.page_size)
        assert need + self.reserve <= self.pages_per_seq, (
            f"prompt needs {need} pages; table holds {self.pages_per_seq}"
        )
        if prefix_of is not None:
            assert prefix_len <= prompt_len, (prefix_len, prompt_len)
            src = self._requests[prefix_of]
            assert prefix_len <= src.prompt_len, (prefix_len, src.prompt_len)
        r = Request(req_id, prompt_len, max_new_tokens,
                    prefix_of=-1 if prefix_of is None else prefix_of,
                    prefix_len=prefix_len)
        self._requests[req_id] = r
        self.waiting.append(r)
        return r

    def fork(self, req_id, new_req_id, max_new_tokens=None):
        """Beam-search fork of a RUNNING request: shares pages via COW.
        The fork takes a lane immediately (fails if none free)."""
        src = self._requests[req_id]
        assert src.lane >= 0 and not src.done, "can only fork running reqs"
        lane = self._free_lane()
        if lane is None:
            raise PageAllocatorError("no free lane to fork into")
        r = Request(
            new_req_id, src.prompt_len,
            max_new_tokens if max_new_tokens is not None
            else src.max_new_tokens,
        )
        r.generated = src.generated
        r.seq = self.alloc.fork_seq(src.seq)
        # Eagerly COW the shared tail: the source's committed-but-not-yet-
        # appended decode token's slot lives there (the LAST slot when the
        # length is page-aligned), and both branches write it on their
        # next decode step — lazy COW at the next allocator append fires
        # only after those device writes had already collided.
        try:
            cow = self.alloc.cow_tail(r.seq)
        except PageAllocatorError:
            # OOM mid-fork: roll the fork back (fork_seq bumped every
            # page's refcount) so repeated fork-under-pressure attempts
            # don't leak the pool away
            self.alloc.free_seq(r.seq)
            raise
        if cow is not None:
            self._pending_cow.append(cow)
        r.lane = lane
        self.lanes[lane] = r
        self._requests[new_req_id] = r
        return r

    def commit(self, req_id, done=False):
        """Record one generated token for req_id (appends a cache slot via
        the allocator; any COW surfaces in the NEXT begin_step's plan).

        A request at table capacity (pages_per_seq * page_size tokens) is
        truncated: the token is recorded as generated but no cache slot
        exists for it, so it must be the LAST — the request is forced
        done (the serving analog of max_model_len truncation)."""
        r = self._requests[req_id]
        assert r.lane >= 0 and not r.done
        capacity = self.pages_per_seq * self.alloc.page_size
        if self.alloc.seq_len(r.seq) >= capacity:
            r.generated += 1
            r.done = True
            return
        _, cow = self.alloc.append_token(r.seq)
        if cow is not None:
            self._pending_cow.append(cow)
        r.generated += 1
        if done or r.generated >= r.max_new_tokens:
            r.done = True

    # ---- step planning ----

    def _free_lane(self):
        for i, r in enumerate(self.lanes):
            if r is None:
                return i
        return None

    def begin_step(self):
        # 1. retire finished requests (free pages BEFORE admission)
        finished = []
        for i, r in enumerate(self.lanes):
            if r is not None and r.done:
                self.alloc.free_seq(r.seq)
                r.seq = -1  # the id may be reused; never alias through it
                self.lanes[i] = None
                finished.append(r)
        # 2. admit waiting requests while lanes + pages allow
        admitted = []
        while self.waiting:
            lane = self._free_lane()
            if lane is None:
                break
            r = self.waiting[0]
            # prefix sharing is best-effort: live source => its full
            # pages covering the declared prefix come free
            src = None
            if r.prefix_of >= 0:
                cand = self._requests[r.prefix_of]
                if cand.seq >= 0:  # reset to -1 at retirement
                    src = cand
            shared_pages = (
                r.prefix_len // self.alloc.page_size if src else 0
            )
            need = (
                -(-r.prompt_len // self.alloc.page_size)
                - shared_pages + self.reserve
            )
            if need > self.alloc.free_pages:
                break  # FIFO: don't let small requests starve the head
            self.waiting.popleft()
            if src is not None:
                r.seq = self.alloc.alloc_prefix_seq(
                    src.seq, r.prefix_len, r.prompt_len
                )
                r.shared_len = shared_pages * self.alloc.page_size
            else:
                r.seq = self.alloc.alloc_seq(r.prompt_len)
                r.shared_len = 0
            r.lane = lane
            self.lanes[lane] = r
            admitted.append(r)
        # 3. assemble the static-shape batch view (shared helper: pads
        # unused slots with the last valid page and asserts capacity)
        from . import gather_block_tables

        tables = np.zeros((self.max_batch, self.pages_per_seq), np.int32)
        lens = np.zeros((self.max_batch,), np.int32)
        running = [r for r in self.lanes if r is not None]
        if running:
            t, ln = gather_block_tables(
                self.alloc, [r.seq for r in running], self.pages_per_seq
            )
            idx = [r.lane for r in running]
            tables[idx] = t
            lens[idx] = ln
        cow = self._pending_cow
        self._pending_cow = []
        src = np.asarray([c[0] for c in cow], np.int32)
        dst = np.asarray([c[1] for c in cow], np.int32)
        return StepPlan(
            admitted=admitted, running=running, cow=(src, dst),
            block_tables=tables, seq_lens=lens, finished=finished,
        )

    @property
    def idle(self):
        return not self.waiting and all(r is None for r in self.lanes)
