// Native page allocator for the paged KV cache (ops/paged.py).
//
// The TPU kernels consume block tables (per-sequence page lists); this is
// the host-side runtime that produces them: a fixed pool of unit pages
// with refcounting, O(1) alloc/free via a free-list stack, copy-on-write
// forking for beam search / prefix sharing. The device never sees this
// code — it only sees the int32 block tables and the (src,dst,n) page-copy
// ops emitted when a shared tail page is written.
//
// The reference has no serving runtime at all; this plays the role vLLM's
// C++/CUDA block manager plays for its paged attention.
//
// C ABI for ctypes (serving/page_allocator.py); no exceptions cross the
// boundary. Thread-compat: one allocator per scheduler thread (no locks —
// the Python side serializes, as a scheduler loop does).

#include <cstdint>
#include <vector>

namespace {

struct Sequence {
  std::vector<int32_t> pages;
  int64_t length = 0;   // tokens
  bool live = false;
};

struct Allocator {
  int32_t page_size;
  std::vector<int32_t> free_stack;   // page ids, LIFO for cache locality
  std::vector<int32_t> refcount;     // per page
  std::vector<Sequence> seqs;
  std::vector<int32_t> free_seq_ids;
};

inline bool pop_page(Allocator* a, int32_t* out) {
  if (a->free_stack.empty()) return false;
  *out = a->free_stack.back();
  a->free_stack.pop_back();
  a->refcount[*out] = 1;
  return true;
}

inline void unref_page(Allocator* a, int32_t p) {
  if (--a->refcount[p] == 0) a->free_stack.push_back(p);
}

}  // namespace

extern "C" {

void* pa_create(int32_t num_pages, int32_t page_size) {
  if (num_pages <= 0 || page_size <= 0) return nullptr;
  auto* a = new Allocator;
  a->page_size = page_size;
  a->refcount.assign(num_pages, 0);
  a->free_stack.reserve(num_pages);
  // LIFO: push descending so page 0 is handed out first (prettier tables)
  for (int32_t p = num_pages - 1; p >= 0; --p) a->free_stack.push_back(p);
  return a;
}

void pa_destroy(void* h) { delete static_cast<Allocator*>(h); }

int32_t pa_num_free_pages(void* h) {
  return static_cast<int32_t>(static_cast<Allocator*>(h)->free_stack.size());
}

// Create a sequence holding n_tokens (>=0). Returns seq id, or -1 on OOM
// (the allocator is left unchanged on failure).
int32_t pa_alloc_seq(void* h, int64_t n_tokens) {
  auto* a = static_cast<Allocator*>(h);
  if (n_tokens < 0) return -1;
  int64_t need = (n_tokens + a->page_size - 1) / a->page_size;
  if (need > static_cast<int64_t>(a->free_stack.size())) return -1;
  int32_t sid;
  if (!a->free_seq_ids.empty()) {
    sid = a->free_seq_ids.back();
    a->free_seq_ids.pop_back();
  } else {
    sid = static_cast<int32_t>(a->seqs.size());
    a->seqs.emplace_back();
  }
  Sequence& s = a->seqs[sid];
  s.pages.clear();
  s.length = n_tokens;
  s.live = true;
  for (int64_t i = 0; i < need; ++i) {
    int32_t p;
    pop_page(a, &p);  // cannot fail: checked above
    s.pages.push_back(p);
  }
  return sid;
}

// Append one token. On success returns the page id the token lands in and
// fills cow_src/cow_dst: if a copy-on-write happened (shared tail page),
// *cow_src/*cow_dst are the page ids whose first `old_len % page_size`
// tokens the caller must copy on device; otherwise both are -1.
// Returns -1 on OOM or dead/invalid sequence (allocator unchanged).
int32_t pa_append_token(void* h, int32_t sid, int32_t* cow_src,
                        int32_t* cow_dst) {
  auto* a = static_cast<Allocator*>(h);
  *cow_src = -1;
  *cow_dst = -1;
  if (sid < 0 || sid >= static_cast<int32_t>(a->seqs.size())) return -1;
  Sequence& s = a->seqs[sid];
  if (!s.live) return -1;
  int32_t off = static_cast<int32_t>(s.length % a->page_size);
  if (off == 0 || s.pages.empty()) {
    // token starts a fresh page
    int32_t p;
    if (!pop_page(a, &p)) return -1;
    s.pages.push_back(p);
    s.length++;
    return p;
  }
  int32_t tail = s.pages.back();
  if (a->refcount[tail] > 1) {
    // shared tail (post-fork): copy-on-write
    int32_t p;
    if (!pop_page(a, &p)) return -1;
    a->refcount[tail]--;  // we hold a new private copy instead
    s.pages.back() = p;
    *cow_src = tail;
    *cow_dst = p;
    s.length++;
    return p;
  }
  s.length++;
  return tail;
}

// Fork: new sequence sharing every page (refcount++), lengths equal.
// Appends to either sequence then trigger COW on the shared tail.
// Returns new seq id or -1.
int32_t pa_fork_seq(void* h, int32_t sid) {
  auto* a = static_cast<Allocator*>(h);
  if (sid < 0 || sid >= static_cast<int32_t>(a->seqs.size())) return -1;
  Sequence& src = a->seqs[sid];
  if (!src.live) return -1;
  int32_t nid;
  if (!a->free_seq_ids.empty()) {
    nid = a->free_seq_ids.back();
    a->free_seq_ids.pop_back();
  } else {
    nid = static_cast<int32_t>(a->seqs.size());
    a->seqs.emplace_back();
  }
  // note: emplace_back may reallocate; re-take the src reference
  Sequence& s2 = a->seqs[nid];
  const Sequence& s1 = a->seqs[sid];
  s2.pages = s1.pages;
  s2.length = s1.length;
  s2.live = true;
  for (int32_t p : s2.pages) a->refcount[p]++;
  return nid;
}

// Eagerly copy-on-write the sequence's tail page if it is shared. Length
// is unchanged. Fills cow_src/cow_dst like pa_append_token; both -1 when
// nothing was needed (unshared or empty). Needed at FORK time: the
// driver's last committed token's device K/V write is still pending, and
// its slot lives in the tail page — including the LAST slot when length
// is page-aligned — so both branches would otherwise scatter divergent
// values into the same physical page (lazy COW at the next allocator
// append fires too late, and for aligned tails never: the next append
// opens a fresh page). For direct users with no pending write this
// spends one page conservatively. Returns 0, or -1 on dead/invalid
// sequence or OOM.
int32_t pa_cow_tail(void* h, int32_t sid, int32_t* cow_src,
                    int32_t* cow_dst) {
  auto* a = static_cast<Allocator*>(h);
  *cow_src = -1;
  *cow_dst = -1;
  if (sid < 0 || sid >= static_cast<int32_t>(a->seqs.size())) return -1;
  Sequence& s = a->seqs[sid];
  if (!s.live) return -1;
  if (s.pages.empty()) return 0;
  int32_t tail = s.pages.back();
  if (a->refcount[tail] <= 1) return 0;
  int32_t p;
  if (!pop_page(a, &p)) return -1;
  a->refcount[tail]--;
  s.pages.back() = p;
  *cow_src = tail;
  *cow_dst = p;
  return 0;
}

// Prefix-sharing allocation: create a sequence of total_tokens whose
// first prefix_tokens/page_size FULL pages are shared (refcount++) with
// src's pages; the remainder is allocated fresh. Shared pages are
// read-only by construction (the new sequence's own tokens start at the
// page-aligned boundary), so no COW is ever needed for them — refcounts
// just keep them alive past the source's retirement. Partial-page prefix
// tokens are NOT shared (the caller recomputes/stores them in its own
// pages). Returns the new seq id, or -1 on dead src / bad args / OOM
// (allocator unchanged on failure).
int32_t pa_alloc_prefix_seq(void* h, int32_t src_sid, int64_t prefix_tokens,
                            int64_t total_tokens) {
  auto* a = static_cast<Allocator*>(h);
  if (src_sid < 0 || src_sid >= static_cast<int32_t>(a->seqs.size()))
    return -1;
  const Sequence& src = a->seqs[src_sid];
  if (!src.live) return -1;
  if (prefix_tokens < 0 || total_tokens < prefix_tokens) return -1;
  if (prefix_tokens > src.length) return -1;
  int64_t shared = prefix_tokens / a->page_size;  // full pages only
  int64_t need_total = (total_tokens + a->page_size - 1) / a->page_size;
  int64_t fresh = need_total - shared;
  if (fresh > static_cast<int64_t>(a->free_stack.size())) return -1;
  int32_t nid;
  if (!a->free_seq_ids.empty()) {
    nid = a->free_seq_ids.back();
    a->free_seq_ids.pop_back();
  } else {
    nid = static_cast<int32_t>(a->seqs.size());
    a->seqs.emplace_back();
  }
  Sequence& s2 = a->seqs[nid];
  const Sequence& s1 = a->seqs[src_sid];  // re-take: emplace may realloc
  s2.pages.assign(s1.pages.begin(), s1.pages.begin() + shared);
  for (int32_t p : s2.pages) a->refcount[p]++;
  for (int64_t i = 0; i < fresh; ++i) {
    int32_t p;
    pop_page(a, &p);  // cannot fail: checked above
    s2.pages.push_back(p);
  }
  s2.length = total_tokens;
  s2.live = true;
  return nid;
}

int32_t pa_free_seq(void* h, int32_t sid) {
  auto* a = static_cast<Allocator*>(h);
  if (sid < 0 || sid >= static_cast<int32_t>(a->seqs.size())) return -1;
  Sequence& s = a->seqs[sid];
  if (!s.live) return -1;
  for (int32_t p : s.pages) unref_page(a, p);
  s.pages.clear();
  s.length = 0;
  s.live = false;
  a->free_seq_ids.push_back(sid);
  return 0;
}

int64_t pa_seq_len(void* h, int32_t sid) {
  auto* a = static_cast<Allocator*>(h);
  if (sid < 0 || sid >= static_cast<int32_t>(a->seqs.size())) return -1;
  const Sequence& s = a->seqs[sid];
  return s.live ? s.length : -1;
}

// Write the sequence's page list into out (capacity cap); returns the
// number of pages, or -1 if dead / cap too small.
int32_t pa_block_table(void* h, int32_t sid, int32_t* out, int32_t cap) {
  auto* a = static_cast<Allocator*>(h);
  if (sid < 0 || sid >= static_cast<int32_t>(a->seqs.size())) return -1;
  const Sequence& s = a->seqs[sid];
  if (!s.live) return -1;
  int32_t n = static_cast<int32_t>(s.pages.size());
  if (n > cap) return -1;
  for (int32_t i = 0; i < n; ++i) out[i] = s.pages[i];
  return n;
}

int32_t pa_page_refcount(void* h, int32_t page) {
  auto* a = static_cast<Allocator*>(h);
  if (page < 0 || page >= static_cast<int32_t>(a->refcount.size())) return -1;
  return a->refcount[page];
}

}  // extern "C"
