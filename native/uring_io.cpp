// Raw-syscall io_uring write path (no liburing in the build environment).
//
// Parity target: the reference's async strip writer
// (image_format/FileUringIO.cpp:42-76) — file output is submitted to the
// kernel ring so entropy coding of strip/tile-row N+1 overlaps the disk
// write of N. All writes are positional (pwrite-style), so completion
// order never matters; the TLM/PSOT patch-at-close rides the same ring.
//
// The Python side (core/stream.py AsyncWriter) owns the data buffers: a
// token accompanies every submit, completions hand tokens back via
// uring_writer_reap, and the owner drops its reference then. Falls back
// cleanly (create returns null) on kernels without io_uring or in
// sandboxes that deny the syscalls.

#include <linux/io_uring.h>
#include <sys/mman.h>
#include <sys/syscall.h>
#include <unistd.h>

#include <cstdint>
#include <cstring>
#include <new>

namespace {

struct Ring {
    int ring_fd = -1;
    int file_fd = -1;
    unsigned entries = 0;
    void* sq_ptr = nullptr;
    size_t sq_sz = 0;
    unsigned *sq_head = nullptr, *sq_tail = nullptr, *sq_mask = nullptr;
    unsigned* sq_array = nullptr;
    io_uring_sqe* sqes = nullptr;
    size_t sqes_sz = 0;
    void* cq_ptr = nullptr;
    size_t cq_sz = 0;
    unsigned *cq_head = nullptr, *cq_tail = nullptr, *cq_mask = nullptr;
    io_uring_cqe* cqes = nullptr;
    unsigned inflight = 0;
    int errors = 0;
};

static int sys_setup(unsigned entries, io_uring_params* p) {
    return (int)syscall(__NR_io_uring_setup, entries, p);
}

static int sys_enter(int fd, unsigned to_submit, unsigned min_complete,
                     unsigned flags) {
    return (int)syscall(__NR_io_uring_enter, fd, to_submit, min_complete,
                        flags, nullptr, 0);
}

// reap available completions into tokens[]; returns count. user_data
// carries (expected_len << 32 | token): a short write (res != len) is an
// error — silently accepting it would corrupt the stream.
static int reap_ready(Ring* r, uint64_t* tokens, int max_tokens) {
    int n = 0;
    unsigned head = __atomic_load_n(r->cq_head, __ATOMIC_ACQUIRE);
    unsigned tail = __atomic_load_n(r->cq_tail, __ATOMIC_ACQUIRE);
    while (head != tail && n < max_tokens) {
        io_uring_cqe* cqe = &r->cqes[head & *r->cq_mask];
        if (cqe->res < 0 || (uint32_t)cqe->res != (uint32_t)(cqe->user_data >> 32))
            r->errors++;
        tokens[n++] = cqe->user_data & 0xFFFFFFFFULL;
        head++;
        r->inflight--;
    }
    __atomic_store_n(r->cq_head, head, __ATOMIC_RELEASE);
    return n;
}

}  // namespace

extern "C" {

// Create a writer ring bound to file_fd. Returns null when io_uring is
// unavailable (old kernel, seccomp) — callers fall back to thread IO.
void* uring_writer_create(int file_fd, int depth) {
    if (depth < 2) depth = 2;
    io_uring_params p;
    std::memset(&p, 0, sizeof(p));
    int fd = sys_setup((unsigned)depth, &p);
    if (fd < 0) return nullptr;
    Ring* r = new (std::nothrow) Ring();
    if (!r) {
        close(fd);
        return nullptr;
    }
    r->ring_fd = fd;
    r->file_fd = file_fd;
    r->entries = p.sq_entries;
    r->sq_sz = p.sq_off.array + p.sq_entries * sizeof(unsigned);
    r->cq_sz = p.cq_off.cqes + p.cq_entries * sizeof(io_uring_cqe);
    bool single_mmap = p.features & IORING_FEAT_SINGLE_MMAP;
    if (single_mmap && r->cq_sz > r->sq_sz) r->sq_sz = r->cq_sz;
    r->sq_ptr = mmap(nullptr, r->sq_sz, PROT_READ | PROT_WRITE,
                     MAP_SHARED | MAP_POPULATE, fd, IORING_OFF_SQ_RING);
    if (r->sq_ptr == MAP_FAILED) goto fail;
    r->cq_ptr = single_mmap
                    ? r->sq_ptr
                    : mmap(nullptr, r->cq_sz, PROT_READ | PROT_WRITE,
                           MAP_SHARED | MAP_POPULATE, fd, IORING_OFF_CQ_RING);
    if (r->cq_ptr == MAP_FAILED) goto fail;
    r->sqes_sz = p.sq_entries * sizeof(io_uring_sqe);
    r->sqes = (io_uring_sqe*)mmap(nullptr, r->sqes_sz,
                                  PROT_READ | PROT_WRITE,
                                  MAP_SHARED | MAP_POPULATE, fd,
                                  IORING_OFF_SQES);
    if (r->sqes == MAP_FAILED) goto fail;
    {
        uint8_t* sq = (uint8_t*)r->sq_ptr;
        r->sq_head = (unsigned*)(sq + p.sq_off.head);
        r->sq_tail = (unsigned*)(sq + p.sq_off.tail);
        r->sq_mask = (unsigned*)(sq + p.sq_off.ring_mask);
        r->sq_array = (unsigned*)(sq + p.sq_off.array);
        uint8_t* cq = (uint8_t*)r->cq_ptr;
        r->cq_head = (unsigned*)(cq + p.cq_off.head);
        r->cq_tail = (unsigned*)(cq + p.cq_off.tail);
        r->cq_mask = (unsigned*)(cq + p.cq_off.ring_mask);
        r->cqes = (io_uring_cqe*)(cq + p.cq_off.cqes);
    }
    return r;
fail:
    if (r->sqes && r->sqes != MAP_FAILED) munmap(r->sqes, r->sqes_sz);
    if (r->cq_ptr && r->cq_ptr != MAP_FAILED && r->cq_ptr != r->sq_ptr)
        munmap(r->cq_ptr, r->cq_sz);
    if (r->sq_ptr && r->sq_ptr != MAP_FAILED) munmap(r->sq_ptr, r->sq_sz);
    close(fd);
    delete r;
    return nullptr;
}

// Submit one positional write; buf must stay valid until its token is
// reaped. token must fit 32 bits (the upper half carries the expected
// length for short-write detection) and len must be < 4 GiB per chunk.
// Returns 0 ok, -1 submit error, -2 ring full (reap first).
int uring_writer_write(void* h, const void* buf, int64_t len, int64_t off,
                       uint64_t token) {
    Ring* r = (Ring*)h;
    if (token > 0xFFFFFFFFULL || len > 0xFFFFFFFFLL) return -1;
    if (r->inflight >= r->entries) return -2;
    unsigned tail = *r->sq_tail;
    unsigned idx = tail & *r->sq_mask;
    io_uring_sqe* sqe = &r->sqes[idx];
    std::memset(sqe, 0, sizeof(*sqe));
    sqe->opcode = IORING_OP_WRITE;
    sqe->fd = r->file_fd;
    sqe->addr = (uint64_t)(uintptr_t)buf;
    sqe->len = (uint32_t)len;
    sqe->off = (uint64_t)off;
    sqe->user_data = ((uint64_t)len << 32) | token;
    r->sq_array[idx] = idx;
    __atomic_store_n(r->sq_tail, tail + 1, __ATOMIC_RELEASE);
    int ret = sys_enter(r->ring_fd, 1, 0, 0);
    if (ret < 0) return -1;
    r->inflight++;
    return 0;
}

// Collect finished tokens. wait_for_one blocks until at least one
// completion is available (when anything is in flight). Returns the
// number of tokens written.
int uring_writer_reap(void* h, uint64_t* tokens, int max_tokens,
                      int wait_for_one) {
    Ring* r = (Ring*)h;
    int n = reap_ready(r, tokens, max_tokens);
    if (n == 0 && wait_for_one && r->inflight > 0) {
        if (sys_enter(r->ring_fd, 0, 1, IORING_ENTER_GETEVENTS) < 0)
            return -1;
        n = reap_ready(r, tokens, max_tokens);
    }
    return n;
}

// Block until every in-flight write completed; returns the number of
// failed writes observed over the ring's lifetime (0 = clean).
int uring_writer_drain(void* h, uint64_t* tokens, int max_tokens,
                       int64_t* n_tokens) {
    Ring* r = (Ring*)h;
    int64_t total = 0;
    while (r->inflight > 0) {
        int n = uring_writer_reap(h, tokens + total,
                                  (int)(max_tokens - total), 1);
        if (n < 0) return -1;
        total += n;
        if (total >= max_tokens) break;  // caller's token buffer too small
    }
    if (n_tokens) *n_tokens = total;
    return r->errors;
}

void uring_writer_destroy(void* h) {
    Ring* r = (Ring*)h;
    if (!r) return;
    if (r->sqes) munmap(r->sqes, r->sqes_sz);
    if (r->cq_ptr && r->cq_ptr != r->sq_ptr) munmap(r->cq_ptr, r->cq_sz);
    if (r->sq_ptr) munmap(r->sq_ptr, r->sq_sz);
    if (r->ring_fd >= 0) close(r->ring_fd);
    delete r;
}

}  // extern "C"
