/* fctest — standalone sanitizer harness for the native codec/IO layer.
 *
 * The reference CI builds {gcc,clang} x {ASan,UBSan,TSan} and runs its
 * golden e2e assertions under them (.github/workflows/build-static.yml,
 * cmake/FindASan.cmake). ctypes cannot load an ASan-instrumented .so into
 * an uninstrumented Python, so this harness links the same sources into an
 * instrumented executable and drives the same code paths directly:
 *
 *   fctest decode <fcz>            parse + full decode to PDB text
 *   fctest fuzz <fcz> <trials>     deterministic mutation/truncation fuzz
 *   fctest roundtrip <pdb>         parse PDB -> encode -> decode
 *   fctest db <dbdata> <dbindex>   decode every entry of an MMseqs2 db
 *   fctest badindex <dbdata>       corrupt .index offsets must be rejected
 *   fctest tchunks <db> <idx> [T] [R]  T threads x R rounds of the
 *       flock'd chunk-claim decode loop (the hybrid scheduler's
 *       thread-worker pattern) — built with -fsanitize=thread too
 *
 * Built by tests/test_sanitizer.py with
 *   -fsanitize=address,undefined -fno-sanitize-recover=all
 * so any heap error or UB aborts with a nonzero exit.
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>
#include <fcntl.h>

extern int64_t fcz_decode_pdb(const uint8_t* buf, int64_t len, int use_alt,
                              char* out);
extern int64_t fcz_decode_pdb_cap(const uint8_t* buf, int64_t len);
extern int64_t fcio_count_atoms(const char* text, int64_t len);
extern int64_t fcio_parse_pdb(const char* text, int64_t len,
                              int32_t* atom_index, int32_t* residue_index,
                              char* name4, char* res3, char* chain,
                              float* coords, float* occ, float* temp,
                              char* title, int32_t* title_len,
                              int32_t title_cap);
extern int64_t fcz_encode_atoms(
        const char* name4, const char* res3, const char* chain,
        const int32_t* atom_index, const int32_t* residue_index,
        const float* coords, const float* temp, int64_t n_atoms,
        int threshold, const char* title, int32_t title_len, int split,
        uint8_t* out, int64_t out_cap,
        int64_t* frag_off, int64_t* frag_len, char* frag_chain,
        int32_t* frag_meta, int32_t max_frags);
extern void* fcdb_reader_open(const char* data_path, const char* index_path,
                              int use_data);
extern int64_t fcdb_reader_size(void* h);
extern int64_t fcdb_reader_get(void* h, int64_t pos, const char** ptr,
                               int64_t* length);
extern void fcdb_reader_close(void* h);

static uint8_t* read_file(const char* path, int64_t* out_len) {
    FILE* f = fopen(path, "rb");
    if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(2); }
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    uint8_t* buf = (uint8_t*)malloc((size_t)sz + 1);
    if (fread(buf, 1, (size_t)sz, f) != (size_t)sz) exit(2);
    fclose(f);
    buf[sz] = 0;
    *out_len = sz;
    return buf;
}

/* decode one payload with an exactly-sized output buffer so ASan catches
 * any formatter overrun of the advertised capacity */
static int64_t decode_one(const uint8_t* buf, int64_t len, int quiet) {
    int64_t cap = fcz_decode_pdb_cap(buf, len);
    if (cap < 0) return cap;
    if (cap > (int64_t)256 * 1024 * 1024) return -9; /* absurd header */
    char* out = (char*)malloc((size_t)cap);
    int64_t w = fcz_decode_pdb(buf, len, 0, out);
    if (w > cap) { fprintf(stderr, "decode overran cap\n"); exit(3); }
    if (!quiet && w > 0) fwrite(out, 1, (size_t)w, stdout);
    free(out);
    return w;
}

/* xorshift64 — deterministic fuzz independent of libc rand */
static uint64_t rng_state = 0x9E3779B97F4A7C15ull;
static uint64_t rng(void) {
    uint64_t x = rng_state;
    x ^= x << 13; x ^= x >> 7; x ^= x << 17;
    return rng_state = x;
}

static int cmd_fuzz(const char* path, int trials) {
    int64_t len;
    uint8_t* blob = read_file(path, &len);
    uint8_t* b = (uint8_t*)malloc((size_t)len);
    for (int t = 0; t < trials; t++) {
        memcpy(b, blob, (size_t)len);
        int64_t blen = len;
        switch (t % 4) {
        case 0: /* random byte flips anywhere */
            for (int k = 0; k < 1 + (int)(rng() % 16); k++)
                b[rng() % (uint64_t)len] = (uint8_t)rng();
            break;
        case 1: /* truncation */
            blen = 4 + (int64_t)(rng() % (uint64_t)(len - 4));
            break;
        case 2: /* header corruption */
            for (int k = 0; k < 6; k++)
                b[4 + rng() % 72] = (uint8_t)rng();
            break;
        default: /* anchor-index corruption */
            for (int k = 0; k < 4 && len > 92; k++)
                b[76 + rng() % 16] = (uint8_t)rng();
            break;
        }
        decode_one(b, blen, 1);
    }
    free(b);
    free(blob);
    printf("fuzz ok %d\n", trials);
    return 0;
}

static int cmd_roundtrip(const char* path) {
    int64_t len;
    uint8_t* text = read_file(path, &len);
    int64_t n = fcio_count_atoms((const char*)text, len);
    if (n <= 0) { fprintf(stderr, "no atoms\n"); return 2; }
    int32_t* aidx = (int32_t*)malloc((size_t)n * 4);
    int32_t* ridx = (int32_t*)malloc((size_t)n * 4);
    char* name4 = (char*)malloc((size_t)n * 4);
    char* res3 = (char*)malloc((size_t)n * 3);
    char* chain = (char*)malloc((size_t)n);
    float* coords = (float*)malloc((size_t)n * 12);
    float* occ = (float*)malloc((size_t)n * 4);
    float* temp = (float*)malloc((size_t)n * 4);
    char title[4096];
    int32_t title_len = 0;
    int64_t got = fcio_parse_pdb((const char*)text, len, aidx, ridx, name4,
                                 res3, chain, coords, occ, temp, title,
                                 &title_len, sizeof(title));
    if (got != n) { fprintf(stderr, "parse count mismatch\n"); return 2; }

    int64_t cap = n * 20 + title_len + ((int64_t)1 << 20);
    uint8_t* out = (uint8_t*)malloc((size_t)cap);
    int64_t foff[256], flen[256];
    char fch[256];
    int32_t fmeta[1024];
    int64_t nf = fcz_encode_atoms(name4, res3, chain, aidx, ridx, coords,
                                  temp, n, 25, title, title_len, 1, out,
                                  cap, foff, flen, fch, fmeta, 256);
    if (nf <= 0) { fprintf(stderr, "encode failed (%lld)\n",
                           (long long)nf); return 2; }
    int decoded = 0;
    for (int64_t i = 0; i < nf; i++) {
        if (flen[i] <= 0) continue;
        if (decode_one(out + foff[i], flen[i], 1) > 0) decoded++;
    }
    /* threshold edge cases the python layer now rejects: the native layer
     * must error cleanly, never divide by zero or truncate counts */
    int64_t w0 = fcz_encode_atoms(name4, res3, chain, aidx, ridx, coords,
                                  temp, n, 0, title, title_len, 0, out, cap,
                                  foff, flen, fch, fmeta, 256);
    if (w0 > 0 && flen[0] > 0) { fprintf(stderr, "b=0 accepted\n"); return 2; }
    int64_t w1 = fcz_encode_atoms(name4, res3, chain, aidx, ridx, coords,
                                  temp, n, 1, title, title_len, 0, out, cap,
                                  foff, flen, fch, fmeta, 256);
    (void)w1; /* threshold=1 on a big chain: either ok or clean -5 */
    printf("roundtrip ok %lld fragments, %d decoded\n", (long long)nf,
           decoded);
    free(text); free(aidx); free(ridx); free(name4); free(res3);
    free(chain); free(coords); free(occ); free(temp); free(out);
    return 0;
}

static int cmd_db(const char* data, const char* index) {
    void* h = fcdb_reader_open(data, index, 1);
    if (!h) { fprintf(stderr, "cannot open db\n"); return 2; }
    int64_t nok = 0, n = fcdb_reader_size(h);
    for (int64_t i = 0; i < n; i++) {
        const char* ptr;
        int64_t len;
        if (fcdb_reader_get(h, i, &ptr, &len) != 0) continue;
        if (len > 1 && decode_one((const uint8_t*)ptr, len - 1, 1) > 0)
            nok++;
    }
    fcdb_reader_close(h);
    printf("db ok %lld/%lld\n", (long long)nok, (long long)n);
    return 0;
}

extern void* fcdb_writer_open(const char* data_path);
extern int64_t fcdb_writer_close(void* h);
extern int64_t fcz_db_decode_range(void* reader, void* writer,
                                   int64_t start, int64_t end,
                                   const char* names, int use_alt);
extern int64_t fcz_db_encode_range(void* reader, void* writer,
                                   int64_t start, int64_t end,
                                   const char* names, int threshold);
extern int64_t fcz_db_extract_range(void* reader, void* writer, int out_fd,
                                    int64_t start, int64_t end,
                                    const char* names, int ext_mode,
                                    int digits, int use_title);

static int cmd_ranges(const char* data, const char* index) {
    /* exercise the GIL-free chunk loops under the sanitizers:
     * decode-range -> shard db, then encode-range the result back, then
     * extract-range both modes/digit forms to /dev/null */
    void* h = fcdb_reader_open(data, index, 1);
    if (!h) { fprintf(stderr, "cannot open db\n"); return 2; }
    int64_t n = fcdb_reader_size(h);
    char pdbdb[] = "/tmp/fctest_rng_pdb_XXXXXX";
    int fd = mkstemp(pdbdb);
    if (fd < 0) return 2;
    close(fd);
    void* w = fcdb_writer_open(pdbdb);
    int64_t dec = fcz_db_decode_range(h, w, 0, n, NULL, 0);
    fcdb_writer_close(w);
    if (dec < 0) return 3;
    char idx[300];
    snprintf(idx, sizeof idx, "%s.index", pdbdb);
    void* h2 = fcdb_reader_open(pdbdb, idx, 1);
    if (!h2) return 2;
    char fczdb[] = "/tmp/fctest_rng_fcz_XXXXXX";
    fd = mkstemp(fczdb);
    if (fd < 0) return 2;
    close(fd);
    void* w2 = fcdb_writer_open(fczdb);
    int64_t enc = fcz_db_encode_range(h2, w2, 0, dec, NULL, 25);
    fcdb_writer_close(w2);
    fcdb_reader_close(h2);
    if (enc < 0) return 3;
    int nullfd = open("/dev/null", O_WRONLY);
    for (int mode = 0; mode <= 1; mode++)
        for (int digits = 1; digits <= 4; digits++)
            if (fcz_db_extract_range(h, NULL, nullfd, 0, n, NULL, mode,
                                     digits, mode) < 0)
                return 3;
    close(nullfd);
    fcdb_reader_close(h);
    printf("ranges ok dec=%lld enc=%lld\n", (long long)dec,
           (long long)enc);
    return 0;
}

#include <pthread.h>
#include <stdatomic.h>
#include <sys/file.h>

/* --- tchunks: the production thread-worker concurrency under TSan ---
 *
 * Mirrors parallel/hybrid.py exactly: N threads, each with its OWN
 * reader+writer handle, claiming entry chunks from a shared flock'd
 * two-pointer control file (ChunkController wire format: two LE int64s,
 * front ascending / back descending) and running the GIL-free
 * fcz_db_decode_range chunk loop. Shared state between threads is the
 * read-only mmap, the control file, and one atomic result counter —
 * any unsynchronized mutation inside fcio/fccodec shows up as a TSan
 * report (built with -fsanitize=thread by tests/test_sanitizer.py). */

typedef struct {
    const char* data;
    const char* index;
    const char* ctrl;
    int64_t n_entries;
    int64_t chunk_entries;
    int wid;
    int back;              /* claim from the back pointer (device-stream
                              role) instead of the front */
    atomic_llong* total;
    int rc;
} tchunk_arg;

static int64_t ctrl_claim(const char* path, int back) {
    int fd = open(path, O_RDWR);
    if (fd < 0) return -2;
    if (flock(fd, LOCK_EX) != 0) { close(fd); return -2; }
    int64_t ptrs[2];
    int64_t got = -1;
    if (pread(fd, ptrs, 16, 0) != 16) {
        got = -2;               /* read error != drained: report, don't
                                   silently end the claim loop */
    } else if (ptrs[0] < ptrs[1]) {
        if (back) got = --ptrs[1];
        else      got = ptrs[0]++;
        if (pwrite(fd, ptrs, 16, 0) != 16) got = -2;
    }
    flock(fd, LOCK_UN);
    close(fd);
    return got;
}

static void* tchunk_main(void* p) {
    tchunk_arg* a = (tchunk_arg*)p;
    void* reader = fcdb_reader_open(a->data, a->index, 1);
    if (!reader) { a->rc = 2; return NULL; }
    char shard[256];
    snprintf(shard, sizeof shard, "/tmp/fctest_tchunk_%d_XXXXXX", a->wid);
    int fd = mkstemp(shard);
    if (fd < 0) { fcdb_reader_close(reader); a->rc = 2; return NULL; }
    close(fd);
    void* writer = fcdb_writer_open(shard);
    if (!writer) { fcdb_reader_close(reader); a->rc = 2; return NULL; }
    int64_t c;
    while ((c = ctrl_claim(a->ctrl, a->back)) >= 0) {
        int64_t start = c * a->chunk_entries;
        int64_t stop = start + a->chunk_entries;
        if (stop > a->n_entries) stop = a->n_entries;
        int64_t r = fcz_db_decode_range(reader, writer, start, stop, NULL,
                                        0);
        if (r < 0) { a->rc = 3; break; }
        atomic_fetch_add(a->total, (long long)r);
    }
    if (c == -2) a->rc = 2;
    fcdb_writer_close(writer);
    fcdb_reader_close(reader);
    unlink(shard);
    char aux[300];
    snprintf(aux, sizeof aux, "%s.index", shard); unlink(aux);
    snprintf(aux, sizeof aux, "%s.dbtype", shard); unlink(aux);
    snprintf(aux, sizeof aux, "%s.lookup", shard); unlink(aux);
    return NULL;
}

static int cmd_tchunks(const char* data, const char* index, int n_threads,
                       int rounds) {
    void* h = fcdb_reader_open(data, index, 0);
    if (!h) { fprintf(stderr, "cannot open db\n"); return 2; }
    int64_t n = fcdb_reader_size(h);
    fcdb_reader_close(h);
    const int64_t chunk_entries = 2;
    int64_t n_chunks = (n + chunk_entries - 1) / chunk_entries;
    for (int round = 0; round < rounds; round++) {
        char ctrl[] = "/tmp/fctest_ctrl_XXXXXX";
        int fd = mkstemp(ctrl);
        if (fd < 0) return 2;
        int64_t ptrs[2] = {0, n_chunks};
        if (write(fd, ptrs, 16) != 16) return 2;
        close(fd);

        atomic_llong total = 0;
        pthread_t tids[64];
        tchunk_arg args[64];
        if (n_threads > 64) n_threads = 64;
        for (int t = 0; t < n_threads; t++) {
            args[t] = (tchunk_arg){data, index, ctrl, n, chunk_entries, t,
                                   t == n_threads - 1, &total, 0};
            pthread_create(&tids[t], NULL, tchunk_main, &args[t]);
        }
        int rc = 0;
        for (int t = 0; t < n_threads; t++) {
            pthread_join(tids[t], NULL);
            if (args[t].rc) rc = args[t].rc;
        }
        unlink(ctrl);
        if (rc) return rc;
        /* every entry decoded exactly once: double-claims or lost
         * chunks both break the count */
        if ((int64_t)atomic_load(&total) != n) {
            fprintf(stderr, "round %d: decoded %lld of %lld entries\n",
                    round, (long long)atomic_load(&total), (long long)n);
            return 3;
        }
    }
    printf("tchunks ok %d threads x %d rounds\n", n_threads, rounds);
    return 0;
}

static int cmd_badindex(const char* data) {
    /* write an index whose offsets/lengths run outside the data file; every
     * lookup must be rejected, not read out of bounds */
    char tmpl[] = "/tmp/fctest_badidx_XXXXXX";
    int fd = mkstemp(tmpl);
    if (fd < 0) return 2;
    FILE* f = fdopen(fd, "w");
    fprintf(f, "0\t999999999999\t16\n");
    fprintf(f, "1\t-8\t16\n");
    fprintf(f, "2\t0\t999999999999\n");
    fprintf(f, "3\t16\t-4\n");
    fclose(f);
    void* h = fcdb_reader_open(data, tmpl, 1);
    unlink(tmpl);
    if (!h) return 2;
    const char* ptr;
    int64_t len;
    for (int64_t i = 0; i < fcdb_reader_size(h); i++) {
        if (fcdb_reader_get(h, i, &ptr, &len) == 0) {
            fprintf(stderr, "out-of-bounds entry %lld accepted\n",
                    (long long)i);
            return 3;
        }
    }
    fcdb_reader_close(h);
    printf("badindex ok\n");
    return 0;
}

int main(int argc, char** argv) {
    if (argc < 3) {
        fprintf(stderr,
                "usage: fctest decode|fuzz|roundtrip|db|badindex|ranges|tchunks ...\n");
        return 2;
    }
    if (strcmp(argv[1], "decode") == 0) {
        int64_t len;
        uint8_t* buf = read_file(argv[2], &len);
        int64_t w = decode_one(buf, len, 0);
        free(buf);
        return w > 0 ? 0 : 1;
    }
    if (strcmp(argv[1], "fuzz") == 0)
        return cmd_fuzz(argv[2], argc > 3 ? atoi(argv[3]) : 400);
    if (strcmp(argv[1], "roundtrip") == 0)
        return cmd_roundtrip(argv[2]);
    if (strcmp(argv[1], "db") == 0 && argc > 3)
        return cmd_db(argv[2], argv[3]);
    if (strcmp(argv[1], "badindex") == 0)
        return cmd_badindex(argv[2]);
    if (strcmp(argv[1], "ranges") == 0 && argc > 3)
        return cmd_ranges(argv[2], argv[3]);
    if (strcmp(argv[1], "tchunks") == 0 && argc > 3)
        return cmd_tchunks(argv[2], argv[3],
                           argc > 4 ? atoi(argv[4]) : 4,
                           argc > 5 ? atoi(argv[5]) : 3);
    fprintf(stderr, "unknown mode\n");
    return 2;
}
