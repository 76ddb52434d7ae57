/* fcio — native IO runtime for foldcomp_tpu.
 *
 * TPU-native re-implementation of the reference's C++ IO layer:
 *   - fixed-column PDB ATOM formatting with fast float->ascii
 *     (reference: writeAtomCoordinatesToPDB + fast_ftoa,
 *      src/atom_coordinate.cpp:186-291)
 *   - direct atom14-tensor -> PDB text expansion (no per-atom Python),
 *     the host half of the batched TPU decode path
 *   - PDB ATOM-line parsing into struct-of-arrays
 *     (reference: gemmi subset used by structure_reader.cpp:31-61)
 *   - MMseqs2-style database reader/writer
 *     (reference: src/database_reader.cpp / database_writer.cpp)
 *
 * Exposed via ctypes (foldcomp_tpu/native.py); every entry point is plain C.
 */
#define _GNU_SOURCE  /* qsort_r */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#ifdef _WIN32
#error "POSIX only"
#endif
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include "aatable_gen.h"

/* ------------------------------------------------------------------ */
/* number formatting                                                   */
/* ------------------------------------------------------------------ */

static const char DIGIT_PAIRS[200] =
    "00010203040506070809101112131415161718192021222324"
    "25262728293031323334353637383940414243444546474849"
    "50515253545556575859606162636465666768697071727374"
    "75767778798081828384858687888990919293949596979899";

static inline char* put_int(char* p, int64_t v) {
    char tmp[24];
    int n = 0;
    uint64_t u;
    if (v < 0) { *p++ = '-'; u = (uint64_t)(-(v + 1)) + 1; }
    else u = (uint64_t)v;
    while (u >= 100) {                 /* two digits per divide */
        unsigned d = (unsigned)(u % 100);
        u /= 100;
        tmp[n++] = DIGIT_PAIRS[d * 2 + 1];
        tmp[n++] = DIGIT_PAIRS[d * 2];
    }
    if (u >= 10) {
        tmp[n++] = DIGIT_PAIRS[u * 2 + 1];
        tmp[n++] = DIGIT_PAIRS[u * 2];
    } else {
        tmp[n++] = (char)('0' + u);
    }
    while (n) *p++ = tmp[--n];
    return p;
}

/* right-justified integer in a fixed-width field (grows if too wide,
 * matching printf %Nd) */
static inline char* put_int_rj(char* p, int64_t v, int width) {
    char tmp[24];
    char* e = put_int(tmp, v);
    int len = (int)(e - tmp);
    for (int i = len; i < width; i++) *p++ = ' ';
    memcpy(p, tmp, (size_t)len);
    return p + len;
}

static inline char* put_ftoa_rj(char* p, float n, int t, int pdigits,
                                int width);

/* Specialized fast_ftoa for the ATOM-line hot fields: t=1000/P=3 coords
 * in a width-8 slot and t=100/P=2 temp in width-6. Identical digit
 * semantics to put_ftoa_rj below (same float rounding + truncating
 * integer splits), but the digits come from the pair LUT and the
 * justification is computed, not copied. Caller guarantees the value
 * range fits the width (put_atom_line template guards). */
static inline char* put_ftoa_fast(char* p, float n, float t, int pdigits,
                                  int width) {
    float half = 0.5f / t;
    float rounded = n + (n < 0 ? -half : half);
    int64_t integer = (int64_t)rounded;
    int64_t decimal = (int64_t)((rounded - (float)integer) * t);
    int neg = n < 0;
    if (neg) {
        if (integer < 0) integer = -integer;
        if (decimal < 0) decimal = -decimal;
    }
    unsigned u = (unsigned)integer;
    if (u > 9999)   /* defensive: 4-digit LUT form only (callers' range
                       guards make this unreachable for f32 inputs) */
        return put_ftoa_rj(p, n, (int)t, pdigits, width);
    int ilen = u < 10 ? 1 : (u < 100 ? 2 : (u < 1000 ? 3 : 4));
    int len = neg + ilen + 1 + pdigits;
    for (int i = width - len; i > 0; i--) *p++ = ' ';
    if (neg) *p++ = '-';
    switch (ilen) {
    case 4: *p++ = DIGIT_PAIRS[(u / 100) * 2];        /* fallthrough */
    case 3: *p++ = DIGIT_PAIRS[(u / 100) * 2 + 1];    /* fallthrough */
    case 2: *p++ = DIGIT_PAIRS[(u % 100) * 2];        /* fallthrough */
    default: *p++ = DIGIT_PAIRS[(u % 100) * 2 + 1];
    }
    *p++ = '.';
    unsigned d = (unsigned)decimal;
    if (pdigits == 3) {
        *p++ = (char)('0' + d / 100);
        *p++ = DIGIT_PAIRS[(d % 100) * 2];
        *p++ = DIGIT_PAIRS[(d % 100) * 2 + 1];
    } else {
        *p++ = DIGIT_PAIRS[d * 2];
        *p++ = DIGIT_PAIRS[d * 2 + 1];
    }
    return p;
}

/* fast_ftoa<T,P> replica (atom_coordinate.cpp:186-218): add +-0.5f/T,
 * truncate both parts toward zero, zero-pad fraction to P digits;
 * result right-justified in `width`. All arithmetic in float. Non-finite
 * or absurd magnitudes (possible only from corrupted streams) are clamped
 * so the digit buffers cannot overflow. */
static inline char* put_ftoa_rj(char* p, float n, int t, int pdigits,
                                int width) {
    if (!(n > -1e15f && n < 1e15f)) /* NaN or |n| >= 1e15 */
        n = n > 0 ? 1e15f : (n < 0 ? -1e15f : 0.0f);
    float half = 0.5f / (float)t;
    float rounded = n + (n < 0 ? -half : half);
    int64_t integer = (int64_t)rounded;
    int64_t decimal = (int64_t)((rounded - (float)integer) * (float)t);
    char tmp[64];
    char* q = tmp;
    if (n < 0) {
        *q++ = '-';
        if (integer < 0) integer = -integer;
        if (decimal < 0) decimal = -decimal;
    }
    q = put_int(q, integer);
    *q++ = '.';
    char dtmp[24];
    char* de = put_int(dtmp, decimal);
    int dlen = (int)(de - dtmp);
    for (int i = dlen; i < pdigits; i++) *q++ = '0';
    memcpy(q, dtmp, (size_t)dlen);
    q += dlen;
    int len = (int)(q - tmp);
    for (int i = len; i < width; i++) *p++ = ' ';
    memcpy(p, tmp, (size_t)len);
    return p + len;
}

/* ------------------------------------------------------------------ */
/* PDB formatting                                                      */
/* ------------------------------------------------------------------ */

static char* put_title(char* p, const char* title, int32_t title_len) {
    /* TITLE records (atom_coordinate writer's caller emits these via
     * writeStream; layout mirrors io/pdb.py format_pdb) */
    if (title_len <= 0) return p;
    int32_t off = 0, cont = 1;
    while (off < title_len) {
        int32_t n = title_len - off;
        if (n > 70) n = 70;
        if (cont == 1) {
            memcpy(p, "TITLE     ", 10); p += 10;
        } else {
            memcpy(p, "TITLE  ", 7); p += 7;
            p = put_int_rj(p, cont, 3);
        }
        memcpy(p, title + off, (size_t)n); p += n;
        *p++ = '\n';
        off += n;
        cont++;
    }
    return p;
}

static inline char* put_atom_line(char* p, int64_t serial, const char* name4,
                                  const char* res3, char chain, int64_t resid,
                                  float x, float y, float z, float temp) {
    memcpy(p, "ATOM  ", 6); p += 6;
    p = put_int_rj(p, serial, 5);
    *p++ = ' ';
    memcpy(p, name4, 4); p += 4;
    *p++ = ' ';
    /* residue name right-justified 3 */
    {
        int len = 0;
        while (len < 3 && res3[len]) len++;
        for (int i = len; i < 3; i++) *p++ = ' ';
        memcpy(p, res3, (size_t)len); p += len;
    }
    *p++ = ' ';
    *p++ = chain;
    p = put_int_rj(p, resid, 4);
    memcpy(p, "    ", 4); p += 4;
    p = put_ftoa_rj(p, x, 1000, 3, 8);
    p = put_ftoa_rj(p, y, 1000, 3, 8);
    p = put_ftoa_rj(p, z, 1000, 3, 8);
    memcpy(p, "  1.00", 6); p += 6;
    p = put_ftoa_rj(p, temp, 100, 2, 6);
    memcpy(p, "          ", 10); p += 10;
    /* element = first non-space char of the name field, right-justified 2 */
    {
        char e = name4[0] == ' ' ? name4[1] : name4[0];
        *p++ = ' ';
        *p++ = e;
    }
    *p++ = ' '; *p++ = ' '; *p++ = '\n';
    return p;
}

/* --- templated ATOM-line fast path ---------------------------------
 * An ATOM line is 81 bytes with fixed columns; per residue only
 * res3/chain/resid/temp change, per atom only serial/name/xyz/element.
 * _tmpl_residue fills the per-residue constants into an 81-byte line
 * buffer; _tmpl_atom patches the per-atom fields and memcpys the line
 * out. Both return 0 (caller falls back to put_atom_line, byte-
 * identical by construction) when a field would overflow its fixed
 * width (|coord| >= 10000 or <= -1000, serial > 99999, ...). */
static inline int _tmpl_residue(char* line, const char* res3, char chain,
                                int64_t resid, float temp) {
    if (resid < -999 || resid > 9999) return 0;
    if (!(temp > -99.0f && temp < 1000.0f)) return 0;
    memcpy(line, "ATOM  ", 6);
    line[11] = ' ';
    line[16] = ' ';
    {
        int len = 0;
        while (len < 3 && res3[len]) len++;
        for (int i = 0; i < 3 - len; i++) line[17 + i] = ' ';
        memcpy(line + 17 + (3 - len), res3, (size_t)len);
    }
    line[20] = ' ';
    line[21] = chain;
    {
        char* q = line + 22;
        char* e = put_int_rj(q, resid, 4);
        if (e != line + 26) return 0;
    }
    memset(line + 26, ' ', 4);
    memcpy(line + 54, "  1.00", 6);
    {
        char* e = put_ftoa_fast(line + 60, temp, 100.0f, 2, 6);
        if (e != line + 66) return 0;
    }
    memset(line + 66, ' ', 11);
    line[78] = ' ';
    line[79] = ' ';
    line[80] = '\n';
    return 1;
}

static inline char* _tmpl_atom(char* p, char* line, int64_t serial,
                               const char* name4, float x, float y,
                               float z) {
    if (serial < 0 || serial > 99999) return NULL;
    if (!(x > -1000.0f && x < 10000.0f && y > -1000.0f && y < 10000.0f &&
          z > -1000.0f && z < 10000.0f))
        return NULL;
    char* e = put_int_rj(line + 6, serial, 5);
    if (e != line + 11) return NULL;
    memcpy(line + 12, name4, 4);
    if (put_ftoa_fast(line + 30, x, 1000.0f, 3, 8) != line + 38)
        return NULL;
    if (put_ftoa_fast(line + 38, y, 1000.0f, 3, 8) != line + 46)
        return NULL;
    if (put_ftoa_fast(line + 46, z, 1000.0f, 3, 8) != line + 54)
        return NULL;
    line[77] = name4[0] == ' ' ? name4[1] : name4[0];
    memcpy(p, line, 81);
    return p + 81;
}

static inline char* put_ter(char* p, int64_t serial, const char* res3,
                            char chain, int64_t resid) {
    memcpy(p, "TER   ", 6); p += 6;
    p = put_int_rj(p, serial, 5);
    memcpy(p, "      ", 6); p += 6;
    {
        int len = 0;
        while (len < 3 && res3[len]) len++;
        for (int i = len; i < 3; i++) *p++ = ' ';
        memcpy(p, res3, (size_t)len); p += len;
    }
    *p++ = ' ';
    *p++ = chain;
    p = put_int_rj(p, resid, 4);
    *p++ = '\n';
    return p;
}

/* Generic formatter over pre-packed per-atom fields.
 * name4: [n*4] name fields; res3: [n*3]; chain: [n]. Returns bytes written. */
int64_t fcio_format_pdb(int32_t n, const int32_t* atom_index,
                        const int32_t* residue_index, const char* name4,
                        const char* res3, const char* chain,
                        const float* coords, const float* temp,
                        const char* title, int32_t title_len, char* out) {
    char* p = out;
    p = put_title(p, title, title_len);
    char r3[4] = {0, 0, 0, 0};
    char line[81];
    int tmpl = 0;
    int32_t tmpl_resid = -1000000;
    char tmpl_chain = 0;
    float tmpl_temp = 0.0f;
    for (int32_t i = 0; i < n; i++) {
        memcpy(r3, res3 + 3 * i, 3);
        /* per-residue constants repeat across an entry's ~8 atom lines:
         * rebuild the line template only when they change */
        if (i == 0 || residue_index[i] != tmpl_resid ||
            chain[i] != tmpl_chain || temp[i] != tmpl_temp) {
            tmpl_resid = residue_index[i];
            tmpl_chain = chain[i];
            tmpl_temp = temp[i];
            tmpl = _tmpl_residue(line, r3, tmpl_chain, tmpl_resid,
                                 tmpl_temp);
        }
        char* q = tmpl ? _tmpl_atom(p, line, atom_index[i], name4 + 4 * i,
                                    coords[3 * i], coords[3 * i + 1],
                                    coords[3 * i + 2])
                       : NULL;
        p = q ? q : put_atom_line(p, atom_index[i], name4 + 4 * i, r3,
                                  chain[i], residue_index[i], coords[3 * i],
                                  coords[3 * i + 1], coords[3 * i + 2],
                                  temp[i]);
    }
    if (n > 0) {
        memcpy(r3, res3 + 3 * (n - 1), 3);
        p = put_ter(p, (int64_t)atom_index[n - 1] + 1, r3, chain[n - 1],
                    residue_index[n - 1]);
    }
    return (int64_t)(p - out);
}

static int code_of_one_letter(char c) {
    for (int i = 0; i < FC_NUM_CODES; i++)
        if (FC_ONE[i] == c) return i;
    return 23; /* UNK */
}

/* Direct atom14-tensor -> PDB text (the decode fast path's host half).
 * atom14: [n_res*14*3]; temp: [n_res]; codes: [n_res].
 * Naming parity with codec/batch.py unpack_decode_result:
 * residue 0 displays the header's first_residue letter; OXT appended with
 * residue_index = n_res (reference quirk, foldcomp.cpp:962-965).
 * Returns bytes written. */
int64_t fcio_format_atom14(const float* atom14, const float* temp,
                           const int32_t* codes, int32_t n_res,
                           int32_t idx_residue, int32_t idx_atom, char chain,
                           char first_res, char last_res, int32_t has_oxt,
                           const float* oxt_xyz, int32_t use_alt,
                           const char* title, int32_t title_len, char* out) {
    char* p = out;
    p = put_title(p, title, title_len);
    int64_t serial = idx_atom;
    const char* last_r3 = FC_THREE[23];
    int64_t last_resid = idx_residue;
    char line[81];
    for (int32_t r = 0; r < n_res; r++) {
        int code = codes[r];
        if (code < 0 || code >= FC_NUM_CODES) code = 23;
        int cnt = FC_N_ATOMS[code];
        const char* r3 = (r == 0) ? FC_THREE[code_of_one_letter(first_res)]
                                  : FC_THREE[code];
        int64_t resid = (int64_t)idx_residue + r;
        const float* base = atom14 + (size_t)r * FC_MAX_ATOM * 3;
        int tmpl = _tmpl_residue(line, r3, chain, resid, temp[r]);
        for (int k = 0; k < cnt; k++) {
            int slot = use_alt ? FC_ALT_PERM[code][k] : k;
            const float* xyz = base + slot * 3;
            char* q = tmpl ? _tmpl_atom(p, line, serial, FC_NAME4[code][slot],
                                        xyz[0], xyz[1], xyz[2])
                           : NULL;
            p = q ? q : put_atom_line(p, serial, FC_NAME4[code][slot], r3,
                                      chain, resid, xyz[0], xyz[1], xyz[2],
                                      temp[r]);
            serial++;
        }
        last_r3 = r3;
        last_resid = resid;
    }
    if (has_oxt) {
        const char* r3 = FC_THREE[code_of_one_letter(last_res)];
        p = put_atom_line(p, serial++, " OXT", r3, chain, n_res, oxt_xyz[0],
                          oxt_xyz[1], oxt_xyz[2],
                          n_res > 0 ? temp[n_res - 1] : 0.0f);
        last_r3 = r3;
        last_resid = n_res;
    }
    if (n_res > 0)
        p = put_ter(p, serial, last_r3, chain, last_resid);
    return (int64_t)(p - out);
}

/* ------------------------------------------------------------------ */
/* PDB parsing                                                         */
/* ------------------------------------------------------------------ */

static inline int parse_int_field(const char* s, int len) {
    int v = 0, sign = 1, i = 0;
    while (i < len && s[i] == ' ') i++;
    if (i < len && (s[i] == '-' || s[i] == '+')) {
        if (s[i] == '-') sign = -1;
        i++;
    }
    for (; i < len && s[i] >= '0' && s[i] <= '9'; i++)
        v = v * 10 + (s[i] - '0');
    return sign * v;
}

static inline float parse_float_field(const char* s, int len) {
    /* fixed-column decimal like -123.456; parse in double, round to float */
    double v = 0.0, frac = 0.0, scale = 1.0;
    int sign = 1, i = 0, in_frac = 0;
    while (i < len && s[i] == ' ') i++;
    if (i < len && (s[i] == '-' || s[i] == '+')) {
        if (s[i] == '-') sign = -1;
        i++;
    }
    for (; i < len; i++) {
        char c = s[i];
        if (c == '.') { in_frac = 1; continue; }
        if (c < '0' || c > '9') break;
        if (in_frac) { scale *= 10.0; frac = frac * 10.0 + (c - '0'); }
        else v = v * 10.0 + (c - '0');
    }
    return (float)(sign * (v + frac / scale));
}

/* Count ATOM/HETATM records (pass 1). Stops at the first ENDMDL so a
 * multi-model (NMR) file contributes only its first model — the
 * reference concatenates all models and then crashes downstream
 * (structure_reader.cpp:47-60); first-model-only is the pinned,
 * deterministic behavior (tests/test_wild_structures.py). */
int64_t fcio_count_atoms(const char* text, int64_t len) {
    int64_t count = 0;
    const char* p = text;
    const char* end = text + len;
    while (p < end) {
        const char* nl = memchr(p, '\n', (size_t)(end - p));
        int64_t ll = nl ? (nl - p) : (end - p);
        if (ll >= 54 && (memcmp(p, "ATOM  ", 6) == 0 ||
                         memcmp(p, "HETATM", 6) == 0))
            count++;
        else if (count > 0 && ll >= 6 && memcmp(p, "ENDMDL", 6) == 0)
            break;
        p = nl ? nl + 1 : end;
    }
    return count;
}

/* Parse ATOM/HETATM records (pass 2) into struct-of-arrays. Also extracts
 * the title (HEADER idCode preferred, else concatenated TITLE columns 11+,
 * right-trimmed — structure_reader.cpp:37-45 parity). name4/res3 are the
 * raw 4/3-char columns (un-stripped). Returns atoms filled. */
int64_t fcio_parse_pdb(const char* text, int64_t len, int32_t* atom_index,
                       int32_t* residue_index, char* name4, char* res3,
                       char* chain, float* coords, float* occ, float* temp,
                       char* title, int32_t* title_len, int32_t title_cap) {
    int64_t n = 0;
    int32_t tlen = 0;
    int have_header_id = 0;
    const char* p = text;
    const char* end = text + len;
    while (p < end) {
        const char* nl = memchr(p, '\n', (size_t)(end - p));
        int64_t ll = nl ? (nl - p) : (end - p);
        if (ll >= 54 && (memcmp(p, "ATOM  ", 6) == 0 ||
                         memcmp(p, "HETATM", 6) == 0)) {
            atom_index[n] = parse_int_field(p + 6, 5);
            memcpy(name4 + 4 * n, p + 12, 4);
            memcpy(res3 + 3 * n, p + 17, 3);
            chain[n] = p[21];
            residue_index[n] = parse_int_field(p + 22, 4);
            coords[3 * n] = parse_float_field(p + 30, 8);
            coords[3 * n + 1] = parse_float_field(p + 38, 8);
            coords[3 * n + 2] = parse_float_field(p + 46, 8);
            occ[n] = ll >= 60 ? parse_float_field(p + 54, 6) : 1.0f;
            temp[n] = ll >= 66 ? parse_float_field(p + 60, 6) : 0.0f;
            n++;
        } else if (n > 0 && ll >= 6 && memcmp(p, "ENDMDL", 6) == 0) {
            break;   /* first model only (see fcio_count_atoms) */
        } else if (ll > 62 && memcmp(p, "HEADER", 6) == 0) {
            int32_t m = (int32_t)(ll - 62 < 4 ? ll - 62 : 4);
            int32_t s = 0, e = m;
            while (s < e && p[62 + s] == ' ') s++;
            while (e > s && p[62 + e - 1] == ' ') e--;
            if (e > s && e - s <= title_cap) {
                memcpy(title, p + 62 + s, (size_t)(e - s));
                tlen = e - s;
                have_header_id = 1;
            }
        } else if (!have_header_id && ll > 10 &&
                   memcmp(p, "TITLE ", 6) == 0) {
            int64_t e = ll;
            while (e > 10 && (p[e - 1] == ' ' || p[e - 1] == '\r')) e--;
            int32_t m = (int32_t)(e - 10);
            if (m > 0 && tlen + m <= title_cap) {
                memcpy(title + tlen, p + 10, (size_t)m);
                tlen += m;
            }
        }
        p = nl ? nl + 1 : end;
    }
    *title_len = tlen;
    return n;
}

/* ------------------------------------------------------------------ */
/* MMseqs2-style database reader                                       */
/* (reference: database_reader.cpp — mmap data, text .index of          */
/*  "id\toffset\tlength" lines sorted by id)                            */
/* ------------------------------------------------------------------ */

typedef struct {
    char* data;        /* mmap'd data file (may be NULL without USE_DATA) */
    int64_t data_size;
    int data_fd;
    int64_t size;      /* entry count */
    uint32_t* ids;
    int64_t* offsets;
    int64_t* lengths;
} fcdb_reader;

static int64_t count_lines(const char* p, int64_t n) {
    int64_t c = 0;
    const char* end = p + n;
    while (p < end) {
        const char* nl = memchr(p, '\n', (size_t)(end - p));
        if (!nl) { c++; break; }
        c++;
        p = nl + 1;
    }
    return c;
}

void* fcdb_reader_open(const char* data_path, const char* index_path,
                       int use_data) {
    fcdb_reader* r = (fcdb_reader*)calloc(1, sizeof(fcdb_reader));
    if (!r) return NULL;
    r->data_fd = -1;
    if (use_data) {
        int fd = open(data_path, O_RDONLY);
        if (fd < 0) { free(r); return NULL; }
        struct stat st;
        if (fstat(fd, &st) != 0) { close(fd); free(r); return NULL; }
        r->data_size = st.st_size;
        r->data = (char*)mmap(NULL, (size_t)st.st_size, PROT_READ,
                              MAP_PRIVATE, fd, 0);
        if (r->data == MAP_FAILED) { close(fd); free(r); return NULL; }
        r->data_fd = fd;
    }
    /* read index file */
    FILE* f = fopen(index_path, "rb");
    if (!f) { free(r); return NULL; }
    fseek(f, 0, SEEK_END);
    long isz = ftell(f);
    fseek(f, 0, SEEK_SET);
    char* buf = (char*)malloc((size_t)isz + 1);
    if (!buf || fread(buf, 1, (size_t)isz, f) != (size_t)isz) {
        fclose(f); free(buf); free(r); return NULL;
    }
    fclose(f);
    buf[isz] = 0;
    int64_t lines = count_lines(buf, isz);
    r->ids = (uint32_t*)malloc((size_t)lines * 4);
    r->offsets = (int64_t*)malloc((size_t)lines * 8);
    r->lengths = (int64_t*)malloc((size_t)lines * 8);
    int64_t n = 0;
    char* p = buf;
    while (*p && n < lines) {
        char* q;
        uint32_t id = (uint32_t)strtoul(p, &q, 10);
        if (q == p) break;
        p = q;
        int64_t off = strtoll(p, &q, 10);
        p = q;
        int64_t ln = strtoll(p, &q, 10);
        p = q;
        r->ids[n] = id;
        r->offsets[n] = off;
        r->lengths[n] = ln;
        n++;
        while (*p && *p != '\n') p++;
        if (*p) p++;
    }
    free(buf);
    r->size = n;
    /* the on-disk index is sorted by id (database_writer.cpp close); sort
     * defensively if a foreign producer wrote it unsorted */
    int sorted = 1;
    for (int64_t i = 1; i < n; i++)
        if (r->ids[i] < r->ids[i - 1]) { sorted = 0; break; }
    if (!sorted) {
        /* simple index-permutation sort (n log n) */
        int64_t* ord = (int64_t*)malloc((size_t)n * 8);
        for (int64_t i = 0; i < n; i++) ord[i] = i;
        /* insertion-free: stdlib qsort with global-free comparator via
         * packing key+index into 96-bit records */
        typedef struct { uint32_t key; int64_t idx; } rec_t;
        rec_t* recs = (rec_t*)malloc((size_t)n * sizeof(rec_t));
        for (int64_t i = 0; i < n; i++) {
            recs[i].key = r->ids[i];
            recs[i].idx = i;
        }
        /* shell sort (stable enough: ties broken by original index) */
        for (int64_t gap = n / 2; gap > 0; gap /= 2)
            for (int64_t i = gap; i < n; i++) {
                rec_t tmp = recs[i];
                int64_t j = i;
                while (j >= gap && (recs[j - gap].key > tmp.key ||
                       (recs[j - gap].key == tmp.key &&
                        recs[j - gap].idx > tmp.idx))) {
                    recs[j] = recs[j - gap];
                    j -= gap;
                }
                recs[j] = tmp;
            }
        uint32_t* nids = (uint32_t*)malloc((size_t)n * 4);
        int64_t* noff = (int64_t*)malloc((size_t)n * 8);
        int64_t* nlen = (int64_t*)malloc((size_t)n * 8);
        for (int64_t i = 0; i < n; i++) {
            int64_t j = recs[i].idx;
            nids[i] = r->ids[j];
            noff[i] = r->offsets[j];
            nlen[i] = r->lengths[j];
        }
        free(r->ids); free(r->offsets); free(r->lengths);
        free(recs); free(ord);
        r->ids = nids; r->offsets = noff; r->lengths = nlen;
    }
    return r;
}

int64_t fcdb_reader_size(void* h) { return ((fcdb_reader*)h)->size; }

int64_t fcdb_reader_get(void* h, int64_t pos, const char** ptr,
                        int64_t* length) {
    fcdb_reader* r = (fcdb_reader*)h;
    if (pos < 0 || pos >= r->size || !r->data) return -1;
    int64_t off = r->offsets[pos];
    int64_t len = r->lengths[pos];
    /* a corrupt or mismatched .index must not let callers read outside the
     * mmap'd data region (ctypes.string_at would leak or segfault) */
    if (off < 0 || len < 0 || off > r->data_size ||
        len > r->data_size - off)
        return -1;
    *ptr = r->data + off;
    *length = len;
    return 0;
}

uint32_t fcdb_reader_key(void* h, int64_t pos) {
    fcdb_reader* r = (fcdb_reader*)h;
    return (pos >= 0 && pos < r->size) ? r->ids[pos] : 0xFFFFFFFFu;
}

int64_t fcdb_reader_offset(void* h, int64_t pos) {
    fcdb_reader* r = (fcdb_reader*)h;
    return (pos >= 0 && pos < r->size) ? r->offsets[pos] : -1;
}

int64_t fcdb_reader_length(void* h, int64_t pos) {
    fcdb_reader* r = (fcdb_reader*)h;
    return (pos >= 0 && pos < r->size) ? r->lengths[pos] : -1;
}

/* binary search by key (index sorted by id, database_reader.cpp:169-200) */
int64_t fcdb_reader_id(void* h, uint32_t key) {
    fcdb_reader* r = (fcdb_reader*)h;
    int64_t lo = 0, hi = r->size - 1;
    while (lo <= hi) {
        int64_t mid = lo + (hi - lo) / 2;
        if (r->ids[mid] == key) return mid;
        if (r->ids[mid] < key) lo = mid + 1;
        else hi = mid - 1;
    }
    return -1;
}

/* bulk-copy the parsed index (for the .index.cache writer) */
void fcdb_reader_dump(void* h, uint32_t* ids, int64_t* offsets,
                      int64_t* lengths) {
    fcdb_reader* r = (fcdb_reader*)h;
    memcpy(ids, r->ids, (size_t)r->size * 4);
    memcpy(offsets, r->offsets, (size_t)r->size * 8);
    memcpy(lengths, r->lengths, (size_t)r->size * 8);
}

void fcdb_reader_close(void* h) {
    fcdb_reader* r = (fcdb_reader*)h;
    if (r->data && r->data != MAP_FAILED)
        munmap(r->data, (size_t)r->data_size);
    if (r->data_fd >= 0) close(r->data_fd);
    free(r->ids);
    free(r->offsets);
    free(r->lengths);
    free(r);
}

/* ------------------------------------------------------------------ */
/* MMseqs2-style database writer (database_writer.cpp parity:           */
/* appends to data, tracks entries, writes .index/.lookup/.dbtype)      */
/* ------------------------------------------------------------------ */

typedef struct {
    FILE* data;
    char* base_path;
    uint32_t* keys;
    int64_t* offsets;
    int64_t* lengths;
    char** names;
    int64_t n, cap;
    int64_t pos;
} fcdb_writer;

void* fcdb_writer_open(const char* data_path) {
    fcdb_writer* w = (fcdb_writer*)calloc(1, sizeof(fcdb_writer));
    if (!w) return NULL;
    w->data = fopen(data_path, "wb");
    if (!w->data) { free(w); return NULL; }
    w->base_path = strdup(data_path);
    w->cap = 1024;
    w->keys = (uint32_t*)malloc((size_t)w->cap * 4);
    w->offsets = (int64_t*)malloc((size_t)w->cap * 8);
    w->lengths = (int64_t*)malloc((size_t)w->cap * 8);
    w->names = (char**)malloc((size_t)w->cap * sizeof(char*));
    return w;
}

int64_t fcdb_writer_append(void* h, const char* buf, int64_t len,
                           uint32_t key, const char* name) {
    fcdb_writer* w = (fcdb_writer*)h;
    if (w->n == w->cap) {
        w->cap *= 2;
        w->keys = (uint32_t*)realloc(w->keys, (size_t)w->cap * 4);
        w->offsets = (int64_t*)realloc(w->offsets, (size_t)w->cap * 8);
        w->lengths = (int64_t*)realloc(w->lengths, (size_t)w->cap * 8);
        w->names = (char**)realloc(w->names, (size_t)w->cap * sizeof(char*));
    }
    if (fwrite(buf, 1, (size_t)len, w->data) != (size_t)len) return -1;
    w->keys[w->n] = key;
    w->offsets[w->n] = w->pos;
    w->lengths[w->n] = len;
    w->names[w->n] = strdup(name ? name : "");
    w->pos += len;
    w->n++;
    return 0;
}

static int cmp_by_key(const void* a, const void* b, void* ctx) {
    fcdb_writer* w = (fcdb_writer*)ctx;
    int64_t ia = *(const int64_t*)a, ib = *(const int64_t*)b;
    if (w->keys[ia] != w->keys[ib])
        return w->keys[ia] < w->keys[ib] ? -1 : 1;
    return ia < ib ? -1 : (ia > ib ? 1 : 0); /* stable */
}

int64_t fcdb_writer_close(void* h) {
    fcdb_writer* w = (fcdb_writer*)h;
    fclose(w->data);
    size_t plen = strlen(w->base_path);
    char* path = (char*)malloc(plen + 16);

    /* stable sort by key (writer_append out-of-order parity) */
    int64_t* order = (int64_t*)malloc((size_t)w->n * 8);
    for (int64_t i = 0; i < w->n; i++) order[i] = i;
    qsort_r(order, (size_t)w->n, 8, cmp_by_key, w);

    memcpy(path, w->base_path, plen);
    strcpy(path + plen, ".index");
    FILE* f = fopen(path, "wb");
    if (f) {
        for (int64_t i = 0; i < w->n; i++) {
            int64_t j = order[i];
            fprintf(f, "%u\t%lld\t%lld\n", w->keys[j],
                    (long long)w->offsets[j], (long long)w->lengths[j]);
        }
        fclose(f);
    }
    strcpy(path + plen, ".lookup");
    f = fopen(path, "wb");
    if (f) {
        for (int64_t i = 0; i < w->n; i++) {
            int64_t j = order[i];
            fprintf(f, "%u\t%s\t0\n", w->keys[j], w->names[j]);
        }
        fclose(f);
    }
    strcpy(path + plen, ".dbtype");
    f = fopen(path, "wb");
    if (f) {
        /* generic dbtype 12 (database_writer.cpp close parity) */
        const unsigned char dbtype[4] = {12, 0, 0, 0};
        fwrite(dbtype, 1, 4, f);
        fclose(f);
    }
    free(order);
    free(path);
    for (int64_t i = 0; i < w->n; i++) free(w->names[i]);
    free(w->names);
    free(w->keys);
    free(w->offsets);
    free(w->lengths);
    free(w->base_path);
    free(w);
    return 0;
}
