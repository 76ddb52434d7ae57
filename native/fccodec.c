/* fccodec — native exact FCZ decoder.
 *
 * Bit-compatible re-implementation of the reference decompression pipeline
 * (Foldcomp::read + Foldcomp::decompress, src/foldcomp.cpp:904-1036 and
 * 779-902): continuize the quantized angle streams, per-anchor-segment
 * forward NeRF reconstruction, reverse reconstruction seeded by the stored
 * next-anchor coordinates, position-weighted blend, per-residue side-chain
 * placement over the amino-acid geometry tables, then fixed-column PDB
 * text. Float semantics follow the reference exactly: float arithmetic
 * with double promotion in norm()/acos()/degree-radian conversions
 * (float3d.h:19-65, nerf.cpp:39-104), so the output is byte-identical to
 * the reference binary's. This is the default CLI decompress path; the
 * batched TPU kernels (foldcomp_tpu/kernels) are the --fast path.
 *
 * Compiled together with fcio.c into libfcio.so (see foldcomp_tpu/native.py).
 */
#define _GNU_SOURCE /* sincosf */
#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <unistd.h>
#include <string.h>

#include "aatable_gen.h"

/* formatting helpers from fcio.c */
extern int64_t fcio_format_pdb(int32_t n, const int32_t* atom_index,
                               const int32_t* residue_index,
                               const char* name4, const char* res3,
                               const char* chain, const float* coords,
                               const float* temp, const char* title,
                               int32_t title_len, char* out);

/* database engine from fcio.c (for the db->db chunk loops) */
extern int64_t fcdb_reader_get(void* h, int64_t pos, const char** ptr,
                               int64_t* length);
extern uint32_t fcdb_reader_key(void* h, int64_t pos);
extern int64_t fcdb_writer_append(void* h, const char* buf, int64_t len,
                                  uint32_t key, const char* name);

typedef struct { float x, y, z; } v3;

/* backbone NeRF bond lengths (foldcomp.h:51-54, nerf.h:37-43) */
#define BL_C_TO_N 1.3311f
#define BL_N_TO_CA 1.4581f
#define BL_PRO_N_TO_CA 1.353f
#define BL_CA_TO_C 1.5281f

/* norm() parity (float3d.h:32-34): double accumulation via pow() */
static inline float v3norm(v3 v) {
    return (float)sqrt((double)v.x * v.x + (double)v.y * v.y
                       + (double)v.z * v.z);
}

/* Nerf::place_atom parity (nerf.cpp:39-104) */
static v3 place_atom(v3 a, v3 b, v3 c, float bond_length, float bond_angle,
                     float torsion_angle) {
    v3 ab = {b.x - a.x, b.y - a.y, b.z - a.z};
    v3 bc = {c.x - b.x, c.y - b.y, c.z - b.z};
    float bc_norm = v3norm(bc);
    v3 bcn = {bc.x / bc_norm, bc.y / bc_norm, bc.z / bc_norm};
    float ba = (float)(bond_angle * M_PI / 180.0);
    float ta = (float)(torsion_angle * M_PI / 180.0);
    /* sincosf: one argument reduction for each pair; bitwise identical
     * to separate sinf/cosf in glibc (verified over a 6e7-sample sweep
     * of [-pi, pi]; the A/B byte-parity suite gates it regardless) */
    float sin_ba, cos_ba, sin_ta, cos_ta;
    sincosf(ba, &sin_ba, &cos_ba);
    sincosf(ta, &sin_ta, &cos_ta);
    v3 d = {
        -1 * bond_length * cos_ba,
        bond_length * cos_ta * sin_ba,
        bond_length * sin_ta * sin_ba,
    };
    v3 n = {ab.y * bcn.z - bcn.y * ab.z,
            ab.z * bcn.x - bcn.z * ab.x,
            ab.x * bcn.y - bcn.x * ab.y};
    float n_norm = v3norm(n);
    n.x = n.x / n_norm;
    n.y = n.y / n_norm;
    n.z = n.z / n_norm;
    v3 nbc = {n.y * bcn.z - bcn.y * n.z,
              n.z * bcn.x - bcn.z * n.x,
              n.x * bcn.y - bcn.x * n.y};
    v3 out = {0.0f, 0.0f, 0.0f};
    out.x += bcn.x * d.x; out.x += nbc.x * d.y; out.x += n.x * d.z;
    out.y += bcn.y * d.x; out.y += nbc.y * d.y; out.y += n.y * d.z;
    out.z += bcn.z * d.x; out.z += nbc.z * d.y; out.z += n.z * d.z;
    out.x += c.x; out.y += c.y; out.z += c.z;
    return out;
}

/* 3-point angle parity (float3d.h:36-65): f32 vector math, double acos */
static float bond_angle3(v3 a, v3 b, v3 c) {
    v3 d1 = {a.x - b.x, a.y - b.y, a.z - b.z};
    v3 d2 = {c.x - b.x, c.y - b.y, c.z - b.z};
    float inner = (d1.x * d2.x) + (d1.y * d2.y) + (d1.z * d2.z);
    float s1 = d1.x * d1.x + d1.y * d1.y + d1.z * d1.z;
    float s2 = d2.x * d2.x + d2.y * d2.y + d2.z * d2.z;
    float cos_t = (float)(inner / sqrt((double)(s1 * s2)));
    return (float)(acos((double)cos_t) * 180.0 / M_PI);
}

static inline float continuize1(uint32_t q, float min, float cont_f) {
    return (float)q * cont_f + min;
}

/* ---- FCZ stream parsing (codec/fcz.py / foldcomp.cpp:904-1036) ---- */

typedef struct {
    uint16_t n_residue, n_atom, idx_residue, idx_atom;
    uint8_t n_anchor;
    char chain;
    uint32_t n_sc;
    char first_res, last_res;
    uint32_t len_title;
    float mins[6], cont_fs[6];
    int32_t* anchor_idx;       /* owned aligned copy [n_anchor] */
    const char* title;
    float* anchor_xyz;         /* owned aligned copy [n_anchor][3][3] */
    uint8_t has_oxt;
    float oxt[3];
    const uint8_t* records;    /* [n_residue][8] */
    const uint8_t* sc_codes;   /* [n_sc] */
    float tf_min, tf_cont;
    const uint8_t* tf_codes;   /* [n_residue] */
} fcz_view;

static void fcz_view_release(fcz_view* v) {
    free(v->anchor_idx);
    free(v->anchor_xyz);
    v->anchor_idx = NULL;
    v->anchor_xyz = NULL;
}

/* On success the caller owns v->anchor_idx / v->anchor_xyz and must call
 * fcz_view_release. The multi-byte arrays are copied out because the FCZ
 * layout gives them no alignment (the title length is arbitrary), so
 * aliasing them in place is UB. */
static int fcz_parse_view(const uint8_t* p, int64_t len, fcz_view* v) {
    if (len < 76 || memcmp(p, "FCMP", 4) != 0) return -1;
    const uint8_t* h = p + 4;
    memcpy(&v->n_residue, h + 0, 2);
    memcpy(&v->n_atom, h + 2, 2);
    memcpy(&v->idx_residue, h + 4, 2);
    memcpy(&v->idx_atom, h + 6, 2);
    v->n_anchor = h[8];
    v->chain = (char)h[9];
    memcpy(&v->n_sc, h + 12, 4);
    v->first_res = (char)h[16];
    v->last_res = (char)h[17];
    memcpy(&v->len_title, h + 20, 4);
    memcpy(v->mins, h + 24, 24);
    memcpy(v->cont_fs, h + 48, 24);
    v->anchor_idx = NULL;
    v->anchor_xyz = NULL;
    /* bounds-check the whole layout first, then copy */
    int64_t off = 4 + 72;
    int64_t o_aidx = off;
    off += 4 * v->n_anchor;
    int64_t o_title = off;
    off += v->len_title;
    int64_t o_axyz = off;
    off += 36 * v->n_anchor;
    if (off >= len) return -2;
    int64_t o_oxt_flag = off;
    off += 1;
    int64_t o_oxt = off;
    off += 12;
    int64_t o_rec = off;
    off += 8 * (int64_t)v->n_residue;
    int64_t o_sc = off;
    off += v->n_sc;
    v->tf_min = 0; v->tf_cont = 0;
    if (off + 8 > len) return -2;
    memcpy(&v->tf_min, p + off, 4);
    memcpy(&v->tf_cont, p + off + 4, 4);
    off += 8;
    int64_t o_tf = off;
    off += v->n_residue;
    if (off > len) return -2;
    v->title = (const char*)(p + o_title);
    v->has_oxt = p[o_oxt_flag];
    memcpy(v->oxt, p + o_oxt, 12);
    v->records = p + o_rec;
    v->sc_codes = p + o_sc;
    v->tf_codes = p + o_tf;
    v->anchor_idx = (int32_t*)malloc((size_t)v->n_anchor * 4 + 4);
    v->anchor_xyz = (float*)malloc((size_t)v->n_anchor * 36 + 4);
    if (!v->anchor_idx || !v->anchor_xyz) {
        fcz_view_release(v);
        return -2;
    }
    memcpy(v->anchor_idx, p + o_aidx, (size_t)v->n_anchor * 4);
    memcpy(v->anchor_xyz, p + o_axyz, (size_t)v->n_anchor * 36);
    return 0;
}

static int code_of_one(char c) {
    for (int i = 0; i < FC_NUM_CODES; i++)
        if (FC_ONE[i] == c) return i;
    return 23;
}

/* Full exact decode of one FCZ payload to PDB text.
 * Returns bytes written, or negative error. `out` must hold
 * >= title + (nAtom+2)*120 bytes (caller sizes it). */
int64_t fcz_decode_pdb(const uint8_t* buf, int64_t len, int use_alt,
                       char* out) {
    fcz_view v;
    int err = fcz_parse_view(buf, len, &v);
    if (err) return err;
    int n = v.n_residue;
    if (n < 1 || v.n_anchor < 2) { fcz_view_release(&v); return -3; }
    /* corrupted anchor indices must not overflow the 3*idx torsion-offset
     * arithmetic below; valid streams are unaffected (indices in [0,n-1]) */
    for (int s = 0; s < v.n_anchor; s++) {
        if (v.anchor_idx[s] < 0) v.anchor_idx[s] = 0;
        if (v.anchor_idx[s] > n - 1) v.anchor_idx[s] = n - 1;
    }

    /* unpack + continuize records (convertBytesToBackboneChain
     * foldcomp.cpp:60-77; continuize foldcomp.cpp:784-805) */
    int* rc = (int*)malloc((size_t)n * sizeof(int));
    float *phi = (float*)malloc((size_t)n * 4);
    float *psi = (float*)malloc((size_t)n * 4);
    float *omg = (float*)malloc((size_t)n * 4);
    float *ncac = (float*)malloc((size_t)n * 4);
    float *cacn = (float*)malloc((size_t)n * 4);
    float *cnca = (float*)malloc((size_t)n * 4);
    for (int i = 0; i < n; i++) {
        const uint8_t* r = v.records + 8 * i;
        rc[i] = r[0] >> 3;
        uint32_t omega_q = ((uint32_t)(r[0] & 0x7) << 8) | r[1];
        uint32_t psi_q = ((uint32_t)r[2] << 4) | (r[3] >> 4);
        uint32_t phi_q = ((uint32_t)(r[3] & 0xF) << 8) | r[4];
        phi[i] = continuize1(phi_q, v.mins[0], v.cont_fs[0]);
        psi[i] = continuize1(psi_q, v.mins[1], v.cont_fs[1]);
        omg[i] = continuize1(omega_q, v.mins[2], v.cont_fs[2]);
        ncac[i] = continuize1(r[7], v.mins[3], v.cont_fs[3]);
        cacn[i] = continuize1(r[5], v.mins[4], v.cont_fs[4]);
        cnca[i] = continuize1(r[6], v.mins[5], v.cont_fs[5]);
    }

    /* interleaved torsion stream (foldcomp.cpp:789-793) */
    int ts_len = 3 * (n - 1);
    if (ts_len < 1) ts_len = 1;
    float* tstream = (float*)calloc((size_t)ts_len, 4);
    for (int i = 0; i < n - 1; i++) {
        tstream[3 * i] = psi[i];
        tstream[3 * i + 1] = omg[i];
        tstream[3 * i + 2] = phi[i];
    }

    /* backbone reconstruction per anchor segment (foldcomp.cpp:812-858).
     * calloc: malformed anchor indices can leave rows unwritten, and the
     * side-chain/output stage must not leak heap contents into PDB text */
    v3* bb = (v3*)calloc((size_t)(3 * n + 3), sizeof(v3));
    int bb_n = 0;
    v3 prev3[3];
    memcpy(prev3, v.anchor_xyz, 36);
    int max_rec = n - 1;
    int max_tor = 3 * (n - 1) - 1;
    int scratch_cap = 3 * (n + 2);
    v3* fwd = (v3*)malloc((size_t)scratch_cap * sizeof(v3));
    v3* rev = (v3*)malloc((size_t)scratch_cap * sizeof(v3));
    float* angs = (float*)malloc((size_t)scratch_cap * 4);
    float* segt = (float*)malloc((size_t)scratch_cap * 4);

    for (int s = 0; s < v.n_anchor - 1; s++) {
        int is_last = (s == v.n_anchor - 2);
        int first = v.anchor_idx[s] < max_rec ? v.anchor_idx[s] : max_rec;
        if (first < 0) first = 0; /* malformed anchors must not overflow */
        int last = v.anchor_idx[s + 1] + 1 < max_rec ? v.anchor_idx[s + 1] + 1
                                                     : max_rec;
        int m = last - first + (is_last ? 1 : 0); /* record count */
        if (m < 1) m = 1;
        if (m > n - first) m = n - first; /* records ri = first..first+m-1 */
        if (m < 1) m = 1;
        if (bb_n + 3 * m > 3 * n + 3) { /* stitched output capacity */
            m = (3 * n + 3 - bb_n) / 3;
            if (m < 1) break;
        }
        int t = 3 * m;                            /* atom count */

        /* forward pass (reconstructBackboneAtoms foldcomp.cpp:167-246) */
        fwd[0] = prev3[0]; fwd[1] = prev3[1]; fwd[2] = prev3[2];
        for (int i = 0; i < m - 1; i++) {
            int ri = first + i;
            v3 a = fwd[3 * i], b = fwd[3 * i + 1], c = fwd[3 * i + 2];
            v3 nn = place_atom(a, b, c, BL_C_TO_N, cacn[ri], psi[ri]);
            float ca_len = (rc[ri] == 14) ? BL_PRO_N_TO_CA : BL_N_TO_CA;
            v3 ca = place_atom(b, c, nn, ca_len, cnca[ri], omg[ri]);
            v3 cc = place_atom(c, nn, ca, BL_CA_TO_C, ncac[ri], phi[ri]);
            fwd[3 * i + 3] = nn; fwd[3 * i + 4] = ca; fwd[3 * i + 5] = cc;
        }

        /* torsion slice (foldcomp.cpp:834-843) */
        int t_first = 3 * v.anchor_idx[s];
        if (t_first > max_tor) t_first = max_tor;
        if (t_first < 0) t_first = 0;
        int t_last = 3 * v.anchor_idx[s + 1];
        if (t_last > max_tor) t_last = max_tor;
        if (t_last < t_first) t_last = t_first;
        int nt = t_last - t_first;
        for (int i = 0; i < nt; i++) segt[i] = tstream[t_first + i];
        if (is_last && 3 * (n - 1) - 1 >= 0)
            segt[nt++] = tstream[3 * (n - 1) - 1];

        /* bond angles of forward coords: angs[k] centered at fwd[k+1] */
        for (int k = 0; k < t - 2; k++)
            angs[k] = bond_angle3(fwd[k], fwd[k + 1], fwd[k + 2]);

        /* reverse pass (reconstructBackboneReverse foldcomp.cpp:248-273 ->
         * nerf.cpp:342-400): seed = stored next anchor (C, CA, N) */
        const float* anext = v.anchor_xyz + 9 * (s + 1);
        rev[0] = (v3){anext[6], anext[7], anext[8]};
        rev[1] = (v3){anext[3], anext[4], anext[5]};
        rev[2] = (v3){anext[0], anext[1], anext[2]};
        static const float blc[3] = {BL_C_TO_N, BL_CA_TO_C, BL_N_TO_CA};
        for (int i = 0; i < t - 3; i++) {
            /* rev_angles[i+1] = angs[t-4-i]; rev_tors[i] = segt[t-4-i] */
            rev[i + 3] = place_atom(rev[i], rev[i + 1], rev[i + 2],
                                    blc[i % 3], angs[t - 4 - i],
                                    segt[t - 4 - i]);
        }

        /* weightedAverage blend (atom_coordinate.cpp:145-163) */
        float ft = (float)t;
        for (int i = 0; i < t; i++) {
            v3 f = fwd[i];
            v3 r = rev[t - 1 - i];
            float wf = (float)(t - i), wr = (float)i;
            v3 bl = {((f.x * wf) + (r.x * wr)) / ft,
                     ((f.y * wf) + (r.y * wr)) / ft,
                     ((f.z * wf) + (r.z * wr)) / ft};
            fwd[i] = bl;
        }

        int keep = is_last ? t : t - 3;
        memcpy(bb + bb_n, fwd, (size_t)keep * sizeof(v3));
        bb_n += keep;
        prev3[0] = fwd[t - 3]; prev3[1] = fwd[t - 2]; prev3[2] = fwd[t - 1];
    }

    /* side chains + output arrays (foldcomp.cpp:861-899) */
    int cap_atoms = 14 * n + 2;
    int32_t* aidx = (int32_t*)malloc((size_t)cap_atoms * 4);
    int32_t* ridx = (int32_t*)malloc((size_t)cap_atoms * 4);
    char* name4 = (char*)malloc((size_t)cap_atoms * 4);
    char* res3 = (char*)malloc((size_t)cap_atoms * 3);
    char* chn = (char*)malloc((size_t)cap_atoms);
    float* coords = (float*)malloc((size_t)cap_atoms * 12);
    float* temp = (float*)malloc((size_t)cap_atoms * 4);
    int na = 0;
    int64_t sc_pos = 0;
    v3 slot[FC_MAX_ATOM];
    int order[FC_MAX_ATOM];
    /* fixed [-180,180] 255-bin continuizer (discretizer.h:89-106) */
    float sc_min = -180.0f;
    float sc_cf = (180.0f - sc_min) / (float)255;

    for (int i = 0; i < n; i++) {
        int code = rc[i];
        /* display name: residue 0 uses header first_residue
         * (foldcomp.cpp:862) */
        int name_code = (i == 0) ? code_of_one(v.first_res)
                                 : (code < FC_NUM_CODES ? code : 23);
        int tbl = name_code; /* AA_DATA keyed by display name */
        int cnt;
        if (code >= 20 || tbl >= 20) {
            cnt = 3;
        } else {
            cnt = FC_N_ATOMS[tbl];
        }
        slot[0] = bb[3 * i]; slot[1] = bb[3 * i + 1]; slot[2] = bb[3 * i + 2];
        int nsc = (code < 20) ? FC_N_ATOMS[code] - 3 : 0;
        if (cnt > 3) {
            for (int k = 3; k < cnt; k++) {
                float tor = (k - 3 < nsc && sc_pos + (k - 3) < v.n_sc)
                    ? (float)v.sc_codes[sc_pos + (k - 3)] * sc_cf + sc_min
                    : 0.0f;
                slot[k] = place_atom(slot[FC_PRED[tbl][k][0]],
                                     slot[FC_PRED[tbl][k][1]],
                                     slot[FC_PRED[tbl][k][2]],
                                     FC_BLEN[tbl][k], FC_BANG[tbl][k], tor);
            }
        }
        sc_pos += nsc;
        float tf = continuize1(v.tf_codes[i], v.tf_min, v.tf_cont);
        for (int k = 0; k < cnt; k++) order[k] = k;
        if (use_alt && tbl < 20)
            for (int k = 0; k < cnt; k++) order[k] = FC_ALT_PERM[tbl][k];
        for (int k = 0; k < cnt; k++) {
            int sl = order[k];
            aidx[na] = v.idx_atom + na;
            ridx[na] = v.idx_residue + i;
            memcpy(name4 + 4 * na, FC_NAME4[tbl][sl], 4);
            memcpy(res3 + 3 * na, FC_THREE[name_code], 3);
            /* right-justify 3-letter name (all are 3 chars) */
            chn[na] = v.chain;
            coords[3 * na] = slot[sl].x;
            coords[3 * na + 1] = slot[sl].y;
            coords[3 * na + 2] = slot[sl].z;
            temp[na] = tf;
            na++;
        }
    }
    if (v.has_oxt) {
        int lc = code_of_one(v.last_res);
        aidx[na] = v.idx_atom + na;
        ridx[na] = n; /* reference quirk (foldcomp.cpp:962-965) */
        memcpy(name4 + 4 * na, " OXT", 4);
        memcpy(res3 + 3 * na, FC_THREE[lc], 3);
        chn[na] = v.chain;
        coords[3 * na] = v.oxt[0];
        coords[3 * na + 1] = v.oxt[1];
        coords[3 * na + 2] = v.oxt[2];
        temp[na] = continuize1(v.tf_codes[n - 1], v.tf_min, v.tf_cont);
        na++;
    }

    int64_t written = fcio_format_pdb(na, aidx, ridx, name4, res3, chn,
                                      coords, temp, v.title,
                                      (int32_t)v.len_title, out);

    free(rc); free(phi); free(psi); free(omg);
    free(ncac); free(cacn); free(cnca);
    free(tstream); free(bb); free(fwd); free(rev); free(angs); free(segt);
    free(aidx); free(ridx); free(name4); free(res3); free(chn);
    free(coords); free(temp);
    fcz_view_release(&v);
    return written;
}

/* size estimate for the caller's output buffer */
int64_t fcz_decode_pdb_cap(const uint8_t* buf, int64_t len) {
    fcz_view v;
    if (fcz_parse_view(buf, len, &v)) return -1;
    fcz_view_release(&v);
    return (int64_t)v.len_title + 64 + ((int64_t)v.len_title / 70 + 2) * 12
        + ((int64_t)v.n_residue * 14 + 4) * 120;
}

/* ================================================================== */
/* Exact FCZ encoder                                                   */
/* (Foldcomp::preprocess + compress + writeStream,                     */
/*  foldcomp.cpp:450-606 / 1038-1109, float-semantics-exact)           */
/* ================================================================== */

/* getTorsionFromXYZ parity (torsion_angle.cpp:46-96) */
static float dihedral4(v3 p0, v3 p1, v3 p2, v3 p3) {
    v3 d1 = {p1.x - p0.x, p1.y - p0.y, p1.z - p0.z};
    v3 d2 = {p2.x - p1.x, p2.y - p1.y, p2.z - p1.z};
    v3 d3 = {p3.x - p2.x, p3.y - p2.y, p3.z - p2.z};
    v3 u1 = {d1.y * d2.z - d2.y * d1.z,
             d1.z * d2.x - d2.z * d1.x,
             d1.x * d2.y - d2.x * d1.y};
    v3 u2 = {d2.y * d3.z - d3.y * d2.z,
             d2.z * d3.x - d3.z * d2.x,
             d2.x * d3.y - d3.x * d2.y};
    float inner = (u1.x * u2.x) + (u1.y * u2.y) + (u1.z * u2.z);
    float s1 = u1.x * u1.x + u1.y * u1.y + u1.z * u1.z;
    float s2 = u2.x * u2.x + u2.y * u2.y + u2.z * u2.z;
    float cos_t = (float)(inner / sqrt((double)(s1 * s2)));
    float ang;
    if (isnan(acos((double)cos_t))) {
        ang = cos_t < 0 ? 180.0f : 0.0f;
    } else {
        ang = (float)(acos((double)cos_t) * 180.0 / M_PI);
    }
    v3 pb = {u2.y * d2.z - d2.y * u2.z,
             u2.z * d2.x - d2.z * u2.x,
             u2.x * d2.y - d2.x * u2.y};
    if ((u1.x * pb.x) + (u1.y * pb.y) + (u1.z * pb.z) < 0)
        ang = -1 * ang;
    return ang;
}

typedef struct {
    float min, max, disc_f, cont_f;
    unsigned int n_bin;
} disc_t;

static disc_t disc_fit(const float* v, int n, unsigned int n_bin) {
    disc_t d;
    d.n_bin = n_bin;
    d.min = v[0]; d.max = v[0];
    for (int i = 1; i < n; i++) {
        if (v[i] < d.min) d.min = v[i];
        if (v[i] > d.max) d.max = v[i];
    }
    d.disc_f = n_bin / (d.max - d.min);
    d.cont_f = (d.max - d.min) / n_bin;
    return d;
}

/* vector discretize parity (discretizer.cpp:43-53): f32 product, +0.5 in
 * double, truncating cast; NaN -> 0 (x86-64 conversion behavior) */
static inline unsigned int disc_round(disc_t* d, float v) {
    double t = (double)((v - d->min) * d->disc_f) + 0.5;
    if (isnan(t)) return 0;
    return (unsigned int)t;
}

/* scalar truncating discretize (discretizer.cpp:55-57) */
static inline unsigned int disc_trunc_fixed(float v) {
    float min = -180.0f;
    float disc_f = (float)255 / (180.0f - min);
    float t = (v - min) * disc_f;
    if (isnan(t)) return 0;
    return (unsigned int)t;
}

static inline void strip4(const char* f, char* out) {
    int n = 0;
    for (int i = 0; i < 4; i++)
        if (f[i] != ' ' && f[i] != 0) out[n++] = f[i];
    out[n] = 0;
}

static int code_of_res3(const char* r3) {
    for (int i = 0; i < FC_NUM_CODES; i++)
        if (memcmp(FC_THREE[i], r3, 3) == 0) return i;
    return -1;
}

/* slot of a stripped atom name within residue code's table; -1 if absent */
static int slot_of_name(int code, const char* stripped) {
    for (int k = 0; k < FC_N_ATOMS[code]; k++) {
        char t[5];
        strip4(FC_NAME4[code][k], t);
        if (strcmp(t, stripped) == 0) return k;
    }
    return -1;
}

static inline void wr_u16(uint8_t** p, uint16_t v) {
    memcpy(*p, &v, 2); *p += 2;
}
static inline void wr_u32(uint8_t** p, uint32_t v) {
    memcpy(*p, &v, 4); *p += 4;
}
static inline void wr_f32(uint8_t** p, float v) {
    memcpy(*p, &v, 4); *p += 4;
}

/* Encode one continuous single-chain fragment given parsed atom arrays
 * (indices into the caller's arrays via `idx`, count `na`).
 * Returns FCZ byte length written to out, or negative error:
 *  -1 fewer than 2 residues, -2 unknown residue name,
 *  -4 invalid anchor threshold (< 1),
 *  -5 chain too long for the format (n_anchor would overflow the uint8
 *     header field, producing a self-inconsistent stream). */
static int64_t encode_fragment(
        const char* name4, const char* res3, const char* chain,
        const int32_t* atom_index, const int32_t* residue_index,
        const float* coords, const float* temp, const int32_t* idx,
        int64_t na, int threshold, const char* title, int32_t title_len,
        uint8_t* out) {
    /* backbone filter (atom_coordinate.cpp:135) */
    int* bb = (int*)malloc((size_t)na * sizeof(int));
    int nbb = 0;
    char st[5];
    for (int64_t i = 0; i < na; i++) {
        strip4(name4 + 4 * idx[i], st);
        if (strcmp(st, "N") == 0 || strcmp(st, "CA") == 0 ||
            strcmp(st, "C") == 0)
            bb[nbb++] = (int)i;
    }
    int n_res = nbb / 3;
    if (n_res < 2) { free(bb); return -1; }
    if (threshold < 1) { free(bb); return -4; }
    if (n_res / threshold + 2 > 255) { free(bb); return -5; }

    v3* flat = (v3*)malloc((size_t)(3 * n_res) * sizeof(v3));
    for (int i = 0; i < 3 * n_res; i++) {
        const float* c = coords + 3 * idx[bb[i]];
        flat[i] = (v3){c[0], c[1], c[2]};
    }

    int idx_residue = residue_index[idx[0]];
    int idx_atom = atom_index[idx[0]];
    char ch = chain[idx[0]];

    /* residue codes from each backbone N atom (foldcomp.cpp:582-601) */
    int* rcode = (int*)malloc((size_t)n_res * sizeof(int));
    for (int i = 0; i < n_res; i++) {
        int c = code_of_res3(res3 + 3 * idx[bb[3 * i]]);
        rcode[i] = c < 0 ? 23 : c;
    }
    char first_res = FC_ONE[code_of_res3(res3 + 3 * idx[0]) < 0 ? 23 :
                            code_of_res3(res3 + 3 * idx[0])];
    char last_res = FC_ONE[code_of_res3(res3 + 3 * idx[na - 1]) < 0 ? 23 :
                           code_of_res3(res3 + 3 * idx[na - 1])];

    /* anchors (_setAnchor, foldcomp.cpp:745-761) */
    int n_inner = n_res / threshold;
    int n_anchor = n_inner + 2;
    int interval = n_res / (n_anchor - 1);
    int32_t* aidx_arr = (int32_t*)malloc((size_t)n_anchor * 4);
    for (int s = 0; s < n_anchor - 1; s++) aidx_arr[s] = s * interval;
    aidx_arr[n_anchor - 1] = n_res - 1;
    float* anchor_xyz = (float*)calloc((size_t)n_anchor * 9, 4);
    for (int s = 0; s < n_anchor; s++) {
        int target = aidx_arr[s] + idx_residue;
        int got[3] = {0, 0, 0};
        for (int64_t i = 0; i < na; i++) {
            if (residue_index[idx[i]] != target) continue;
            strip4(name4 + 4 * idx[i], st);
            int k = strcmp(st, "N") == 0 ? 0 : strcmp(st, "CA") == 0 ? 1 :
                    strcmp(st, "C") == 0 ? 2 : -1;
            if (k >= 0 && !got[k]) {
                memcpy(anchor_xyz + 9 * s + 3 * k, coords + 3 * idx[i], 12);
                got[k] = 1;
            }
        }
    }
    int has_oxt;
    {
        strip4(name4 + 4 * idx[na - 1], st);
        has_oxt = strcmp(st, "OXT") == 0;
    }
    const float* oxt = coords + 3 * idx[na - 1];

    /* torsions + bond angles (foldcomp.cpp:484-505) */
    int nt = 3 * n_res - 3;
    float* tors = (float*)malloc((size_t)nt * 4);
    for (int i = 0; i < nt; i++)
        tors[i] = dihedral4(flat[i], flat[i + 1], flat[i + 2], flat[i + 3]);
    int nang = 3 * n_res - 2;
    float* angs = (float*)malloc((size_t)nang * 4);
    for (int i = 0; i < nang; i++)
        angs[i] = bond_angle3(flat[i], flat[i + 1], flat[i + 2]);

    int m = n_res - 1;
    float *psi = (float*)malloc((size_t)m * 4);
    float *omg = (float*)malloc((size_t)m * 4);
    float *phi = (float*)malloc((size_t)m * 4);
    float *cacn = (float*)malloc((size_t)m * 4);
    float *cnca = (float*)malloc((size_t)m * 4);
    float *ncac = (float*)malloc((size_t)m * 4);
    for (int i = 0; i < m; i++) {
        psi[i] = tors[3 * i];
        omg[i] = tors[3 * i + 1];
        phi[i] = tors[3 * i + 2];
        cacn[i] = angs[3 * i + 1];
        cnca[i] = angs[3 * i + 2];
        ncac[i] = angs[3 * i + 3];
    }
    disc_t d_phi = disc_fit(phi, m, (1u << 12) - 1);
    disc_t d_psi = disc_fit(psi, m, (1u << 12) - 1);
    disc_t d_omg = disc_fit(omg, m, (1u << 11) - 1);
    disc_t d_ncac = disc_fit(ncac, m, (1u << 8) - 1);
    disc_t d_cacn = disc_fit(cacn, m, (1u << 8) - 1);
    disc_t d_cnca = disc_fit(cnca, m, (1u << 8) - 1);

    /* residue groups (splitAtomByResidue parity, the final atom always
     * joins the current group — atom_coordinate.cpp:304-328) */
    int64_t* gstart = (int64_t*)malloc((size_t)(na + 1) * 8);
    int ng = 0;
    gstart[ng++] = 0;
    for (int64_t i = 1; i < na - 1; i++)
        if (residue_index[idx[i]] != residue_index[idx[i - 1]])
            gstart[ng++] = i;
    gstart[ng] = na;

    /* side-chain torsions per residue over the AA graph
     * (sidechain.cpp:149-180); missing atoms contribute (0,0,0) */
    uint8_t* sc = (uint8_t*)malloc((size_t)na + 16 * (size_t)ng);
    int64_t nsc = 0;
    int bad_residue = 0;
    for (int g = 0; g < ng && !bad_residue; g++) {
        int64_t s0 = gstart[g], s1 = gstart[g + 1];
        int code = code_of_res3(res3 + 3 * idx[s0]);
        if (code < 0 || code >= 20) { bad_residue = 1; break; }
        /* first-occurrence coords per slot */
        v3 slotc[FC_MAX_ATOM];
        int have[FC_MAX_ATOM];
        memset(have, 0, sizeof(have));
        for (int64_t i = s0; i < s1; i++) {
            strip4(name4 + 4 * idx[i], st);
            int sl = slot_of_name(code, st);
            if (sl >= 0 && !have[sl]) {
                const float* c = coords + 3 * idx[i];
                slotc[sl] = (v3){c[0], c[1], c[2]};
                have[sl] = 1;
            }
        }
        v3 zero = {0, 0, 0};
        for (int k = 3; k < FC_N_ATOMS[code]; k++) {
            v3 p0 = have[FC_PRED[code][k][0]] ? slotc[FC_PRED[code][k][0]]
                                              : zero;
            v3 p1 = have[FC_PRED[code][k][1]] ? slotc[FC_PRED[code][k][1]]
                                              : zero;
            v3 p2 = have[FC_PRED[code][k][2]] ? slotc[FC_PRED[code][k][2]]
                                              : zero;
            v3 p3 = have[k] ? slotc[k] : zero;
            float ang = dihedral4(p0, p1, p2, p3);
            sc[nsc++] = (uint8_t)disc_trunc_fixed(ang);
        }
    }

    /* tempFactors from CA atoms (foldcomp.cpp:543-550) */
    float* tf = (float*)malloc((size_t)(n_res + 8) * 4);
    int ntf = 0;
    for (int64_t i = 0; i < na && ntf < n_res + 8; i++) {
        strip4(name4 + 4 * idx[i], st);
        if (strcmp(st, "CA") == 0) tf[ntf++] = temp[idx[i]];
    }
    int64_t written = -2;
    if (!bad_residue && ntf > 0) {
        disc_t d_tf = disc_fit(tf, ntf, (1u << 8) - 1);

        /* serialize (writeStream parity, foldcomp.cpp:1038-1109;
         * padding bytes zeroed) */
        uint8_t* p = out;
        memcpy(p, "FCMP", 4); p += 4;
        wr_u16(&p, (uint16_t)n_res);
        wr_u16(&p, (uint16_t)na);
        wr_u16(&p, (uint16_t)idx_residue);
        wr_u16(&p, (uint16_t)idx_atom);
        *p++ = (uint8_t)n_anchor;
        *p++ = (uint8_t)ch;
        *p++ = 0; *p++ = 0;
        wr_u32(&p, (uint32_t)nsc);
        *p++ = (uint8_t)first_res;
        *p++ = (uint8_t)last_res;
        *p++ = 0; *p++ = 0;
        wr_u32(&p, (uint32_t)title_len);
        wr_f32(&p, d_phi.min); wr_f32(&p, d_psi.min); wr_f32(&p, d_omg.min);
        wr_f32(&p, d_ncac.min); wr_f32(&p, d_cacn.min);
        wr_f32(&p, d_cnca.min);
        wr_f32(&p, d_phi.cont_f); wr_f32(&p, d_psi.cont_f);
        wr_f32(&p, d_omg.cont_f); wr_f32(&p, d_ncac.cont_f);
        wr_f32(&p, d_cacn.cont_f); wr_f32(&p, d_cnca.cont_f);
        memcpy(p, aidx_arr, (size_t)n_anchor * 4); p += 4 * n_anchor;
        memcpy(p, title, (size_t)title_len); p += title_len;
        memcpy(p, anchor_xyz, (size_t)n_anchor * 36); p += 36 * n_anchor;
        *p++ = has_oxt ? 1 : 0;
        if (has_oxt) { memcpy(p, oxt, 12); }
        else { memset(p, 0, 12); }
        p += 12;
        for (int i = 0; i < n_res; i++) {
            unsigned int qr = (unsigned int)rcode[i] & 0x1F;
            unsigned int qphi = 0, qpsi = 0, qomg = 0;
            unsigned int qncac = 0, qcacn = 0, qcnca = 0;
            if (i < m) {
                qphi = disc_round(&d_phi, phi[i]) & 0xFFF;
                qpsi = disc_round(&d_psi, psi[i]) & 0xFFF;
                qomg = disc_round(&d_omg, omg[i]) & 0x7FF;
                qncac = disc_round(&d_ncac, ncac[i]) & 0xFF;
                qcacn = disc_round(&d_cacn, cacn[i]) & 0xFF;
                qcnca = disc_round(&d_cnca, cnca[i]) & 0xFF;
            }
            p[0] = (uint8_t)((qr << 3) | (qomg >> 8));
            p[1] = (uint8_t)(qomg & 0xFF);
            p[2] = (uint8_t)(qpsi >> 4);
            p[3] = (uint8_t)(((qpsi & 0xF) << 4) | (qphi >> 8));
            p[4] = (uint8_t)(qphi & 0xFF);
            p[5] = (uint8_t)qcacn;
            p[6] = (uint8_t)qcnca;
            p[7] = (uint8_t)qncac;
            p += 8;
        }
        memcpy(p, sc, (size_t)nsc); p += nsc;
        wr_f32(&p, d_tf.min);
        wr_f32(&p, d_tf.cont_f);
        for (int i = 0; i < n_res; i++)
            *p++ = (uint8_t)(i < ntf ? disc_round(&d_tf, tf[i]) : 0);
        written = p - out;
    }

    free(bb); free(flat); free(rcode); free(aidx_arr); free(anchor_xyz);
    free(tors); free(angs);
    free(psi); free(omg); free(phi); free(cacn); free(cnca); free(ncac);
    free(gstart); free(sc); free(tf);
    return written;
}

/* Encode parsed atom arrays: optional alternative-position removal, chain
 * + discontinuity splitting (atom_coordinate.cpp:362-370, 469-530), one
 * FCZ blob per fragment packed back-to-back into `out`.
 *
 * split: 0 = single fragment over all atoms (Python-binding mode,
 * foldcomp.cxx:295-328), 1 = full CLI splitting (main.cpp:438-536).
 * frag_meta per fragment: [chain_ordinal, frag_ordinal_in_chain,
 * n_frags_in_chain, n_chains]. Returns fragment count (fragments that
 * failed encode get frag_len < 0), or -1 on overflow. */
int64_t fcz_encode_atoms(
        const char* name4, const char* res3, const char* chain,
        const int32_t* atom_index, const int32_t* residue_index,
        const float* coords, const float* temp, int64_t n_atoms,
        int threshold, const char* title, int32_t title_len, int split,
        uint8_t* out, int64_t out_cap,
        int64_t* frag_off, int64_t* frag_len, char* frag_chain,
        int32_t* frag_meta, int32_t max_frags) {
    if (n_atoms <= 0) return 0;
    /* removeAlternativePosition: drop consecutive duplicate atom names */
    int32_t* keep = (int32_t*)malloc((size_t)n_atoms * 4);
    int64_t nk = 0;
    keep[nk++] = 0;
    for (int64_t i = 1; i < n_atoms; i++) {
        if (memcmp(name4 + 4 * i, name4 + 4 * (i - 1), 4) == 0)
            continue;
        keep[nk++] = (int32_t)i;
    }

    /* chain fragmentation (atom_coordinate.cpp:469-498): on a chain switch
     * the new fragment must start at an N atom; a leading non-N run of the
     * new chain belongs to NO fragment (identify_chains parity). Fragments
     * are therefore (start, end) pairs, not a partition. */
    int64_t* cs = (int64_t*)malloc((size_t)(nk + 1) * 8);
    int64_t* ce = (int64_t*)malloc((size_t)(nk + 1) * 8);
    int nch = 0;
    if (!split) {
        cs[0] = 0;
        ce[0] = nk;
        nch = 1;
    } else {
        char st[5];
        int64_t start = 0;
        int64_t i = 1;
        while (i < nk) {
            if (chain[keep[i]] != chain[keep[i - 1]]) {
                strip4(name4 + 4 * keep[i], st);
                if (strcmp(st, "N") == 0) {
                    cs[nch] = start; ce[nch] = i; nch++;
                    start = i;
                } else {
                    int64_t j = i;
                    int found = 0;
                    while (j < nk) {
                        strip4(name4 + 4 * keep[j], st);
                        if (strcmp(st, "N") == 0) { found = 1; break; }
                        j++;
                    }
                    if (found) {
                        cs[nch] = start; ce[nch] = i; nch++;
                        start = j;
                        i = j;
                    }
                    /* no N found: fragment extends to the end */
                }
            }
            i++;
        }
        cs[nch] = start; ce[nch] = nk; nch++;
    }

    int64_t nfrag = 0;
    int64_t pos = 0;
    for (int c = 0; c < nch; c++) {
        int64_t c0 = cs[c], c1 = ce[c];
        /* discontinuity split on N-atom residue gaps
         * (atom_coordinate.cpp:506-530) */
        int64_t* fstart = (int64_t*)malloc((size_t)(c1 - c0 + 2) * 8);
        int nf = 0;
        if (!split) {
            fstart[nf++] = c0;
        } else {
            char st[5];
            int64_t prev_n = -1;
            int prev_ridx = 0;
            int64_t first_n = -1;
            for (int64_t i = c0; i < c1; i++) {
                strip4(name4 + 4 * keep[i], st);
                if (strcmp(st, "N") != 0) continue;
                int ri = residue_index[keep[i]];
                if (first_n < 0) {
                    first_n = i;
                    fstart[nf++] = i;
                } else if (ri - prev_ridx > 1) {
                    fstart[nf++] = i;
                }
                prev_n = i;
                prev_ridx = ri;
            }
            (void)prev_n;
            if (nf == 0) fstart[nf++] = c0;
        }
        fstart[nf] = c1;
        for (int f = 0; f < nf; f++) {
            if (nfrag >= max_frags) { free(fstart); free(cs); free(ce);
                free(keep); return -1; }
            int64_t a0 = fstart[f], a1 = fstart[f + 1];
            int64_t cap_need = (a1 - a0) * 16 + title_len + 4096;
            if (pos + cap_need > out_cap) { free(fstart); free(cs);
                free(ce); free(keep); return -1; }
            int64_t w = encode_fragment(
                name4, res3, chain, atom_index, residue_index, coords,
                temp, keep + a0, a1 - a0, threshold, title, title_len,
                out + pos);
            frag_off[nfrag] = pos;
            frag_len[nfrag] = w;
            frag_chain[nfrag] = chain[keep[a0]];
            frag_meta[4 * nfrag] = c;
            frag_meta[4 * nfrag + 1] = f;
            frag_meta[4 * nfrag + 2] = nf;
            frag_meta[4 * nfrag + 3] = nch;
            if (w > 0) pos += w;
            nfrag++;
        }
        free(fstart);
    }
    free(cs);
    free(ce);
    free(keep);
    return nfrag;
}

/* ================================================================== */
/* db->db decompress chunk loop (runs whole work chunks without the    */
/* GIL: the Python worker loop paid ~6 ctypes crossings + 3 bytes      */
/* copies per entry — reference: processOneDbEntry, main.cpp:612-689)  */
/* ================================================================== */

/* Decode entries [start, end) of an open fcdb reader straight into an
 * open fcdb writer. `names` holds (end-start) NUL-terminated entry
 * names back to back (the .lookup names the Python caller resolved);
 * NULL falls back to the decimal key. Entries that fail to parse or
 * decode are skipped, matching the CLI's per-entry error tolerance.
 * Payloads are appended with the reference's trailing NUL. Returns the
 * number written, or -1 on allocation/write failure. */
int64_t fcz_db_decode_range(void* reader, void* writer, int64_t start,
                            int64_t end, const char* names, int use_alt) {
    char* out = NULL;
    int64_t out_cap = 0;
    char keybuf[16];
    const char* nm = names;
    int64_t written = 0;
    for (int64_t pos = start; pos < end; pos++) {
        const char* name = NULL;
        if (names) { name = nm; nm += strlen(nm) + 1; }
        const char* data;
        int64_t len;
        if (fcdb_reader_get(reader, pos, &data, &len)) continue;
        if (len > 0 && data[len - 1] == '\0') len--;  /* stored with NUL */
        int64_t cap = fcz_decode_pdb_cap((const uint8_t*)data, len);
        if (cap < 0) continue;
        if (cap + 1 > out_cap) {
            free(out);
            out_cap = cap + 1;
            out = (char*)malloc((size_t)out_cap);
            if (!out) return -1;
        }
        int64_t n = fcz_decode_pdb((const uint8_t*)data, len, use_alt, out);
        if (n < 0) continue;
        out[n] = '\0';
        uint32_t key = fcdb_reader_key(reader, pos);
        if (!name) {
            snprintf(keybuf, sizeof keybuf, "%u", key);
            name = keybuf;
        }
        if (fcdb_writer_append(writer, out, n + 1, key, name)) {
            free(out);
            return -1;
        }
        written++;
    }
    free(out);
    return written;
}

extern int64_t fcio_count_atoms(const char* text, int64_t len);
extern int64_t fcio_parse_pdb(const char* text, int64_t len,
                              int32_t* atom_index, int32_t* residue_index,
                              char* name4, char* res3, char* chain,
                              float* coords, float* occ, float* temp,
                              char* title, int32_t* title_len,
                              int32_t title_cap);

/* db->db compress chunk loop: parse + split-encode + append entirely in
 * C. Title rule matches encode_pdb_native(title=None): the parsed
 * structure title, else the entry name (main.cpp:464-465). Fragments
 * with encode errors (too short / unknown residue) are skipped, like
 * the Python worker loop. Returns fragments written, -1 on allocation
 * failure. */
int64_t fcz_db_encode_range(void* reader, void* writer, int64_t start,
                            int64_t end, const char* names, int threshold) {
    enum { MAX_FRAGS = 4096, TITLE_CAP = 8192 };
    int64_t a_cap = 0, o_cap = 0;
    int32_t *aidx = NULL, *ridx = NULL;
    char *name4 = NULL, *res3 = NULL, *chn = NULL;
    float *coords = NULL, *occ = NULL, *temp = NULL;
    uint8_t* out = NULL;
    int64_t frag_off[MAX_FRAGS], frag_len[MAX_FRAGS];
    char frag_chain[MAX_FRAGS];
    int32_t frag_meta[4 * MAX_FRAGS];
    char title[TITLE_CAP];
    const char* nm = names;
    int64_t written = 0;

    for (int64_t pos = start; pos < end; pos++) {
        const char* name = "";
        if (names) { name = nm; nm += strlen(nm) + 1; }
        const char* data;
        int64_t len;
        if (fcdb_reader_get(reader, pos, &data, &len)) continue;
        if (len > 0 && data[len - 1] == '\0') len--;
        int64_t n = fcio_count_atoms(data, len);
        if (n <= 0) continue;
        if (n > a_cap) {
            a_cap = n + 64;
            free(aidx); free(ridx); free(name4); free(res3); free(chn);
            free(coords); free(occ); free(temp);
            aidx = (int32_t*)malloc((size_t)a_cap * 4);
            ridx = (int32_t*)malloc((size_t)a_cap * 4);
            name4 = (char*)malloc((size_t)a_cap * 4 + 4);
            res3 = (char*)malloc((size_t)a_cap * 3 + 4);
            chn = (char*)malloc((size_t)a_cap + 4);
            coords = (float*)malloc((size_t)a_cap * 12);
            occ = (float*)malloc((size_t)a_cap * 4);
            temp = (float*)malloc((size_t)a_cap * 4);
            if (!aidx || !ridx || !name4 || !res3 || !chn || !coords ||
                !occ || !temp)
                goto oom;
        }
        int32_t tlen = 0;
        n = fcio_parse_pdb(data, len, aidx, ridx, name4, res3, chn, coords,
                           occ, temp, title, &tlen, TITLE_CAP);
        if (n <= 0) continue;
        const char* t = tlen ? title : name;
        int32_t tl = tlen ? tlen : (int32_t)strlen(name);
        /* same capacity rule as encode_pdb_native */
        int64_t need = 16 * n + ((int64_t)tl + 4096) * 8 + (1 << 16);
        if (need > o_cap) {
            free(out);
            o_cap = need;
            out = (uint8_t*)malloc((size_t)o_cap);
            if (!out) goto oom;
        }
        int64_t nf = fcz_encode_atoms(name4, res3, chn, aidx, ridx, coords,
                                      temp, n, threshold, t, tl, 1, out,
                                      o_cap, frag_off, frag_len, frag_chain,
                                      frag_meta, MAX_FRAGS);
        if (nf < 0) continue;
        uint32_t key = fcdb_reader_key(reader, pos);
        for (int64_t i = 0; i < nf; i++) {
            if (frag_len[i] <= 0) continue;
            if (fcdb_writer_append(writer, (const char*)out + frag_off[i],
                                   frag_len[i], key, name))
                goto oom;
            written++;
        }
    }
    free(aidx); free(ridx); free(name4); free(res3); free(chn);
    free(coords); free(occ); free(temp); free(out);
    return written;
oom:
    free(aidx); free(ridx); free(name4); free(res3); free(chn);
    free(coords); free(occ); free(temp); free(out);
    return -1;
}

static char* put_int_c(char* p, int64_t v) {
    char tmp[24];
    int k = 0;
    uint64_t u = v < 0 ? (*p++ = '-', (uint64_t)(-v)) : (uint64_t)v;
    do { tmp[k++] = (char)('0' + u % 10); u /= 10; } while (u);
    while (k) *p++ = tmp[--k];
    return p;
}

/* db extract chunk loop (pLDDT / sequence), reference digit semantics
 * (foldcomp.cpp:1260-1338): per-residue truncating digit conversion in
 * f32 with the 0-1 vs 0-100 scale auto-detect. Output goes to the fcdb
 * writer (text entry + trailing NUL) when `writer` is non-NULL, else
 * appended to file descriptor out_fd (merged text mode). ext_mode 0 =
 * pLDDT (fasta for digits==1, TSV otherwise), 1 = sequence (fasta).
 * Returns entries written, -1 on allocation/write failure. */
int64_t fcz_db_extract_range(void* reader, void* writer, int out_fd,
                             int64_t start, int64_t end, const char* names,
                             int ext_mode, int digits, int use_title) {
    char* buf = NULL;
    int64_t cap = 0;
    char keybuf[16];
    const char* nm = names;
    int64_t written = 0;
    if (digits < 1) digits = 1;
    if (digits > 4) digits = 4;
    for (int64_t pos = start; pos < end; pos++) {
        const char* name = "";
        if (names) { name = nm; nm += strlen(nm) + 1; }
        const char* data;
        int64_t len;
        if (fcdb_reader_get(reader, pos, &data, &len)) continue;
        if (len > 0 && data[len - 1] == '\0') len--;
        fcz_view v;
        if (fcz_parse_view((const uint8_t*)data, len, &v)) continue;
        uint32_t key = fcdb_reader_key(reader, pos);
        const char* title = name;
        int64_t title_len;
        if (use_title) {   /* stored title verbatim, even when empty */
            title = v.title;
            title_len = v.len_title;
        } else {
            if (!names) {
                snprintf(keybuf, sizeof keybuf, "%u", key);
                title = keybuf;
            }
            title_len = (int64_t)strlen(title);
        }
        int n = v.n_residue;
        int64_t need = title_len + 32 + (int64_t)n * 7;
        if (need > cap) {
            free(buf);
            cap = need;
            buf = (char*)malloc((size_t)cap);
            if (!buf) { fcz_view_release(&v); return -1; }
        }
        char* p = buf;
        int tsv = (ext_mode == 0 && digits > 1);
        if (tsv) {
            memcpy(p, title, (size_t)title_len); p += title_len;
            *p++ = '\t';
            p = put_int_c(p, n);
            *p++ = '\t';
        } else {
            *p++ = '>';
            memcpy(p, title, (size_t)title_len); p += title_len;
            *p++ = '\n';
        }
        if (ext_mode == 1) {
            for (int i = 0; i < n; i++) {
                int code = v.records[8 * i] >> 3;
                *p++ = (code >= 0 && code < FC_NUM_CODES) ? FC_ONE[code]
                                                          : 'X';
            }
        } else {
            double maxval = (double)v.tf_cont * 255.0 + (double)v.tf_min;
            int zero_one = (maxval <= 1.0 && digits <= 2);
            for (int i = 0; i < n; i++) {
                float val = (float)v.tf_codes[i] * v.tf_cont + v.tf_min;
                float c;
                char d1, d2;
                if (zero_one) {
                    c = val < 0.0f ? 0.0f : (val > 1.0f ? 1.0f : val);
                    d1 = (char)((int)(c * 10.0f) % 10) + '0';
                    d2 = (char)((int)(c * 100.0f) % 10) + '0';
                } else {
                    c = val < 0.0f ? 0.0f : (val > 100.0f ? 100.0f : val);
                    d1 = (char)(c / 10.0f) + '0';
                    d2 = (char)((int)c % 10) + '0';
                }
                *p++ = d1;
                if (digits > 1) *p++ = d2;
                if (digits >= 3) {
                    *p++ = '.';
                    *p++ = (char)((int)(c * 10.0f) % 10) + '0';
                }
                if (digits == 4)
                    *p++ = (char)((int)(c * 100.0f) % 10) + '0';
                if (digits > 1 && i != n - 1) *p++ = ',';
            }
        }
        *p++ = '\n';
        fcz_view_release(&v);
        if (writer) {
            *p = '\0';
            if (fcdb_writer_append(writer, buf, (p - buf) + 1, key, name)) {
                free(buf);
                return -1;
            }
        } else {
            int64_t w = (int64_t)(p - buf), o = 0;
            while (o < w) {
                int64_t r = write(out_fd, buf + o, (size_t)(w - o));
                if (r <= 0) { free(buf); return -1; }
                o += r;
            }
        }
        written++;
    }
    free(buf);
    return written;
}

/* ------------------------------------------------------------------ */
/* Ragged-lane decode pack (codec/batch.py pack_decode_batch_lanes in
 * C): fills the fused Pallas decode's device arrays directly in their
 * transposed device layouts from per-entry FczData field pointers.
 * The python pack peaks ~3.3 Mres/s/thread and is the healthy-link
 * e2e ceiling (VERDICT r3 #5); this fill is one pass per output.
 *
 * Zeroed/preset outputs are the CALLER's job only where the C pass
 * does not write every element: pad lanes beyond nl (all arrays) and
 * clamped sc slots (sc_seg) are written explicitly here, so plain
 * np.empty buffers are fine.
 *
 * Returns nl (real lanes) or <0 on inconsistent inputs. */
int64_t fcz_pack_lanes(
    int64_t n_entries,
    const int32_t* nres, const int32_t* na,
    const uint8_t** recs, const uint8_t** scs, const int32_t* n_scs,
    const int32_t** aidx, const float** axyz,
    const float** mins6, const float** cont6,
    const float* tfmin, const float* tfcont, const uint8_t** tfcodes,
    int64_t nlp, int64_t seg_pad, int64_t r_tot,
    uint8_t* seg_records,   /* [8][seg_pad][nlp] */
    uint8_t* sc_seg,        /* [seg_pad][11][nlp] */
    float* mins_lane, float* cont_lane,      /* [nlp][6] */
    float* fwd9, float* rev9,                /* [9][nlp] */
    uint8_t* is_first, int32_t* seg_m,       /* [nlp] */
    int32_t* res_code, float* temp,          /* [r_tot] */
    int32_t* lane_of, int32_t* rec_of)       /* [r_tot] */
{
    /* per-lane tables */
    int32_t* ent = (int32_t*)malloc((size_t)nlp * 4);
    int32_t* fst = (int32_t*)malloc((size_t)nlp * 4);
    int64_t* rbase = (int64_t*)malloc(((size_t)n_entries + 1) * 8);
    int32_t* scoff = (int32_t*)malloc((size_t)r_tot * 4);
    if (!ent || !fst || !rbase || !scoff) {
        free(ent); free(fst); free(rbase); free(scoff);
        return -12;
    }
    int64_t nl = 0, g = 0;
    rbase[0] = 0;
    for (int64_t e = 0; e < n_entries; e++) {
        rbase[e + 1] = rbase[e] + nres[e];
        int s_e = na[e] - 1;
        if (s_e < 1 || nres[e] < 1) { nl = -2; break; }
        for (int s = 0; s < s_e; s++) {
            if (nl >= nlp) { nl = -3; break; }
            int32_t first = aidx[e][s];
            if (first > nres[e] - 1) first = nres[e] - 1;
            int64_t count;
            if (s == s_e - 1) {
                count = nres[e] - first;
            } else {
                int32_t a1 = aidx[e][s + 1] + 1;
                if (a1 > nres[e] - 1) a1 = nres[e] - 1;
                count = (int64_t)a1 - first;
            }
            if (count < 1) count = 1;
            if (count > seg_pad) { nl = -4; break; }
            ent[nl] = (int32_t)e;
            fst[nl] = first;
            seg_m[nl] = (int32_t)count;
            is_first[nl] = (s == 0);
            memcpy(mins_lane + 6 * nl, mins6[e], 24);
            memcpy(cont_lane + 6 * nl, cont6[e], 24);
            for (int k = 0; k < 9; k++) {
                fwd9[k * nlp + nl] = axyz[e][(int64_t)s * 9 + k];
                rev9[k * nlp + nl] = axyz[e][((int64_t)s + 1) * 9 + k];
            }
            nl++;
        }
        if (nl < 0) break;
    }
    if (nl < 0 || rbase[n_entries] != r_tot) {
        free(ent); free(fst); free(rbase); free(scoff);
        return nl < 0 ? nl : -5;
    }
    /* pad lanes */
    for (int64_t l = nl; l < nlp; l++) {
        ent[l] = -1;
        fst[l] = 0;
        seg_m[l] = 1;
        is_first[l] = 1;
        memset(mins_lane + 6 * l, 0, 24);
        memset(cont_lane + 6 * l, 0, 24);
        for (int k = 0; k < 9; k++) {
            fwd9[k * nlp + l] = 0.0f;
            rev9[k * nlp + l] = 0.0f;
        }
    }

    /* per-residue vectors + per-entry sc running offsets */
    int64_t lane0 = 0;
    for (int64_t e = 0; e < n_entries; e++) {
        int s_e = na[e] - 1;
        int s = 0;
        int32_t off = 0;
        const uint8_t* rr = recs[e];
        const uint8_t* tc = tfcodes[e];
        float tmin = tfmin[e], tcf = tfcont[e];
        for (int32_t r = 0; r < nres[e]; r++, g++) {
            int code = rr[(int64_t)r * 8] >> 3;
            res_code[g] = code;
            temp[g] = (float)tc[r] * tcf + tmin;
            while (s + 1 < s_e && fst[lane0 + s + 1] <= r) s++;
            lane_of[g] = (int32_t)(lane0 + s);
            int32_t ro = r - fst[lane0 + s];
            if (ro < 0) ro = 0;
            if (ro > seg_pad - 1) ro = (int32_t)seg_pad - 1;
            rec_of[g] = ro;
            scoff[g] = off;
            if (code < 20) {
                int c = FC_N_ATOMS[code] - 3;
                if (c > 0) off += c;
            }
        }
        lane0 += s_e;
    }

    /* window-expanded records, BYTE-PLANE-major [8][seg_pad][nlp]: the
     * fused decode kernels read the planes directly and unpack+dequant
     * in VMEM (a [.,.,8] minor dim is tiling-pathological on device);
     * 8 sequential write streams per j-row */
    for (int64_t j = 0; j < seg_pad; j++) {
        uint8_t* rowp[8];
        for (int b = 0; b < 8; b++)
            rowp[b] = seg_records + ((int64_t)b * seg_pad + j) * nlp;
        for (int64_t l = 0; l < nl; l++) {
            int32_t e = ent[l];
            int64_t idx = fst[l] + j;
            int64_t last = nres[e] - 1;
            if (idx > last) idx = last;
            const uint8_t* src = recs[e] + idx * 8;
            for (int b = 0; b < 8; b++) rowp[b][l] = src[b];
        }
        if (nl < nlp)
            for (int b = 0; b < 8; b++)
                memset(rowp[b] + nl, 0, (size_t)(nlp - nl));
    }

    /* side-chain codes in [seg_pad][11][nlp] (s-major u8: the fused
     * decode kernel reads the rows directly and dequantizes in VMEM —
     * no [11,S,N] f32 transpose on device) */
    for (int64_t j = 0; j < seg_pad; j++) {
        for (int k = 0; k < 11; k++) {
            uint8_t* row = sc_seg + (j * 11 + k) * nlp;
            for (int64_t l = 0; l < nl; l++) {
                int32_t e = ent[l];
                int64_t idx = fst[l] + j;
                int64_t last = nres[e] - 1;
                if (idx > last) idx = last;
                int64_t gg = rbase[e] + idx;
                int code = res_code[gg];
                int cnt = (code < 20) ? FC_N_ATOMS[code] - 3 : 0;
                uint8_t v = 0;
                if (k < cnt) {
                    int64_t so = (int64_t)scoff[gg] + k;
                    if (so < n_scs[e]) v = scs[e][so];
                }
                row[l] = v;
            }
            if (nl < nlp) memset(row + nl, 0, (size_t)(nlp - nl));
        }
    }

    free(ent); free(fst); free(rbase); free(scoff);
    return nl;
}

/* Max records per segment across a batch (the pack's seg_pad sizing and
 * the fused-path width guard) — the python segments_of loop costs ~15 ms
 * per 2048-entry batch. */
int64_t fcz_pack_seg_max(int64_t n_entries, const int32_t* nres,
                         const int32_t* na, const int32_t** aidx) {
    int64_t mx = 1;
    for (int64_t e = 0; e < n_entries; e++) {
        int s_e = na[e] - 1;
        for (int s = 0; s < s_e; s++) {
            int32_t first = aidx[e][s];
            if (first > nres[e] - 1) first = nres[e] - 1;
            int64_t count;
            if (s == s_e - 1) {
                count = nres[e] - first;
            } else {
                int32_t a1 = aidx[e][s + 1] + 1;
                if (a1 > nres[e] - 1) a1 = nres[e] - 1;
                count = (int64_t)a1 - first;
            }
            if (count > mx) mx = count;
        }
    }
    return mx;
}

/* ------------------------------------------------------------------ */
/* Planar encode-wire pack (codec/batch.py encode_submit in C): fills
 * the padded f32 atom14 batch AND emits the compact integer
 * millicoordinate wire directly in the fused Pallas encode's
 * plane-major device layout ([42|3, bp, l] — residues on lanes,
 * proteins on sublanes, kernels/pallas_encode.py), replacing both the
 * multi-pass numpy _compact_coord_batch and the on-device
 * [B,L,42] -> [42,B,L] mini-prologue transpose (~1.3 ms at B=2048).
 *
 * Semantics mirror _compact_coord_batch exactly (same IEEE f32 op
 * order — mul by 1000, rintf, i32 cast, exact-recovery divide — so the
 * valid/invalid decision is bit-identical to the numpy pass):
 *   s = rintf(c * 1000f); |s| < 2^24; (float)(int32)s / 1000f == c;
 *   present bit j  = any of slot j's 3 components nonzero;
 *   base           = xi[first present slot] (zeros when none);
 *   delta[j]       = present_j ? xi[j] - base : 0, each in
 *                    (-2^15, 2^15) exclusive.
 *
 * Returns 1 when the wire is valid (baseT/deltaT/present fully
 * written, pad proteins/lanes zeroed), 0 when any element falls out of
 * the compact form (atom14 is STILL completely filled — the caller
 * proceeds on the f32 path without a second fill pass), <0 on bad
 * arguments. Buffers may be dirty (np.empty / recycled pool): every
 * element of every output this function owns is written. */
int64_t fcz_pack_encode_wire_range(
    int64_t k0, int64_t n_chunk, const float** a14s, const int32_t* ms,
    int64_t bp, int64_t l,
    float* atom14,      /* [.][l][14][3], full-batch base pointer */
    int32_t* baseT,     /* [3][bp][l] */
    int16_t* deltaT,    /* [42][bp][l] */
    uint16_t* present,  /* [bp][l] */
    int64_t pad_from)   /* zero wire rows [pad_from, bp) when >= 0 */
{
    if (n_chunk < 1 || bp < k0 + n_chunk || l < 1) return -1;
    int64_t plane = bp * l;
    int ok = 1;
    for (int64_t kk = 0; kk < n_chunk; kk++) {
        int64_t k = k0 + kk;
        const float* src = a14s[kk];
        int32_t m = ms[kk];
        if (m < 0 || m > l) return -1;
        float* dst = atom14 + k * l * 42;
        memcpy(dst, src, (size_t)m * 42 * 4);
        memset(dst + (int64_t)m * 42, 0, (size_t)(l - m) * 42 * 4);
        if (!ok) continue;
        for (int64_t r = 0; r < l; r++) {
            int64_t lo = k * l + r;
            if (r >= m) {        /* pad residue: all-zero wire */
                present[lo] = 0;
                baseT[lo] = 0; baseT[plane + lo] = 0;
                baseT[2 * plane + lo] = 0;
                for (int p = 0; p < 42; p++) deltaT[p * plane + lo] = 0;
                continue;
            }
            const float* c = src + r * 42;
            int32_t xi[42];
            uint16_t pres = 0;
            for (int j = 0; j < 14; j++) {
                int32_t nz = 0;
                for (int t = 0; t < 3; t++) {
                    float sv = rintf(c[3 * j + t] * 1000.0f);
                    if (!(sv < 16777216.0f && sv > -16777216.0f)) {
                        ok = 0; goto fill_only;
                    }
                    int32_t v = (int32_t)sv;
                    if ((float)v / 1000.0f != c[3 * j + t]) {
                        ok = 0; goto fill_only;
                    }
                    xi[3 * j + t] = v;
                    nz |= v;
                }
                if (nz) pres |= (uint16_t)(1u << j);
            }
            int first = 0;
            for (int j = 0; j < 14; j++) {
                if (pres & (1u << j)) { first = j; break; }
            }
            int32_t bx = xi[3 * first], by = xi[3 * first + 1],
                    bz = xi[3 * first + 2];
            present[lo] = pres;
            baseT[lo] = bx;
            baseT[plane + lo] = by;
            baseT[2 * plane + lo] = bz;
            for (int j = 0; j < 14; j++) {
                int32_t on = (pres >> j) & 1;
                int32_t dx = on ? xi[3 * j] - bx : 0;
                int32_t dy = on ? xi[3 * j + 1] - by : 0;
                int32_t dz = on ? xi[3 * j + 2] - bz : 0;
                if (dx <= -32768 || dx >= 32768 || dy <= -32768 ||
                    dy >= 32768 || dz <= -32768 || dz >= 32768) {
                    ok = 0; goto fill_only;
                }
                deltaT[(3 * j) * plane + lo] = (int16_t)dx;
                deltaT[(3 * j + 1) * plane + lo] = (int16_t)dy;
                deltaT[(3 * j + 2) * plane + lo] = (int16_t)dz;
            }
        }
        continue;
    fill_only:
        /* wire fell out of the compact form: finish the atom14 fill
         * only (the memcpy/memset above already ran for this k) */
        ;
    }
    if (!ok) return 0;
    /* pad proteins beyond the live batch: zero wire rows */
    if (pad_from >= 0) {
        for (int64_t k = pad_from; k < bp; k++) {
            memset(present + k * l, 0, (size_t)l * 2);
            for (int p = 0; p < 3; p++)
                memset(baseT + p * plane + k * l, 0, (size_t)l * 4);
            for (int p = 0; p < 42; p++)
                memset(deltaT + p * plane + k * l, 0, (size_t)l * 2);
        }
    }
    return 1;
}

int64_t fcz_pack_encode_wire(
    int64_t n_live, const float** a14s, const int32_t* ms,
    int64_t bp, int64_t l,
    float* atom14, int32_t* baseT, int16_t* deltaT, uint16_t* present)
{
    return fcz_pack_encode_wire_range(0, n_live, a14s, ms, bp, l,
                                      atom14, baseT, deltaT, present,
                                      n_live);
}

/* ------------------------------------------------------------------ */
/* Side-chain placement from an EXTERNAL backbone (the bb-only decode
 * wire, ROADMAP round-5 #2): on degraded host<->device links the
 * device ships only blended N/CA/C rows (~36 B/residue vs 96 B for
 * full-atom rows) and the host places O + side chains here with the
 * reference float op order (place_atom above, nerf.cpp:39-104;
 * tables/codes exactly as the exact decode loop at line ~364,
 * including the residue-0 display-name table quirk, foldcomp.cpp:862).
 *
 * bb:  [n][3][3] f32 (N, CA, C per residue, component-minor)
 * out: [n][14][3] f32 — slots 0..2 copied, 3..cnt-1 placed, rest 0.
 * Returns the number of sc codes consumed, or -1 on bad args. */
int64_t fcz_place_sc_from_bb(int64_t n, const float* bb,
                             const int32_t* codes,
                             const uint8_t* sc_codes, int64_t n_sc,
                             char first_res, float* out14)
{
    if (n < 0) return -1;
    float sc_min = -180.0f;
    float sc_cf = (180.0f - sc_min) / (float)255;
    v3 slot[FC_MAX_ATOM];
    int64_t sc_pos = 0;
    for (int64_t i = 0; i < n; i++) {
        int code = codes[i];
        int name_code = (i == 0) ? code_of_one(first_res)
                                 : (code < FC_NUM_CODES ? code : 23);
        int tbl = name_code;
        int cnt = (code >= 20 || tbl >= 20) ? 3 : FC_N_ATOMS[tbl];
        const float* b = bb + i * 9;
        slot[0].x = b[0]; slot[0].y = b[1]; slot[0].z = b[2];
        slot[1].x = b[3]; slot[1].y = b[4]; slot[1].z = b[5];
        slot[2].x = b[6]; slot[2].y = b[7]; slot[2].z = b[8];
        int nsc = (code < 20) ? FC_N_ATOMS[code] - 3 : 0;
        for (int k = 3; k < cnt; k++) {
            float tor = (k - 3 < nsc && sc_pos + (k - 3) < n_sc)
                ? (float)sc_codes[sc_pos + (k - 3)] * sc_cf + sc_min
                : 0.0f;
            slot[k] = place_atom(slot[FC_PRED[tbl][k][0]],
                                 slot[FC_PRED[tbl][k][1]],
                                 slot[FC_PRED[tbl][k][2]],
                                 FC_BLEN[tbl][k], FC_BANG[tbl][k], tor);
        }
        sc_pos += nsc;
        float* o = out14 + i * 42;
        for (int k = 0; k < FC_MAX_ATOM; k++) {
            if (k < cnt) {
                o[3 * k] = slot[k].x;
                o[3 * k + 1] = slot[k].y;
                o[3 * k + 2] = slot[k].z;
            } else {
                o[3 * k] = 0.0f;
                o[3 * k + 1] = 0.0f;
                o[3 * k + 2] = 0.0f;
            }
        }
    }
    return sc_pos;
}
