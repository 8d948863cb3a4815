// plonk_tpu native host runtime: BLS12-381 Fp/G1 batch kernels.
//
// The device (TPU) does the O(n) work; this library covers the host-side
// runtime around it — the pieces the reference delegates to the
// dusk-bls12_381 Rust crate (SURVEY.md section 2.2): batch projective->affine
// normalization (Montgomery-trick inversion), Pippenger window combining, and
// small multi-scalar multiplications for the verifier.
//
// ABI: extern "C", operating on raw little-endian buffers so Python drives it
// with ctypes and zero-copy numpy pointers.
//   - Fp elements cross the ABI as 6 x u64 little-endian limbs, MONTGOMERY
//     form with R = 2^384 (matching the device layout: 24 x 16-bit limbs,
//     R = 2^(16*24)).
//   - Device tensors cross as the (3, 24, n) uint32 16-bit-limb arrays used
//     on the TPU, Montgomery form.
//   - Scalars (Fr) cross as 32-byte little-endian canonical integers.
//
// Build: g++ -O2 -shared -fPIC -o libplonk_host.so plonk_host.cpp

#include <cstdint>
#include <cstring>
#include <vector>

typedef unsigned __int128 u128;
typedef uint64_t u64;
typedef uint32_t u32;
typedef uint8_t u8;

// ---------------------------------------------------------------------------
// Fp: 381-bit base field, 6 x u64 Montgomery (R = 2^384)
// ---------------------------------------------------------------------------

static const u64 FP_MOD[6] = {
    0xb9feffffffffaaabULL, 0x1eabfffeb153ffffULL, 0x6730d2a0f6b0f624ULL,
    0x64774b84f38512bfULL, 0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL,
};
// -p^-1 mod 2^64
static const u64 FP_INV = 0x89f3fffcfffcfffdULL;
// R^2 mod p (to enter Montgomery form)
static const u64 FP_R2[6] = {
    0xf4df1f341c341746ULL, 0x0a76e6a609d104f1ULL, 0x8de5476c4c95b6d5ULL,
    0x67eb88a9939d83c0ULL, 0x9a793e85b519952dULL, 0x11988fe592cae3aaULL,
};
// R mod p (Montgomery one)
static const u64 FP_ONE[6] = {
    0x760900000002fffdULL, 0xebf4000bc40c0002ULL, 0x5f48985753c758baULL,
    0x77ce585370525745ULL, 0x5c071a97a256ec6dULL, 0x15f65ec3fa80e493ULL,
};

struct Fp { u64 l[6]; };

static inline void fp_zero(Fp &o) { memset(o.l, 0, sizeof(o.l)); }

static inline bool fp_is_zero(const Fp &a) {
    u64 acc = 0;
    for (int i = 0; i < 6; i++) acc |= a.l[i];
    return acc == 0;
}

static inline void fp_cond_sub_p(Fp &a) {
    // a -= p if a >= p
    u64 t[6]; u64 borrow = 0;
    for (int i = 0; i < 6; i++) {
        u128 d = (u128)a.l[i] - FP_MOD[i] - borrow;
        t[i] = (u64)d;
        borrow = (u64)((d >> 64) & 1);
    }
    if (!borrow) memcpy(a.l, t, sizeof(t));
}

static inline void fp_add(Fp &o, const Fp &a, const Fp &b) {
    u64 carry = 0;
    for (int i = 0; i < 6; i++) {
        u128 s = (u128)a.l[i] + b.l[i] + carry;
        o.l[i] = (u64)s;
        carry = (u64)(s >> 64);
    }
    fp_cond_sub_p(o);
}

static inline void fp_sub(Fp &o, const Fp &a, const Fp &b) {
    u64 borrow = 0;
    for (int i = 0; i < 6; i++) {
        u128 d = (u128)a.l[i] - b.l[i] - borrow;
        o.l[i] = (u64)d;
        borrow = (u64)((d >> 64) & 1);
    }
    if (borrow) {
        u64 carry = 0;
        for (int i = 0; i < 6; i++) {
            u128 s = (u128)o.l[i] + FP_MOD[i] + carry;
            o.l[i] = (u64)s;
            carry = (u64)(s >> 64);
        }
    }
}

static inline void fp_neg(Fp &o, const Fp &a) {
    if (fp_is_zero(a)) { o = a; return; }
    u64 borrow = 0;
    for (int i = 0; i < 6; i++) {
        u128 d = (u128)FP_MOD[i] - a.l[i] - borrow;
        o.l[i] = (u64)d;
        borrow = (u64)((d >> 64) & 1);
    }
}

// CIOS Montgomery multiplication
static void fp_mul(Fp &out, const Fp &a, const Fp &b) {
    u64 t[8] = {0};
    for (int i = 0; i < 6; i++) {
        u64 carry = 0;
        for (int j = 0; j < 6; j++) {
            u128 s = (u128)a.l[j] * b.l[i] + t[j] + carry;
            t[j] = (u64)s;
            carry = (u64)(s >> 64);
        }
        u128 s = (u128)t[6] + carry;
        t[6] = (u64)s;
        t[7] = (u64)(s >> 64);

        u64 m = t[0] * FP_INV;
        u128 c = (u128)m * FP_MOD[0] + t[0];
        carry = (u64)(c >> 64);
        for (int j = 1; j < 6; j++) {
            c = (u128)m * FP_MOD[j] + t[j] + carry;
            t[j - 1] = (u64)c;
            carry = (u64)(c >> 64);
        }
        c = (u128)t[6] + carry;
        t[5] = (u64)c;
        t[6] = t[7] + (u64)(c >> 64);
        t[7] = 0;
    }
    memcpy(out.l, t, 6 * sizeof(u64));
    fp_cond_sub_p(out);
}

static inline void fp_sqr(Fp &o, const Fp &a) { fp_mul(o, a, a); }

static void fp_inv(Fp &o, const Fp &a) {
    // Fermat: a^(p-2); p-2 scanned MSB->LSB
    static const u64 PM2[6] = {
        0xb9feffffffffaaa9ULL, 0x1eabfffeb153ffffULL, 0x6730d2a0f6b0f624ULL,
        0x64774b84f38512bfULL, 0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL,
    };
    Fp acc; memcpy(acc.l, FP_ONE, sizeof(FP_ONE));
    for (int i = 380; i >= 0; i--) {
        fp_sqr(acc, acc);
        if ((PM2[i / 64] >> (i % 64)) & 1) fp_mul(acc, acc, a);
    }
    o = acc;
}

static void fp_from_mont(Fp &o, const Fp &a) {
    Fp one; fp_zero(one); one.l[0] = 1;
    fp_mul(o, a, one);
}

static void fp_to_mont(Fp &o, const Fp &a) {
    Fp r2; memcpy(r2.l, FP_R2, sizeof(FP_R2));
    fp_mul(o, a, r2);
}

// ---------------------------------------------------------------------------
// G1: projective (X:Y:Z), complete addition (Renes-Costello-Batina alg. 7,
// a = 0, b3 = 12) — same formulas as the device kernel (curve/g1_device.py).
// ---------------------------------------------------------------------------

struct G1p { Fp X, Y, Z; };

static void g1_identity(G1p &o) {
    fp_zero(o.X);
    memcpy(o.Y.l, FP_ONE, sizeof(FP_ONE));
    fp_zero(o.Z);
}

static inline void fp_mul12(Fp &o, const Fp &a) {
    Fp t2, t3;
    fp_add(t2, a, a);        // 2a
    fp_add(t3, t2, a);       // 3a
    fp_add(t3, t3, t3);      // 6a
    fp_add(o, t3, t3);       // 12a
}

static void g1_add(G1p &o, const G1p &p, const G1p &q) {
    Fp t0, t1, t2, t3, t4, xz, t0_3, t2b3, z3t, t1m, y3b3, A, B;
    fp_mul(t0, p.X, q.X);
    fp_mul(t1, p.Y, q.Y);
    fp_mul(t2, p.Z, q.Z);
    fp_add(A, p.X, p.Y); fp_add(B, q.X, q.Y);
    fp_mul(t3, A, B); fp_sub(t3, t3, t0); fp_sub(t3, t3, t1);
    fp_add(A, p.Y, p.Z); fp_add(B, q.Y, q.Z);
    fp_mul(t4, A, B); fp_sub(t4, t4, t1); fp_sub(t4, t4, t2);
    fp_add(A, p.X, p.Z); fp_add(B, q.X, q.Z);
    fp_mul(xz, A, B); fp_sub(xz, xz, t0); fp_sub(xz, xz, t2);
    fp_add(t0_3, t0, t0); fp_add(t0_3, t0_3, t0);
    fp_mul12(t2b3, t2);
    fp_add(z3t, t1, t2b3);
    fp_sub(t1m, t1, t2b3);
    fp_mul12(y3b3, xz);
    Fp X3, Y3, Z3, u, v;
    fp_mul(u, t3, t1m); fp_mul(v, t4, y3b3); fp_sub(X3, u, v);
    fp_mul(u, y3b3, t0_3); fp_mul(v, t1m, z3t); fp_add(Y3, u, v);
    fp_mul(u, z3t, t4); fp_mul(v, t0_3, t3); fp_add(Z3, u, v);
    o.X = X3; o.Y = Y3; o.Z = Z3;
}

static void g1_double(G1p &o, const G1p &p) { g1_add(o, p, p); }

// ---------------------------------------------------------------------------
// device tensor <-> Fp: (24 x u16-in-u32) little-endian limbs, Montgomery
// ---------------------------------------------------------------------------

static inline void fp_from_u16limbs(Fp &o, const u32 *limbs, size_t stride) {
    for (int w = 0; w < 6; w++) {
        u64 v = 0;
        for (int k = 3; k >= 0; k--)
            v = (v << 16) | (u64)(limbs[(4 * w + k) * stride] & 0xffff);
        o.l[w] = v;
    }
    // device kernels keep Fp in redundant [0, 2p) form; canonicalize on import
    fp_cond_sub_p(o);
}

static inline void bytes_to_fp_canon(Fp &o, const u8 *b) {
    for (int w = 0; w < 6; w++) {
        u64 v = 0;
        for (int k = 7; k >= 0; k--) v = (v << 8) | b[8 * w + k];
        o.l[w] = v;
    }
}

static inline void fp_canon_to_bytes(u8 *b, const Fp &a) {
    for (int w = 0; w < 6; w++)
        for (int k = 0; k < 8; k++) b[8 * w + k] = (u8)(a.l[w] >> (8 * k));
}

extern "C" {

// (3, 24, n) u32 Montgomery projective device tensor -> n x 96-byte canonical
// affine (x||y little-endian), inf[] flags.  Batch inversion: one fp_inv for
// the whole batch (Montgomery trick) — the reference's batch_normalize.
void g1_from_device(const u32 *xyz, long n, u8 *out_affine, u8 *out_inf) {
    if (n <= 0) return;
    std::vector<Fp> X((size_t)n), Y((size_t)n), Z((size_t)n);
    const u32 *xs = xyz, *ys = xyz + 24 * n, *zs = xyz + 48 * n;
    for (long i = 0; i < n; i++) {
        fp_from_u16limbs(X[i], xs + i, (size_t)n);
        fp_from_u16limbs(Y[i], ys + i, (size_t)n);
        fp_from_u16limbs(Z[i], zs + i, (size_t)n);
    }
    // prefix products of nonzero Zs
    std::vector<Fp> pref((size_t)n);
    Fp run; memcpy(run.l, FP_ONE, sizeof(FP_ONE));
    for (long i = 0; i < n; i++) {
        if (!fp_is_zero(Z[i])) fp_mul(run, run, Z[i]);
        pref[i] = run;
    }
    Fp inv_run; fp_inv(inv_run, run);
    for (long i = n - 1; i >= 0; i--) {
        out_inf[i] = fp_is_zero(Z[i]) ? 1 : 0;
        if (out_inf[i]) {
            memset(out_affine + 96 * i, 0, 96);
            continue;
        }
        Fp zinv;
        if (i == 0) {
            zinv = inv_run;
        } else {
            fp_mul(zinv, inv_run, pref[i - 1]);
        }
        fp_mul(inv_run, inv_run, Z[i]);  // strip this Z for earlier entries
        Fp xa, ya, xc, yc;
        fp_mul(xa, X[i], zinv);
        fp_mul(ya, Y[i], zinv);
        fp_from_mont(xc, xa);
        fp_from_mont(yc, ya);
        fp_canon_to_bytes(out_affine + 96 * i, xc);
        fp_canon_to_bytes(out_affine + 96 * i + 48, yc);
    }
}

// Pippenger window combine: acc = sum_w 2^(c*w) W_w over (3, 24, W) device
// window tensor (Montgomery projective).  Returns canonical affine + inf.
void g1_combine_windows(const u32 *xyz, long W, long c, u8 *out96,
                        u8 *out_inf) {
    G1p acc; g1_identity(acc);
    const u32 *xs = xyz, *ys = xyz + 24 * W, *zs = xyz + 48 * W;
    for (long w = W - 1; w >= 0; w--) {
        for (long k = 0; k < c; k++) g1_double(acc, acc);
        G1p pt;
        fp_from_u16limbs(pt.X, xs + w, (size_t)W);
        fp_from_u16limbs(pt.Y, ys + w, (size_t)W);
        fp_from_u16limbs(pt.Z, zs + w, (size_t)W);
        g1_add(acc, acc, pt);
    }
    if (fp_is_zero(acc.Z)) {
        *out_inf = 1;
        memset(out96, 0, 96);
        return;
    }
    *out_inf = 0;
    Fp zinv, xa, ya, xc, yc;
    fp_inv(zinv, acc.Z);
    fp_mul(xa, acc.X, zinv);
    fp_mul(ya, acc.Y, zinv);
    fp_from_mont(xc, xa);
    fp_from_mont(yc, ya);
    fp_canon_to_bytes(out96, xc);
    fp_canon_to_bytes(out96 + 48, yc);
}

// Small variable-base MSM (the verifier's ~33-point [D]/[F] combination):
// points as n x 96-byte canonical affine (+inf flags), scalars as n x 32-byte
// little-endian canonical.  Double-and-add over a 4-bit window table.
void g1_msm_small(const u8 *points96, const u8 *inf, const u8 *scalars32,
                  long n, u8 *out96, u8 *out_inf) {
    G1p acc; g1_identity(acc);
    for (long i = 0; i < n; i++) {
        if (inf[i]) continue;
        G1p base;
        Fp xc, yc;
        bytes_to_fp_canon(xc, points96 + 96 * i);
        bytes_to_fp_canon(yc, points96 + 96 * i + 48);
        fp_to_mont(base.X, xc);
        fp_to_mont(base.Y, yc);
        memcpy(base.Z.l, FP_ONE, sizeof(FP_ONE));
        // 4-bit window table: 0..15 multiples
        G1p tbl[16];
        g1_identity(tbl[0]);
        tbl[1] = base;
        for (int k = 2; k < 16; k++) g1_add(tbl[k], tbl[k - 1], base);
        G1p term; g1_identity(term);
        const u8 *s = scalars32 + 32 * i;
        bool started = false;
        for (int nib = 63; nib >= 0; nib--) {
            if (started)
                for (int d = 0; d < 4; d++) g1_double(term, term);
            int digit = (s[nib / 2] >> ((nib & 1) * 4)) & 0xf;
            if (digit) {
                g1_add(term, term, tbl[digit]);
                started = true;
            }
        }
        g1_add(acc, acc, term);
    }
    if (fp_is_zero(acc.Z)) {
        *out_inf = 1;
        memset(out96, 0, 96);
        return;
    }
    *out_inf = 0;
    Fp zinv, xa, ya, xc, yc;
    fp_inv(zinv, acc.Z);
    fp_mul(xa, acc.X, zinv);
    fp_mul(ya, acc.Y, zinv);
    fp_from_mont(xc, xa);
    fp_from_mont(yc, ya);
    fp_canon_to_bytes(out96, xc);
    fp_canon_to_bytes(out96 + 48, yc);
}

// Host fixed-base scalar-mul batch: out[i] = scalars[i] * G (canonical
// affine G).  Used by PublicParameters.setup's host path.
void g1_scalar_mul_base(const u8 *base96, const u8 *scalars32, long n,
                        u8 *out_affine, u8 *out_inf) {
    Fp xc, yc;
    G1p base;
    bytes_to_fp_canon(xc, base96);
    bytes_to_fp_canon(yc, base96 + 48);
    fp_to_mont(base.X, xc);
    fp_to_mont(base.Y, yc);
    memcpy(base.Z.l, FP_ONE, sizeof(FP_ONE));
    // shared 4-bit table
    G1p tbl[16];
    g1_identity(tbl[0]);
    tbl[1] = base;
    for (int k = 2; k < 16; k++) g1_add(tbl[k], tbl[k - 1], base);

    std::vector<G1p> res((size_t)n);
    for (long i = 0; i < n; i++) {
        G1p term; g1_identity(term);
        const u8 *s = scalars32 + 32 * i;
        bool started = false;
        for (int nib = 63; nib >= 0; nib--) {
            if (started)
                for (int d = 0; d < 4; d++) g1_double(term, term);
            int digit = (s[nib / 2] >> ((nib & 1) * 4)) & 0xf;
            if (digit) {
                g1_add(term, term, tbl[digit]);
                started = true;
            }
        }
        res[i] = term;
    }
    // batch normalize
    std::vector<Fp> pref((size_t)n);
    Fp run; memcpy(run.l, FP_ONE, sizeof(FP_ONE));
    for (long i = 0; i < n; i++) {
        if (!fp_is_zero(res[i].Z)) fp_mul(run, run, res[i].Z);
        pref[i] = run;
    }
    Fp inv_run; fp_inv(inv_run, run);
    for (long i = n - 1; i >= 0; i--) {
        out_inf[i] = fp_is_zero(res[i].Z) ? 1 : 0;
        if (out_inf[i]) {
            memset(out_affine + 96 * i, 0, 96);
            continue;
        }
        Fp zinv;
        if (i == 0) zinv = inv_run;
        else fp_mul(zinv, inv_run, pref[i - 1]);
        fp_mul(inv_run, inv_run, res[i].Z);
        Fp xa, ya, xo, yo;
        fp_mul(xa, res[i].X, zinv);
        fp_mul(ya, res[i].Y, zinv);
        fp_from_mont(xo, xa);
        fp_from_mont(yo, ya);
        fp_canon_to_bytes(out_affine + 96 * i, xo);
        fp_canon_to_bytes(out_affine + 96 * i + 48, yo);
    }
}

}  // extern "C"
