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

// ---------------------------------------------------------------------------
// Fp2 / Fp6 / Fp12 tower + optimal ate pairing — the verifier's 2-pairing
// check (reference: dusk-bls12_381 multi_miller_loop + final_exponentiation,
// consumed at /root/reference/src/proof_system/proof.rs:461-489).  Formulas
// mirror the Python oracle (plonk_tpu/curve/bls12_381.py) exactly:
//   Fp2 = Fp[u]/(u^2+1), Fp6 = Fp2[v]/(v^3 - (u+1)), Fp12 = Fp6[w]/(w^2 - v)
//   untwist psi(x', y') = (x' w^-2, y' w^-3); affine chord/tangent lines.
// Frobenius twist constants and the hard-part exponent are injected once from
// Python (pairing_init) so this file stays free of bignum constant derivation.
// ---------------------------------------------------------------------------

struct Fp2c { Fp c0, c1; };
struct Fp6c { Fp2c c0, c1, c2; };
struct Fp12c { Fp6c c0, c1; };

static inline void fp2_zero(Fp2c &o) { fp_zero(o.c0); fp_zero(o.c1); }
static inline void fp2_one(Fp2c &o) {
    memcpy(o.c0.l, FP_ONE, sizeof(FP_ONE)); fp_zero(o.c1);
}
static inline bool fp2_is_zero(const Fp2c &a) {
    return fp_is_zero(a.c0) && fp_is_zero(a.c1);
}
static inline void fp2_add(Fp2c &o, const Fp2c &a, const Fp2c &b) {
    fp_add(o.c0, a.c0, b.c0); fp_add(o.c1, a.c1, b.c1);
}
static inline void fp2_sub(Fp2c &o, const Fp2c &a, const Fp2c &b) {
    fp_sub(o.c0, a.c0, b.c0); fp_sub(o.c1, a.c1, b.c1);
}
static inline void fp2_neg(Fp2c &o, const Fp2c &a) {
    fp_neg(o.c0, a.c0); fp_neg(o.c1, a.c1);
}
static void fp2_mul(Fp2c &o, const Fp2c &a, const Fp2c &b) {
    // Karatsuba, u^2 = -1 (bls12_381.py Fp2.__mul__)
    Fp t0, t1, t2, sa, sb;
    fp_mul(t0, a.c0, b.c0);
    fp_mul(t1, a.c1, b.c1);
    fp_add(sa, a.c0, a.c1); fp_add(sb, b.c0, b.c1);
    fp_mul(t2, sa, sb);
    fp_sub(o.c0, t0, t1);
    fp_sub(t2, t2, t0); fp_sub(o.c1, t2, t1);
}
static void fp2_sqr(Fp2c &o, const Fp2c &a) {
    // (a0+a1 u)^2 = (a0+a1)(a0-a1) + 2 a0 a1 u  (2 muls)
    Fp s, d, m, t;
    fp_add(s, a.c0, a.c1);
    fp_sub(d, a.c0, a.c1);
    fp_mul(m, a.c0, a.c1);
    fp_mul(t, s, d);
    o.c0 = t;
    fp_add(o.c1, m, m);
}
static void fp2_inv(Fp2c &o, const Fp2c &a) {
    // (a0 - a1 u)/(a0^2 + a1^2)
    Fp d, t0, t1;
    fp_sqr(t0, a.c0); fp_sqr(t1, a.c1); fp_add(d, t0, t1);
    fp_inv(d, d);
    fp_mul(o.c0, a.c0, d);
    Fp n1; fp_neg(n1, a.c1); fp_mul(o.c1, n1, d);
}
// xi = 1 + u
static void fp2_mul_xi(Fp2c &o, const Fp2c &a) {
    Fp t0, t1;
    fp_sub(t0, a.c0, a.c1);
    fp_add(t1, a.c0, a.c1);
    o.c0 = t0; o.c1 = t1;
}

static inline void fp6_zero(Fp6c &o) { fp2_zero(o.c0); fp2_zero(o.c1); fp2_zero(o.c2); }
static inline void fp6_one(Fp6c &o) { fp2_one(o.c0); fp2_zero(o.c1); fp2_zero(o.c2); }
static inline bool fp6_is_zero(const Fp6c &a) {
    return fp2_is_zero(a.c0) && fp2_is_zero(a.c1) && fp2_is_zero(a.c2);
}
static inline void fp6_add(Fp6c &o, const Fp6c &a, const Fp6c &b) {
    fp2_add(o.c0, a.c0, b.c0); fp2_add(o.c1, a.c1, b.c1); fp2_add(o.c2, a.c2, b.c2);
}
static inline void fp6_sub(Fp6c &o, const Fp6c &a, const Fp6c &b) {
    fp2_sub(o.c0, a.c0, b.c0); fp2_sub(o.c1, a.c1, b.c1); fp2_sub(o.c2, a.c2, b.c2);
}
static inline void fp6_neg(Fp6c &o, const Fp6c &a) {
    fp2_neg(o.c0, a.c0); fp2_neg(o.c1, a.c1); fp2_neg(o.c2, a.c2);
}
static void fp6_mul(Fp6c &o, const Fp6c &a, const Fp6c &b) {
    // bls12_381.py Fp6.__mul__ (Toom/Karatsuba with xi folding)
    Fp2c t0, t1, t2, sa, sb, m, x;
    fp2_mul(t0, a.c0, b.c0);
    fp2_mul(t1, a.c1, b.c1);
    fp2_mul(t2, a.c2, b.c2);
    Fp6c r;
    fp2_add(sa, a.c1, a.c2); fp2_add(sb, b.c1, b.c2);
    fp2_mul(m, sa, sb); fp2_sub(m, m, t1); fp2_sub(m, m, t2);
    fp2_mul_xi(x, m); fp2_add(r.c0, t0, x);
    fp2_add(sa, a.c0, a.c1); fp2_add(sb, b.c0, b.c1);
    fp2_mul(m, sa, sb); fp2_sub(m, m, t0); fp2_sub(m, m, t1);
    fp2_mul_xi(x, t2); fp2_add(r.c1, m, x);
    fp2_add(sa, a.c0, a.c2); fp2_add(sb, b.c0, b.c2);
    fp2_mul(m, sa, sb); fp2_sub(m, m, t0); fp2_sub(m, m, t2);
    fp2_add(r.c2, m, t1);
    o = r;
}
static void fp6_sqr(Fp6c &o, const Fp6c &a) {
    // CH-SQR2: s0=a0^2, s1=2 a0 a1, s2=(a0-a1+a2)^2, s3=2 a1 a2, s4=a2^2
    Fp2c s0, s1, s2, s3, s4, t, x;
    fp2_sqr(s0, a.c0);
    fp2_mul(s1, a.c0, a.c1); fp2_add(s1, s1, s1);
    fp2_sub(t, a.c0, a.c1); fp2_add(t, t, a.c2); fp2_sqr(s2, t);
    fp2_mul(s3, a.c1, a.c2); fp2_add(s3, s3, s3);
    fp2_sqr(s4, a.c2);
    Fp6c r;
    fp2_mul_xi(x, s3); fp2_add(r.c0, s0, x);
    fp2_mul_xi(x, s4); fp2_add(r.c1, s1, x);
    fp2_add(r.c2, s1, s2); fp2_add(r.c2, r.c2, s3);
    fp2_sub(r.c2, r.c2, s0); fp2_sub(r.c2, r.c2, s4);
    o = r;
}
static void fp6_mul_fp2(Fp6c &o, const Fp6c &a, const Fp2c &k) {
    fp2_mul(o.c0, a.c0, k); fp2_mul(o.c1, a.c1, k); fp2_mul(o.c2, a.c2, k);
}
static void fp6_inv(Fp6c &o, const Fp6c &a) {
    // bls12_381.py Fp6.inv
    Fp2c c0, c1, c2, t, m, x;
    fp2_sqr(c0, a.c0); fp2_mul(m, a.c1, a.c2); fp2_mul_xi(x, m); fp2_sub(c0, c0, x);
    fp2_sqr(m, a.c2); fp2_mul_xi(c1, m); fp2_mul(m, a.c0, a.c1); fp2_sub(c1, c1, m);
    fp2_sqr(c2, a.c1); fp2_mul(m, a.c0, a.c2); fp2_sub(c2, c2, m);
    Fp2c s1, s2;
    fp2_mul(s1, a.c2, c1); fp2_mul(s2, a.c1, c2); fp2_add(s1, s1, s2);
    fp2_mul_xi(x, s1);
    fp2_mul(t, a.c0, c0); fp2_add(t, t, x);
    fp2_inv(t, t);
    fp2_mul(o.c0, c0, t); fp2_mul(o.c1, c1, t); fp2_mul(o.c2, c2, t);
}
// multiply by v: (a0, a1, a2) -> (xi*a2, a0, a1)
static void fp6_mul_v(Fp6c &o, const Fp6c &a) {
    Fp2c x; fp2_mul_xi(x, a.c2);
    Fp2c a0 = a.c0, a1 = a.c1;
    o.c0 = x; o.c1 = a0; o.c2 = a1;
}

static inline void fp12_one(Fp12c &o) { fp6_one(o.c0); fp6_zero(o.c1); }
static inline bool fp12_is_one(const Fp12c &a) {
    if (!fp6_is_zero(a.c1)) return false;
    Fp6c one; fp6_one(one);
    return memcmp(&a.c0, &one, sizeof(one)) == 0;
}
static void fp12_mul(Fp12c &o, const Fp12c &a, const Fp12c &b) {
    Fp6c t0, t1, sa, sb, m, v;
    fp6_mul(t0, a.c0, b.c0);
    fp6_mul(t1, a.c1, b.c1);
    fp6_add(sa, a.c0, a.c1); fp6_add(sb, b.c0, b.c1);
    fp6_mul(m, sa, sb);
    Fp12c r;
    fp6_mul_v(v, t1); fp6_add(r.c0, t0, v);
    fp6_sub(m, m, t0); fp6_sub(r.c1, m, t1);
    o = r;
}
static void fp12_sqr(Fp12c &o, const Fp12c &a) {
    // (c0 + c1 w)^2 = c0^2 + v c1^2 + 2 c0 c1 w  via Karatsuba-like:
    // c0' = (c0 + c1)(c0 + v c1) - c0 c1 - v c0 c1 ; c1' = 2 c0 c1
    Fp6c ab, apb, vb, avb, t;
    fp6_mul(ab, a.c0, a.c1);
    fp6_add(apb, a.c0, a.c1);
    fp6_mul_v(vb, a.c1);
    fp6_add(avb, a.c0, vb);
    Fp12c r;
    fp6_mul(t, apb, avb);
    fp6_sub(t, t, ab);
    Fp6c vab; fp6_mul_v(vab, ab);
    fp6_sub(r.c0, t, vab);
    fp6_add(r.c1, ab, ab);
    o = r;
}

// cyclotomic squaring (Granger–Scott) for elements of the cyclotomic
// subgroup (anything after the easy part of the final exponentiation);
// ~3x cheaper than a generic fp12_sqr.  fp4: (a + b t), t^2 = xi.
static void fp4_sqr(Fp2c &oc0, Fp2c &oc1, const Fp2c &a, const Fp2c &b) {
    Fp2c t0, t1, t2, s;
    fp2_sqr(t0, a);
    fp2_sqr(t1, b);
    fp2_mul_xi(t2, t1);
    fp2_add(oc0, t2, t0);
    fp2_add(s, a, b);
    fp2_sqr(s, s);
    fp2_sub(s, s, t0);
    fp2_sub(oc1, s, t1);
}
static void fp12_cyclotomic_sqr(Fp12c &o, const Fp12c &f) {
    // slot naming per the standard Fp4-tower view of Fp12
    Fp2c z0 = f.c0.c0, z4 = f.c0.c1, z3 = f.c0.c2;
    Fp2c z2 = f.c1.c0, z1 = f.c1.c1, z5 = f.c1.c2;
    Fp2c t0, t1, t2, t3, a, b;

    fp4_sqr(t0, t1, z0, z1);
    // z0' = 3 t0 - 2 z0 ; z1' = 3 t1 + 2 z1
    fp2_sub(a, t0, z0); fp2_add(a, a, a); fp2_add(z0, a, t0);
    fp2_add(b, t1, z1); fp2_add(b, b, b); fp2_add(z1, b, t1);

    fp4_sqr(t0, t1, z2, z3);
    fp4_sqr(t2, t3, z4, z5);

    // z4' = 3 t0 - 2 z4 ; z5' = 3 t1 + 2 z5
    fp2_sub(a, t0, z4); fp2_add(a, a, a); fp2_add(z4, a, t0);
    fp2_add(b, t1, z5); fp2_add(b, b, b); fp2_add(z5, b, t1);

    // z2' = 3 xi t3 + 2 z2 ; z3' = 3 t2 - 2 z3
    Fp2c xt3; fp2_mul_xi(xt3, t3);
    fp2_add(a, xt3, z2); fp2_add(a, a, a); fp2_add(z2, a, xt3);
    fp2_sub(b, t2, z3); fp2_add(b, b, b); fp2_add(z3, b, t2);

    o.c0.c0 = z0; o.c0.c1 = z4; o.c0.c2 = z3;
    o.c1.c0 = z2; o.c1.c1 = z1; o.c1.c2 = z5;
}
static void fp12_inv(Fp12c &o, const Fp12c &a) {
    Fp6c t0, t1, v;
    fp6_sqr(t0, a.c0);
    fp6_sqr(t1, a.c1); fp6_mul_v(v, t1);
    fp6_sub(t0, t0, v);
    fp6_inv(t0, t0);
    fp6_mul(o.c0, a.c0, t0);
    Fp6c n; fp6_mul(n, a.c1, t0); fp6_neg(o.c1, n);
}
static void fp12_conj(Fp12c &o, const Fp12c &a) {
    o.c0 = a.c0; fp6_neg(o.c1, a.c1);
}

// Frobenius constants (Montgomery form), injected by pairing_init:
// v^p = FROB_V * v, v^2p = FROB_V2 * v^2 (coefficients after fp2 conj),
// w-parts additionally scaled by FROB_W.
static Fp2c FROB_W, FROB_V, FROB_V2, FROB_VW, FROB_V2W;
static std::vector<u8> HARD_EXP;  // little-endian bytes of (p^4 - p^2 + 1)/r
static bool PAIRING_READY = false;

static inline void fp2_frob(Fp2c &o, const Fp2c &a) {  // conj: u -> -u
    o.c0 = a.c0; fp_neg(o.c1, a.c1);
}
static void fp12_frob(Fp12c &o, const Fp12c &a) {
    Fp2c t;
    Fp12c r;
    fp2_frob(r.c0.c0, a.c0.c0);
    fp2_frob(t, a.c0.c1); fp2_mul(r.c0.c1, t, FROB_V);
    fp2_frob(t, a.c0.c2); fp2_mul(r.c0.c2, t, FROB_V2);
    fp2_frob(t, a.c1.c0); fp2_mul(r.c1.c0, t, FROB_W);
    fp2_frob(t, a.c1.c1); fp2_mul(r.c1.c1, t, FROB_VW);
    fp2_frob(t, a.c1.c2); fp2_mul(r.c1.c2, t, FROB_V2W);
    o = r;
}

// pow for CYCLOTOMIC-subgroup bases (the hard part of the final
// exponentiation): Granger–Scott squarings, which only hold in the subgroup.
static void fp12_pow_le_cyc(Fp12c &o, const Fp12c &a, const u8 *exp, long len) {
    Fp12c acc; fp12_one(acc);
    long top = -1;
    for (long i = len - 1; i >= 0 && top < 0; i--)
        if (exp[i]) for (int b = 7; b >= 0; b--)
            if ((exp[i] >> b) & 1) { top = 8 * i + b; break; }
    for (long i = top; i >= 0; i--) {
        fp12_cyclotomic_sqr(acc, acc);
        if ((exp[i / 8] >> (i % 8)) & 1) fp12_mul(acc, acc, a);
    }
    o = acc;
}

// untwist constants w^-2, w^-3 (computed at init from w^2 = v)
static Fp12c W2_INV, W3_INV;

static void pairing_local_init() {
    // w = (0, 1_Fp6): w^2 = v, w^3 = v*w
    Fp12c w; fp6_zero(w.c0); fp6_one(w.c1);
    Fp12c w2, w3;
    fp12_mul(w2, w, w); fp12_mul(w3, w2, w);
    fp12_inv(W2_INV, w2); fp12_inv(W3_INV, w3);
}

// sparse embed: Fp2 -> Fp12 (slot c0.c0)
static void fp2_to_fp12c(Fp12c &o, const Fp2c &a) {
    fp6_zero(o.c0); fp6_zero(o.c1); o.c0.c0 = a;
}

// affine point pair in Fp12 coordinates (untwisted G2 / embedded G1)
struct Pt12 { Fp12c x, y; };

// line through t and q evaluated at (px, py); updates t <- t + q.
// mirror of bls12_381.py _line; `dbl` selects tangent vs chord.
static void line_eval(Fp12c &val, Pt12 &t, const Pt12 &q, bool dbl,
                      const Fp12c &px, const Fp12c &py) {
    Fp12c lam, num, den;
    if (dbl) {
        // lam = 3 x^2 / (2 y)
        Fp12c x2; fp12_sqr(x2, t.x);
        Fp12c three_x2, two_y;
        fp6_add(three_x2.c0, x2.c0, x2.c0); fp6_add(three_x2.c0, three_x2.c0, x2.c0);
        fp6_add(three_x2.c1, x2.c1, x2.c1); fp6_add(three_x2.c1, three_x2.c1, x2.c1);
        fp6_add(two_y.c0, t.y.c0, t.y.c0);
        fp6_add(two_y.c1, t.y.c1, t.y.c1);
        fp12_inv(den, two_y);
        fp12_mul(lam, three_x2, den);
    } else {
        Fp12c dy, dx;
        fp6_sub(dy.c0, q.y.c0, t.y.c0); fp6_sub(dy.c1, q.y.c1, t.y.c1);
        fp6_sub(dx.c0, q.x.c0, t.x.c0); fp6_sub(dx.c1, q.x.c1, t.x.c1);
        fp12_inv(den, dx);
        fp12_mul(lam, dy, den);
    }
    // val = py - ty - lam*(px - tx)
    Fp12c pmx, l_pmx;
    fp6_sub(pmx.c0, px.c0, t.x.c0); fp6_sub(pmx.c1, px.c1, t.x.c1);
    fp12_mul(l_pmx, lam, pmx);
    fp6_sub(val.c0, py.c0, t.y.c0); fp6_sub(val.c1, py.c1, t.y.c1);
    fp6_sub(val.c0, val.c0, l_pmx.c0); fp6_sub(val.c1, val.c1, l_pmx.c1);
    // x3 = lam^2 - tx - qx ; y3 = lam (tx - x3) - ty
    Fp12c l2, x3, y3, txmx3;
    fp12_sqr(l2, lam);
    fp6_sub(x3.c0, l2.c0, t.x.c0); fp6_sub(x3.c1, l2.c1, t.x.c1);
    fp6_sub(x3.c0, x3.c0, q.x.c0); fp6_sub(x3.c1, x3.c1, q.x.c1);
    fp6_sub(txmx3.c0, t.x.c0, x3.c0); fp6_sub(txmx3.c1, t.x.c1, x3.c1);
    fp12_mul(y3, lam, txmx3);
    fp6_sub(y3.c0, y3.c0, t.y.c0); fp6_sub(y3.c1, y3.c1, t.y.c1);
    t.x = x3; t.y = y3;
}

// |BLS_X| = 0xd201000000010000, x < 0 (bls12_381 curve parameter)
static const u64 BLS_X_ABS = 0xd201000000010000ULL;

// ---------------------------------------------------------------------------
// Sparse-line Miller loop: G2 steps in homogeneous-Jacobian coordinates
// producing (c0, c1, c4) line coefficients (Costello–Lange–Naehrig,
// eprint 2010/354 Alg. 26/27), applied to f with the sparse mul_by_014 —
// no per-line Fp12 inversions and ~6x fewer Fp multiplications than the
// affine untwist path (miller_loop_c, kept as the in-tree oracle).
// ---------------------------------------------------------------------------

// Fp6 sparse: self * (c0 + c1 v)
static void fp6_mul_by_01(Fp6c &o, const Fp6c &a, const Fp2c &c0,
                          const Fp2c &c1) {
    Fp2c aa, bb, t1, t2, t3, s, x;
    fp2_mul(aa, a.c0, c0);
    fp2_mul(bb, a.c1, c1);
    fp2_add(s, a.c1, a.c2); fp2_mul(t1, s, c1); fp2_sub(t1, t1, bb);
    fp2_mul_xi(x, t1); fp2_add(t1, x, aa);
    fp2_add(s, c0, c1);
    Fp2c s2; fp2_add(s2, a.c0, a.c1);
    fp2_mul(t2, s, s2); fp2_sub(t2, t2, aa); fp2_sub(t2, t2, bb);
    fp2_add(s, a.c0, a.c2); fp2_mul(t3, s, c0); fp2_sub(t3, t3, aa);
    fp2_add(t3, t3, bb);
    o.c0 = t1; o.c1 = t2; o.c2 = t3;
}

// Fp6 sparse: self * (c1 v)
static void fp6_mul_by_1(Fp6c &o, const Fp6c &a, const Fp2c &c1) {
    Fp2c t, x;
    fp2_mul(t, a.c2, c1); fp2_mul_xi(x, t);
    Fp2c m1, m2;
    fp2_mul(m1, a.c0, c1);
    fp2_mul(m2, a.c1, c1);
    o.c0 = x; o.c1 = m1; o.c2 = m2;
}

// f * sparse[(c0, c1, 0), (0, c4, 0)]  (slots: c0 at c0.c0, c1 at c0.c1,
// c4 at c1.c1)
static void fp12_mul_by_014(Fp12c &f, const Fp2c &c0, const Fp2c &c1,
                            const Fp2c &c4) {
    Fp6c aa, bb, t, sum;
    fp6_mul_by_01(aa, f.c0, c0, c1);
    fp6_mul_by_1(bb, f.c1, c4);
    Fp2c o14; fp2_add(o14, c1, c4);
    fp6_add(sum, f.c1, f.c0);
    fp6_mul_by_01(t, sum, c0, o14);
    fp6_sub(t, t, aa); fp6_sub(t, t, bb);
    Fp6c vb; fp6_mul_v(vb, bb);
    fp6_add(f.c0, vb, aa);
    f.c1 = t;
}

// Fp6 sparse: self * (b v + c v^2)
static void fp6_mul_by_12(Fp6c &o, const Fp6c &a, const Fp2c &b,
                          const Fp2c &c) {
    // (f0 + f1 v + f2 v^2)(b v + c v^2)
    //   = xi(f1 c + f2 b) + (f0 b + xi f2 c) v + (f0 c + f1 b) v^2
    Fp2c f0b, f0c, f1b, f1c, f2b, f2c, t, x;
    fp2_mul(f0b, a.c0, b); fp2_mul(f0c, a.c0, c);
    fp2_mul(f1b, a.c1, b); fp2_mul(f1c, a.c1, c);
    fp2_mul(f2b, a.c2, b); fp2_mul(f2c, a.c2, c);
    fp2_add(t, f1c, f2b); fp2_mul_xi(o.c0, t);
    fp2_mul_xi(x, f2c); fp2_add(o.c1, f0b, x);
    fp2_add(o.c2, f0c, f1b);
}

// f * sparse line for THIS tower's untwist psi(x,y) = (x w^-2, y w^-3):
// slots s0 at c0.c0 (1), s3 at c1.c1 (w^3), s5 at c1.c2 (w^5).
// S = A + B w with A = (s0, 0, 0), B = (0, s3, s5).
static void fp12_mul_by_035(Fp12c &f, const Fp2c &s0, const Fp2c &s3,
                            const Fp2c &s5) {
    Fp6c aa, bb, t, sum;
    fp6_mul_fp2(aa, f.c0, s0);          // F0 * A
    fp6_mul_by_12(bb, f.c1, s3, s5);    // F1 * B
    // c1' = (F0 + F1)(A + B) - aa - bb  with A+B = (s0, s3, s5) sparse-dense
    Fp6c ab; ab.c0 = s0; ab.c1 = s3; ab.c2 = s5;
    fp6_add(sum, f.c0, f.c1);
    fp6_mul(t, sum, ab);
    fp6_sub(t, t, aa); fp6_sub(t, t, bb);
    Fp6c vb; fp6_mul_v(vb, bb);
    fp6_add(f.c0, aa, vb);
    f.c1 = t;
}

struct G2Proj { Fp2c x, y, z; };

// Alg. 26: doubling step; updates r, emits line coeffs (c0, c1, c4)
static void g2_doubling_step(G2Proj &r, Fp2c &c0, Fp2c &c1, Fp2c &c4) {
    Fp2c tmp0, tmp1, tmp2, tmp3, tmp4, tmp5, tmp6, zsq, t;
    fp2_sqr(tmp0, r.x);
    fp2_sqr(tmp1, r.y);
    fp2_sqr(tmp2, tmp1);
    fp2_add(t, tmp1, r.x); fp2_sqr(tmp3, t);
    fp2_sub(tmp3, tmp3, tmp0); fp2_sub(tmp3, tmp3, tmp2);
    fp2_add(tmp3, tmp3, tmp3);
    fp2_add(tmp4, tmp0, tmp0); fp2_add(tmp4, tmp4, tmp0);
    fp2_add(tmp6, r.x, tmp4);
    fp2_sqr(tmp5, tmp4);
    fp2_sqr(zsq, r.z);
    // x' = tmp5 - 2 tmp3
    fp2_sub(r.x, tmp5, tmp3); fp2_sub(r.x, r.x, tmp3);
    // z' = (z + y)^2 - tmp1 - zsq
    fp2_add(t, r.z, r.y); fp2_sqr(t, t);
    fp2_sub(t, t, tmp1); fp2_sub(r.z, t, zsq);
    // y' = (tmp3 - x') tmp4 - 8 tmp2
    fp2_sub(t, tmp3, r.x); fp2_mul(r.y, t, tmp4);
    Fp2c e8; fp2_add(e8, tmp2, tmp2); fp2_add(e8, e8, e8); fp2_add(e8, e8, e8);
    fp2_sub(r.y, r.y, e8);
    // c1 = -2 (tmp4 zsq) ; c4 = tmp6^2 - tmp0 - tmp5 - 4 tmp1 ; c0 = 2 z' zsq
    fp2_mul(t, tmp4, zsq); fp2_add(t, t, t); fp2_neg(c1, t);
    fp2_sqr(t, tmp6); fp2_sub(t, t, tmp0); fp2_sub(t, t, tmp5);
    Fp2c f4; fp2_add(f4, tmp1, tmp1); fp2_add(f4, f4, f4);
    fp2_sub(c4, t, f4);
    fp2_mul(t, r.z, zsq); fp2_add(c0, t, t);
}

// Alg. 27: mixed addition step with affine q; updates r, emits coeffs
static void g2_addition_step(G2Proj &r, const Fp2c &qx, const Fp2c &qy,
                             Fp2c &c0, Fp2c &c1, Fp2c &c4) {
    Fp2c zsq, ysq, t0, t1, t2, t3, t4, t5, t6, t7, t8, t9, t10, t;
    fp2_sqr(zsq, r.z);
    fp2_sqr(ysq, qy);
    fp2_mul(t0, zsq, qx);
    fp2_add(t, qy, r.z); fp2_sqr(t, t);
    fp2_sub(t, t, ysq); fp2_sub(t, t, zsq);
    fp2_mul(t1, t, zsq);
    fp2_sub(t2, t0, r.x);
    fp2_sqr(t3, t2);
    fp2_add(t4, t3, t3); fp2_add(t4, t4, t4);
    fp2_mul(t5, t4, t2);
    fp2_sub(t6, t1, r.y); fp2_sub(t6, t6, r.y);
    fp2_mul(t9, t6, qx);
    fp2_mul(t7, t4, r.x);
    // x' = t6^2 - t5 - 2 t7
    fp2_sqr(t, t6); fp2_sub(t, t, t5); fp2_sub(t, t, t7); fp2_sub(r.x, t, t7);
    // z' = (z + t2)^2 - zsq - t3
    fp2_add(t, r.z, t2); fp2_sqr(t, t);
    fp2_sub(t, t, zsq); fp2_sub(r.z, t, t3);
    fp2_add(t10, qy, r.z);
    // y' = (t7 - x') t6 - 2 y t5
    fp2_sub(t8, t7, r.x); fp2_mul(t8, t8, t6);
    fp2_mul(t, r.y, t5); fp2_add(t, t, t);
    fp2_sub(r.y, t8, t);
    // coeffs
    fp2_sqr(t10, t10); fp2_sub(t10, t10, ysq);
    Fp2c ztsq; fp2_sqr(ztsq, r.z);
    fp2_sub(t10, t10, ztsq);
    fp2_add(t9, t9, t9); fp2_sub(t9, t9, t10);
    fp2_add(t10, r.z, r.z);
    fp2_neg(t6, t6);
    fp2_add(t1, t6, t6);
    c0 = t10; c1 = t1; c4 = t9;
}

// apply line: f *= xi*(c0*yP) + c4 w^3 + (c1*xP) w^5.
// Derivation (line through untwisted T, evaluated at embedded P, scaled by
// the subfield factor xi * 2YZ^3 which the final exponentiation kills):
//   val = yP - lam2 xP w^-1 + (lam2 x_T - y_T) w^-3,  lam2 in Fp2
//   val * xi = xi yP - lam2 xP w^5 + (lam2 x_T - y_T) w^3
// Alg. 26/27's (c0, c1, c4) are exactly (2x the) Jacobian-cleared versions
// of (1-slot/yP, w^5-slot/xP, w^3-slot).
static inline void ell(Fp12c &f, const Fp2c &c0, const Fp2c &c1,
                       const Fp2c &c4, const Fp &px, const Fp &py) {
    Fp2c s0, s5;
    fp_mul(s0.c0, c0.c0, py); fp_mul(s0.c1, c0.c1, py);
    fp2_mul_xi(s0, s0);
    fp_mul(s5.c0, c1.c0, px); fp_mul(s5.c1, c1.c1, px);
    fp12_mul_by_035(f, s0, c4, s5);
}

static void miller_loop_proj(Fp12c &f, const Fp &px, const Fp &py,
                             const Fp2c &qx, const Fp2c &qy) {
    G2Proj r;
    r.x = qx; r.y = qy; fp2_one(r.z);
    fp12_one(f);
    Fp2c c0, c1, c4;
    for (int i = 62; i >= 0; i--) {
        fp12_sqr(f, f);
        g2_doubling_step(r, c0, c1, c4);
        ell(f, c0, c1, c4, px, py);
        if ((BLS_X_ABS >> i) & 1) {
            g2_addition_step(r, qx, qy, c0, c1, c4);
            ell(f, c0, c1, c4, px, py);
        }
    }
    // x < 0: conjugate
    Fp12c c; fp12_conj(c, f); f = c;
}

static void miller_loop_c(Fp12c &f, const Fp &px, const Fp &py,
                          const Fp2c &qx, const Fp2c &qy) {
    // embed P, untwist Q
    Fp12c px12, py12, qx12, qy12;
    Fp2c t2;
    fp2_zero(t2); t2.c0 = px; fp2_to_fp12c(px12, t2);
    t2.c0 = py; fp2_to_fp12c(py12, t2);
    fp2_to_fp12c(qx12, qx); fp12_mul(qx12, qx12, W2_INV);
    fp2_to_fp12c(qy12, qy); fp12_mul(qy12, qy12, W3_INV);
    Pt12 q = {qx12, qy12};
    Pt12 t = q;
    fp12_one(f);
    int topbit = 63;
    while (!((BLS_X_ABS >> topbit) & 1)) topbit--;
    Fp12c val;
    for (int i = topbit - 1; i >= 0; i--) {
        fp12_sqr(f, f);
        line_eval(val, t, t, true, px12, py12);
        fp12_mul(f, f, val);
        if ((BLS_X_ABS >> i) & 1) {
            line_eval(val, t, q, false, px12, py12);
            fp12_mul(f, f, val);
        }
    }
    // x < 0: conjugate
    Fp12c c; fp12_conj(c, f); f = c;
}

static void final_exp_c(Fp12c &o, const Fp12c &f) {
    // easy: f^((p^6-1)(p^2+1))
    Fp12c c, inv, t, fr;
    fp12_conj(c, f);
    fp12_inv(inv, f);
    fp12_mul(t, c, inv);
    fp12_frob(fr, t); fp12_frob(fr, fr);
    fp12_mul(t, fr, t);
    // hard: ^((p^4 - p^2 + 1)/r); t is cyclotomic after the easy part
    fp12_pow_le_cyc(o, t, HARD_EXP.data(), (long)HARD_EXP.size());
}

// g^x for cyclotomic g, x = -|BLS_X| (negative): conj(g^|x|) with
// Granger–Scott squarings.  |x| has 6 set bits: 63 cyc-sqrs + 5 muls.
static void fp12_pow_x(Fp12c &o, const Fp12c &g) {
    Fp12c acc = g;
    for (int i = 62; i >= 0; i--) {
        fp12_cyclotomic_sqr(acc, acc);
        if ((BLS_X_ABS >> i) & 1) fp12_mul(acc, acc, g);
    }
    fp12_conj(o, acc);
}

// final_exponentiation(f)^3 — the Hayashida–Hayasaka–Teruya hard-part
// decomposition 3*(p^4-p^2+1)/r = (x-1)^2 (x+p) (x^2+p^2-1) + 3, verified
// against the integer exponent in tests.  The cube preserves the ==1 check
// (gcd(3, r) = 1), which is the only question the verifier asks; callers
// needing the canonical GT value use final_exp_c.
static void final_exp_cubed(Fp12c &o, const Fp12c &f) {
    Fp12c c, inv, t, fr, u, a, b, res, t3;
    fp12_conj(c, f);
    fp12_inv(inv, f);
    fp12_mul(t, c, inv);
    fp12_frob(fr, t); fp12_frob(fr, fr);
    fp12_mul(t, fr, t);                        // easy part; t cyclotomic
    // u = t^(x-1) = t^x * conj(t)
    fp12_pow_x(u, t);
    fp12_conj(c, t); fp12_mul(u, u, c);
    // a = u^(x-1)
    fp12_pow_x(a, u);
    fp12_conj(c, u); fp12_mul(a, a, c);
    // b = a^(x+p) = a^x * frob(a)
    fp12_pow_x(b, a);
    fp12_frob(fr, a); fp12_mul(b, b, fr);
    // res = b^(x^2 + p^2 - 1) = (b^x)^x * frob^2(b) * conj(b)
    fp12_pow_x(c, b); fp12_pow_x(res, c);
    fp12_frob(fr, b); fp12_frob(fr, fr); fp12_mul(res, res, fr);
    fp12_conj(c, b); fp12_mul(res, res, c);
    // * t^3
    fp12_cyclotomic_sqr(t3, t); fp12_mul(t3, t3, t);
    fp12_mul(o, res, t3);
}

extern "C" {

// One-time constants: five Fp2 Frobenius twist coefficients (canonical
// little-endian 96 bytes each: c0||c1) + the hard-part exponent bytes (LE).
void pairing_init(const u8 *frob_w, const u8 *frob_v, const u8 *frob_v2,
                  const u8 *frob_vw, const u8 *frob_v2w,
                  const u8 *hard_exp, long hard_exp_len) {
    auto load2 = [](Fp2c &o, const u8 *b) {
        Fp t;
        bytes_to_fp_canon(t, b); fp_to_mont(o.c0, t);
        bytes_to_fp_canon(t, b + 48); fp_to_mont(o.c1, t);
    };
    load2(FROB_W, frob_w); load2(FROB_V, frob_v); load2(FROB_V2, frob_v2);
    load2(FROB_VW, frob_vw); load2(FROB_V2W, frob_v2w);
    HARD_EXP.assign(hard_exp, hard_exp + hard_exp_len);
    pairing_local_init();
    PAIRING_READY = true;
}

// prod_i e(P_i, Q_i) == 1?  g1s: k x 96 bytes (x||y, 48B LE canonical each);
// g2s: k x 192 bytes (x.c0||x.c1||y.c0||y.c1).  Points must be affine
// non-identity (the caller filters infinities — they contribute the unit).
// Returns 1 (yes), 0 (no), -1 (pairing_init not called).
int pairing_check(const u8 *g1s, const u8 *g2s, long k) {
    if (!PAIRING_READY) return -1;
    Fp12c f, m;
    fp12_one(f);
    for (long i = 0; i < k; i++) {
        Fp px, py, t;
        bytes_to_fp_canon(t, g1s + 96 * i); fp_to_mont(px, t);
        bytes_to_fp_canon(t, g1s + 96 * i + 48); fp_to_mont(py, t);
        Fp2c qx, qy;
        bytes_to_fp_canon(t, g2s + 192 * i); fp_to_mont(qx.c0, t);
        bytes_to_fp_canon(t, g2s + 192 * i + 48); fp_to_mont(qx.c1, t);
        bytes_to_fp_canon(t, g2s + 192 * i + 96); fp_to_mont(qy.c0, t);
        bytes_to_fp_canon(t, g2s + 192 * i + 144); fp_to_mont(qy.c1, t);
        miller_loop_proj(m, px, py, qx, qy);
        fp12_mul(f, f, m);
    }
    Fp12c r;
    final_exp_cubed(r, f);
    return fp12_is_one(r) ? 1 : 0;
}

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
