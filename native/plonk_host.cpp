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

// [0..5] = p limbs, [6] = -p^-1 mod 2^64: the ADX asm path indexes this
// through one pointer operand to stay under the asm-operand limit.
static const u64 FP_MOD_ADX[8] = {
    0xb9feffffffffaaabULL, 0x1eabfffeb153ffffULL, 0x6730d2a0f6b0f624ULL,
    0x64774b84f38512bfULL, 0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL,
    0x89f3fffcfffcfffdULL, 0,  // [6] = -p^-1 mod 2^64 (imul operand)
};
static const u64 *FP_MOD = FP_MOD_ADX;
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

// CIOS Montgomery multiplication (portable path; also the fuzz oracle for
// the ADX path in tests/test_native.py)
static void fp_mul_portable(Fp &out, const Fp &a, const Fp &b) {
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

#if defined(__ADX__) && defined(__BMI2__)
// "No-carry" CIOS round with mulx + dual adcx/adox carry chains (valid since
// p's top word 0x1a0111ea397fe69a < 2^62, so the per-round carries fold into
// one extra limb without overflow — the gnark/blst no-carry condition).
// After each round the limb window rotates: (t0..t5) <- (t1..t5, cm).
// ~2x faster than the u128 CIOS on this host (78ns vs 153ns per mul).
#define FP_ADX_ROUND(T0, T1, T2, T3, T4, T5, CM, BI)                           \
  asm("movq %[bi], %%rdx\n\t"                                                  \
      "xorl %k[lo], %k[lo]\n\t"          /* clear CF/OF */                     \
      "mulxq 0(%[ap]), %[lo], %[hA]\n\t"                                       \
      "adoxq %[lo], %[t0]\n\t"                                                 \
      "mulxq 8(%[ap]), %[lo], %[hB]\n\t"                                       \
      "adoxq %[lo], %[t1]\n\t"                                                 \
      "adcxq %[hA], %[t1]\n\t"                                                 \
      "mulxq 16(%[ap]), %[lo], %[hA]\n\t"                                      \
      "adoxq %[lo], %[t2]\n\t"                                                 \
      "adcxq %[hB], %[t2]\n\t"                                                 \
      "mulxq 24(%[ap]), %[lo], %[hB]\n\t"                                      \
      "adoxq %[lo], %[t3]\n\t"                                                 \
      "adcxq %[hA], %[t3]\n\t"                                                 \
      "mulxq 32(%[ap]), %[lo], %[hA]\n\t"                                      \
      "adoxq %[lo], %[t4]\n\t"                                                 \
      "adcxq %[hB], %[t4]\n\t"                                                 \
      "mulxq 40(%[ap]), %[lo], %[cm]\n\t"                                      \
      "adoxq %[lo], %[t5]\n\t"                                                 \
      "movl $0, %k[lo]\n\t"              /* zero WITHOUT touching flags */     \
      "adcxq %[hA], %[t5]\n\t"                                                 \
      "adoxq %[lo], %[cm]\n\t"                                                 \
      "adcxq %[lo], %[cm]\n\t"                                                 \
      "movq %[t0], %%rdx\n\t"                                                  \
      "imulq 48(%[mp]), %%rdx\n\t"       /* m = t0 * (-p^-1) */                \
      "xorl %k[lo], %k[lo]\n\t"                                                \
      "mulxq 0(%[mp]), %[lo], %[hA]\n\t"                            \
      "adoxq %[lo], %[t0]\n\t"           /* t0 dies; carry out via OF */       \
      "mulxq 8(%[mp]), %[lo], %[hB]\n\t"                            \
      "adoxq %[lo], %[t1]\n\t"                                                 \
      "adcxq %[hA], %[t1]\n\t"                                                 \
      "mulxq 16(%[mp]), %[lo], %[hA]\n\t"                           \
      "adoxq %[lo], %[t2]\n\t"                                                 \
      "adcxq %[hB], %[t2]\n\t"                                                 \
      "mulxq 24(%[mp]), %[lo], %[hB]\n\t"                           \
      "adoxq %[lo], %[t3]\n\t"                                                 \
      "adcxq %[hA], %[t3]\n\t"                                                 \
      "mulxq 32(%[mp]), %[lo], %[hA]\n\t"                           \
      "adoxq %[lo], %[t4]\n\t"                                                 \
      "adcxq %[hB], %[t4]\n\t"                                                 \
      "mulxq 40(%[mp]), %[lo], %[hB]\n\t"                           \
      "adoxq %[lo], %[t5]\n\t"                                                 \
      "movl $0, %k[lo]\n\t"                                                    \
      "adcxq %[hA], %[t5]\n\t"                                                 \
      "adoxq %[hB], %[cm]\n\t"                                                 \
      "adcxq %[lo], %[cm]\n\t"                                                 \
      : [t0] "+&r"(T0), [t1] "+&r"(T1), [t2] "+&r"(T2), [t3] "+&r"(T3),        \
        [t4] "+&r"(T4), [t5] "+&r"(T5), [cm] "=&r"(CM),                        \
        [lo] "=&r"(s_lo), [hA] "=&r"(s_hA), [hB] "=&r"(s_hB)                   \
      : [bi] "m"(BI), [ap] "r"(a.l), [mp] "r"(FP_MOD_ADX),                     \
        "m"(*(const u64(*)[6])a.l)     /* the asm READS *ap */                 \
      : "rdx", "cc")

static inline void fp_mul(Fp &out, const Fp &a, const Fp &b) {
    u64 t0 = 0, t1 = 0, t2 = 0, t3 = 0, t4 = 0, t5 = 0, cm;
    u64 s_lo, s_hA, s_hB;
    FP_ADX_ROUND(t0, t1, t2, t3, t4, t5, cm, b.l[0]);
    FP_ADX_ROUND(t1, t2, t3, t4, t5, cm, t0, b.l[1]);
    FP_ADX_ROUND(t2, t3, t4, t5, cm, t0, t1, b.l[2]);
    FP_ADX_ROUND(t3, t4, t5, cm, t0, t1, t2, b.l[3]);
    FP_ADX_ROUND(t4, t5, cm, t0, t1, t2, t3, b.l[4]);
    FP_ADX_ROUND(t5, cm, t0, t1, t2, t3, t4, b.l[5]);
    out.l[0] = cm; out.l[1] = t0; out.l[2] = t1;
    out.l[3] = t2; out.l[4] = t3; out.l[5] = t4;
    fp_cond_sub_p(out);
}
#else
static inline void fp_mul(Fp &out, const Fp &a, const Fp &b) {
    fp_mul_portable(out, a, b);
}
#endif

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

// Multi-pair Miller loop: ONE shared f (and its 64 fp12_sqr) with every
// pair's line functions folded in per iteration — the standard
// multi_miller_loop trick (the reference consumes dusk-bls12_381's version
// at src/proof_system/proof.rs:461-489).  Halves the 2-pairing cost vs
// running miller_loop_proj per pair.
static void multi_miller_proj(Fp12c &f, const Fp *px, const Fp *py,
                              const Fp2c *qx, const Fp2c *qy, long k) {
    std::vector<G2Proj> r((size_t)k);
    for (long j = 0; j < k; j++) {
        r[j].x = qx[j]; r[j].y = qy[j]; fp2_one(r[j].z);
    }
    fp12_one(f);
    Fp2c c0, c1, c4;
    for (int i = 62; i >= 0; i--) {
        fp12_sqr(f, f);
        for (long j = 0; j < k; j++) {
            g2_doubling_step(r[j], c0, c1, c4);
            ell(f, c0, c1, c4, px[j], py[j]);
        }
        if ((BLS_X_ABS >> i) & 1) {
            for (long j = 0; j < k; j++) {
                g2_addition_step(r[j], qx[j], qy[j], c0, c1, c4);
                ell(f, c0, c1, c4, px[j], py[j]);
            }
        }
    }
    Fp12c c; fp12_conj(c, f); f = c;
}

// Prepared G2: all Miller-loop line coefficients of a FIXED G2 point,
// computed once (the verifier's h and x*h never change per opening key).
// Each verify then skips every g2_doubling_step/g2_addition_step — only the
// shared fp12_sqr chain and the sparse line multiplications remain.
static void g2_prepare_lines(std::vector<Fp2c> &out, const Fp2c &qx,
                             const Fp2c &qy) {
    out.clear();
    out.reserve(3 * 70);
    G2Proj r;
    r.x = qx; r.y = qy; fp2_one(r.z);
    Fp2c c0, c1, c4;
    for (int i = 62; i >= 0; i--) {
        g2_doubling_step(r, c0, c1, c4);
        out.push_back(c0); out.push_back(c1); out.push_back(c4);
        if ((BLS_X_ABS >> i) & 1) {
            g2_addition_step(r, qx, qy, c0, c1, c4);
            out.push_back(c0); out.push_back(c1); out.push_back(c4);
        }
    }
}

// multi_miller_proj with prepared line coefficients (same loop order).
static void multi_miller_lines(Fp12c &f, const Fp *px, const Fp *py,
                               const std::vector<Fp2c> *const *lines,
                               long k) {
    fp12_one(f);
    size_t pos = 0;
    for (int i = 62; i >= 0; i--) {
        fp12_sqr(f, f);
        for (long j = 0; j < k; j++) {
            const Fp2c *c = lines[j]->data() + pos;
            ell(f, c[0], c[1], c[2], px[j], py[j]);
        }
        pos += 3;
        if ((BLS_X_ABS >> i) & 1) {
            for (long j = 0; j < k; j++) {
                const Fp2c *c = lines[j]->data() + pos;
                ell(f, c[0], c[1], c[2], px[j], py[j]);
            }
            pos += 3;
        }
    }
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

// ===========================================================================
// Native verifier (reference src/proof_system/proof.rs:218-489 end-to-end):
// Fr scalar field, STROBE-128/Merlin transcript replay, widget scalars,
// Straus wNAF MSM over Jacobian coordinates, and the 2-pairing check.
// Python (plonk_tpu/proof_system/proof.py) keeps the oracle implementation
// behind PLONK_NO_NATIVE=1.
// ===========================================================================

// -- Fr: BLS12-381 scalar field, 4 x u64 Montgomery (R = 2^256) --------------

static const u64 FR_MOD[4] = {
    0xffffffff00000001ULL, 0x53bda402fffe5bfeULL,
    0x3339d80809a1d805ULL, 0x73eda753299d7d48ULL,
};
static const u64 FR_INVC = 0xfffffffeffffffffULL;  // -r^-1 mod 2^64
static const u64 FR_R2C[4] = {
    0xc999e990f3f29c6dULL, 0x2b6cedcb87925c23ULL,
    0x05d314967254398fULL, 0x0748d9d99f59ff11ULL,
};
static const u64 FR_ONEC[4] = {
    0x00000001fffffffeULL, 0x5884b7fa00034802ULL,
    0x998c4fefecbc4ff5ULL, 0x1824b159acc5056fULL,
};
// Jubjub EDWARDS_D as an Fr element, canonical
static const u64 JUBJUB_D_C[4] = {
    0x01065fd6d6343eb1ULL, 0x292d7f6d37579d26ULL,
    0xf5fd9207e6bd7fd4ULL, 0x2a9318e74bfa2b48ULL,
};

struct Fr { u64 l[4]; };

static inline bool fr_is_zero(const Fr &a) {
    return (a.l[0] | a.l[1] | a.l[2] | a.l[3]) == 0;
}
static inline void fr_cond_sub(Fr &a) {
    u64 t[4]; u64 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a.l[i] - FR_MOD[i] - borrow;
        t[i] = (u64)d;
        borrow = (u64)((d >> 64) & 1);
    }
    if (!borrow) memcpy(a.l, t, sizeof(t));
}
static inline void fr_add(Fr &o, const Fr &a, const Fr &b) {
    u64 carry = 0;
    for (int i = 0; i < 4; i++) {
        u128 s = (u128)a.l[i] + b.l[i] + carry;
        o.l[i] = (u64)s; carry = (u64)(s >> 64);
    }
    fr_cond_sub(o);
}
static inline void fr_sub(Fr &o, const Fr &a, const Fr &b) {
    u64 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a.l[i] - b.l[i] - borrow;
        o.l[i] = (u64)d; borrow = (u64)((d >> 64) & 1);
    }
    if (borrow) {
        u64 carry = 0;
        for (int i = 0; i < 4; i++) {
            u128 s = (u128)o.l[i] + FR_MOD[i] + carry;
            o.l[i] = (u64)s; carry = (u64)(s >> 64);
        }
    }
}
static inline void fr_neg(Fr &o, const Fr &a) {
    if (fr_is_zero(a)) { o = a; return; }
    u64 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)FR_MOD[i] - a.l[i] - borrow;
        o.l[i] = (u64)d; borrow = (u64)((d >> 64) & 1);
    }
}
// Full CIOS (keeps the extra limbs: inputs may be any 256-bit value, which
// the 64-byte wide challenge reduction needs)
static void fr_mul(Fr &out, const Fr &a, const Fr &b) {
    u64 t[6] = {0};
    for (int i = 0; i < 4; i++) {
        u64 carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 s = (u128)a.l[j] * b.l[i] + t[j] + carry;
            t[j] = (u64)s; carry = (u64)(s >> 64);
        }
        u128 s = (u128)t[4] + carry;
        t[4] = (u64)s; t[5] = (u64)(s >> 64);
        u64 m = t[0] * FR_INVC;
        u128 c = (u128)m * FR_MOD[0] + t[0];
        carry = (u64)(c >> 64);
        for (int j = 1; j < 4; j++) {
            c = (u128)m * FR_MOD[j] + t[j] + carry;
            t[j - 1] = (u64)c; carry = (u64)(c >> 64);
        }
        c = (u128)t[4] + carry;
        t[3] = (u64)c;
        t[4] = t[5] + (u64)(c >> 64);
        t[5] = 0;
    }
    memcpy(out.l, t, 4 * sizeof(u64));
    fr_cond_sub(out);
}
static inline void fr_sqr(Fr &o, const Fr &a) { fr_mul(o, a, a); }
static void fr_inv(Fr &o, const Fr &a) {
    // Fermat a^(r-2); r-2 = FR_MOD with l0 -= 2
    u64 e[4]; memcpy(e, FR_MOD, sizeof(e)); e[0] -= 2;
    Fr acc; memcpy(acc.l, FR_ONEC, sizeof(FR_ONEC));
    for (int i = 254; i >= 0; i--) {
        fr_sqr(acc, acc);
        if ((e[i / 64] >> (i % 64)) & 1) fr_mul(acc, acc, a);
    }
    o = acc;
}
static inline void fr_to_mont(Fr &o, const Fr &canon) {
    Fr r2; memcpy(r2.l, FR_R2C, sizeof(FR_R2C));
    fr_mul(o, canon, r2);
}
static inline void fr_from_mont(Fr &o, const Fr &m) {
    Fr one; memset(one.l, 0, sizeof(one.l)); one.l[0] = 1;
    fr_mul(o, m, one);
}
static inline void fr_from_bytes32(Fr &o, const u8 *b) {  // canonical LE -> Montgomery
    Fr c;
    for (int w = 0; w < 4; w++) {
        u64 v = 0;
        for (int k = 7; k >= 0; k--) v = (v << 8) | b[8 * w + k];
        c.l[w] = v;
    }
    fr_to_mont(o, c);
}
static inline void fr_to_bytes32(u8 *b, const Fr &m) {
    Fr c; fr_from_mont(c, m);
    for (int w = 0; w < 4; w++)
        for (int k = 0; k < 8; k++) b[8 * w + k] = (u8)(c.l[w] >> (8 * k));
}
static inline void fr_from_u64(Fr &o, u64 v) {
    Fr c; memset(c.l, 0, sizeof(c.l)); c.l[0] = v;
    fr_to_mont(o, c);
}
// 64-byte little-endian wide reduction (BlsScalar::from_bytes_wide):
// mont(lo + hi*2^256) = mul_m(lo, R2) + mul_m(hi, R3)
static void fr_from_bytes_wide(Fr &o, const u8 *b64) {
    Fr lo, hi;
    for (int w = 0; w < 4; w++) {
        u64 v = 0, v2 = 0;
        for (int k = 7; k >= 0; k--) {
            v = (v << 8) | b64[8 * w + k];
            v2 = (v2 << 8) | b64[32 + 8 * w + k];
        }
        lo.l[w] = v; hi.l[w] = v2;
    }
    Fr r2, r3;
    memcpy(r2.l, FR_R2C, sizeof(FR_R2C));
    fr_mul(r3, r2, r2);   // R3 = R2*R2/R = R^3
    Fr a, c;
    fr_mul(a, lo, r2);
    fr_mul(c, hi, r3);
    fr_add(o, a, c);
}

// -- Keccak-f[1600] + STROBE-128 + Merlin (byte-exact mirror of
// plonk_tpu/transcript/{strobe,merlin}.py; upstream merlin crate vectors are
// pinned in tests/test_transcript.py) ---------------------------------------

static const u64 KECCAK_RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808AULL,
    0x8000000080008000ULL, 0x000000000000808BULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008AULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000AULL,
    0x000000008000808BULL, 0x800000000000008BULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800AULL, 0x800000008000000AULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL,
};
static const int KECCAK_ROT[5][5] = {
    {0, 36, 3, 41, 18}, {1, 44, 10, 45, 2}, {62, 6, 43, 15, 61},
    {28, 55, 25, 21, 56}, {27, 20, 39, 8, 14},
};
static inline u64 rotl64(u64 x, int n) {
    n &= 63; return n ? (x << n) | (x >> (64 - n)) : x;
}
static void keccak_f1600(u8 *state) {
    u64 lanes[5][5];
    for (int x = 0; x < 5; x++)
        for (int y = 0; y < 5; y++)
            memcpy(&lanes[x][y], state + 8 * (x + 5 * y), 8);
    for (int r = 0; r < 24; r++) {
        u64 c[5], d[5];
        for (int x = 0; x < 5; x++)
            c[x] = lanes[x][0] ^ lanes[x][1] ^ lanes[x][2] ^ lanes[x][3] ^ lanes[x][4];
        for (int x = 0; x < 5; x++)
            d[x] = c[(x + 4) % 5] ^ rotl64(c[(x + 1) % 5], 1);
        for (int x = 0; x < 5; x++)
            for (int y = 0; y < 5; y++) lanes[x][y] ^= d[x];
        u64 b[5][5];
        for (int x = 0; x < 5; x++)
            for (int y = 0; y < 5; y++)
                b[y][(2 * x + 3 * y) % 5] = rotl64(lanes[x][y], KECCAK_ROT[x][y]);
        for (int x = 0; x < 5; x++)
            for (int y = 0; y < 5; y++)
                lanes[x][y] = b[x][y] ^ (~b[(x + 1) % 5][y] & b[(x + 2) % 5][y]);
        lanes[0][0] ^= KECCAK_RC[r];
    }
    for (int x = 0; x < 5; x++)
        for (int y = 0; y < 5; y++)
            memcpy(state + 8 * (x + 5 * y), &lanes[x][y], 8);
}

static const int STROBE_R = 166;
enum { SF_I = 1, SF_A = 2, SF_C = 4, SF_M = 16 };

struct Strobe {
    u8 st[200];
    u8 pos, pos_begin, cur_flags;

    void run_f() {
        st[pos] ^= pos_begin;
        st[pos + 1] ^= 0x04;
        st[STROBE_R + 1] ^= 0x80;
        keccak_f1600(st);
        pos = 0; pos_begin = 0;
    }
    void absorb(const u8 *d, long n) {
        for (long i = 0; i < n; i++) {
            st[pos] ^= d[i];
            if (++pos == STROBE_R) run_f();
        }
    }
    void squeeze(u8 *out, long n) {
        for (long i = 0; i < n; i++) {
            out[i] = st[pos];
            st[pos] = 0;
            if (++pos == STROBE_R) run_f();
        }
    }
    void begin_op(u8 flags) {
        u8 old_begin = pos_begin;
        pos_begin = pos + 1;
        cur_flags = flags;
        u8 hdr[2] = {old_begin, flags};
        absorb(hdr, 2);
        if ((flags & SF_C) && pos != 0) run_f();
    }
    void meta_ad(const u8 *d, long n, bool more) {
        if (!more) begin_op(SF_M | SF_A);
        absorb(d, n);
    }
    void ad(const u8 *d, long n, bool more) {
        if (!more) begin_op(SF_A);
        absorb(d, n);
    }
    void prf(u8 *out, long n) {
        begin_op(SF_I | SF_A | SF_C);
        squeeze(out, n);
    }
    // merlin ops
    void append_message(const u8 *label, long ll, const u8 *msg, long ml) {
        meta_ad(label, ll, false);
        u8 len4[4] = {(u8)ml, (u8)(ml >> 8), (u8)(ml >> 16), (u8)(ml >> 24)};
        meta_ad(len4, 4, true);
        ad(msg, ml, false);
    }
    void challenge_bytes(const u8 *label, long ll, u8 *out, long n) {
        meta_ad(label, ll, false);
        u8 len4[4] = {(u8)n, (u8)(n >> 8), (u8)(n >> 16), (u8)(n >> 24)};
        meta_ad(len4, 4, true);
        prf(out, n);
    }
    void challenge_fr(const char *label, Fr &out) {
        u8 wide[64];
        challenge_bytes((const u8 *)label, (long)strlen(label), wide, 64);
        fr_from_bytes_wide(out, wide);
    }
    void append_fr_bytes(const char *label, const u8 *s32) {
        append_message((const u8 *)label, (long)strlen(label), s32, 32);
    }
    void append_fr(const char *label, const Fr &s) {
        u8 b[32]; fr_to_bytes32(b, s);
        append_fr_bytes(label, b);
    }
};

// -- G1 Jacobian (branchy, verification-only: inputs are public) -------------

struct G1j { Fp X, Y, Z; };  // Z == 0 <=> identity

static inline void g1j_identity(G1j &o) {
    memcpy(o.X.l, FP_ONE, sizeof(FP_ONE));
    memcpy(o.Y.l, FP_ONE, sizeof(FP_ONE));
    fp_zero(o.Z);
}
static inline bool g1j_is_identity(const G1j &p) { return fp_is_zero(p.Z); }

// dbl-2009-l (a = 0): 2M + 5S
static void g1j_double(G1j &o, const G1j &p) {
    if (g1j_is_identity(p)) { o = p; return; }
    Fp A, B, C, D, E, F, t, t2;
    fp_sqr(A, p.X);
    fp_sqr(B, p.Y);
    fp_sqr(C, B);
    fp_add(t, p.X, B); fp_sqr(t, t); fp_sub(t, t, A); fp_sub(t, t, C);
    fp_add(D, t, t);
    fp_add(E, A, A); fp_add(E, E, A);
    fp_sqr(F, E);
    fp_sub(o.X, F, D); fp_sub(o.X, o.X, D);
    fp_sub(t, D, o.X); fp_mul(t, E, t);
    fp_add(t2, C, C); fp_add(t2, t2, t2); fp_add(t2, t2, t2);
    fp_mul(o.Z, p.Y, p.Z); fp_add(o.Z, o.Z, o.Z);
    fp_sub(o.Y, t, t2);
}

// madd-2007-bl mixed add (Z2 = 1): 7M + 4S
static void g1j_add_affine(G1j &o, const G1j &p, const Fp &qx, const Fp &qy) {
    if (g1j_is_identity(p)) {
        o.X = qx; o.Y = qy;
        memcpy(o.Z.l, FP_ONE, sizeof(FP_ONE));
        return;
    }
    Fp Z1Z1, U2, S2, H, HH, I, J, r, V, t;
    fp_sqr(Z1Z1, p.Z);
    fp_mul(U2, qx, Z1Z1);
    fp_mul(S2, qy, p.Z); fp_mul(S2, S2, Z1Z1);
    fp_sub(H, U2, p.X);
    fp_sub(r, S2, p.Y);
    if (fp_is_zero(H)) {
        if (fp_is_zero(r)) { g1j_double(o, p); return; }
        g1j_identity(o); return;
    }
    fp_sqr(HH, H);
    fp_add(I, HH, HH); fp_add(I, I, I);
    fp_mul(J, H, I);
    fp_add(r, r, r);
    fp_mul(V, p.X, I);
    fp_sqr(t, r); fp_sub(t, t, J); fp_sub(t, t, V); fp_sub(o.X, t, V);
    fp_sub(t, V, o.X); fp_mul(t, r, t);
    Fp y1j; fp_mul(y1j, p.Y, J); fp_add(y1j, y1j, y1j);
    fp_sub(o.Y, t, y1j);
    fp_add(t, p.Z, H); fp_sqr(t, t); fp_sub(t, t, Z1Z1);
    fp_sub(o.Z, t, HH);
}

// general Jacobian add (table building): 11M + 5S
static void g1j_add(G1j &o, const G1j &p, const G1j &q) {
    if (g1j_is_identity(p)) { o = q; return; }
    if (g1j_is_identity(q)) { o = p; return; }
    Fp Z1Z1, Z2Z2, U1, U2, S1, S2, H, I, J, r, V, t;
    fp_sqr(Z1Z1, p.Z);
    fp_sqr(Z2Z2, q.Z);
    fp_mul(U1, p.X, Z2Z2);
    fp_mul(U2, q.X, Z1Z1);
    fp_mul(S1, p.Y, q.Z); fp_mul(S1, S1, Z2Z2);
    fp_mul(S2, q.Y, p.Z); fp_mul(S2, S2, Z1Z1);
    fp_sub(H, U2, U1);
    fp_sub(r, S2, S1);
    if (fp_is_zero(H)) {
        if (fp_is_zero(r)) { g1j_double(o, p); return; }
        g1j_identity(o); return;
    }
    Fp HH;
    fp_add(t, H, H); fp_sqr(I, t);
    fp_mul(J, H, I);
    fp_add(r, r, r);
    fp_mul(V, U1, I);
    fp_sqr(t, r); fp_sub(t, t, J); fp_sub(t, t, V); fp_sub(o.X, t, V);
    fp_sub(t, V, o.X); fp_mul(t, r, t);
    Fp s1j; fp_mul(s1j, S1, J); fp_add(s1j, s1j, s1j);
    fp_sub(o.Y, t, s1j);
    fp_mul(t, p.Z, q.Z); fp_mul(t, t, H); fp_add(o.Z, t, t);
    (void)HH;
}

// batch Jacobian -> affine via one inversion (Montgomery trick)
static void g1j_batch_affine(const G1j *pts, long n, Fp *ax, Fp *ay, u8 *inf) {
    std::vector<Fp> pref((size_t)n);
    Fp run; memcpy(run.l, FP_ONE, sizeof(FP_ONE));
    for (long i = 0; i < n; i++) {
        if (!fp_is_zero(pts[i].Z)) fp_mul(run, run, pts[i].Z);
        pref[i] = run;
    }
    Fp inv_run; fp_inv(inv_run, run);
    for (long i = n - 1; i >= 0; i--) {
        inf[i] = fp_is_zero(pts[i].Z) ? 1 : 0;
        if (inf[i]) { fp_zero(ax[i]); fp_zero(ay[i]); continue; }
        Fp zinv;
        if (i == 0) zinv = inv_run;
        else fp_mul(zinv, inv_run, pref[i - 1]);
        fp_mul(inv_run, inv_run, pts[i].Z);
        Fp zi2, zi3;
        fp_sqr(zi2, zinv);
        fp_mul(zi3, zi2, zinv);
        fp_mul(ax[i], pts[i].X, zi2);
        fp_mul(ay[i], pts[i].Y, zi3);
    }
}

// wNAF-5 recode of a canonical 256-bit scalar: digits in {0, ±1, ±3, .. ±15},
// digits[i] is the signed digit consumed at bit position i.
static int wnaf5(const u64 *sc, signed char *digits) {
    u64 k[5] = {sc[0], sc[1], sc[2], sc[3], 0};
    int top = -1;
    long i = 0;
    auto is_zero = [&k]() { return (k[0] | k[1] | k[2] | k[3] | k[4]) == 0; };
    auto shr1 = [&k]() {
        for (int j = 0; j < 4; j++) k[j] = (k[j] >> 1) | (k[j + 1] << 63);
        k[4] >>= 1;
    };
    memset(digits, 0, 260);
    while (!is_zero()) {
        if (k[0] & 1) {
            int d = (int)(k[0] & 31);
            if (d > 16) d -= 32;
            digits[i] = (signed char)d;
            // k -= d
            if (d > 0) {
                u64 borrow = (u64)d;
                for (int j = 0; j < 5 && borrow; j++) {
                    u64 nb = k[j] < borrow;
                    k[j] -= borrow; borrow = nb;
                }
            } else {
                u64 carry = (u64)(-d);
                for (int j = 0; j < 5 && carry; j++) {
                    u64 s = k[j] + carry;
                    carry = s < k[j]; k[j] = s;
                }
            }
            top = (int)i;
        }
        shr1();
        i++;
        if (i >= 260) break;
    }
    return top;
}

// Straus interleaved MSM: points as canonical affine bytes (+inf flags),
// scalars in Montgomery form.  Result in Jacobian.
// Precomputed odd-multiple affine tables (1P, 3P, ..., 15P) for a point set.
// Built once per fixed point set (the verifier's 15 vk commitments + g) and
// reused across verifies — table construction was ~1/3 of the MSM cost.
struct StrausTables {
    std::vector<Fp> ax, ay;   // n * 8 entries
    std::vector<u8> tinf;     // n * 8
};

static void g1_straus_build_into(const u8 *pts96, const u8 *inf, long n,
                                 Fp *ax, Fp *ay, u8 *tinf) {
    std::vector<G1j> tbl((size_t)n * 8);
    for (long i = 0; i < n; i++) {
        if (inf[i]) continue;  // zero-init tbl rows read as infinity
        G1j base;
        Fp xc, yc;
        bytes_to_fp_canon(xc, pts96 + 96 * i);
        bytes_to_fp_canon(yc, pts96 + 96 * i + 48);
        fp_to_mont(base.X, xc);
        fp_to_mont(base.Y, yc);
        memcpy(base.Z.l, FP_ONE, sizeof(FP_ONE));
        G1j *T = &tbl[(size_t)i * 8];
        T[0] = base;                       // 1P
        G1j dbl; g1j_double(dbl, base);    // 2P
        for (int k = 1; k < 8; k++) g1j_add(T[k], T[k - 1], dbl);
    }
    g1j_batch_affine(tbl.data(), n * 8, ax, ay, tinf);
}

static void g1_straus_build_tables(const u8 *pts96, const u8 *inf, long n,
                                   StrausTables &t) {
    t.ax.resize((size_t)n * 8);
    t.ay.resize((size_t)n * 8);
    t.tinf.resize((size_t)n * 8);
    g1_straus_build_into(pts96, inf, n, t.ax.data(), t.ay.data(),
                         t.tinf.data());
}

// Straus wNAF MSM consuming prebuilt affine tables; scalars in Montgomery.
static void g1_msm_straus_tables(const StrausTables &t, const u8 *inf,
                                 const Fr *scalars, long n, G1j &out) {
    std::vector<signed char> digits((size_t)n * 260);
    std::vector<u8> skip((size_t)n);
    int top = -1;
    for (long i = 0; i < n; i++) {
        Fr canon; fr_from_mont(canon, scalars[i]);
        if (inf[i] || fr_is_zero(canon)) { skip[i] = 1; continue; }
        skip[i] = 0;
        int tb = wnaf5(canon.l, &digits[(size_t)i * 260]);
        if (tb > top) top = tb;
    }
    g1j_identity(out);
    if (top < 0) return;
    const Fp *ax = t.ax.data(), *ay = t.ay.data();
    const u8 *tinf = t.tinf.data();
    for (int bit = top; bit >= 0; bit--) {
        g1j_double(out, out);
        for (long i = 0; i < n; i++) {
            if (skip[i]) continue;
            int d = digits[(size_t)i * 260 + bit];
            if (!d) continue;
            long idx = (size_t)i * 8 + ((d > 0 ? d : -d) - 1) / 2;
            if (tinf[idx]) continue;
            if (d > 0) {
                g1j_add_affine(out, out, ax[idx], ay[idx]);
            } else {
                Fp ny; fp_neg(ny, ay[idx]);
                g1j_add_affine(out, out, ax[idx], ny);
            }
        }
    }
}

static void g1_msm_straus(const u8 *pts96, const u8 *inf, const Fr *scalars,
                          long n, G1j &out) {
    // per-point odd-multiple tables 1P..15P (Jacobian), then one batch
    // normalization so the main loop uses 7M+4S mixed adds
    std::vector<G1j> tbl((size_t)n * 8);
    std::vector<signed char> digits((size_t)n * 260);
    std::vector<u8> skip((size_t)n);
    int top = -1;
    for (long i = 0; i < n; i++) {
        Fr canon; fr_from_mont(canon, scalars[i]);
        if (inf[i] || fr_is_zero(canon)) { skip[i] = 1; continue; }
        skip[i] = 0;
        int t = wnaf5(canon.l, &digits[(size_t)i * 260]);
        if (t > top) top = t;
        G1j base;
        Fp xc, yc;
        bytes_to_fp_canon(xc, pts96 + 96 * i);
        bytes_to_fp_canon(yc, pts96 + 96 * i + 48);
        fp_to_mont(base.X, xc);
        fp_to_mont(base.Y, yc);
        memcpy(base.Z.l, FP_ONE, sizeof(FP_ONE));
        G1j *T = &tbl[(size_t)i * 8];
        T[0] = base;                       // 1P
        G1j dbl; g1j_double(dbl, base);    // 2P
        for (int k = 1; k < 8; k++) g1j_add(T[k], T[k - 1], dbl);
    }
    g1j_identity(out);
    if (top < 0) return;
    // normalize all tables at once
    std::vector<Fp> ax((size_t)n * 8), ay((size_t)n * 8);
    std::vector<u8> tinf((size_t)n * 8);
    g1j_batch_affine(tbl.data(), n * 8, ax.data(), ay.data(), tinf.data());
    for (int bit = top; bit >= 0; bit--) {
        g1j_double(out, out);
        for (long i = 0; i < n; i++) {
            if (skip[i]) continue;
            int d = digits[(size_t)i * 260 + bit];
            if (!d) continue;
            long idx = (size_t)i * 8 + ((d > 0 ? d : -d) - 1) / 2;
            if (tinf[idx]) continue;
            if (d > 0) {
                g1j_add_affine(out, out, ax[idx], ay[idx]);
            } else {
                Fp ny; fp_neg(ny, ay[idx]);
                g1j_add_affine(out, out, ax[idx], ny);
            }
        }
    }
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
    std::vector<Fp> px((size_t)k), py((size_t)k);
    std::vector<Fp2c> qx((size_t)k), qy((size_t)k);
    for (long i = 0; i < k; i++) {
        Fp t;
        bytes_to_fp_canon(t, g1s + 96 * i); fp_to_mont(px[i], t);
        bytes_to_fp_canon(t, g1s + 96 * i + 48); fp_to_mont(py[i], t);
        bytes_to_fp_canon(t, g2s + 192 * i); fp_to_mont(qx[i].c0, t);
        bytes_to_fp_canon(t, g2s + 192 * i + 48); fp_to_mont(qx[i].c1, t);
        bytes_to_fp_canon(t, g2s + 192 * i + 96); fp_to_mont(qy[i].c0, t);
        bytes_to_fp_canon(t, g2s + 192 * i + 144); fp_to_mont(qy[i].c1, t);
    }
    Fp12c f;
    multi_miller_proj(f, px.data(), py.data(), qx.data(), qy.data(), k);
    Fp12c r;
    final_exp_cubed(r, f);
    return fp12_is_one(r) ? 1 : 0;
}

// ADX-vs-portable Montgomery-mul cross-check over `n` derandomized inputs
// (xorshift chain, includes p-1 edge inputs).  Returns 0 on agreement —
// native.py runs this once at load and falls back to a portable build if the
// asm path misbehaves on an exotic host.
int fp_mul_selftest(long n) {
    u64 st = 0x9e3779b97f4a7c15ULL;
    auto xr = [&st]() {
        st ^= st << 13; st ^= st >> 7; st ^= st << 17;
        return st * 0x2545F4914F6CDD1DULL;
    };
    Fp a, b, o1, o2;
    // edge: (p-1)^2
    memcpy(a.l, FP_MOD, 48); a.l[0] -= 1;
    b = a;
    fp_mul_portable(o1, a, b);
    fp_mul(o2, a, b);
    if (memcmp(o1.l, o2.l, 48)) return 1;
    for (long i = 0; i < n; i++) {
        for (int j = 0; j < 6; j++) { a.l[j] = xr(); b.l[j] = xr(); }
        a.l[5] %= FP_MOD[5]; b.l[5] %= FP_MOD[5];
        fp_mul_portable(o1, a, b);
        fp_mul(o2, a, b);
        if (memcmp(o1.l, o2.l, 48)) return 1;
    }
    return 0;
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

// Full PLONK proof verification (reference proof.rs:218-489; the Python
// oracle is plonk_tpu/proof_system/proof.py Proof.verify).
//
//   strobe203:  the seeded transcript state exported by Python — 200-byte
//               Keccak state + pos + pos_begin + cur_flags (the Verifier
//               caches it: label + circuit_domain_sep + VerifierKey seeding)
//   proof1008:  proof bytes (11 x 48B compressed commitments + 15 x 32B evals)
//   proof_aff:  the same 11 commitments as 96B canonical affine (x||y), with
//               inf flags (validated at Proof construction)
//   vk_aff:     15 VerifierKey commitments, SELECTOR_ORDER + SIGMA_ORDER:
//               q_m q_l q_r q_o q_f q_c q_arith q_range q_logic
//               q_fixed_group_add q_variable_group_add s1 s2 s3 s4
//   g/h/xh:     OpeningKey points (G1 affine 96B; G2 affine 192B canonical)
//   pi_scalars: public inputs (32B canonical each)
//   pi_winv:    omega^{-index} for each PI position (32B canonical)
//   n:          padded domain size (power of two)
//   omega32 / n_inv32: domain generator and 1/n (32B canonical)
//   legacy:     1 = V1 batching (V_MAX_DEGREE_LEGACY = 7, selector evals
//               not bound — proof.rs:495-752)
// Returns 1 (valid), 0 (invalid), -1 (pairing constants not initialized).
int plonk_verify(const u8 *strobe203, const u8 *proof1008,
                 const u8 *proof_aff, const u8 *proof_inf,
                 const u8 *vk_aff, const u8 *vk_inf,
                 const u8 *g_aff, const u8 *h_aff, const u8 *xh_aff,
                 const u8 *pi_scalars, const u8 *pi_winv, long npi,
                 u64 n, const u8 *omega32, const u8 *n_inv32, int legacy) {
    if (!PAIRING_READY) return -1;
    Strobe t;
    memcpy(t.st, strobe203, 200);
    t.pos = strobe203[200];
    t.pos_begin = strobe203[201];
    t.cur_flags = strobe203[202];

    // PI appends (compiler Verifier.verify), then the proof replay
    for (long i = 0; i < npi; i++)
        t.append_fr_bytes("pi", pi_scalars + 32 * i);

    const u8 *comm = proof1008;             // 11 x 48B, COMMITMENT_ORDER
    const u8 *evals = proof1008 + 11 * 48;  // 15 x 32B, FIELD_ORDER
    auto append_comm = [&t, comm](const char *label, int idx) {
        t.append_message((const u8 *)label, (long)strlen(label),
                         comm + 48 * idx, 48);
    };
    append_comm("a_comm", 0); append_comm("b_comm", 1);
    append_comm("c_comm", 2); append_comm("d_comm", 3);
    Fr beta, gamma, alpha, range_sep, logic_sep, fixed_sep, var_sep;
    Fr z_chal, v_chal, vw_chal, u_chal;
    t.challenge_fr("beta", beta);
    t.append_fr("beta", beta);
    t.challenge_fr("gamma", gamma);
    append_comm("z_comm", 4);
    t.challenge_fr("alpha", alpha);
    t.challenge_fr("range separation challenge", range_sep);
    t.challenge_fr("logic separation challenge", logic_sep);
    t.challenge_fr("fixed base separation challenge", fixed_sep);
    t.challenge_fr("variable base separation challenge", var_sep);
    append_comm("t_low_comm", 5); append_comm("t_mid_comm", 6);
    append_comm("t_high_comm", 7); append_comm("t_fourth_comm", 8);
    t.challenge_fr("z_challenge", z_chal);
    // eval storage order: a b c d aw bw dw qarith qc ql qr s1 s2 s3 z
    static const char *EV_LABELS[15] = {
        "a_eval", "b_eval", "c_eval", "d_eval",
        "s_sigma_1_eval", "s_sigma_2_eval", "s_sigma_3_eval", "z_eval",
        "a_w_eval", "b_w_eval", "d_w_eval",
        "q_arith_eval", "q_c_eval", "q_l_eval", "q_r_eval"};
    static const int EV_IDX[15] = {0, 1, 2, 3, 11, 12, 13, 14, 4, 5, 6,
                                   7, 8, 9, 10};
    for (int i = 0; i < 15; i++)
        t.append_fr_bytes(EV_LABELS[i], evals + 32 * EV_IDX[i]);
    t.challenge_fr("v_challenge", v_chal);
    t.challenge_fr("v_w_challenge", vw_chal);
    append_comm("w_z_chall_comm", 9);
    append_comm("w_z_chall_w_comm", 10);
    t.challenge_fr("u_challenge", u_chal);

    // evals as Montgomery Fr
    Fr ev[15];
    for (int i = 0; i < 15; i++) fr_from_bytes32(ev[i], evals + 32 * i);
    const Fr &a_ev = ev[0], &b_ev = ev[1], &c_ev = ev[2], &d_ev = ev[3];
    const Fr &aw_ev = ev[4], &bw_ev = ev[5], &dw_ev = ev[6];
    const Fr &qarith_ev = ev[7], &qc_ev = ev[8], &ql_ev = ev[9],
             &qr_ev = ev[10];
    const Fr &s1_ev = ev[11], &s2_ev = ev[12], &s3_ev = ev[13],
             &z_ev = ev[14];

    Fr ONE; memcpy(ONE.l, FR_ONEC, sizeof(FR_ONEC));
    Fr TWO, THREE, FOUR, K1f, K2f, K3f, EDW;
    fr_from_u64(TWO, 2); fr_from_u64(THREE, 3); fr_from_u64(FOUR, 4);
    fr_from_u64(K1f, 7); fr_from_u64(K2f, 13); fr_from_u64(K3f, 17);
    { Fr c; memcpy(c.l, JUBJUB_D_C, sizeof(JUBJUB_D_C)); fr_to_mont(EDW, c); }

    // z^n (n = 2^k), z_h = z^n - 1, L1(z)
    Fr zn = z_chal;
    for (u64 m = n; m > 1; m >>= 1) fr_sqr(zn, zn);
    Fr z_h; fr_sub(z_h, zn, ONE);
    Fr omega, n_inv;
    fr_from_bytes32(omega, omega32);
    fr_from_bytes32(n_inv, n_inv32);
    Fr zm1; fr_sub(zm1, z_chal, ONE);
    Fr l1;
    if (fr_is_zero(zm1)) {
        l1 = ONE;
    } else {
        Fr nf; fr_from_u64(nf, n);
        Fr den; fr_mul(den, nf, zm1);
        fr_inv(den, den);
        fr_mul(l1, z_h, den);
    }

    auto delta4 = [&](Fr &o, const Fr &f) {
        Fr t1, t2, t3;
        fr_sub(t1, f, ONE); fr_sub(t2, f, TWO); fr_sub(t3, f, THREE);
        fr_mul(o, f, t1); fr_mul(o, o, t2); fr_mul(o, o, t3);
    };

    // -- widget scalars ([D]_1 MSM contributions; widgets.py) ----------------
    Fr D_sc[16];  // q_m q_l q_r q_o q_f q_c | range logic fixed var | z s4 | t0..t3
    // arithmetic
    fr_mul(D_sc[0], a_ev, b_ev); fr_mul(D_sc[0], D_sc[0], qarith_ev);
    fr_mul(D_sc[1], a_ev, qarith_ev);
    fr_mul(D_sc[2], b_ev, qarith_ev);
    fr_mul(D_sc[3], c_ev, qarith_ev);
    fr_mul(D_sc[4], d_ev, qarith_ev);
    D_sc[5] = qarith_ev;
    // range
    {
        Fr kappa, k2, k3, b1, b2, b3, b4, tt, f;
        fr_sqr(kappa, range_sep); fr_sqr(k2, kappa); fr_mul(k3, k2, kappa);
        fr_mul(tt, FOUR, d_ev); fr_sub(f, c_ev, tt); delta4(b1, f);
        fr_mul(tt, FOUR, c_ev); fr_sub(f, b_ev, tt); delta4(b2, f);
        fr_mul(b2, b2, kappa);
        fr_mul(tt, FOUR, b_ev); fr_sub(f, a_ev, tt); delta4(b3, f);
        fr_mul(b3, b3, k2);
        fr_mul(tt, FOUR, a_ev); fr_sub(f, dw_ev, tt); delta4(b4, f);
        fr_mul(b4, b4, k3);
        Fr s; fr_add(s, b1, b2); fr_add(s, s, b3); fr_add(s, s, b4);
        fr_mul(D_sc[6], s, range_sep);
    }
    // logic
    {
        Fr kappa, k2, k3, k4, a, b, d, w, c0, c1, c2, c3, c4, tt;
        fr_sqr(kappa, logic_sep); fr_sqr(k2, kappa);
        fr_mul(k3, k2, kappa); fr_mul(k4, k3, kappa);
        fr_mul(tt, FOUR, a_ev); fr_sub(a, aw_ev, tt);
        fr_mul(tt, FOUR, b_ev); fr_sub(b, bw_ev, tt);
        fr_mul(tt, FOUR, d_ev); fr_sub(d, dw_ev, tt);
        w = c_ev;
        delta4(c0, a);
        delta4(c1, b); fr_mul(c1, c1, kappa);
        delta4(c2, d); fr_mul(c2, c2, k2);
        fr_mul(tt, a, b); fr_sub(c3, w, tt); fr_mul(c3, c3, k3);
        // delta_xor_and(a, b, w, d, qc_ev)
        {
            Fr NINE, EIGHTEEN, E81, E83, F, E, B2, apb, t1, t2, t3;
            fr_from_u64(NINE, 9); fr_from_u64(EIGHTEEN, 18);
            fr_from_u64(E81, 81); fr_from_u64(E83, 83);
            fr_add(apb, a, b);
            // F = w(w(4w - 18(a+b) + 81) + 18(a^2+b^2) - 81(a+b) + 83)
            fr_mul(t1, FOUR, w);
            fr_mul(t2, EIGHTEEN, apb); fr_sub(t1, t1, t2); fr_add(t1, t1, E81);
            fr_mul(t1, w, t1);
            Fr a2, b2s;
            fr_sqr(a2, a); fr_sqr(b2s, b); fr_add(t2, a2, b2s);
            fr_mul(t2, EIGHTEEN, t2);
            fr_add(t1, t1, t2);
            fr_mul(t2, E81, apb); fr_sub(t1, t1, t2);
            fr_add(t1, t1, E83);
            fr_mul(F, w, t1);
            // E = 3(a+b+c) - 2F   (c here is the d accumulator diff)
            fr_add(t1, apb, d); fr_mul(t1, THREE, t1);
            fr_add(t2, F, F); fr_sub(E, t1, t2);
            // B = q_c(9c - 3(a+b))
            fr_mul(t1, NINE, d);
            fr_mul(t2, THREE, apb); fr_sub(t1, t1, t2);
            fr_mul(B2, qc_ev, t1);
            fr_add(c4, B2, E);
            fr_mul(c4, c4, k4);
            (void)t3;
        }
        Fr s; fr_add(s, c0, c1); fr_add(s, s, c2);
        fr_add(s, s, c3); fr_add(s, s, c4);
        fr_mul(D_sc[7], s, logic_sep);
    }
    // fixed-base ECC
    {
        Fr kappa, k2, k3, bit, tt, t2;
        fr_sqr(kappa, fixed_sep); fr_sqr(k2, kappa); fr_mul(k3, k2, kappa);
        const Fr &x_beta = ql_ev, &y_beta = qr_ev;
        const Fr &acc_x = a_ev, &acc_x_w = aw_ev;
        const Fr &acc_y = b_ev, &acc_y_w = bw_ev;
        const Fr &xy_alpha = c_ev;
        fr_add(tt, d_ev, d_ev); fr_sub(bit, dw_ev, tt);
        Fr bit_cons, y_alpha, x_alpha, xy_cons, dxy, x_acc, y_acc;
        fr_sub(tt, bit, ONE); fr_mul(bit_cons, bit, tt);
        fr_add(tt, bit, ONE); fr_mul(bit_cons, bit_cons, tt);
        fr_sqr(tt, bit);
        Fr ym1; fr_sub(ym1, y_beta, ONE);
        fr_mul(y_alpha, tt, ym1); fr_add(y_alpha, y_alpha, ONE);
        fr_mul(x_alpha, bit, x_beta);
        fr_mul(tt, bit, qc_ev); fr_sub(xy_cons, tt, xy_alpha);
        fr_mul(xy_cons, xy_cons, kappa);
        fr_mul(dxy, xy_alpha, acc_x); fr_mul(dxy, dxy, acc_y);
        fr_mul(dxy, dxy, EDW);
        // x_acc = (acc_x_w + acc_x_w*dxy - (acc_x*y_alpha + acc_y*x_alpha)) k2
        fr_mul(tt, acc_x_w, dxy); fr_add(tt, acc_x_w, tt);
        Fr m1, m2;
        fr_mul(m1, acc_x, y_alpha); fr_mul(m2, acc_y, x_alpha);
        fr_add(m1, m1, m2); fr_sub(tt, tt, m1);
        fr_mul(x_acc, tt, k2);
        // y_acc = (acc_y_w - acc_y_w*dxy - (acc_y*y_alpha + acc_x*x_alpha)) k3
        fr_mul(tt, acc_y_w, dxy); fr_sub(tt, acc_y_w, tt);
        fr_mul(m1, acc_y, y_alpha); fr_mul(m2, acc_x, x_alpha);
        fr_add(m1, m1, m2); fr_sub(tt, tt, m1);
        fr_mul(y_acc, tt, k3);
        Fr s; fr_add(s, bit_cons, x_acc); fr_add(s, s, y_acc);
        fr_add(s, s, xy_cons);
        fr_mul(D_sc[8], s, fixed_sep);
        (void)t2;
    }
    // variable-base ECC
    {
        Fr kappa, tt, m1, m2;
        fr_sqr(kappa, var_sep);
        const Fr &x1 = a_ev, &x3 = aw_ev, &y1 = b_ev, &y3 = bw_ev;
        const Fr &x2 = c_ev, &y2 = d_ev, &x1y2 = dw_ev;
        Fr xy_cons, y1x2, d_term, x3c, y3c;
        fr_mul(tt, x1, y2); fr_sub(xy_cons, tt, x1y2);
        fr_mul(y1x2, y1, x2);
        fr_mul(d_term, EDW, x1y2); fr_mul(d_term, d_term, y1x2);
        // x3c = (x1y2 + y1x2 - (x3 + x3*d_term)) kappa
        fr_mul(tt, x3, d_term); fr_add(tt, x3, tt);
        fr_add(m1, x1y2, y1x2); fr_sub(m1, m1, tt);
        fr_mul(x3c, m1, kappa);
        // y3c = (y1*y2 + x1*x2 - (y3 - y3*d_term)) kappa^2
        fr_mul(tt, y3, d_term); fr_sub(tt, y3, tt);
        fr_mul(m1, y1, y2); fr_mul(m2, x1, x2); fr_add(m1, m1, m2);
        fr_sub(m1, m1, tt);
        fr_mul(y3c, m1, kappa); fr_mul(y3c, y3c, kappa);
        Fr s; fr_add(s, xy_cons, x3c); fr_add(s, s, y3c);
        fr_mul(D_sc[9], s, var_sep);
    }
    // permutation z_comm scalar
    {
        Fr bz, tt, f1, f2, f3, f4, x;
        fr_mul(bz, beta, z_chal);
        fr_add(f1, a_ev, bz); fr_add(f1, f1, gamma);
        fr_mul(tt, K1f, bz); fr_add(f2, b_ev, tt); fr_add(f2, f2, gamma);
        fr_mul(tt, K2f, bz); fr_add(f3, c_ev, tt); fr_add(f3, f3, gamma);
        fr_mul(tt, K3f, bz); fr_add(f4, d_ev, tt); fr_add(f4, f4, gamma);
        fr_mul(f4, f4, alpha);
        fr_mul(x, f1, f2); fr_mul(x, x, f3); fr_mul(x, x, f4);
        Fr l1a2; fr_mul(l1a2, l1, alpha); fr_mul(l1a2, l1a2, alpha);
        fr_add(x, x, l1a2); fr_add(D_sc[10], x, u_chal);
    }
    // permutation s_sigma_4 scalar (negated)
    {
        Fr tt, f1, f2, f3, y;
        fr_mul(tt, beta, s1_ev); fr_add(f1, a_ev, tt); fr_add(f1, f1, gamma);
        fr_mul(tt, beta, s2_ev); fr_add(f2, b_ev, tt); fr_add(f2, f2, gamma);
        fr_mul(tt, beta, s3_ev); fr_add(f3, c_ev, tt); fr_add(f3, f3, gamma);
        fr_mul(y, f1, f2); fr_mul(y, y, f3);
        fr_mul(tt, beta, z_ev); fr_mul(tt, tt, alpha);
        fr_mul(y, y, tt);
        fr_neg(D_sc[11], y);
    }
    // quotient chunks: -z_h * z^{kn}
    {
        Fr neg_zh; fr_neg(neg_zh, z_h);
        D_sc[12] = neg_zh;
        fr_mul(D_sc[13], neg_zh, zn);
        fr_mul(D_sc[14], D_sc[13], zn);
        fr_mul(D_sc[15], D_sc[14], zn);
    }

    // barycentric PI evaluation (sparse; proof.rs:911-952)
    Fr pi_eval; memset(pi_eval.l, 0, sizeof(pi_eval.l));
    if (npi > 0) {
        Fr numerator; fr_mul(numerator, z_h, n_inv);
        Fr total; memset(total.l, 0, sizeof(total.l));
        for (long i = 0; i < npi; i++) {
            Fr e; fr_from_bytes32(e, pi_scalars + 32 * i);
            if (fr_is_zero(e)) continue;
            Fr wi; fr_from_bytes32(wi, pi_winv + 32 * i);
            Fr den; fr_mul(den, wi, z_chal); fr_sub(den, den, ONE);
            fr_inv(den, den);
            fr_mul(e, e, den);
            fr_add(total, total, e);
        }
        fr_mul(pi_eval, total, numerator);
    }

    // r_0 scalar (proof.rs:353-366)
    Fr r0;
    {
        Fr tt, f1, f2, f3, f4, prod, l1aa;
        fr_mul(l1aa, l1, alpha); fr_mul(l1aa, l1aa, alpha);
        fr_mul(tt, beta, s1_ev); fr_add(f1, a_ev, tt); fr_add(f1, f1, gamma);
        fr_mul(tt, beta, s2_ev); fr_add(f2, b_ev, tt); fr_add(f2, f2, gamma);
        fr_mul(tt, beta, s3_ev); fr_add(f3, c_ev, tt); fr_add(f3, f3, gamma);
        fr_add(f4, d_ev, gamma);
        fr_mul(prod, f1, f2); fr_mul(prod, prod, f3); fr_mul(prod, prod, f4);
        fr_mul(prod, prod, z_ev); fr_mul(prod, prod, alpha);
        fr_sub(r0, pi_eval, l1aa);
        fr_sub(r0, r0, prod);
    }

    // powers of v for [E]/[F]
    const int vmax = legacy ? 7 : 11;
    Fr v_coeffs[14];
    v_coeffs[0] = v_chal;
    for (int i = 1; i < vmax; i++) fr_mul(v_coeffs[i], v_coeffs[i - 1], v_chal);
    fr_mul(v_coeffs[vmax], vw_chal, u_chal);
    fr_mul(v_coeffs[vmax + 1], v_coeffs[vmax], vw_chal);
    fr_mul(v_coeffs[vmax + 2], v_coeffs[vmax + 1], vw_chal);

    Fr E_scalar;
    {
        const Fr *E_evals[14];
        int k = 0;
        E_evals[k++] = &a_ev; E_evals[k++] = &b_ev; E_evals[k++] = &c_ev;
        E_evals[k++] = &d_ev;
        E_evals[k++] = &s1_ev; E_evals[k++] = &s2_ev; E_evals[k++] = &s3_ev;
        if (!legacy) {
            E_evals[k++] = &qarith_ev; E_evals[k++] = &qc_ev;
            E_evals[k++] = &ql_ev; E_evals[k++] = &qr_ev;
        }
        E_evals[k++] = &aw_ev; E_evals[k++] = &bw_ev; E_evals[k++] = &dw_ev;
        Fr s; memset(s.l, 0, sizeof(s.l));
        for (int i = 0; i < k; i++) {
            Fr m; fr_mul(m, *E_evals[i], v_coeffs[i]);
            fr_add(s, s, m);
        }
        fr_sub(s, s, r0);
        Fr uz; fr_mul(uz, u_chal, z_ev);
        fr_add(E_scalar, s, uz);
    }

    // -- assemble the single right-side MSM ---------------------------------
    // right = z*W_z + (u z omega) W_zw + [D] + F_extra - E, checked against
    // left = -(W_z + u W_zw) via e(left, xH) e(right, H) == 1.
    // points: 15 vk + 11 proof + g = 27 (scalars merged where D and F overlap)
    u8 inf[27];
    Fr sc[27];
    for (int i = 0; i < 15; i++) {
        inf[i] = vk_inf[i];
        memset(sc[i].l, 0, sizeof(sc[i].l));
    }
    for (int i = 0; i < 11; i++) {
        inf[15 + i] = proof_inf[i];
        memset(sc[15 + i].l, 0, sizeof(sc[15 + i].l));
    }
    inf[26] = 0;
    // Straus tables: slots 0-14 (vk) and 26 (g) are FIXED per verifier —
    // their odd-multiple affine tables come from a one-entry cache keyed by
    // the point bytes; only the 11 proof slots build fresh each call.
    static struct {
        u8 key[16 * 96];
        Fp ax[16 * 8], ay[16 * 8];
        u8 tinf[16 * 8];
        bool valid = false;
    } FIXED_MSM;
    u8 fixed_pts[16 * 96];
    u8 fixed_inf[16];
    memcpy(fixed_pts, vk_aff, 15 * 96);
    memcpy(fixed_pts + 15 * 96, g_aff, 96);
    memcpy(fixed_inf, vk_inf, 15);
    fixed_inf[15] = 0;
    if (!FIXED_MSM.valid
        || memcmp(FIXED_MSM.key, fixed_pts, sizeof(fixed_pts)) != 0) {
        g1_straus_build_into(fixed_pts, fixed_inf, 16, FIXED_MSM.ax,
                             FIXED_MSM.ay, FIXED_MSM.tinf);
        memcpy(FIXED_MSM.key, fixed_pts, sizeof(fixed_pts));
        FIXED_MSM.valid = true;
    }
    StrausTables all;
    all.ax.resize(27 * 8);
    all.ay.resize(27 * 8);
    all.tinf.resize(27 * 8);
    memcpy(all.ax.data(), FIXED_MSM.ax, 15 * 8 * sizeof(Fp));
    memcpy(all.ay.data(), FIXED_MSM.ay, 15 * 8 * sizeof(Fp));
    memcpy(all.tinf.data(), FIXED_MSM.tinf, 15 * 8);
    memcpy(all.ax.data() + 26 * 8, FIXED_MSM.ax + 15 * 8, 8 * sizeof(Fp));
    memcpy(all.ay.data() + 26 * 8, FIXED_MSM.ay + 15 * 8, 8 * sizeof(Fp));
    memcpy(all.tinf.data() + 26 * 8, FIXED_MSM.tinf + 15 * 8, 8);
    g1_straus_build_into(proof_aff, proof_inf, 11, all.ax.data() + 15 * 8,
                         all.ay.data() + 15 * 8, all.tinf.data() + 15 * 8);
    // [D] widget scalars: vk indices (SELECTOR_ORDER+SIGMA_ORDER)
    sc[0] = D_sc[0];   // q_m
    sc[1] = D_sc[1];   // q_l
    sc[2] = D_sc[2];   // q_r
    sc[3] = D_sc[3];   // q_o
    sc[4] = D_sc[4];   // q_f
    sc[5] = D_sc[5];   // q_c
    sc[7] = D_sc[6];   // q_range
    sc[8] = D_sc[7];   // q_logic
    sc[9] = D_sc[8];   // q_fixed_group_add
    sc[10] = D_sc[9];  // q_variable_group_add
    sc[14] = D_sc[11]; // s_sigma_4
    // proof points: a b c d z t_low t_mid t_high t_fourth W_z W_zw
    sc[15 + 4] = D_sc[10];  // z_comm
    sc[15 + 5] = D_sc[12]; sc[15 + 6] = D_sc[13];
    sc[15 + 7] = D_sc[14]; sc[15 + 8] = D_sc[15];
    // F part: v_coeffs over [a b c d s1 s2 s3 (qarith qc ql qr)] with the
    // u*v_w shifts folded into a, b, d (proof.rs:369-454)
    Fr f0 = v_coeffs[0], f1 = v_coeffs[1], f3 = v_coeffs[3];
    fr_add(f0, f0, v_coeffs[vmax]);
    fr_add(f1, f1, v_coeffs[vmax + 1]);
    fr_add(f3, f3, v_coeffs[vmax + 2]);
    fr_add(sc[15 + 0], sc[15 + 0], f0);          // a
    fr_add(sc[15 + 1], sc[15 + 1], f1);          // b
    fr_add(sc[15 + 2], sc[15 + 2], v_coeffs[2]); // c
    fr_add(sc[15 + 3], sc[15 + 3], f3);          // d
    fr_add(sc[11], sc[11], v_coeffs[4]);         // s_sigma_1
    fr_add(sc[12], sc[12], v_coeffs[5]);         // s_sigma_2
    fr_add(sc[13], sc[13], v_coeffs[6]);         // s_sigma_3
    if (!legacy) {
        fr_add(sc[6], sc[6], v_coeffs[7]);   // q_arith
        fr_add(sc[5], sc[5], v_coeffs[8]);   // q_c
        fr_add(sc[1], sc[1], v_coeffs[9]);   // q_l
        fr_add(sc[2], sc[2], v_coeffs[10]);  // q_r
    }
    // W_z, W_zw contributions to right: z*W_z + (u z omega) W_zw
    sc[15 + 9] = z_chal;
    { Fr m; fr_mul(m, u_chal, z_chal); fr_mul(m, m, omega); sc[15 + 10] = m; }
    // -E = -(g * E_scalar)
    fr_neg(sc[26], E_scalar);

    G1j right;
    g1_msm_straus_tables(all, inf, sc, 27, right);

    // left = -(W_z + u W_zw): W_z and W_zw tables already live at proof
    // slots 9, 10 of the combined table block
    G1j left;
    {
        StrausTables lt;
        lt.ax.assign(all.ax.begin() + (15 + 9) * 8,
                     all.ax.begin() + (15 + 11) * 8);
        lt.ay.assign(all.ay.begin() + (15 + 9) * 8,
                     all.ay.begin() + (15 + 11) * 8);
        lt.tinf.assign(all.tinf.begin() + (15 + 9) * 8,
                       all.tinf.begin() + (15 + 11) * 8);
        u8 linf[2] = {proof_inf[9], proof_inf[10]};
        Fr lsc[2] = {ONE, u_chal};
        g1_msm_straus_tables(lt, linf, lsc, 2, left);
        fp_neg(left.Y, left.Y);
    }

    // normalize to affine and run the 2-pairing check.  h and x*h are fixed
    // per opening key, so their Miller-loop line coefficients come from a
    // one-entry prepared-G2 cache keyed by the point bytes.
    static struct {
        u8 key[2 * 192];
        std::vector<Fp2c> lines[2];  // [0] = xh, [1] = h
        bool valid = false;
    } G2_PREP;
    {
        u8 key[2 * 192];
        memcpy(key, xh_aff, 192);
        memcpy(key + 192, h_aff, 192);
        if (!G2_PREP.valid || memcmp(G2_PREP.key, key, sizeof(key)) != 0) {
            const u8 *g2s[2] = {xh_aff, h_aff};
            for (int i = 0; i < 2; i++) {
                Fp2c gx, gy;
                Fp tmp;
                bytes_to_fp_canon(tmp, g2s[i]); fp_to_mont(gx.c0, tmp);
                bytes_to_fp_canon(tmp, g2s[i] + 48); fp_to_mont(gx.c1, tmp);
                bytes_to_fp_canon(tmp, g2s[i] + 96); fp_to_mont(gy.c0, tmp);
                bytes_to_fp_canon(tmp, g2s[i] + 144); fp_to_mont(gy.c1, tmp);
                g2_prepare_lines(G2_PREP.lines[i], gx, gy);
            }
            memcpy(G2_PREP.key, key, sizeof(key));
            G2_PREP.valid = true;
        }
    }
    G1j both[2] = {left, right};
    Fp ax[2], ay[2];
    u8 binf[2];
    g1j_batch_affine(both, 2, ax, ay, binf);
    Fp px[2], py[2];
    const std::vector<Fp2c> *lines[2];
    long k = 0;
    for (int i = 0; i < 2; i++) {
        if (binf[i]) continue;  // e(identity, .) = 1
        px[k] = ax[i]; py[k] = ay[i];
        lines[k] = &G2_PREP.lines[i];
        k++;
    }
    if (k == 0) return 1;
    Fp12c f, res;
    multi_miller_lines(f, px, py, lines, k);
    final_exp_cubed(res, f);
    return fp12_is_one(res) ? 1 : 0;
}

}  // extern "C"
