"""Field and curve parameters for BLS12-381 and the embedded Jubjub curve.

Parameter provenance (values are public curve constants, independently known):
- BLS12-381 scalar field r and base field p: IETF pairing-friendly-curves draft.
- Two-adicity / generator facts mirrored from the reference's dependency
  `dusk-bls12_381` (see /root/reference/src/fft/domain.rs:115-153 for how the
  reference consumes ROOT_OF_UNITY / TWO_ADACITY / GENERATOR).
- Jubjub: the twisted Edwards curve -x^2 + y^2 = 1 + d x^2 y^2 over Fr with
  d = -(10240/10241), cofactor 8 (zcash "jubjub" curve; the reference uses it
  through `dusk-jubjub`, /root/reference/Cargo.toml:24).
"""

# ---------------------------------------------------------------------------
# BLS12-381 scalar field Fr (the circuit field)
# ---------------------------------------------------------------------------
R_MOD = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001

# Multiplicative generator of Fr* (matches dusk-bls12_381 GENERATOR = 7, used
# as the coset shift in coset FFTs; /root/reference/src/fft/domain.rs:211).
FR_GENERATOR = 7

# Fr has 2-adicity 32: r - 1 = 2^32 * odd.
TWO_ADICITY = 32
assert (R_MOD - 1) % (1 << TWO_ADICITY) == 0
assert ((R_MOD - 1) >> TWO_ADICITY) % 2 == 1

# Canonical 2^32-th root of unity: GENERATOR^((r-1)/2^32). This matches the
# dusk-bls12_381 ROOT_OF_UNITY derivation consumed at domain.rs:137.
FR_ROOT_OF_UNITY = pow(FR_GENERATOR, (R_MOD - 1) >> TWO_ADICITY, R_MOD)

# ---------------------------------------------------------------------------
# BLS12-381 base field Fp and curve constants
# ---------------------------------------------------------------------------
P_MOD = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB

# E: y^2 = x^3 + 4 over Fp;  E': y^2 = x^3 + 4(u+1) over Fp2.
B_COEFF = 4

# BLS parameter x (negative): p = (x-1)^2 * r / 3 + x,  |x| = 2^63 + ...
BLS_X = 0xD201000000010000  # |x|; x itself is negative
BLS_X_IS_NEGATIVE = True

# G1 generator (standard, IETF draft / zcash serialization spec)
G1_GEN_X = 0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB
G1_GEN_Y = 0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1

# G2 generator
G2_GEN_X_C0 = 0x024AA2B2F08F0A91260805272DC51051C6E47AD4FA403B02B4510B647AE3D1770BAC0326A805BBEFD48056C8C121BDB8
G2_GEN_X_C1 = 0x13E02B6052719F607DACD3A088274F65596BD0D09920B61AB5DA61BBDC7F5049334CF11213945D57E5AC7D055D042B7E
G2_GEN_Y_C0 = 0x0CE5D527727D6E118CC9CDC6DA2E351AADFD9BAA8CBDD3A76D429A695160D12C923AC9CC3BACA289E193548608B82801
G2_GEN_Y_C1 = 0x0606C4A02EA734CC32ACD2B02BC28B99CB3E287E85A763AF267492AB572E99AB3F370D275CEC1DA1AAA9075FF05F79BE

# ---------------------------------------------------------------------------
# Jubjub (embedded twisted Edwards curve over Fr)
#   -x^2 + y^2 = 1 + d x^2 y^2,  d = -(10240/10241) mod r
# ---------------------------------------------------------------------------
JUBJUB_D = (-10240 * pow(10241, -1, R_MOD)) % R_MOD
# a = -1 (twisted Edwards coefficient)
JUBJUB_A = R_MOD - 1
# Prime order of the large subgroup; cofactor 8.
JUBJUB_ORDER = 0x0E7DB4EA6533AFA906673B0101343B00A6682093CCC81082D0970E5ED6F72CB7
JUBJUB_COFACTOR = 8
assert JUBJUB_ORDER * 8 * 2 > R_MOD > JUBJUB_ORDER * 8  # |E| = 8 * order

# Permutation-argument coset constants (reference:
# /root/reference/src/composer/permutation/constants.rs:14-16)
K1 = 7
K2 = 13
K3 = 17

# Blinding headroom added to the SRS degree
# (/root/reference/src/commitment_scheme/kzg10/srs.rs:54)
ADDED_BLINDING_DEGREE = 6
