// Stand-in for the absent hyrax-bls12-381 submodule (+ its mcl
// dependency), written from scratch against the reference's call-site
// contract so the reference zkCNN sources (/root/reference/src) build
// and run unmodified for a measured single-thread CPU baseline:
//
//   * Fr (BLS12-381 scalar field), G1, initPairing, getG1basePoint:
//     used at global_var.hpp:43-48, verifier.cpp:119-126,
//     utils.cpp:224-232, neuralNetwork.cpp:899-916.
//   * hyrax_bls12_381::polyProver / polyVerifier: prover.hpp:40-47,
//     prover.cpp:503-511, verifier.cpp:128,359-373.
//   * timer + integer typedefs: prover.hpp:42-43, circuit.h.
//
// DETERMINISM: mcl's Fr::setByCSPRNG draws live randomness, making the
// reference's transcripts irreproducible.  Here setByCSPRNG draws from
// a seeded tape (SHA-512(seed || LE64(counter)) mod p, counter-based),
// byte-compatible with zkcnn_tpu/gkr/tape.py, so a reference run and a
// zkcnn_tpu run with the same seed consume identical challenges and
// their transcripts can be diffed element by element.  Seed comes from
// env ZKCNN_TAPE_SEED (default "zkcnn-tpu").
//
// squareRoot: only used by getRootOfUnit's ladder of repeated square
// roots of -1 (utils.cpp:224-232).  mcl picks one of the two roots per
// step; any consistent choice yields a valid primitive root.  We pick
// the CANONICAL ladder w_k = g^((p-1)/2^k) (g = 7, the field's smallest
// multiplicative generator) so the twiddles match
// zkcnn_tpu/field/params.py::root_of_unity exactly; off-ladder inputs
// fall back to Tonelli-Shanks.

#ifndef HYRAX_BLS12_381_POLYCOMMIT_HPP
#define HYRAX_BLS12_381_POLYCOMMIT_HPP

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cassert>
#include <chrono>
#include <vector>
#include <string>
#include <ostream>

typedef uint8_t u8;
typedef char i8;  // reference declares ceilPow2BitLength as char (utils.hpp:13)
typedef uint32_t u32;
typedef int32_t i32;
typedef uint64_t u64;
typedef int64_t i64;

namespace mcl {

enum CurveType { BLS12_381 };

namespace bn {

// ---------------------------------------------------------------------
// compact SHA-512 (FIPS 180-4), for the seeded tape
// ---------------------------------------------------------------------
struct Sha512 {
    static u64 rotr(u64 x, int n) { return (x >> n) | (x << (64 - n)); }
    static void compress(u64 h[8], const u8 block[128]) {
        static const u64 K[80] = {
            0x428a2f98d728ae22ULL,0x7137449123ef65cdULL,0xb5c0fbcfec4d3b2fULL,0xe9b5dba58189dbbcULL,
            0x3956c25bf348b538ULL,0x59f111f1b605d019ULL,0x923f82a4af194f9bULL,0xab1c5ed5da6d8118ULL,
            0xd807aa98a3030242ULL,0x12835b0145706fbeULL,0x243185be4ee4b28cULL,0x550c7dc3d5ffb4e2ULL,
            0x72be5d74f27b896fULL,0x80deb1fe3b1696b1ULL,0x9bdc06a725c71235ULL,0xc19bf174cf692694ULL,
            0xe49b69c19ef14ad2ULL,0xefbe4786384f25e3ULL,0x0fc19dc68b8cd5b5ULL,0x240ca1cc77ac9c65ULL,
            0x2de92c6f592b0275ULL,0x4a7484aa6ea6e483ULL,0x5cb0a9dcbd41fbd4ULL,0x76f988da831153b5ULL,
            0x983e5152ee66dfabULL,0xa831c66d2db43210ULL,0xb00327c898fb213fULL,0xbf597fc7beef0ee4ULL,
            0xc6e00bf33da88fc2ULL,0xd5a79147930aa725ULL,0x06ca6351e003826fULL,0x142929670a0e6e70ULL,
            0x27b70a8546d22ffcULL,0x2e1b21385c26c926ULL,0x4d2c6dfc5ac42aedULL,0x53380d139d95b3dfULL,
            0x650a73548baf63deULL,0x766a0abb3c77b2a8ULL,0x81c2c92e47edaee6ULL,0x92722c851482353bULL,
            0xa2bfe8a14cf10364ULL,0xa81a664bbc423001ULL,0xc24b8b70d0f89791ULL,0xc76c51a30654be30ULL,
            0xd192e819d6ef5218ULL,0xd69906245565a910ULL,0xf40e35855771202aULL,0x106aa07032bbd1b8ULL,
            0x19a4c116b8d2d0c8ULL,0x1e376c085141ab53ULL,0x2748774cdf8eeb99ULL,0x34b0bcb5e19b48a8ULL,
            0x391c0cb3c5c95a63ULL,0x4ed8aa4ae3418acbULL,0x5b9cca4f7763e373ULL,0x682e6ff3d6b2b8a3ULL,
            0x748f82ee5defb2fcULL,0x78a5636f43172f60ULL,0x84c87814a1f0ab72ULL,0x8cc702081a6439ecULL,
            0x90befffa23631e28ULL,0xa4506cebde82bde9ULL,0xbef9a3f7b2c67915ULL,0xc67178f2e372532bULL,
            0xca273eceea26619cULL,0xd186b8c721c0c207ULL,0xeada7dd6cde0eb1eULL,0xf57d4f7fee6ed178ULL,
            0x06f067aa72176fbaULL,0x0a637dc5a2c898a6ULL,0x113f9804bef90daeULL,0x1b710b35131c471bULL,
            0x28db77f523047d84ULL,0x32caab7b40c72493ULL,0x3c9ebe0a15c9bebcULL,0x431d67c49c100d4cULL,
            0x4cc5d4becb3e42b6ULL,0x597f299cfc657e2aULL,0x5fcb6fab3ad6faecULL,0x6c44198c4a475817ULL};
        u64 w[80];
        for (int i = 0; i < 16; i++) {
            w[i] = 0;
            for (int j = 0; j < 8; j++) w[i] = (w[i] << 8) | block[8 * i + j];
        }
        for (int i = 16; i < 80; i++) {
            u64 s0 = rotr(w[i-15],1) ^ rotr(w[i-15],8) ^ (w[i-15] >> 7);
            u64 s1 = rotr(w[i-2],19) ^ rotr(w[i-2],61) ^ (w[i-2] >> 6);
            w[i] = w[i-16] + s0 + w[i-7] + s1;
        }
        u64 a=h[0],b=h[1],c=h[2],d=h[3],e=h[4],f=h[5],g=h[6],hh=h[7];
        for (int i = 0; i < 80; i++) {
            u64 S1 = rotr(e,14) ^ rotr(e,18) ^ rotr(e,41);
            u64 ch = (e & f) ^ (~e & g);
            u64 t1 = hh + S1 + ch + K[i] + w[i];
            u64 S0 = rotr(a,28) ^ rotr(a,34) ^ rotr(a,39);
            u64 mj = (a & b) ^ (a & c) ^ (b & c);
            u64 t2 = S0 + mj;
            hh=g; g=f; f=e; e=d+t1; d=c; c=b; b=a; a=t1+t2;
        }
        h[0]+=a; h[1]+=b; h[2]+=c; h[3]+=d; h[4]+=e; h[5]+=f; h[6]+=g; h[7]+=hh;
    }
    static void digest(const u8 *msg, size_t len, u8 out[64]) {
        u64 h[8] = {0x6a09e667f3bcc908ULL,0xbb67ae8584caa73bULL,
                    0x3c6ef372fe94f82bULL,0xa54ff53a5f1d36f1ULL,
                    0x510e527fade682d1ULL,0x9b05688c2b3e6c1fULL,
                    0x1f83d9abfb41bd6bULL,0x5be0cd19137e2179ULL};
        size_t i = 0;
        for (; i + 128 <= len; i += 128) compress(h, msg + i);
        u8 tail[256];
        size_t rem = len - i;
        std::memcpy(tail, msg + i, rem);
        tail[rem] = 0x80;
        size_t tl = (rem + 1 <= 112) ? 128 : 256;
        std::memset(tail + rem + 1, 0, tl - rem - 1);
        u64 bits = (u64)len * 8;
        for (int j = 0; j < 8; j++) tail[tl - 1 - j] = (u8)(bits >> (8 * j));
        compress(h, tail);
        if (tl == 256) compress(h, tail + 128);
        for (int j = 0; j < 8; j++)
            for (int k = 0; k < 8; k++) out[8 * j + k] = (u8)(h[j] >> (56 - 8 * k));
    }
};

// ---------------------------------------------------------------------
// generic N-limb (64-bit) Montgomery field
// ---------------------------------------------------------------------
template <int N>
struct Mont {
    u64 v[N];  // Montgomery form

    static u64 P[N], R1[N], R2[N], PINV;  // modulus, R mod p, R^2 mod p, -p^-1 mod 2^64

    static bool add_raw(u64 *z, const u64 *x, const u64 *y) {
        unsigned __int128 c = 0;
        for (int i = 0; i < N; i++) {
            c += (unsigned __int128)x[i] + y[i];
            z[i] = (u64)c; c >>= 64;
        }
        return c != 0;
    }
    static bool sub_raw(u64 *z, const u64 *x, const u64 *y) {
        __int128 c = 0;
        for (int i = 0; i < N; i++) {
            c += (__int128)x[i] - y[i];
            z[i] = (u64)c; c >>= 64;
        }
        return c != 0;  // borrow
    }
    static int cmp_raw(const u64 *x, const u64 *y) {
        for (int i = N - 1; i >= 0; i--) {
            if (x[i] < y[i]) return -1;
            if (x[i] > y[i]) return 1;
        }
        return 0;
    }
    static void cond_sub_p(u64 *z) {
        if (cmp_raw(z, P) >= 0) sub_raw(z, z, P);
    }
    // CIOS Montgomery multiplication
    static void mul_raw(u64 *z, const u64 *x, const u64 *y) {
        u64 t[N + 2] = {0};
        for (int i = 0; i < N; i++) {
            unsigned __int128 c = 0;
            for (int j = 0; j < N; j++) {
                c += (unsigned __int128)x[j] * y[i] + t[j];
                t[j] = (u64)c; c >>= 64;
            }
            c += t[N]; t[N] = (u64)c; t[N + 1] = (u64)(c >> 64);
            u64 m = t[0] * PINV;
            c = (unsigned __int128)m * P[0] + t[0];
            c >>= 64;
            for (int j = 1; j < N; j++) {
                c += (unsigned __int128)m * P[j] + t[j];
                t[j - 1] = (u64)c; c >>= 64;
            }
            c += t[N]; t[N - 1] = (u64)c; t[N] = t[N + 1] + (u64)(c >> 64);
            t[N + 1] = 0;
        }
        std::memcpy(z, t, sizeof(u64) * N);
        cond_sub_p(z);
    }
    static void init_consts(const u64 *p) {
        std::memcpy(P, p, sizeof(u64) * N);
        u64 inv = 1;  // Newton: inv of P[0] mod 2^64
        for (int i = 0; i < 6; i++) inv *= 2 - P[0] * inv;
        PINV = (u64)(0 - inv);
        // R1 = 2^(64N) mod p by 64N doublings of 1
        u64 one[N] = {1};
        std::memcpy(R1, one, sizeof one);
        for (int i = 0; i < 64 * N; i++) {
            bool carry = add_raw(R1, R1, R1);
            if (carry || cmp_raw(R1, P) >= 0) sub_raw(R1, R1, P);
        }
        // R2 = R1 doubled 64N more times
        std::memcpy(R2, R1, sizeof(u64) * N);
        for (int i = 0; i < 64 * N; i++) {
            bool carry = add_raw(R2, R2, R2);
            if (carry || cmp_raw(R2, P) >= 0) sub_raw(R2, R2, P);
        }
    }

    void clear() { std::memset(v, 0, sizeof v); }
    bool is_zero() const {
        for (int i = 0; i < N; i++) if (v[i]) return false;
        return true;
    }
    void set_u64(u64 x) {  // from small unsigned integer
        u64 t[N] = {x};
        mul_raw(v, t, R2);
    }
    void to_plain(u64 *out) const {  // Montgomery -> canonical
        u64 one[N] = {1};
        mul_raw(out, v, one);
    }
    void from_plain(const u64 *in) {
        mul_raw(v, in, R2);
    }
    Mont add(const Mont &o) const {
        Mont r;
        bool carry = add_raw(r.v, v, o.v);
        if (carry || cmp_raw(r.v, P) >= 0) sub_raw(r.v, r.v, P);
        return r;
    }
    Mont sub(const Mont &o) const {
        Mont r;
        if (sub_raw(r.v, v, o.v)) add_raw(r.v, r.v, P);
        return r;
    }
    Mont mul(const Mont &o) const {
        Mont r; mul_raw(r.v, v, o.v); return r;
    }
    Mont sqr() const { return mul(*this); }
    Mont pow_limbs(const u64 *e, int ebits) const {
        Mont r; std::memcpy(r.v, R1, sizeof r.v);  // one
        for (int i = ebits - 1; i >= 0; i--) {
            r = r.sqr();
            if ((e[i / 64] >> (i % 64)) & 1) r = r.mul(*this);
        }
        return r;
    }
    bool operator==(const Mont &o) const { return cmp_raw(v, o.v) == 0; }
};
template <int N> u64 Mont<N>::P[N];
template <int N> u64 Mont<N>::R1[N];
template <int N> u64 Mont<N>::R2[N];
template <int N> u64 Mont<N>::PINV;

// ---------------------------------------------------------------------
// Fr: BLS12-381 scalar field (255 bits, 4 limbs)
// ---------------------------------------------------------------------
inline constexpr u64 FR_MOD[4] = {
    0xffffffff00000001ULL, 0x53bda402fffe5bfeULL,
    0x3339d80809a1d805ULL, 0x73eda753299d7d48ULL};

// globals shared by all Fr instances (C++17 inline statics)
struct FrG {
    static inline u64 HALF[4] = {};        // (p+1)/2, canonical
    static inline bool ladder_ready = false;
    static inline u64 tape_counter = 0;
    static inline std::string tape_seed;
};

class Fr {
public:
    Mont<4> m;

    static void initConsts();
    static bool squareRoot(Fr &y, const Fr &x);

    Fr() { m.clear(); }
    Fr(i64 x) {
        if (x >= 0) m.set_u64((u64)x);
        else { m.set_u64((u64)(-x)); Fr z; m = z.m.sub(m); }
    }
    Fr(int x) : Fr((i64)x) {}
    Fr(u64 x) { m.set_u64(x); }
    Fr(unsigned long long x) { m.set_u64((u64)x); }
    Fr(long long x) : Fr((i64)x) {}
    Fr(u32 x) { m.set_u64(x); }

    static Fr one() { Fr r; std::memcpy(r.m.v, Mont<4>::R1, sizeof r.m.v); return r; }
    static size_t getByteSize() { return 32; }

    void clear() { m.clear(); }
    bool isZero() const { return m.is_zero(); }

    Fr operator+(const Fr &o) const { Fr r; r.m = m.add(o.m); return r; }
    Fr operator-(const Fr &o) const { Fr r; r.m = m.sub(o.m); return r; }
    Fr operator*(const Fr &o) const { Fr r; r.m = m.mul(o.m); return r; }
    Fr operator-() const { Fr z; return z - *this; }
    Fr &operator+=(const Fr &o) { m = m.add(o.m); return *this; }
    Fr &operator-=(const Fr &o) { m = m.sub(o.m); return *this; }
    Fr &operator*=(const Fr &o) { m = m.mul(o.m); return *this; }
    bool operator==(const Fr &o) const { return m == o.m; }
    bool operator!=(const Fr &o) const { return !(m == o.m); }
    bool operator<(const Fr &o) const {  // canonical integer compare
        u64 a[4], b[4];
        m.to_plain(a); o.m.to_plain(b);
        return Mont<4>::cmp_raw(a, b) < 0;
    }
    bool operator>(const Fr &o) const { return o < *this; }

    bool isNegative() const {  // canonical >= (p+1)/2
        u64 a[4];
        m.to_plain(a);
        return Mont<4>::cmp_raw(a, FrG::HALF) >= 0;
    }
    i64 getInt64() const {
        u64 a[4];
        m.to_plain(a);
        if (isNegative()) {
            u64 d[4];
            Mont<4>::sub_raw(d, FR_MOD, a);
            return -(i64)d[0];
        }
        return (i64)a[0];
    }

    static void inv(Fr &y, const Fr &x) {  // Fermat: x^(p-2)
        u64 e[4];
        std::memcpy(e, FR_MOD, sizeof e);
        e[0] -= 2;
        y.m = x.m.pow_limbs(e, 255);
    }

    // Seeded tape: SHA-512(seed || LE64(counter)) interpreted as a
    // little-endian integer mod p (byte-compatible with
    // zkcnn_tpu/gkr/tape.py::Tape.field).
    void setByCSPRNG() {
        std::vector<u8> buf(FrG::tape_seed.begin(), FrG::tape_seed.end());
        for (int i = 0; i < 8; i++)
            buf.push_back((u8)(FrG::tape_counter >> (8 * i)));
        FrG::tape_counter++;
        u8 dig[64];
        Sha512::digest(buf.data(), buf.size(), dig);
        // little-endian digest -> integer mod p: process MSB first
        u64 acc[4] = {0};
        for (int i = 63; i >= 0; i--) {
            // acc = acc*256 + dig[i]  (mod p), via 8 doublings + add
            for (int b = 0; b < 8; b++) {
                bool carry = Mont<4>::add_raw(acc, acc, acc);
                if (carry || Mont<4>::cmp_raw(acc, FR_MOD) >= 0)
                    Mont<4>::sub_raw(acc, acc, FR_MOD);
            }
            u64 d[4] = {dig[i], 0, 0, 0};
            bool carry = Mont<4>::add_raw(acc, acc, d);
            if (carry || Mont<4>::cmp_raw(acc, FR_MOD) >= 0)
                Mont<4>::sub_raw(acc, acc, FR_MOD);
        }
        m.from_plain(acc);
    }
};

// decimal print (mcl operator<< equivalent; used by diagnostics)
inline std::ostream &operator<<(std::ostream &os, const Fr &x) {
    u64 a[4];
    x.m.to_plain(a);
    std::string s;
    bool zero;
    do {
        // divide a by 10, collect remainder
        unsigned __int128 rem = 0;
        zero = true;
        for (int i = 3; i >= 0; i--) {
            unsigned __int128 cur = (rem << 64) | a[i];
            a[i] = (u64)(cur / 10);
            rem = cur % 10;
            if (a[i]) zero = false;
        }
        s.push_back((char)('0' + (int)rem));
    } while (!zero);
    for (size_t i = s.size(); i-- > 0;) os << s[i];
    return os;
}

// canonical two-adic ladder: ladder()[k] = g^((p-1)/2^k), g = 7
inline Fr *fr_ladder() {
    static Fr L[33];
    return L;
}

inline void Fr::initConsts() {
    Mont<4>::init_consts(FR_MOD);
    // (p+1)/2
    u64 t[4];
    std::memcpy(t, FR_MOD, sizeof t);
    unsigned __int128 c = (unsigned __int128)t[0] + 1;
    t[0] = (u64)c; c >>= 64;
    for (int i = 1; i < 4; i++) { c += t[i]; t[i] = (u64)c; c >>= 64; }
    for (int i = 0; i < 4; i++)
        FrG::HALF[i] = (t[i] >> 1) | (i + 1 < 4 ? (t[i + 1] << 63) : 0);
    // ladder from generator 7: w32 = 7^((p-1)/2^32), then square down
    Fr g; g.m.set_u64(7);
    u64 pm1[4];
    std::memcpy(pm1, FR_MOD, sizeof pm1);
    pm1[0] -= 1;  // p odd, no borrow
    u64 e[4];
    for (int i = 0; i < 4; i++)
        e[i] = (pm1[i] >> 32) | (i + 1 < 4 ? (pm1[i + 1] << 32) : 0);
    fr_ladder()[32].m = g.m.pow_limbs(e, 256 - 32);
    for (int k = 31; k >= 1; k--)
        fr_ladder()[k].m = fr_ladder()[k + 1].m.sqr();
    FrG::ladder_ready = true;
    const char *s = std::getenv("ZKCNN_TAPE_SEED");
    FrG::tape_seed = s ? s : "zkcnn-tpu";
    FrG::tape_counter = 0;
}

inline bool Fr::squareRoot(Fr &y, const Fr &x) {
    // canonical ladder fast path (see header comment)
    if (FrG::ladder_ready)
        for (int k = 1; k <= 31; k++)
            if (x == fr_ladder()[k]) { y = fr_ladder()[k + 1]; return true; }
    // general Tonelli-Shanks (p-1 = q * 2^32, q odd)
    if (x.isZero()) { y.clear(); return true; }
    u64 pm1[4];
    std::memcpy(pm1, FR_MOD, sizeof pm1);
    pm1[0] -= 1;
    u64 q[4];  // (p-1) >> 32
    for (int i = 0; i < 4; i++)
        q[i] = (pm1[i] >> 32) | (i + 1 < 4 ? (pm1[i + 1] << 32) : 0);
    // t = x^q, r = x^((q+1)/2)
    u64 q1[4];
    std::memcpy(q1, q, sizeof q1);
    unsigned __int128 c = (unsigned __int128)q1[0] + 1;
    q1[0] = (u64)c; c >>= 64;
    for (int i = 1; i < 4 && c; i++) { c += q1[i]; q1[i] = (u64)c; c >>= 64; }
    for (int i = 0; i < 4; i++)
        q1[i] = (q1[i] >> 1) | (i + 1 < 4 ? (q1[i + 1] << 63) : 0);
    Fr t; t.m = x.m.pow_limbs(q, 256 - 32);
    Fr r; r.m = x.m.pow_limbs(q1, 256 - 32);
    Fr z = FrG::ladder_ready ? fr_ladder()[32] : Fr(1);
    int mexp = 32;
    Fr ONE = one();
    while (!(t == ONE)) {
        Fr tt = t;
        int i = 0;
        while (!(tt == ONE)) { tt = tt * tt; i++; if (i == mexp) return false; }
        Fr b = z;
        for (int j = 0; j < mexp - i - 1; j++) b = b * b;
        mexp = i;
        z = b * b;
        t = t * z;
        r = r * b;
    }
    y = r;
    return true;
}

// ---------------------------------------------------------------------
// Fp + G1 (Jacobian, y^2 = x^3 + 4)
// ---------------------------------------------------------------------
typedef Mont<6> Fp;

inline constexpr u64 FP_MOD[6] = {
    0xb9feffffffffaaabULL, 0x1eabfffeb153ffffULL, 0x6730d2a0f6b0f624ULL,
    0x64774b84f38512bfULL, 0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL};
inline constexpr u64 G1_GEN_X[6] = {
    0xfb3af00adb22c6bbULL, 0x6c55e83ff97a1aefULL, 0xa14e3a3f171bac58ULL,
    0xc3688c4f9774b905ULL, 0x2695638c4fa9ac0fULL, 0x17f1d3a73197d794ULL};
inline constexpr u64 G1_GEN_Y[6] = {
    0x0caa232946c5e7e1ULL, 0xd03cc744a2888ae4ULL, 0x00db18cb2c04b3edULL,
    0xfcf5e095d5d00af6ULL, 0xa09e30ed741d8ae4ULL, 0x08b3f481e3aaa0f1ULL};

class G1 {
public:
    Fp X, Y, Z;  // Z == 0 => identity

    static void initConsts() { Fp::init_consts(FP_MOD); }

    G1() { X.clear(); Y.clear(); Z.clear(); }
    bool isZero() const { return Z.is_zero(); }

    static G1 base() {
        G1 g;
        g.X.from_plain(G1_GEN_X);
        g.Y.from_plain(G1_GEN_Y);
        std::memcpy(g.Z.v, Fp::R1, sizeof g.Z.v);  // 1
        return g;
    }

    G1 dbl() const {
        if (isZero()) return *this;
        Fp A = X.sqr(), B = Y.sqr(), C = B.sqr();
        Fp t = X.add(B).sqr().sub(A).sub(C);
        Fp D = t.add(t);
        Fp E = A.add(A).add(A);
        Fp F2 = E.sqr();
        G1 r;
        r.X = F2.sub(D).sub(D);
        Fp c8 = C.add(C); c8 = c8.add(c8); c8 = c8.add(c8);
        r.Y = E.mul(D.sub(r.X)).sub(c8);
        Fp yz = Y.mul(Z);
        r.Z = yz.add(yz);
        return r;
    }
    G1 add(const G1 &o) const {
        if (isZero()) return o;
        if (o.isZero()) return *this;
        Fp Z1Z1 = Z.sqr(), Z2Z2 = o.Z.sqr();
        Fp U1 = X.mul(Z2Z2), U2 = o.X.mul(Z1Z1);
        Fp S1 = Y.mul(o.Z).mul(Z2Z2), S2 = o.Y.mul(Z).mul(Z1Z1);
        if (U1 == U2) {
            if (S1 == S2) return dbl();
            return G1();  // inverse points
        }
        Fp H = U2.sub(U1);
        Fp I = H.add(H).sqr();
        Fp J = H.mul(I);
        Fp rr = S2.sub(S1); rr = rr.add(rr);
        Fp V = U1.mul(I);
        G1 out;
        out.X = rr.sqr().sub(J).sub(V).sub(V);
        Fp s1j = S1.mul(J); s1j = s1j.add(s1j);
        out.Y = rr.mul(V.sub(out.X)).sub(s1j);
        out.Z = Z.add(o.Z).sqr().sub(Z1Z1).sub(Z2Z2).mul(H);
        return out;
    }
    G1 operator+(const G1 &o) const { return add(o); }
    G1 &operator+=(const G1 &o) { *this = add(o); return *this; }

    G1 operator*(const Fr &s) const {
        u64 e[4];
        s.m.to_plain(e);
        G1 r;
        for (int i = 255; i >= 0; i--) {
            r = r.dbl();
            if ((e[i / 64] >> (i % 64)) & 1) r = r.add(*this);
        }
        return r;
    }
    bool operator==(const G1 &o) const {
        if (isZero() || o.isZero()) return isZero() == o.isZero();
        Fp Z1Z1 = Z.sqr(), Z2Z2 = o.Z.sqr();
        if (!(X.mul(Z2Z2) == o.X.mul(Z1Z1))) return false;
        return Y.mul(o.Z).mul(Z2Z2) == o.Y.mul(Z).mul(Z1Z1);
    }
};

inline G1 getG1basePoint() { return G1::base(); }

inline void initPairing(CurveType) {
    Fr::initConsts();
    G1::initConsts();
}

}  // namespace bn
}  // namespace mcl

using mcl::bn::Fr;
using mcl::bn::G1;
using mcl::bn::initPairing;

// ---------------------------------------------------------------------
// timer (hyrax submodule contract: prover.hpp:42-43)
// ---------------------------------------------------------------------
class timer {
public:
    double total = 0.0;
    std::chrono::steady_clock::time_point t0;
    bool running = false;
    void start() { t0 = std::chrono::steady_clock::now(); running = true; }
    void stop() {
        if (!running) return;
        total += std::chrono::duration<double>(
            std::chrono::steady_clock::now() - t0).count();
        running = false;
    }
    double elapse_sec() const { return total; }
};

// ---------------------------------------------------------------------
// Hyrax polynomial commitment, sqrt (matrix) form:
// rows indexed by the HIGH bits, columns (= gens) by the LOW bits,
// matching verifier.cpp:119-121 gens sizing (2^(logn - logn/2) gens)
// and zkcnn_tpu/pcs/hyrax.py's layout.
// ---------------------------------------------------------------------
namespace hyrax_bls12_381 {

class polyProver {
public:
    std::vector<Fr> Z;
    std::vector<G1> gens;
    std::vector<G1> comm;    // per-row commitments
    std::vector<Fr> open_b;  // folded row (the sqrt opening)
    size_t n_rows = 0, n_cols = 0;
    timer pt;
    double ps_kb = 0;

    polyProver(const std::vector<Fr> &vals, const std::vector<G1> &g)
        : Z(vals), gens(g) {
        pt.start();
        n_cols = gens.size();
        n_rows = Z.size() / n_cols;
        if (n_rows * n_cols < Z.size()) n_rows++;
        Z.resize(n_rows * n_cols);
        comm.resize(n_rows);
        for (size_t r = 0; r < n_rows; r++) {
            G1 acc;
            for (size_t c = 0; c < n_cols; c++)
                if (!Z[r * n_cols + c].isZero())
                    acc += gens[c] * Z[r * n_cols + c];
            comm[r] = acc;
        }
        pt.stop();
        ps_kb += n_rows * 48.0 / 1024.0;
    }

    // fold rows with eq(row, r_hi); called by the verifier (in-process,
    // like the reference's prover/verifier pair)
    const std::vector<Fr> &open(const std::vector<Fr> &eq_hi) {
        pt.start();
        open_b.assign(n_cols, Fr());
        for (size_t r = 0; r < n_rows; r++)
            for (size_t c = 0; c < n_cols; c++)
                open_b[c] += eq_hi[r] * Z[r * n_cols + c];
        pt.stop();
        ps_kb += n_cols * 32.0 / 1024.0;
        return open_b;
    }

    double getPT() const { return pt.elapse_sec(); }
    double getPS() const { return ps_kb; }
};

class polyVerifier {
public:
    polyProver &p;
    std::vector<G1> gens;
    timer vt;

    polyVerifier(polyProver &pp, const std::vector<G1> &g) : p(pp), gens(g) {}

    // eq(i, r) for all i, index bit k <-> r[k] (low variable = low bit)
    static void eq_table(const std::vector<Fr> &r, std::vector<Fr> &out) {
        out.assign((size_t)1 << r.size(), Fr());
        out[0] = Fr::one();
        for (size_t k = 0; k < r.size(); k++) {
            size_t m = (size_t)1 << k;
            for (size_t i = 0; i < m; i++) {
                Fr hi = out[i] * r[k];
                out[i | m] = hi;
                out[i] = out[i] - hi;
            }
        }
    }

    bool verify(const std::vector<Fr> &r, const Fr &eval) {
        size_t lc = 0;
        while (((size_t)1 << lc) < gens.size()) lc++;
        std::vector<Fr> r_lo(r.begin(), r.begin() + lc);
        std::vector<Fr> r_hi(r.begin() + lc, r.end());
        std::vector<Fr> eq_hi, eq_lo;
        eq_table(r_hi, eq_hi);
        eq_table(r_lo, eq_lo);
        eq_hi.resize(p.n_rows, Fr());
        const std::vector<Fr> &b = p.open(eq_hi);
        vt.start();
        // <b, eq_lo> == eval
        Fr dot;
        for (size_t c = 0; c < p.n_cols; c++) dot += b[c] * eq_lo[c];
        bool ok = (dot == eval);
        if (ok) {
            // <b, gens> == sum_r eq_hi[r] * comm[r]
            G1 lhs, rhs;
            for (size_t c = 0; c < p.n_cols; c++)
                if (!b[c].isZero()) lhs += gens[c] * b[c];
            for (size_t rr = 0; rr < p.n_rows; rr++)
                if (!eq_hi[rr].isZero()) rhs += p.comm[rr] * eq_hi[rr];
            ok = (lhs == rhs);
        }
        vt.stop();
        return ok;
    }

    double getVT() const { return vt.elapse_sec(); }
};

}  // namespace hyrax_bls12_381

#endif  // HYRAX_BLS12_381_POLYCOMMIT_HPP
