// Validates the mcl/hyrax stand-in (include/hyrax-bls12-381) against
// Python-integer ground truth: prints values that baseline/selftest.py
// recomputes exactly and compares.
#include <hyrax-bls12-381/polyCommit.hpp>
#include <cstdio>
using mcl::bn::Fp;
using mcl::bn::Sha512;

static void print_fr(const char *tag, const Fr &x) {
    u64 a[4];
    x.m.to_plain(a);
    printf("%s %016llx%016llx%016llx%016llx\n", tag,
           (unsigned long long)a[3], (unsigned long long)a[2],
           (unsigned long long)a[1], (unsigned long long)a[0]);
}

static void print_g1(const char *tag, const G1 &pt) {
    // normalize to affine via z-inverse in Fp (Fermat)
    if (pt.isZero()) { printf("%s inf\n", tag); return; }
    u64 e[6];
    std::memcpy(e, mcl::bn::FP_MOD, sizeof e);
    e[0] -= 2;
    Fp zi = pt.Z.pow_limbs(e, 381);
    Fp zi2 = zi.sqr(), zi3 = zi2.mul(zi);
    Fp ax = pt.X.mul(zi2), ay = pt.Y.mul(zi3);
    u64 a[6], b[6];
    ax.to_plain(a); ay.to_plain(b);
    printf("%s ", tag);
    for (int i = 5; i >= 0; i--) printf("%016llx", (unsigned long long)a[i]);
    printf(" ");
    for (int i = 5; i >= 0; i--) printf("%016llx", (unsigned long long)b[i]);
    printf("\n");
}

int main() {
    initPairing(mcl::BLS12_381);

    Fr a(123456789), b((i64)-987654321);
    print_fr("add", a + b);
    print_fr("mul", a * b);
    Fr inv_a; Fr::inv(inv_a, a);
    print_fr("inv", inv_a);
    print_fr("neg", -a);

    // root-of-unity ladder (utils.cpp getRootOfUnit semantics)
    Fr r = -Fr::one();
    for (int k = 1; k < 5; k++) {
        bool ok = Fr::squareRoot(r, r);
        if (!ok) { printf("sqrt FAIL\n"); return 1; }
        print_fr("rou", r);
    }

    // signed semantics
    Fr neg((i64)-42);
    printf("isneg %d getint %lld\n", (int)neg.isNegative(),
           (long long)neg.getInt64());

    // tape draws (must match zkcnn_tpu Tape(b"zkcnn-tpu"))
    Fr t1, t2;
    t1.setByCSPRNG();
    t2.setByCSPRNG();
    print_fr("tape0", t1);
    print_fr("tape1", t2);

    // curve ops
    G1 g = mcl::bn::getG1basePoint();
    print_g1("g2", g + g);
    print_g1("g3", g + g + g);
    print_g1("gmul", g * Fr((i64)1234567));

    // hyrax roundtrip: commit a small MLE, verify an opening
    {
        size_t logn = 6;
        std::vector<Fr> vals(1u << logn);
        for (size_t i = 0; i < vals.size(); i++) vals[i] = Fr((i64)(i * 7 + 1));
        size_t n_gens = 1u << (logn - logn / 2);
        std::vector<G1> gens(n_gens);
        for (auto &x : gens) { Fr s; s.setByCSPRNG(); x = g * s; }
        hyrax_bls12_381::polyProver pp(vals, gens);
        hyrax_bls12_381::polyVerifier pv(pp, gens);
        std::vector<Fr> pt_(logn);
        for (auto &x : pt_) x.setByCSPRNG();
        // V~(r) by direct folding
        std::vector<Fr> cur(vals);
        for (size_t k = 0; k < logn; k++) {
            size_t m = cur.size() / 2;
            for (size_t i = 0; i < m; i++)
                cur[i] = cur[2 * i] + pt_[k] * (cur[2 * i + 1] - cur[2 * i]);
            cur.resize(m);
        }
        bool ok = pv.verify(pt_, cur[0]);
        Fr bad = cur[0] + Fr::one();
        bool bad_ok = pv.verify(pt_, bad);
        printf("hyrax ok=%d badrejected=%d\n", (int)ok, (int)!bad_ok);
    }
    return 0;
}
