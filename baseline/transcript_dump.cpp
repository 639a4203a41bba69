// Transcript dumper for the reference prover (SURVEY.md §7 north star:
// bit-exact transcripts between the C++ reference and zkcnn_tpu).
//
// Drives the UNMODIFIED reference prover (/root/reference/src) through
// the exact protocol schedule its verifier uses (verifier.cpp:118-357
// — draw sites at 139,157-160,207,249-253,275-279), with the stub's
// seeded tape (ZKCNN_TAPE_SEED, byte-compatible with
// zkcnn_tpu/gkr/tape.py) supplying every setByCSPRNG draw.  Prints one
// decimal field element per line, in the order zkcnn_tpu's verifier
// materializes its transcript (gkr/verifier.py::_tx_slots):
//
//   vres
//   per layer (top-down):  round polys (CONSTANT-FIRST coefficient
//     order, 3 per quadratic round / 4 per cubic round), claim_u0,
//     claim_u1, then for phase-2 layers: phase-2 polys, claim_v0,
//     claim_v1
//   liu polys, eval_in
//
// Python counterpart: tools/transcript_diff.py.

#include "circuit.h"
#include "neuralNetwork.hpp"
#include "models.hpp"
#include "prover.hpp"
#include "global_var.hpp"
#include <cstring>
#include <iostream>

vector<std::string> output_tb(16, "");

static void dump(const F &x) { std::cout << x << "\n"; }

static F draw() { F x; x.setByCSPRNG(); return x; }

int main(int argc, char **argv) {
    initPairing(mcl::BLS12_381);
    if (argc < 5) {
        fprintf(stderr,
                "usage: transcript_dump in.csv conf.csv out.csv pic_cnt\n");
        return 2;
    }
    char i_filename[500], c_filename[500], o_filename[500];
    strcpy(i_filename, argv[1]);
    strcpy(c_filename, argv[2]);
    strcpy(o_filename, argv[3]);
    int pic_cnt = atoi(argv[4]);

    prover p;
    lenet nn(32, 32, 1, pic_cnt, MAX, i_filename, c_filename, o_filename);
    nn.create(p, false);
    p.init();
    auto &C = p.C;

    // generator draws precede everything (verifier.cpp:119-126); the
    // group points themselves never touch the GKR transcript, so only
    // the tape consumption is mirrored (the commitment itself is
    // measured separately by the demo binaries)
    u8 logn = C.circuit[0].bit_length;
    u64 n_sqrt = 1ULL << (logn - (logn >> 1));
    for (u64 i = 0; i < n_sqrt; ++i) (void) draw();

    std::vector<vector<F>> r_u(C.size + 2), r_v(C.size + 2);
    F alpha = F_ONE, beta = F_ZERO;

    // output-layer point + Vres (verifier.cpp:137-146)
    r_u[C.size].resize(C.circuit[C.size - 1].bit_length);
    for (auto &x : r_u[C.size]) x = draw();
    dump(p.Vres(r_u[C.size].begin(), C.circuit[C.size - 1].size,
                C.circuit[C.size - 1].bit_length));
    p.sumcheckInitAll(r_u[C.size].begin());

    for (u8 i = C.size - 1; i; --i) {
        auto &cur = C.circuit[i];
        p.sumcheckInit(alpha, beta);
        r_u[i].resize(cur.max_bl_u);
        for (auto &x : r_u[i]) x = draw();
        F relu_rou = F_ONE;
        if (cur.zero_start_id < cur.size) relu_rou = draw();

        F prev_r = F_ZERO;
        F claim_u0, claim_u1;
        if (cur.ty == layerType::DOT_PROD) {
            p.sumcheckDotProdInitPhase1();
            for (i8 j = 0; j < cur.max_bl_u; ++j) {
                cubic_poly poly = p.sumcheckDotProdUpdate1(prev_r);
                dump(poly.d); dump(poly.c); dump(poly.b); dump(poly.a);
                prev_r = r_u[i][j];
            }
            claim_u0.clear();
            p.sumcheckDotProdFinalize1(prev_r, claim_u1);
        } else {
            p.sumcheckInitPhase1(relu_rou);
            for (i8 j = 0; j < cur.max_bl_u; ++j) {
                quadratic_poly poly = p.sumcheckUpdate1(prev_r);
                dump(poly.c); dump(poly.b); dump(poly.a);
                prev_r = r_u[i][j];
            }
            p.sumcheckFinalize1(prev_r, claim_u0, claim_u1);
        }
        dump(claim_u0); dump(claim_u1);

        if (cur.need_phase2) {
            r_v[i].resize(cur.max_bl_v);
            for (auto &x : r_v[i]) x = draw();
            p.sumcheckInitPhase2();
            prev_r = F_ZERO;
            for (i8 j = 0; j < cur.max_bl_v; ++j) {
                quadratic_poly poly = p.sumcheckUpdate2(prev_r);
                dump(poly.c); dump(poly.b); dump(poly.a);
                prev_r = r_v[i][j];
            }
            F claim_v0, claim_v1;
            p.sumcheckFinalize2(prev_r, claim_v0, claim_v1);
            dump(claim_v0); dump(claim_v1);
        }

        // claim-linkage draws (verifier.cpp:245-255)
        if (cur.ty != layerType::FFT && cur.ty != layerType::IFFT) {
            if (~cur.bit_length_u[1]) alpha = draw();
            else alpha.clear();
            if (~cur.bit_length_v[1]) beta = draw();
            else beta.clear();
        }
    }

    // Liu input consolidation (verifier.cpp:268-305)
    auto &c0 = C.circuit[0];
    vector<F> sig_u(C.size - 1), sig_v(C.size - 1);
    for (auto &x : sig_u) x = draw();
    for (auto &x : sig_v) x = draw();
    r_u[0].resize(c0.bit_length);
    for (auto &x : r_u[0]) x = draw();

    p.sumcheckLiuInit(sig_u, sig_v);
    F prev_r = F_ZERO;
    for (int j = 0; j < c0.bit_length; ++j) {
        quadratic_poly poly = p.sumcheckLiuUpdate(prev_r);
        dump(poly.c); dump(poly.b); dump(poly.a);
        prev_r = r_u[0][j];
    }
    F eval_in;
    p.sumcheckLiuFinalize(prev_r, eval_in);
    dump(eval_in);
    return 0;
}
