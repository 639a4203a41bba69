#!/usr/bin/env python3
"""Generate synthetic demo data for the baseline runs.

The reference's bundled data archive is absent upstream
(.MISSING_LARGE_BLOBS), so both sides run on the same synthetic stream:
np.default_rng(seed).uniform(-1, 1), which is exactly what
zkcnn_tpu.nn.random_source(seed) yields take()-by-take.  The C++ demo
reads doubles sequentially from the CSV (ifstream >> double,
neuralNetwork.cpp:813/840), so value alignment only requires the two
builders to consume the same counts in the same order.

%.17g round-trips IEEE doubles exactly, so the C++ side parses
bit-identical values.
"""

import argparse
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("out")
ap.add_argument("--seed", type=int, default=24)
ap.add_argument("--count", type=int, default=4_000_000)
ap.add_argument("--img", type=int, default=1024,
                help="image element count (first img values are in "
                     "[0,1), like normalized MNIST/CIFAR pixels)")
ap.add_argument("--wscale", type=float, default=0.08,
                help="weight range half-width (trained-net scale; also "
                     "keeps activations inside the quantizer's range so "
                     "the reference's (int)log2 truncation-vs-floor "
                     "corner -- neuralNetwork.cpp:975, a latent bug its "
                     "bundled data never triggers -- stays untriggered)")
a = ap.parse_args()

rng = np.random.default_rng(a.seed)
vals = rng.uniform(-1.0, 1.0, a.count)
vals[:a.img] = (vals[:a.img] + 1.0) / 2.0   # pixels in [0, 1)
vals[a.img:] *= a.wscale                     # weights/biases small
with open(a.out, "w") as f:
    for i in range(0, a.count, 1024):
        f.write("\n".join("%.17g" % v for v in vals[i:i + 1024]))
        f.write("\n")
print(f"wrote {a.count} doubles (seed {a.seed}) to {a.out}")
