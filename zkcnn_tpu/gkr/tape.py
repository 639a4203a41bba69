"""Injectable verifier randomness.

The reference draws live CSPRNG randomness at every verifier step
(setByCSPRNG, reference src/verifier.cpp:139,157-160,207,249-253,
275-279), which makes transcripts irreproducible.  We make the tape an
explicit, seeded object so that (a) proofs are replayable in tests,
(b) one-chip and N-chip runs can be diffed bit-for-bit, and (c) a
Fiat-Shamir transcript can be slotted in later by deriving draws from
a running hash instead of a counter.
"""

import hashlib

from ..field.params import FR_P


class Tape:
    def __init__(self, seed: bytes = b"zkcnn-tpu"):
        self.seed = seed
        self.counter = 0

    def field(self) -> int:
        """One Fr element: SHA-512(seed || ctr) mod p (64 bytes of
        entropy -> bias < 2^-250)."""
        h = hashlib.sha512(self.seed + self.counter.to_bytes(8, "little"))
        self.counter += 1
        return int.from_bytes(h.digest(), "little") % FR_P

    def fields(self, k: int):
        return [self.field() for _ in range(k)]

    def clone(self) -> "Tape":
        """Snapshot for replaying a sub-protocol's challenge sequence
        (prover and verifier must consume identical draws)."""
        t = Tape(self.seed)
        t.counter = self.counter
        return t
