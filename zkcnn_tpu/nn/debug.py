"""Witness debugging utilities (reference printLayerValues,
src/neuralNetwork.cpp:979-992: exits loudly on any nonzero value in a
layer's must-be-zero region)."""

import numpy as np

from ..circuit import Circuit


def check_zero_regions(C: Circuit, vals, raise_on_fail: bool = True):
    """Assert every layer's [zero_start_id, size) block is zero.  The
    zero regions carry the bit-ness / reconstruction constraints of the
    ReLU and pooling gadgets, so a violation pinpoints a witness bug
    before any proving happens."""
    bad = []
    for i, layer in enumerate(C.layers):
        if layer.zero_start_id < layer.size:
            seg = np.asarray(vals[i][layer.zero_start_id:layer.size])
            if seg.any():
                nz = int(np.nonzero(seg.any(axis=-1))[0][0])
                bad.append((i, layer.zero_start_id + nz))
    if bad and raise_on_fail:
        raise AssertionError(f"zero-region violations at (layer, gate): "
                             f"{bad}")
    return bad


def layer_summary(C: Circuit) -> str:
    lines = []
    for i, ly in enumerate(C.layers):
        lines.append(
            f"{i:3d} {ly.ty.name:12s} size={ly.size:>9d} (2^{ly.bit_length})"
            f" uni={len(ly.uni):>9d} bin={len(ly.bin):>9d}"
            f" zero_start={ly.zero_start_id}"
            + (f" fft_bl={ly.fft_bit_length}" if ly.fft_bit_length >= 0
               else ""))
    return "\n".join(lines)
