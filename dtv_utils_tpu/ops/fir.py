"""Polyphase interpolate-by-2 FIR — Pallas TPU kernel.

The J.83B RRC pulse shaper (SURVEY.md §7 step 5: "RRC interpolate-by-2 as
overlap-save polyphase conv (Pallas kernel)").  Each grid step loads one
input tile plus a HALO-sample halo into VMEM and runs both phase FIRs as
in-register shifted multiply-adds — one HBM read of the input and one write
of the output, where the XLA shifted-slice formulation re-streams the input
per fusion group.

Layout: time runs along lanes ([2, L] re/im rows).  The halo comes from a
second, TILE-shifted view of the same array whose (2, HALO) blocks stride
TILE lanes — aligned blocks, no overlapping BlockSpecs.  Taps are static
Python floats baked into the kernel.  Falls back to interpreter mode
off-TPU (CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 128           # lane width (min lane-divisible size ≥ ntaps//2-1 = 49)
# Lanes per row.  16384 (128 KB/tile) crashes the deployment's AOT
# compile helper on the full 25x2-tap unrolled kernel (minimized round 3:
# 16 taps @ 16384 compiles, 25 @ 16384 dies, 25 @ 4096 compiles and runs
# bit-exactly) — a Mosaic compile-resource cliff, not a kernel error.
TILE = 4096
# Time rows per grid step.  One 4096-lane row per step left the kernel
# latency-bound (~880 sequential grid steps ≈ 19 ms for a superblock,
# ~190x off roofline, round-4 session profile); batching rows amortizes the per-step
# cost while keeping each vector op at the Mosaic-safe 4096-lane width.
ROWS = 8


def _kernel(x_ref, xh_ref, out_ref, *, taps0, taps1, tile):
    """One block of ROWS consecutive time rows:
    out[p, :, r, m] = Σ_j taps_p[j] · xcat[:, r, m + j].

    x_ref  [2, ROWS, tile]   — this block's input rows
    xh_ref [2, ROWS, HALO]   — each row's next-HALO samples (halo)
    out_ref [2, 2, ROWS, tile] — (phase, re/im, row, time)
    """
    xcat = jnp.concatenate([x_ref[:, :, :], xh_ref[:, :, :]], axis=2)
    for p, taps in ((0, taps0), (1, taps1)):
        acc = xcat[:, :, 0:tile] * taps[0]
        for j in range(1, len(taps)):
            acc = acc + xcat[:, :, j:j + tile] * taps[j]
        out_ref[p, :, :, :] = acc


@functools.partial(jax.jit, static_argnames=("taps0", "taps1", "n_pad"))
def _interp2(x_padded: jax.Array, taps0: tuple, taps1: tuple,
             n_pad: int) -> jax.Array:
    n_rows = n_pad // TILE                      # multiple of ROWS (caller)
    x3 = x_padded[:, :n_pad].reshape(2, n_rows, TILE)
    # per-row halo = the next row's first HALO lanes (zeros past the end —
    # x_padded carries a TILE of zero tail)
    xh = x_padded[:, TILE:TILE + n_pad].reshape(2, n_rows, TILE)[:, :, :HALO]

    kern = functools.partial(_kernel, taps0=taps0, taps1=taps1, tile=TILE)
    y = pl.pallas_call(
        kern,
        grid=(n_rows // ROWS,),
        in_specs=[
            pl.BlockSpec((2, ROWS, TILE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, ROWS, HALO), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, 2, ROWS, TILE), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, 2, n_rows, TILE), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(x3, xh)
    return y.reshape(2, 2, n_pad)


_PALLAS_OK: bool | None = None


def pallas_enabled() -> bool:
    """Whether the J.83B RRC uses the Pallas kernel on TPU (default: yes;
    set DTV_PALLAS_FIR=0 to force the XLA conv formulation).

    Round-2 note ("AOT helper crashes on the 50-tap unrolled FIR") was a
    TILE=16384 compile-resource cliff; at TILE=4096 the full kernel
    compiles and runs on the remote-tunnel deployment (see TILE above),
    validated bit-exact against the XLA formulation on-device.  Other TPU
    toolchain versions could still hit the compile-resource cliff, so the
    first call probes a one-tile compile and falls back to the XLA conv
    path automatically (with a warning) if the Mosaic compile raises."""
    import os
    if os.environ.get("DTV_PALLAS_FIR", "1") == "0":
        return False
    global _PALLAS_OK
    if _PALLAS_OK is None:
        try:
            probe_taps = tuple(0.0 for _ in range(25))
            n_pad = ROWS * TILE
            x = jnp.zeros((2, n_pad + TILE), jnp.float32)
            _interp2.lower(x, probe_taps, probe_taps, n_pad).compile()
            _PALLAS_OK = True
        except Exception as e:  # Mosaic compile-resource cliff
            import warnings
            warnings.warn(
                "Pallas FIR kernel failed to compile on this TPU toolchain "
                f"({type(e).__name__}); falling back to the XLA conv path. "
                "Set DTV_PALLAS_FIR=0 to silence this probe.")
            _PALLAS_OK = False
    return _PALLAS_OK


def polyphase_interp2(ext_rows: jax.Array, taps: np.ndarray,
                      n: int) -> jax.Array:
    """ext_rows [2, hist + n] (hist = ntaps//2 - 1 history samples) →
    phase-interleaved output [2, 2n]: out[:, 2m+p] = Σ_j h_p[j]·ext[:, m+j]
    with h_p = taps[p::2] reversed (true convolution)."""
    taps0 = tuple(float(v) for v in taps[0::2][::-1])
    taps1 = tuple(float(v) for v in taps[1::2][::-1])
    n_pad = -(-n // (ROWS * TILE)) * (ROWS * TILE)
    total = n_pad + TILE                    # room for the shifted halo view
    x_padded = jnp.pad(ext_rows, ((0, 0), (0, total - ext_rows.shape[1])))
    y = _interp2(x_padded, taps0, taps1, n_pad)      # [2(p), 2(c), n_pad]
    return jnp.transpose(y, (1, 2, 0)).reshape(2, 2 * n_pad)[:, :2 * n]
