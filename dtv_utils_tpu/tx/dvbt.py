"""DVB-T modulator (EN 300 744), TPU-native.

Re-expresses the reference transmit chain — the 12-block GNU Radio flowgraph
at /root/reference/dvbt-blade.py:179-210 (energy dispersal → RS(204,188) →
Forney outer interleaver → K=7 punctured convolutional coder → bit / symbol
inner interleavers → QAM map → pilots/TPS → IFFT → cyclic prefix → ×const)
— as ONE jit-compiled array program over a whole superframe:

  * all interleavers are precomputed static gathers;
  * RS parity is an int8 MXU matmul over GF(2) bitplanes;
  * the convolutional coder is a handful of shifted XORs;
  * 272 OFDM symbols IFFT as one batched FFT.

Streaming state across superframes is a tiny pytree (dispersal packet phase,
outer-interleaver tail, 6 bits of coder memory) — every element is a pure
function of the *input* TS stream, which is what makes the time axis
shardable (parallel/stream.py).

Output amplitude matches the reference convention: unnormalized (FFTW-style)
inverse FFT scaled by 0.0022097087 (dvbt-blade.py:187-189; the script uses
this constant for every mode/constellation).

IQ is carried as float32 (re, im) pairs [..., 2] (core/cplx.py) — the TPU
backend has no complex dtype, and the pair layout is bit-identical to the
gr_complex file format — with the IFFT as batched MXU matmuls (ops/cfft.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from dtv_utils_tpu.core import bits as bitops
from dtv_utils_tpu.core import cplx
from dtv_utils_tpu.core.config import DvbtConfig
from dtv_utils_tpu.ops.cfft import ifft_pairs, ifftshift_pairs
from dtv_utils_tpu.core.prbs import dvbt_dispersal_mask
from dtv_utils_tpu.ops.convcode import conv_encode
from dtv_utils_tpu.ops.interleave import forney_carry_len
from dtv_utils_tpu.ops.rs import DVBT_RS
from dtv_utils_tpu.tx import dvbt_tables as T

OUTPUT_SCALE = 0.0022097087      # dvbt-blade.py:189
OUTER_I, OUTER_M = 12, 17        # dvbt-blade.py:181


@jax.tree_util.register_dataclass
@dataclass
class DvbtState:
    """Carry-state between consecutive TS blocks (superframes)."""
    packet_phase: jax.Array   # int32 scalar: packets into the 8-pkt PRBS group
    outer_carry: jax.Array    # uint8 [2244]: Forney interleaver tail
    conv_state: jax.Array     # uint8 [6]: last 6 interleaved-stream bits


def init_state(cfg: DvbtConfig) -> DvbtState:
    del cfg
    return DvbtState(
        packet_phase=jnp.zeros((), jnp.int32),
        outer_carry=jnp.zeros(forney_carry_len(OUTER_I, OUTER_M), jnp.uint8),
        conv_state=jnp.zeros(6, jnp.uint8),
    )


@functools.cache
def _plan(cfg: DvbtConfig):
    """All static tables for one config (host NumPy, cached)."""
    n_pkt = cfg.rs_blocks_per_superframe
    v = cfg.constellation.bits_per_symbol
    n_cells = cfg.cells_per_superframe
    mask, _ = dvbt_dispersal_mask()
    # dispersal mask for every possible packet phase (gcd stepping covers
    # only a subset at runtime, but 8 rows is nothing)
    total = n_pkt * 188
    masks = np.empty((8, total), dtype=np.uint8)
    base = np.tile(mask, total // len(mask) + 2)
    for ph in range(8):
        masks[ph] = base[ph * 188: ph * 188 + total]
    del n_cells
    # puncture: small per-period column selector (serial order: X_i then Y_i)
    from dtv_utils_tpu.ops.convcode import PUNCTURE_PATTERNS
    xp, yp = PUNCTURE_PATTERNS[cfg.code_rate.value]
    keep_cols = []
    for i in range(len(xp)):
        if xp[i]:
            keep_cols.append(2 * i)
        if yp[i]:
            keep_cols.append(2 * i + 1)
    even_idx, odd_idx = T.symbol_interleaver_gather(cfg.mode)
    lut = np.stack([T.constellation_lut(cfg.constellation).real,
                    T.constellation_lut(cfg.constellation).imag],
                   axis=-1).astype(np.float32)
    plan_c = T.carrier_plan(cfg)
    static_cells = np.stack([plan_c.static_cells.real,
                             plan_c.static_cells.imag],
                            axis=-1).astype(np.float32)
    pow2 = (1 << np.arange(v - 1, -1, -1)).astype(np.int32)
    demux_pos = np.argsort(np.asarray(T.DEMUX[v]))
    # NumPy only, and no full-stream index tables: giant gather constants
    # bloat the executable (hundreds of MB at 8k 64QAM) — every permutation
    # below is expressed with strided slices / rolls / tiny index vectors.
    return dict(
        masks=masks,
        punct_period=len(xp),
        keep_cols=np.asarray(keep_cols, dtype=np.int32),
        demux_pos=demux_pos.astype(np.int32),
        even_idx=even_idx.astype(np.int32),
        odd_idx=odd_idx.astype(np.int32),
        lut=lut,
        gidx=plan_c.gidx.astype(np.int32),
        static_cells=static_cells,
        pow2=pow2,
    )


def encode_to_carriers(cfg: DvbtConfig, ts: jax.Array,
                       state: DvbtState) -> tuple[jax.Array, DvbtState]:
    """Stages 1-8 (dispersal … pilot/TPS assembly): ts uint8
    [ts_bytes_per_superframe] → carrier grid complex64 [272, K] + next state.
    """
    p = _plan(cfg)
    n_pkt = cfg.rs_blocks_per_superframe
    v = cfg.constellation.bits_per_symbol
    n_sym = cfg.symbols_per_superframe
    n_data = cfg.mode.data_carriers

    # 1. energy dispersal — one XOR with the phase-selected PRBS mask
    dispersed = ts ^ jnp.asarray(p["masks"])[state.packet_phase % 8]
    new_phase = (state.packet_phase + n_pkt) % 8

    # 2. RS(204,188) — MXU bit-matmul per packet
    pkts = dispersed.reshape(n_pkt, 188)
    coded = DVBT_RS().encode_bytes(pkts).reshape(n_pkt * 204)

    # 3. outer (Forney) convolutional interleaver.  out[12r + b] =
    # ext[C + 12r + b - 204b]: one strided slice per branch, no index table.
    C = state.outer_carry.shape[0]
    ext = jnp.concatenate([state.outer_carry, coded])
    n_bytes = n_pkt * 204
    rows = n_bytes // OUTER_I
    cols = [jax.lax.slice(ext, (C + b - OUTER_I * OUTER_M * b,),
                          (C + b - OUTER_I * OUTER_M * b + OUTER_I * rows,),
                          (OUTER_I,))
            for b in range(OUTER_I)]
    outer = jnp.stack(cols, axis=1).reshape(n_bytes)
    new_outer_carry = ext[-C:]

    # 4. inner coder: K=7 mother code on the bitstream + puncturing
    dbits = bitops.bytes_to_bits(outer)
    xy = conv_encode(dbits, state.conv_state)          # [nbits, 2]
    new_conv_state = dbits[-6:][::-1]                  # most recent first
    # puncture: pick kept (step, X/Y) columns within each period
    per = p["punct_period"]
    punctured = xy.reshape(-1, 2 * per)[:, p["keep_cols"]].reshape(-1)

    # 5. bit interleaver: demux = column pick, H_e(w)=(w+off_e)%126 = roll
    bits3 = punctured.reshape(-1, T.BIT_ILV_BLOCK, v)  # [blk, w, j]
    cell_cols = [jnp.roll(bits3[:, :, int(p["demux_pos"][e])],
                          -T.BIT_ILV_OFFSETS[e], axis=1)
                 for e in range(v)]
    cell_bits = jnp.stack(cell_cols, axis=-1)          # [blk, w, e]
    words = jnp.sum(cell_bits.reshape(-1, v).astype(jnp.int32) * p["pow2"],
                    axis=-1)

    # 6. symbol interleaver: one small [n_data] gather per parity class
    sym_words = words.reshape(n_sym // 2, 2, n_data)
    sym_words = jnp.stack(
        [sym_words[:, 0, :][:, p["even_idx"]],
         sym_words[:, 1, :][:, p["odd_idx"]]], axis=1).reshape(n_sym, n_data)

    # 7. QAM map
    data_cells = jnp.asarray(p["lut"])[sym_words]      # pairs [.., 2]

    # 8. pilots + TPS: per-phase [K] gather from [data || static]
    source = jnp.concatenate(
        [data_cells, jnp.asarray(p["static_cells"])], axis=1)
    src4 = source.reshape(n_sym // 4, 4, source.shape[1], 2)
    carriers = jnp.stack(
        [src4[:, ph][:, p["gidx"][ph]] for ph in range(4)],
        axis=1).reshape(n_sym, -1, 2)

    return carriers, DvbtState(packet_phase=new_phase,
                               outer_carry=new_outer_carry,
                               conv_state=new_conv_state)


def carriers_to_iq(cfg: DvbtConfig, carriers: jax.Array) -> jax.Array:
    """Stages 9-10: carrier grid [n_sym, K, 2] → IQ pairs
    [n_sym * (fft + guard), 2]."""
    fft = cfg.fft_size
    gi = cfg.guard_samples
    K = cfg.mode.carriers
    n_sym = carriers.shape[0]
    # center carriers (zeros_on_left = ceil((fft-K)/2), as gr-dtv lays out)
    left = (fft - K + 1) // 2
    spec = jnp.zeros((n_sym, fft, 2), dtype=jnp.float32)
    spec = spec.at[:, left:left + K].set(carriers)
    # unnormalized inverse FFT (FFTW convention of fft.fft_vcc, shift=True)
    time = ifft_pairs(ifftshift_pairs(spec))
    sym_out = jnp.concatenate([time[:, fft - gi:], time], axis=1)
    return (sym_out * OUTPUT_SCALE).reshape(-1, 2)


def modulate_superframe(cfg: DvbtConfig, ts: jax.Array,
                        state: DvbtState) -> tuple[jax.Array, DvbtState]:
    """One superframe: ts uint8 [ts_bytes_per_superframe] → IQ float32
    pairs [272 * (fft + guard), 2], plus the next stream state.

    jit with cfg static: ``jax.jit(modulate_superframe, static_argnums=0)``.
    """
    carriers, new_state = encode_to_carriers(cfg, ts, state)
    return carriers_to_iq(cfg, carriers), new_state


@functools.cache
def jit_modulator(cfg: DvbtConfig):
    return jax.jit(functools.partial(modulate_superframe, cfg))


def modulate_stream(cfg: DvbtConfig, ts: np.ndarray,
                    state: DvbtState | None = None,
                    ) -> tuple[np.ndarray, DvbtState]:
    """Host convenience: modulate any whole number of superframes.

    Returns complex64 (host view of the device pair arrays)."""
    blk = cfg.ts_bytes_per_superframe
    assert len(ts) % blk == 0, f"need multiple of {blk} TS bytes"
    if state is None:
        state = init_state(cfg)
    fn = jit_modulator(cfg)
    out = []
    for i in range(len(ts) // blk):
        iq, state = fn(jnp.asarray(ts[i * blk:(i + 1) * blk]), state)
        out.append(cplx.to_np(iq))
    return np.concatenate(out) if out else np.empty(0, np.complex64), state
