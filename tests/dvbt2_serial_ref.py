"""Independent serial DVB-T2 FEC/interleaver oracle.

Byte/bit-at-a-time LFSRs and explicit loops, sharing only constant tables
with dtv_utils_tpu.tx.dvbt2 — catches vectorization and indexing bugs in
the JAX chain (table recall risks are shared; see PARITY.md).
"""

from __future__ import annotations

import numpy as np

from dtv_utils_tpu.core.config import Dvbt2Config, T2Constellation
from dtv_utils_tpu.core.galois import (GF2_14_DVB, GF2_16_DVB,
                                       bch_generator_poly)
from dtv_utils_tpu.core.config import T2FrameSize
from dtv_utils_tpu.tx import dvbt2_tables as T


def crc8_dvb(data_bytes) -> int:
    """Bitwise CRC-8, poly x^8+x^7+x^6+x^4+x^2+1, zero init."""
    reg = 0
    for byte in data_bytes:
        for i in range(7, -1, -1):
            fb = ((reg >> 7) & 1) ^ ((int(byte) >> i) & 1)
            reg = (reg << 1) & 0xFF
            if fb:
                reg ^= 0b11010101
    return reg


class SerialDvbt2:
    def __init__(self, cfg: Dvbt2Config):
        self.cfg = cfg
        self.phase = 0            # bytes into current packet
        self.prev = [0] * 187     # last 187 raw stream bytes

    # -- mode adaptation ---------------------------------------------------
    def mode_adapt(self, ts: np.ndarray) -> np.ndarray:
        cfg = self.cfg
        dfl_bytes = (cfg.kbch - 80) // 8
        stream = list(self.prev) + [int(x) for x in ts]
        out = []
        phase = self.phase
        for i in range(len(ts)):
            if phase == 0:  # sync byte: replace with CRC of prev 187
                out.append(crc8_dvb(stream[i:i + 187]))
            else:
                out.append(int(ts[i]))
            phase = (phase + 1) % 188
        frames = []
        phase = self.phase
        bits = np.unpackbits(np.asarray(out, dtype=np.uint8))
        dfl = cfg.kbch - 80
        for b in range(cfg.fec_blocks):
            syncd = ((188 - phase) % 188) * 8
            hdr = [0xF0, 0, 1504 >> 8, 1504 & 0xFF, dfl >> 8, dfl & 0xFF,
                   0x47, syncd >> 8, syncd & 0xFF]
            hdr.append(crc8_dvb(hdr))
            hdr_bits = np.unpackbits(np.asarray(hdr, dtype=np.uint8))
            frames.append(np.concatenate(
                [hdr_bits, bits[b * dfl:(b + 1) * dfl]]))
            phase = (phase + dfl_bytes) % 188
        self.phase = (self.phase + len(ts)) % 188
        self.prev = [int(x) for x in ts[-187:]]
        return np.stack(frames)

    # -- FEC ---------------------------------------------------------------
    def scramble(self, frames: np.ndarray) -> np.ndarray:
        reg = [1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 0]
        seq = np.empty(frames.shape[1], dtype=np.uint8)
        for i in range(len(seq)):
            fb = reg[13] ^ reg[14]
            seq[i] = fb
            reg = [fb] + reg[:-1]
        return frames ^ seq[None, :]

    def bch(self, frames: np.ndarray) -> np.ndarray:
        cfg = self.cfg
        gf = (GF2_16_DVB if cfg.frame_size is T2FrameSize.NORMAL
              else GF2_14_DVB)
        g = bch_generator_poly(gf, cfg.bch_t)
        r = len(g) - 1
        out = []
        for f in frames:
            reg = np.zeros(r, dtype=np.uint8)       # reg[0] = highest degree
            for bit in f:
                fb = reg[0] ^ bit
                reg[:-1] = reg[1:]
                reg[-1] = 0
                if fb:
                    reg ^= g[:r][::-1]
            out.append(np.concatenate([f, reg]))
        return np.stack(out)

    def ldpc(self, frames: np.ndarray) -> np.ndarray:
        cfg = self.cfg
        rows = T.ldpc_accumulator_rows(cfg.code_rate.value, cfg.nldpc,
                                       cfg.nbch)
        q = cfg.ldpc_q
        npar = cfg.nldpc - cfg.nbch
        out = []
        for f in frames:
            p = np.zeros(npar, dtype=np.uint8)
            for g, addrs in enumerate(rows):
                for m in range(360):
                    bit = f[g * 360 + m]
                    if bit:
                        for a in addrs:
                            p[(a + m * q) % npar] ^= 1
            for i in range(1, npar):
                p[i] ^= p[i - 1]
            out.append(np.concatenate([f, p]))
        return np.stack(out)

    # -- interleaving + mapping -------------------------------------------
    def bit_interleave(self, frames: np.ndarray) -> np.ndarray:
        perm = T.bit_interleaver_perm(self.cfg)
        if perm is None:
            return frames
        return frames[:, perm]

    def map_cells(self, frames: np.ndarray) -> np.ndarray:
        cfg = self.cfg
        v = cfg.constellation.bits_per_symbol
        dperm = T.demux_perm(cfg)
        nsub = len(dperm)
        lut = T.constellation_pairs(cfg.constellation, cfg.rotation)
        lutc = lut[..., 0] + 1j * lut[..., 1]
        out = []
        for f in frames:
            y = f.reshape(-1, nsub)[:, dperm].reshape(-1, v)
            words = y @ (1 << np.arange(v - 1, -1, -1))
            cells = lutc[words]
            if cfg.rotation:
                cells = cells.real + 1j * np.roll(cells.imag, 1)
            out.append(cells)
        return np.stack(out)

    def cell_time_interleave(self, cells: np.ndarray) -> np.ndarray:
        cfg = self.cfg
        nc = cfg.cells_per_fec_block
        base = T.cell_interleaver_perm(nc)
        shifts = T.cell_interleaver_shifts(cfg.fec_blocks, nc)
        ci = np.empty_like(cells)
        for r in range(cfg.fec_blocks):
            lr = (base + shifts[r]) % nc
            ci[r, lr] = cells[r]                    # out[L_r(q)] = in[q]
        nti = max(cfg.ti_blocks, 1)
        bsz, extra = divmod(cfg.fec_blocks, nti)
        sizes = [bsz + (1 if i < extra else 0) for i in range(nti)]
        out = []
        start = 0
        for size in sizes:
            blk = ci[start:start + size].reshape(-1)   # serial cell stream
            ncol = size * 5
            nrow = nc // 5
            mem = np.empty((nrow, ncol), dtype=cells.dtype)
            ptr = 0
            for c in range(ncol):                      # write column-wise
                mem[:, c] = blk[ptr:ptr + nrow]
                ptr += nrow
            out.append(mem.reshape(-1))                # read row-wise
            start += size
        return np.concatenate(out)

    def payload_cells(self, ts: np.ndarray) -> np.ndarray:
        bb = self.mode_adapt(ts)
        fec = self.ldpc(self.bch(self.scramble(bb)))
        cells = self.map_cells(self.bit_interleave(fec))
        return self.cell_time_interleave(cells)
