"""Independent byte/bit-serial DVB-T encoder used as a test oracle.

Deliberately written the way the reference's C/C++ blocks work — explicit
LFSRs, delay-line deques, per-bit loops (cf. the GNU Radio blocks
instantiated at /root/reference/dvbt-blade.py:179-189) — sharing only the
*constant tables* with the vectorized JAX chain, so any indexing/vectorization
bug in dtv_utils_tpu.tx.dvbt shows up as a mismatch.
"""

from __future__ import annotations

from collections import deque

import numpy as np

from dtv_utils_tpu.core.config import DvbtConfig
from dtv_utils_tpu.core.prbs import dvbt_pilot_signs
from dtv_utils_tpu.ops.convcode import PUNCTURE_PATTERNS
from dtv_utils_tpu.ops.rs import DVBT_RS
from dtv_utils_tpu.tx import dvbt_tables as T


class SerialDvbt:
    """Stateful stream encoder; feed whole superframes of TS bytes."""

    def __init__(self, cfg: DvbtConfig):
        self.cfg = cfg
        # energy dispersal LFSR state & packet counter
        self.prbs_reg = [1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 0]
        self.pkt_count = 0
        # outer interleaver: 12 branches, branch b delays b*17 bytes
        self.branches = [deque([0] * (b * 17)) for b in range(12)]
        self.byte_count = 0
        # inner coder register: last 6 input bits, most recent first
        self.conv_reg = [0] * 6
        self.symbol_count = 0

    # --- stage 1: energy dispersal -------------------------------------
    def _prbs_byte(self) -> int:
        out = 0
        for _ in range(8):
            fb = self.prbs_reg[13] ^ self.prbs_reg[14]
            out = (out << 1) | fb
            self.prbs_reg = [fb] + self.prbs_reg[:-1]
        return out

    def dispersal(self, ts: np.ndarray) -> np.ndarray:
        out = np.empty_like(ts)
        for p in range(len(ts) // 188):
            pkt = ts[p * 188:(p + 1) * 188].copy()
            if self.pkt_count % 8 == 0:
                self.prbs_reg = [1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 0]
                pkt[0] ^= 0xFF          # invert sync of first packet in group
                # first PRBS byte applies to the byte AFTER the inverted sync
            else:
                self._prbs_byte()       # PRBS clocked during (skipped) sync
            for i in range(1, 188):
                pkt[i] ^= self._prbs_byte()
            out[p * 188:(p + 1) * 188] = pkt
            self.pkt_count += 1
        return out

    # --- stage 2: RS(204,188) ------------------------------------------
    def rs(self, dispersed: np.ndarray) -> np.ndarray:
        pkts = dispersed.reshape(-1, 188)
        return DVBT_RS().encode_bytes_ref(pkts).reshape(-1).astype(np.uint8)

    # --- stage 3: outer interleaver ------------------------------------
    def outer(self, stream: np.ndarray) -> np.ndarray:
        out = np.empty_like(stream)
        for i, byte in enumerate(stream):
            b = self.byte_count % 12
            if b == 0:
                out[i] = byte           # branch 0: no delay
            else:
                q = self.branches[b]
                q.append(int(byte))
                out[i] = q.popleft()
            self.byte_count += 1
        return out

    # --- stage 4: conv encode + puncture --------------------------------
    def inner(self, stream: np.ndarray) -> np.ndarray:
        bits = np.unpackbits(stream)
        xp, yp = PUNCTURE_PATTERNS[self.cfg.code_rate.value]
        period = len(xp)
        out = []
        for i, d in enumerate(bits):
            r = [int(d)] + self.conv_reg
            x = r[0] ^ r[1] ^ r[2] ^ r[3] ^ r[6]
            y = r[0] ^ r[2] ^ r[3] ^ r[5] ^ r[6]
            ph = i % period
            if xp[ph]:
                out.append(x)
            if yp[ph]:
                out.append(y)
            self.conv_reg = r[:6]
        return np.asarray(out, dtype=np.uint8)

    # --- stage 5: bit interleaver → cell words --------------------------
    def bit_interleave(self, bits: np.ndarray) -> np.ndarray:
        v = self.cfg.constellation.bits_per_symbol
        demux = T.DEMUX[v]
        n_cells = len(bits) // v
        subs = [[] for _ in range(v)]
        for i, bit in enumerate(bits):
            subs[demux[i % v]].append(int(bit))
        words = np.empty(n_cells, dtype=np.int64)
        for c in range(n_cells):
            blk, w = divmod(c, 126)
            word = 0
            for e in range(v):
                he = (w + T.BIT_ILV_OFFSETS[e]) % 126
                word = (word << 1) | subs[e][blk * 126 + he]
            words[c] = word
        return words

    # --- stage 6: symbol interleaver ------------------------------------
    def symbol_interleave(self, words: np.ndarray) -> np.ndarray:
        n_data = self.cfg.mode.data_carriers
        h = T.symbol_interleaver_perm(self.cfg.mode)
        out = np.empty_like(words)
        for s in range(len(words) // n_data):
            blk = words[s * n_data:(s + 1) * n_data]
            dst = np.empty_like(blk)
            if self.symbol_count % 2 == 0:
                for q in range(n_data):
                    dst[h[q]] = blk[q]
            else:
                for q in range(n_data):
                    dst[q] = blk[h[q]]
            out[s * n_data:(s + 1) * n_data] = dst
            self.symbol_count += 1
        return out

    # --- stages 7-8: map + pilots/TPS grid -------------------------------
    def to_carriers(self, words: np.ndarray) -> np.ndarray:
        cfg = self.cfg
        lut = T.constellation_lut(cfg.constellation)
        K = cfg.mode.carriers
        n_data = cfg.mode.data_carriers
        w_sign = dvbt_pilot_signs(K)
        cont = set(T.continual_pilots(cfg.mode).tolist())
        tps_set = set(T.tps_carriers(cfg.mode).tolist())
        d = T.tps_dbpsk_signs(cfg)
        n_sym = len(words) // n_data
        grids = np.zeros((n_sym, K), dtype=np.complex64)
        for l in range(n_sym):
            cells = lut[words[l * n_data:(l + 1) * n_data]]
            scat = set(T.scattered_pilots(cfg.mode, l % 4).tolist())
            di = 0
            for k in range(K):
                if k in cont or k in scat:
                    grids[l, k] = np.float32(4.0 / 3.0) * w_sign[k]
                elif k in tps_set:
                    grids[l, k] = d[l % len(d)] * w_sign[k]
                else:
                    grids[l, k] = cells[di]
                    di += 1
            assert di == n_data
        return grids

    # --- stages 9-10: IFFT + CP ------------------------------------------
    def to_iq(self, grids: np.ndarray) -> np.ndarray:
        cfg = self.cfg
        fft = cfg.fft_size
        gi = cfg.guard_samples
        K = cfg.mode.carriers
        n_sym = grids.shape[0]
        out = np.empty(n_sym * (fft + gi), dtype=np.complex64)
        left = (fft - K + 1) // 2
        for l in range(n_sym):
            spec = np.zeros(fft, dtype=np.complex64)
            spec[left:left + K] = grids[l]
            time = np.fft.ifft(np.fft.ifftshift(spec)) * fft
            sym = np.concatenate([time[fft - gi:], time]) * 0.0022097087
            out[l * (fft + gi):(l + 1) * (fft + gi)] = sym.astype(np.complex64)
        return out

    def encode_to_carriers(self, ts: np.ndarray) -> np.ndarray:
        x = self.dispersal(np.asarray(ts, dtype=np.uint8))
        x = self.rs(x)
        x = self.outer(x)
        b = self.inner(x)
        w = self.bit_interleave(b)
        w = self.symbol_interleave(w)
        return self.to_carriers(w)

    def modulate(self, ts: np.ndarray) -> np.ndarray:
        return self.to_iq(self.encode_to_carriers(ts))
