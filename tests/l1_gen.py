"""Synthesize base64 ATSC 3.0 L1 signaling captures for l1dump tests.

Packs L1-Basic (200 bits) + L1-Detail in the exact field order the decoder
reads (A/331 subset as parsed by /root/reference/l1dump.c), then base64-
encodes.  Scenario builders below cover single/multi-subframe, channel
bonding, MIMO, HTI/CTI/LDM, and both frame-length modes.
"""

from __future__ import annotations

import base64
import dataclasses
from dataclasses import field


class BW:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, value: int, n: int) -> "BW":
        for i in range(n - 1, -1, -1):
            self.bits.append((int(value) >> i) & 1)
        return self

    def to_bytes(self) -> bytes:
        out = bytearray()
        bits = self.bits + [0] * (-len(self.bits) % 8)
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


@dataclasses.dataclass
class Plp:
    id: int = 0
    lls: int = 0
    layer: int = 0
    start: int = 0
    size: int = 100000
    scrambler: int = 0
    fec_type: int = 1            # BCH + 64K LDPC
    mod: int = 3                 # 256QAM
    cod: int = 8                 # 10/15
    ti_mode: int = 0
    fec_block_start: int = 0
    cti_fec_block_start: int = 0
    num_channel_bonded: int = 0
    bonding_format: int = 0
    bonded_rf: tuple = ()
    mimo_comb: int = 0
    mimo_iq: int = 0
    mimo_ph: int = 0
    dispersed: int = 0
    num_subslices: int = 3       # raw-1 written
    subslice_interval: int = 5000
    ext_il: int = 0
    cti_depth: int = 2
    cti_start_row: int = 17
    hti_inter: int = 0
    hti_num_ti_blocks: int = 2   # raw (count-1)
    hti_fec_max: int = 50        # raw
    hti_fec_blocks: tuple = (40,)
    hti_cell_il: int = 1
    ldm_level: int = 4


@dataclasses.dataclass
class Subframe:
    mimo: int = 0
    miso: int = 0
    fft: int = 0                 # enum 0/1/2
    cred: int = 0
    gi: int = 5
    num_ofdm: int = 100          # actual count
    pilot: int = 0
    boost: int = 2
    sbs_first: int = 0
    sbs_last: int = 0
    multiplex: int = 0
    freq_interleaver: int = 1
    sbs_null_cells: int = 425
    plps: list = field(default_factory=lambda: [Plp()])


@dataclasses.dataclass
class Capture:
    version: int = 0
    mimo_pilot: int = 0
    lls: int = 0
    time_info: int = 0
    return_ch: int = 0
    papr: int = 1
    flm: int = 1                 # symbol-aligned
    frame_length: int = 35       # x5 ms (time-aligned)
    excess: int = 100
    time_offset: int = 1000
    add_samples: int = 12
    preamble_num_symbols: int = 2
    preamble_cred: int = 1
    content_tag: int = 1
    detail_fec: int = 2
    add_parity: int = 0
    detail_total_cells: int = 2000
    fs_mimo_mixed: int = 0
    b_crc: int = 0x1B2C3D4E
    d_version: int = 0
    bonded_bsid: tuple = ()      # len == num_rf
    t_sec: int = 1723930000
    t_msec: int = 512
    t_usec: int = 300
    t_nsec: int = 7
    bsid: int = 0xBEEF
    mixed: dict = field(default_factory=dict)  # i -> [(present,c,q,p)...]
    d_crc: int = 0x5F6A7B8C
    subs: list = field(default_factory=lambda: [Subframe()])


def _pack_plp(w: BW, cap: Capture, sf: Subframe, first_sub: bool, p: Plp):
    w.u(p.id, 6).u(p.lls, 1).u(p.layer, 2)
    w.u(p.start, 24).u(p.size, 24).u(p.scrambler, 2).u(p.fec_type, 4)
    if p.fec_type <= 5:
        w.u(p.mod, 4).u(p.cod, 4)
    w.u(p.ti_mode, 2)
    if p.ti_mode == 0:
        w.u(p.fec_block_start, 15)
    elif p.ti_mode == 1:
        w.u(p.cti_fec_block_start, 22)
    if len(cap.bonded_bsid) > 0:
        w.u(p.num_channel_bonded, 3)
        if p.num_channel_bonded > 0:
            w.u(p.bonding_format, 2)
            for rf in p.bonded_rf:
                w.u(rf, 3)
    fs_mimo = cap.subs[0].mimo
    if (first_sub and fs_mimo == 1) or (not first_sub and sf.mimo):
        w.u(p.mimo_comb, 1).u(p.mimo_iq, 1).u(p.mimo_ph, 1)
    if p.layer == 0:
        w.u(p.dispersed, 1)
        if p.dispersed:
            w.u(p.num_subslices - 1, 14).u(p.subslice_interval, 24)
        if p.ti_mode in (1, 2) and p.mod == 0:
            w.u(p.ext_il, 1)
        if p.ti_mode == 1:
            w.u(p.cti_depth, 3).u(p.cti_start_row, 11)
        elif p.ti_mode == 2:
            w.u(p.hti_inter, 1)
            w.u(p.hti_num_ti_blocks, 4)
            w.u(p.hti_fec_max, 12)
            if p.hti_inter == 0:
                w.u(p.hti_fec_blocks[0], 12)
            else:
                for k in range(p.hti_num_ti_blocks + 1):
                    w.u(p.hti_fec_blocks[k % len(p.hti_fec_blocks)], 12)
            w.u(p.hti_cell_il, 1)
    else:
        w.u(p.ldm_level, 5)


def pack(cap: Capture) -> bytes:
    fs = cap.subs[0]
    nsub_raw = len(cap.subs) - 1

    detail = BW()
    detail.u(cap.d_version, 4).u(len(cap.bonded_bsid), 3)
    for b in cap.bonded_bsid:
        detail.u(b, 16).u(0, 3)
    if cap.time_info != 0:
        detail.u(cap.t_sec, 32).u(cap.t_msec, 10)
        if cap.time_info != 1:
            detail.u(cap.t_usec, 10)
            if cap.time_info != 2:
                detail.u(cap.t_nsec, 10)
    for i, sf in enumerate(cap.subs):
        if i > 0:
            detail.u(sf.mimo, 1).u(sf.miso, 2).u(sf.fft, 2)
            detail.u(sf.cred, 3).u(sf.gi, 4).u(sf.num_ofdm - 1, 11)
            detail.u(sf.pilot, 5).u(sf.boost, 3)
            detail.u(sf.sbs_first, 1).u(sf.sbs_last, 1)
        if nsub_raw > 0:
            detail.u(sf.multiplex, 1)
        detail.u(sf.freq_interleaver, 1)
        effective = (sf.sbs_first == 1 or sf.sbs_last == 1) if i == 0 \
            else sf.sbs_last == 1   # reference keys i>0 on sbs_last [bug]
        if effective:
            detail.u(sf.sbs_null_cells, 13)
        detail.u(len(sf.plps) - 1, 6)
        for p in sf.plps:
            _pack_plp(detail, cap, sf, i == 0, p)
    if cap.d_version >= 1:
        detail.u(cap.bsid, 16)
    if cap.d_version >= 2:
        last_nplp = len(cap.subs[-1].plps)
        for i, sf in enumerate(cap.subs):
            flags = cap.mixed.get(i, [])
            mixed_bit = 1 if flags else 0
            if i > 0:
                detail.u(mixed_bit, 1)
            cond = (cap.fs_mimo_mixed == 1) if i == 0 else mixed_bit == 1
            if cond:
                assert len(flags) == last_nplp, (i, len(flags), last_nplp)
                for f in flags:
                    detail.u(f[0], 1)
                    if f[0] == 1:
                        detail.u(f[1], 1).u(f[2], 1).u(f[3], 1)
    consumed = len(detail.bits)
    size_bytes = (consumed + 32 + 7) // 8
    pad = size_bytes * 8 - 32 - consumed
    detail.u(0, pad)
    detail.u(cap.d_crc, 32)

    w = BW()
    w.u(cap.version, 3).u(cap.mimo_pilot, 1).u(cap.lls, 1)
    w.u(cap.time_info, 2).u(cap.return_ch, 1).u(cap.papr, 2).u(cap.flm, 1)
    if cap.flm == 0:
        w.u(cap.frame_length, 10).u(cap.excess, 13)
    else:
        w.u(cap.time_offset, 16).u(cap.add_samples, 7)
    w.u(nsub_raw, 8)
    w.u(cap.preamble_num_symbols - 1, 3)
    w.u(cap.preamble_cred, 3).u(cap.content_tag, 2)
    w.u(size_bytes, 13)
    w.u(cap.detail_fec, 3).u(cap.add_parity, 2)
    w.u(cap.detail_total_cells, 19)
    w.u(fs.mimo, 1).u(fs.miso, 2).u(fs.fft, 2).u(fs.cred, 3).u(fs.gi, 4)
    w.u(fs.num_ofdm - 1, 11).u(fs.pilot, 5).u(fs.boost, 3)
    w.u(fs.sbs_first, 1).u(fs.sbs_last, 1)
    if cap.version == 0:
        w.u(0, 48)
    else:
        w.u(cap.fs_mimo_mixed, 1).u(0, 47)
    w.u(cap.b_crc, 32)
    assert len(w.bits) == 200, len(w.bits)
    w.bits.extend(detail.bits)
    return base64.b64encode(w.to_bytes()) + b"\n"


# ---------------------------------------------------------------- scenarios

def single() -> bytes:
    """1 subframe, symbol-aligned, SBS on, 2 core PLPs (none + HTI)."""
    sf = Subframe(fft=0, gi=3, pilot=0, boost=2, cred=2, num_ofdm=100,
                  sbs_first=1, sbs_last=1,
                  plps=[Plp(id=0, ti_mode=0, size=550300),
                        Plp(id=1, ti_mode=2, mod=1, cod=4, fec_type=0,
                            size=120000, hti_inter=0,
                            hti_fec_blocks=(30,))])
    return pack(Capture(subs=[sf], preamble_num_symbols=2, papr=1, flm=1))


def multi() -> bytes:
    """3 subframes, time-aligned, CTI + LDM + QPSK ext-interleaving."""
    s0 = Subframe(fft=2, gi=9, pilot=6, boost=1, cred=0, num_ofdm=80,
                  sbs_first=1, sbs_last=0,
                  plps=[Plp(id=0, ti_mode=1, mod=0, cod=2, fec_type=3,
                            size=200000, ext_il=1, cti_depth=3)])
    s1 = Subframe(fft=1, gi=7, pilot=9, boost=4, cred=3, num_ofdm=140,
                  miso=1, sbs_first=0, sbs_last=1, sbs_null_cells=333,
                  plps=[Plp(id=1, ti_mode=1, mod=2, cod=10, size=90000,
                            cti_depth=2),
                        Plp(id=2, layer=1, ldm_level=1, size=90000,
                            mod=1, cod=5)])
    s2 = Subframe(fft=0, gi=12, pilot=15, boost=0, cred=4, num_ofdm=60,
                  sbs_first=0, sbs_last=0,
                  plps=[Plp(id=3, ti_mode=0, mod=5, cod=11, size=40000,
                            dispersed=1)])
    return pack(Capture(subs=[s0, s1, s2], version=1, d_version=1,
                        time_info=3, flm=0, frame_length=40, excess=211,
                        papr=0, preamble_num_symbols=1, lls=1,
                        mimo_pilot=1, return_ch=1, add_parity=1,
                        detail_fec=6))


def bonded_mimo() -> bytes:
    """Channel bonding + first-sub MIMO + L1D version 2 mixed walk."""
    s0 = Subframe(fft=1, gi=6, pilot=4, boost=3, cred=1, num_ofdm=120,
                  mimo=1, sbs_first=1, sbs_last=1,
                  plps=[Plp(id=0, ti_mode=2, mod=0, cod=6, fec_type=2,
                            size=150000, hti_inter=1, ext_il=0,
                            hti_num_ti_blocks=2,
                            hti_fec_blocks=(20, 25, 30),
                            num_channel_bonded=2, bonded_rf=(1, 3))])
    s1 = Subframe(fft=2, gi=11, pilot=12, boost=2, cred=2, num_ofdm=90,
                  mimo=1, sbs_first=1, sbs_last=0,
                  plps=[Plp(id=1, ti_mode=0, mod=4, cod=9, size=250000,
                            num_channel_bonded=1, bonded_rf=(2,),
                            bonding_format=1, mimo_comb=1, mimo_ph=1)])
    cap = Capture(subs=[s0, s1], version=2, d_version=2, time_info=1,
                  flm=1, papr=3, preamble_num_symbols=3, preamble_cred=4,
                  fs_mimo_mixed=1, bonded_bsid=(0x1A2B, 0x3C4D),
                  mixed={0: [(1, 1, 0, 1)], 1: [(0, 0, 0, 0)]})
    return pack(cap)


SCENARIOS = {"single": single, "multi": multi, "bonded_mimo": bonded_mimo}
