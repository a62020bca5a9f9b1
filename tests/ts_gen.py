"""Synthesize MPEG-2 transport streams for xport analyzer tests.

Builds PAT/PMT/PSIP sections, PES packets with PTS/DTS, PCR-bearing
adaptation fields, and MPEG-2 video + MPEG-1 Layer II audio elementary
streams — everything the xport TS demuxer decodes (layouts per ISO 13818-1
and ATSC A/65 as parsed by /root/reference/xport.c).
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------- TS layer

class TsMux:
    def __init__(self, hdmv: bool = False):
        self.cc = {}
        self.out = bytearray()
        self.hdmv = hdmv
        self.arrival = 1000

    def _next_cc(self, pid: int) -> int:
        c = self.cc.get(pid, 0)
        self.cc[pid] = (c + 1) & 0xF
        return c

    def packet(self, pid: int, payload: bytes, pusi: bool = False,
               pcr: int | None = None, skip_cc: bool = False) -> None:
        """One 188-byte packet; payload padded via adaptation stuffing."""
        if skip_cc:
            self._next_cc(pid)
        cc = self._next_cc(pid)
        af = bytearray()
        have_af = pcr is not None
        if pcr is not None:
            base, ext = divmod(pcr, 300)
            af_body = bytearray([0x10])          # PCR flag
            af_body += bytes([(base >> 25) & 0xFF, (base >> 17) & 0xFF,
                              (base >> 9) & 0xFF, (base >> 1) & 0xFF,
                              ((base & 1) << 7) | 0x7E | ((ext >> 8) & 1),
                              ext & 0xFF])
            af = bytearray([len(af_body)]) + af_body
        room = 188 - 4 - len(af)
        assert len(payload) <= room, (len(payload), room)
        if len(payload) < room:                  # stuff via adaptation field
            pad = room - len(payload)
            if not have_af:
                if pad == 1:
                    af = bytearray([0])
                else:
                    af = bytearray([pad - 1, 0x00]) + b"\xff" * (pad - 2)
                have_af = True
            else:
                af += b"\xff" * pad
                af[0] += pad
        afc = 0x30 if have_af else 0x10
        hdr = bytes([0x47, (0x40 if pusi else 0) | (pid >> 8), pid & 0xFF,
                     afc | cc])
        pkt = hdr + bytes(af) + payload[:188]
        assert len(pkt) == 188, len(pkt)
        if self.hdmv:
            self.out += ((self.arrival & 0x3FFFFFFF)
                         | (0x40 << 24)).to_bytes(4, "big")
            self.arrival += 1536
        self.out += pkt

    def add_section(self, pid: int, section: bytes) -> None:
        first = True
        data = bytes([0]) + section              # pointer_field = 0
        while data:
            chunk, data = data[:184], data[184:]
            self.packet(pid, chunk, pusi=first)
            first = False

    def add_pes(self, pid: int, pes: bytes, pcr: int | None = None) -> None:
        first = True
        data = pes
        while data:
            room = 176 if (first and pcr is not None) else 184
            chunk, data = data[:room], data[room:]
            self.packet(pid, chunk, pusi=first, pcr=pcr if first else None)
            first = False

    def stuffing(self, n: int = 1) -> None:
        for _ in range(n):
            if self.hdmv:
                self.out += ((self.arrival & 0x3FFFFFFF)
                             | (0x40 << 24)).to_bytes(4, "big")
                self.arrival += 1536
            pkt = bytes([0x47, 0x1F, 0xFF, 0x10]) + b"\xff" * 184
            self.out += pkt

    def garbage(self, n: int) -> None:
        self.out += bytes((0x48 + i) & 0x7F for i in range(n))


def section(table_id: int, body: bytes, table_id_ext: int = 1,
            version: int = 0, protocol_version: bool = False) -> bytes:
    """PSI/PSIP section: header + body + dummy CRC (xport ignores CRCs)."""
    tail = body + b"\xde\xad\xbe\xef"
    mid = bytes([table_id_ext >> 8, table_id_ext & 0xFF,
                 0xC0 | (version << 1) | 1, 0, 0])
    if protocol_version:
        mid += bytes([0])
    length = len(mid) + len(tail)
    return bytes([table_id, 0xB0 | (length >> 8), length & 0xFF]) + mid + tail


def pat(programs: list[tuple[int, int]], tsid: int = 0x1234) -> bytes:
    body = b"".join(bytes([p >> 8, p & 0xFF, 0xE0 | (pid >> 8), pid & 0xFF])
                    for p, pid in programs)
    return section(0x00, body, table_id_ext=tsid)


def pmt(program: int, pcr_pid: int,
        streams: list[tuple[int, int, bytes]],
        program_descriptors: bytes = b"") -> bytes:
    body = bytes([0xE0 | (pcr_pid >> 8), pcr_pid & 0xFF,
                  0xF0 | (len(program_descriptors) >> 8),
                  len(program_descriptors) & 0xFF]) + program_descriptors
    for stype, pid, desc in streams:
        body += bytes([stype, 0xE0 | (pid >> 8), pid & 0xFF,
                       0xF0 | (len(desc) >> 8), len(desc) & 0xFF]) + desc
    return section(0x02, body, table_id_ext=program)


# --------------------------------------------------------------- PES layer

def _ts_33(prefix: int, value: int) -> bytes:
    return bytes([(prefix << 4) | (((value >> 30) & 7) << 1) | 1,
                  (value >> 22) & 0xFF,
                  (((value >> 15) & 0x7F) << 1) | 1,
                  (value >> 7) & 0xFF,
                  ((value & 0x7F) << 1) | 1])


def pes(stream_id: int, payload: bytes, pts: int | None = None,
        dts: int | None = None, unbounded: bool = False) -> bytes:
    flags2 = 0
    hdr = b""
    if pts is not None and dts is not None:
        flags2 = 0xC0
        hdr = _ts_33(3, pts) + _ts_33(1, dts)
    elif pts is not None:
        flags2 = 0x80
        hdr = _ts_33(2, pts)
    body = bytes([0x80, flags2, len(hdr)]) + hdr + payload
    length = 0 if unbounded else len(body)
    assert length <= 0xFFFF
    return bytes([0, 0, 1, stream_id, length >> 8, length & 0xFF]) + body


# ------------------------------------------------------- MPEG-2 video ES

def m2v_sequence_header(width=1920, height=1080, aspect=3, framerate=4,
                        bitrate_400=48500) -> bytes:
    b = bytearray([0, 0, 1, 0xB3])
    b += bytes([width >> 4, ((width & 0xF) << 4) | (height >> 8),
                height & 0xFF, (aspect << 4) | framerate])
    b += bytes([(bitrate_400 >> 10) & 0xFF, (bitrate_400 >> 2) & 0xFF,
                ((bitrate_400 & 0x3) << 6) | 0x20 | 0x07, 0xE0])
    return bytes(b)


def m2v_sequence_extension(progressive=0) -> bytes:
    return bytes([0, 0, 1, 0xB5, 0x14,
                  0x80 | (progressive << 3) | 0x02, 0x20, 0x00, 0x00, 0x00])


def m2v_gop(closed=1) -> bytes:
    return bytes([0, 0, 1, 0xB8, 0x00, 0x08, 0x00, closed << 6])


def m2v_picture(temporal_ref: int, ptype: int) -> bytes:
    return bytes([0, 0, 1, 0x00, (temporal_ref >> 2) & 0xFF,
                  ((temporal_ref & 3) << 6) | (ptype << 3) | 0x07, 0xFF,
                  0xF8])


def m2v_picture_coding_ext(tff=1, rff=0, progressive_frame=0) -> bytes:
    return bytes([0, 0, 1, 0xB5, 0x81, 0x11, 0x13,
                  (tff << 7) | 0x0A | (rff << 1),
                  (progressive_frame << 7) | 0x40, 0x00])


def m2v_slices(rng, n_slices=4, slice_bytes=120) -> bytes:
    out = bytearray()
    for s in range(n_slices):
        out += bytes([0, 0, 1, 1 + s])
        out += bytes(rng.integers(0x10, 0xEF, slice_bytes, dtype=np.uint8))
    return bytes(out)


def m2v_stream(rng, n_gops=3, pics_per_gop=6, with_gop=True,
               progressive=0) -> list[tuple[bytes, int, int | None]]:
    """[(picture access unit bytes, pts, dts|None)] at 29.97 fps."""
    out = []
    tick = 3003
    base = 90000
    frame = 0
    for gidx in range(n_gops):
        for p in range(pics_per_gop):
            es = bytearray()
            if p == 0:
                es += m2v_sequence_header()
                es += m2v_sequence_extension(progressive)
                if with_gop:
                    es += m2v_gop()
            ptype = 1 if p == 0 else (2 if p % 3 == 0 else 3)
            tref = (p + 2) % pics_per_gop if p else pics_per_gop - 1
            es += m2v_picture(gidx * pics_per_gop + p if not with_gop
                              else tref, ptype)
            es += m2v_picture_coding_ext(rff=(frame % 5 == 4) and not progressive,
                                         progressive_frame=progressive)
            es += m2v_slices(rng)
            pts = base + frame * tick
            dts = pts - 2 * tick if ptype != 3 else None
            out.append((bytes(es), pts, dts))
            frame += 1
    return out


# ---------------------------------------------------------- MP2 audio ES

def mp2_frame(rng, bitrate_idx=14, fs_idx=1, mode=0) -> bytes:
    """One 1152-sample Layer II frame, padding 0 (size = 144*br/fs)."""
    bitrates = [0, 32000, 48000, 56000, 64000, 80000, 96000, 112000, 128000,
                160000, 192000, 224000, 256000, 320000, 384000]
    rates = [44100, 48000, 32000]
    size = bitrates[bitrate_idx] * 144 // rates[fs_idx]
    hdr = bytes([0xFF, 0xFC, (bitrate_idx << 4) | (fs_idx << 2),
                 (mode << 6) | 0x04])
    data = rng.integers(0, 255, size - 4, dtype=np.uint8)
    data[data == 0xFF] = 0x55                   # no false sync words
    return hdr + bytes(data)


# ------------------------------------------------------------- AC-3 ES

def ac3_frame(rng, bitrate_idx=14, fs_idx=0, acmod=7, bsid=8, bsmod=0):
    """One 1536-sample AC-3 syncframe (fs 48k -> bitrate*192/fs bytes)."""
    bitrates = [32000, 40000, 48000, 56000, 64000, 80000, 96000, 112000,
                128000, 160000, 192000, 224000, 256000, 320000, 384000,
                448000, 512000, 576000, 640000]
    rates = [48000, 44100, 32000]
    size = bitrates[bitrate_idx] * 192 // rates[fs_idx]
    hdr = bytes([0x0B, 0x77, 0x12, 0x34,
                 (fs_idx << 6) | (bitrate_idx * 2),
                 (bsid << 3) | bsmod, (acmod << 5) | 0x1F])
    data = rng.integers(0x10, 0xEF, size - 7, dtype=np.uint8)
    return hdr + bytes(data)


# ------------------------------------------------------------- VC-1 ES

def vc1_sequence_header() -> bytes:
    """Advanced profile, 1920x1088 coded, display ext + 29.97 frame rate."""
    w12, h12 = (1920 - 2) // 2, (1080 - 2) // 2
    dw, dh = 1919, 1079
    b = bytearray([0, 0, 1, 0x0F])
    b += bytes([0xDA, 0x12, w12 >> 4, ((w12 & 0xF) << 4) | (h12 >> 8),
                h12 & 0xFF])
    b += bytes([0x80 | 0x02 | ((dw >> 13) & 1)])   # pulldown, display_ext
    b += bytes([(dw >> 5) & 0xFF, ((dw & 0x1F) << 3) | ((dh >> 11) & 7),
                (dh >> 3) & 0xFF, ((dh & 7) << 5) | 0x10 | 0x01])
    b += bytes([0x80, 0xC8, 0x00])                 # fr flag, nr=3, dr=2
    return bytes(b)


def vc1_entry_point() -> bytes:
    return bytes([0, 0, 1, 0x0E, 0x44, 0x6A, 0x28, 0x40])


def vc1_frame(rng, ptype: str, rptfrm: int = 0, size: int = 200) -> bytes:
    if ptype == "I":
        b1 = 0xC0 | (rptfrm << 3)
    elif ptype == "P":
        b1 = 0x00 | (rptfrm << 5)
    elif ptype == "B":
        b1 = 0x80 | (rptfrm << 4)
    elif ptype == "BI":
        b1 = 0xE0 | (rptfrm << 2)
    else:                                          # skipped
        b1 = 0xF0 | (rptfrm << 1)
    data = rng.integers(0x10, 0xEF, size, dtype=np.uint8)
    return bytes([0, 0, 1, 0x0D, b1, 0x22, 0x33, 0x44]) + bytes(data)


def vc1_stream(rng, n_frames=18) -> list[tuple[bytes, int, int | None]]:
    out = []
    tick = 3003
    base = 95000
    for n in range(n_frames):
        es = bytearray()
        if n % 6 == 0:
            es += vc1_sequence_header()
            es += vc1_entry_point()
            ptype = "I"
        else:
            ptype = "B" if n % 3 == 2 else "P"
        es += vc1_frame(rng, ptype, rptfrm=1 if n % 7 == 6 else 0)
        if n == n_frames - 1:
            es += bytes([0, 0, 1, 0x0A])           # end-of-sequence BDU
        pts = base + n * tick
        dts = pts - 2 * tick if ptype != "B" else None
        out.append((bytes(es), pts, dts))
    return out


# ------------------------------------------------------------- H.264 ES

def h264_pictures(rng) -> list[tuple[bytes, int, int | None]]:
    import h264_gen
    p = h264_gen.SpsParams()
    out = []
    tick = 3003
    base = 92000
    frame = 0
    for g in range(3):
        es = bytearray()
        es += h264_gen.aud_nal(0)                  # I-only AUD starts output
        es += h264_gen.sps_nal(p)
        es += h264_gen.pps_nal()
        es += h264_gen.sei_nal(p, pic_struct=0, buffering_period=True)
        es += h264_gen.slice_nal(p, 7, frame, 0, idr=True, ref_idc=3,
                                 payload_bytes=96, rng=rng)
        pts = base + frame * tick
        out.append((bytes(es), pts, pts - 2 * tick))
        frame += 1
        for k in range(5):
            es = bytearray()
            es += h264_gen.aud_nal(1 if k % 2 == 0 else 2)
            es += h264_gen.sei_nal(p, pic_struct=k % 9)
            stype = 0 if k % 2 == 0 else 1
            ref = 2 if stype == 0 else 0
            es += h264_gen.slice_nal(p, stype, frame, (frame * 2) % 256,
                                     ref_idc=ref, payload_bytes=64, rng=rng)
            pts = base + frame * tick
            dts = pts - 2 * tick if stype == 0 else None
            out.append((bytes(es), pts, dts))
            frame += 1
    return out


# ---------------------------------------------------------- PSIP sections

def mgt(tables: list[tuple[int, int, int]]) -> bytes:
    """tables: (table_type, pid, version)."""
    body = bytes([len(tables) >> 8, len(tables) & 0xFF])
    for ttype, pid, ver in tables:
        body += bytes([ttype >> 8, ttype & 0xFF, 0xE0 | (pid >> 8),
                       pid & 0xFF, 0xE0 | ver, 0, 0, 4, 0, 0xF0, 0])
    body += bytes([0xF0, 0])                    # MGT descriptors: none
    return section(0xC7, body, protocol_version=True)


def _short_name(name: str) -> bytes:
    out = bytearray()
    for i in range(7):
        ch = ord(name[i]) if i < len(name) else 0
        out += bytes([0, ch])
    return bytes(out)


def tvct_channel(name: str, major: int, minor: int, program: int,
                 source_id: int, sld_streams: list[tuple[int, int, str]],
                 ext_name: str = "") -> bytes:
    desc = b""
    if ext_name:
        desc += bytes([0xA0, len(ext_name)]) + ext_name.encode()
    sld = bytes([0xE0, 0x30, len(sld_streams)])  # PCR pid 0x30
    for stype, pid, lang in sld_streams:
        sld += bytes([stype, 0xE0 | (pid >> 8), pid & 0xFF]) + lang.encode()
    desc += bytes([0xA1, len(sld)]) + sld
    ch = _short_name(name)
    ch += bytes([0xF0 | (major >> 6), ((major & 0x3F) << 2) | (minor >> 8),
                 minor & 0xFF, 0x04])
    ch += bytes([0x12, 0x34, 0x56, 0x78])        # carrier frequency (skipped)
    ch += bytes([0x1A, 0x2B, program >> 8, program & 0xFF, 0x0D])
    ch += bytes([0xC0 | 0x02, source_id >> 8, source_id & 0xFF])
    ch += bytes([0xFC | (len(desc) >> 8), len(desc) & 0xFF]) + desc
    return ch


def tvct(channels: list[bytes]) -> bytes:
    body = bytes([len(channels)]) + b"".join(channels)
    body += bytes([0xFC, 0])                     # additional descriptors
    return section(0xC8, body, protocol_version=True)


def eit(events: list[tuple[int, int, int, str, bytes]]) -> bytes:
    """events: (event_id, start_time, secs, title, descriptors)."""
    body = bytes([len(events)])
    for eid, start, secs, title, desc in events:
        t = title.encode()
        body += bytes([0xC0 | (eid >> 8), eid & 0xFF])
        body += start.to_bytes(4, "big")
        body += bytes([0x30 | (secs >> 16), (secs >> 8) & 0xFF, secs & 0xFF])
        body += bytes([len(t)]) + t
        body += bytes([0xF0 | (len(desc) >> 8), len(desc) & 0xFF]) + desc
    return section(0xCB, body, protocol_version=True)


# ----------------------------------------------------------- full streams

VIDEO_PID = 0x31
AUDIO_PID = 0x34
PMT_PID = 0x30


def make_ts(with_gop=True, progressive=0, psip=False, cc_error=False,
            garbage=False, seed=3) -> bytes:
    rng = np.random.default_rng(seed)
    mux = TsMux()
    mux.add_section(0x0000, pat([(1, PMT_PID), (2, 0x40)]))
    mux.add_section(PMT_PID, pmt(
        1, VIDEO_PID,
        [(0x02, VIDEO_PID, bytes([0x52, 0x01, 0x31])),
         (0x04, AUDIO_PID, bytes([0x0A, 0x04]) + b"eng\x00"),
         (0x06, 0x35, b"")],
        program_descriptors=bytes([0x05, 0x04]) + b"GA94"))
    if psip:
        mux.add_section(0x1FFB, mgt([(0x0000, 0x1FFB, 1), (0x0004, 0x1D00, 0),
                                     (0x0100, 0x1D10, 0), (0x0200, 0x1D20, 0)]))
        mux.add_section(0x1FFB, tvct([
            tvct_channel("KDTV", 12, 1, 1, 0x0101,
                         [(0x02, VIDEO_PID, "eng"), (0x04, AUDIO_PID, "eng")],
                         ext_name="DTV Utils Test Service"),
        ]))
    pictures = m2v_stream(rng, with_gop=with_gop, progressive=progressive)
    audio_frames = [mp2_frame(rng) for _ in range(24)]
    audio_pts = 88000
    ai = 0
    pcr = 80000 * 300
    for n, (es, pts, dts) in enumerate(pictures):
        mux.add_pes(VIDEO_PID, pes(0xE0, es, pts, dts, unbounded=True),
                    pcr=pcr)
        pcr += 3003 * 300
        if cc_error and n == 7:
            mux.packet(VIDEO_PID, b"\x00" * 184, skip_cc=True)
        if garbage and n == 9:
            mux.garbage(23)
        if n % 2 == 0 and ai + 2 <= len(audio_frames):
            payload = audio_frames[ai] + audio_frames[ai + 1]
            ai += 2
            mux.add_pes(AUDIO_PID, pes(0xC0, payload, audio_pts))
            audio_pts += 2 * 1152 * 90000 // 48000
        if psip and n == 10:
            mux.add_section(0x1D10, eit([
                (0x21, 0x60000000, 1800, "Evening News",
                 bytes([0x81, 2, 0x10, 0x20, 0x86, 1, 0x55])),
                (0x22, 0x60000708, 3600, "Late Movie",
                 bytes([0x87, 2, 0x01, 0x02, 0xAA, 3, 1, 2, 3])),
            ]))
        mux.stuffing(1)
    return bytes(mux.out)


def make_av_ts(video: str = "h264", audio: str = "ac3", hdmv: bool = False,
               lpcm_flags: int = 0x3140, seed: int = 5) -> bytes:
    """Generic AV mux for the stage-2 ES parsers."""
    rng = np.random.default_rng(seed)
    mux = TsMux(hdmv=hdmv)
    vtype = {"h264": 0x1B, "vc1": 0xEA, "mpeg2": 0x02}[video]
    atype = {"ac3": 0x81, "mp2": 0x04, "lpcm": 0x80}[audio]
    mux.add_section(0x0000, pat([(1, PMT_PID)]))
    mux.add_section(PMT_PID, pmt(1, VIDEO_PID,
                                 [(vtype, VIDEO_PID, b""),
                                  (atype, AUDIO_PID, b"")]))
    if video == "h264":
        pictures = h264_pictures(rng)
    elif video == "vc1":
        pictures = vc1_stream(rng)
    else:
        pictures = m2v_stream(rng)
    if audio == "ac3":
        aframes = [ac3_frame(rng) for _ in range(20)]
        samples, fs = 1536, 48000
    elif audio == "mp2":
        aframes = [mp2_frame(rng) for _ in range(20)]
        samples, fs = 1152, 48000
    else:
        aframes = None
    audio_pts = 86000
    ai = 0
    pcr = 80000 * 300
    for n, (es, pts, dts) in enumerate(pictures):
        mux.add_pes(VIDEO_PID, pes(0xE0, es, pts, dts, unbounded=True),
                    pcr=pcr)
        pcr += 3003 * 300
        if aframes is not None:
            if n % 2 == 0 and ai + 2 <= len(aframes):
                payload = aframes[ai] + aframes[ai + 1]
                ai += 2
                sid = 0xBD if audio == "ac3" else 0xC0
                mux.add_pes(AUDIO_PID, pes(sid, payload, audio_pts))
                audio_pts += 2 * samples * 90000 // fs
        elif n % 2 == 0:
            # LPCM: PES-private with the 4-byte header after the PES header;
            # odd payload size exercises the sample carry + resync path
            nbytes = 6 * 2 * 24 + (2 if n % 4 == 0 else 0)
            pcm = bytes(rng.integers(0, 255, nbytes, dtype=np.uint8))
            payload = lpcm_flags.to_bytes(4, "big") + pcm
            mux.add_pes(AUDIO_PID, pes(0xBD, payload, audio_pts))
            audio_pts += 24 * 90000 // 48000
        mux.stuffing(1)
    return bytes(mux.out)
