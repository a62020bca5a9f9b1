// MPEG-2 transport-stream demultiplexer / analyzer ("xport" equivalent).
//
// SPDX-License-Identifier: MIT
//
// Behavior contract: byte-identical stdout and demuxed ES/PES output files
// vs /root/reference/xport.c, verified against the reference binary in
// tests/test_native_xport.py (parity cases + corruption fuzz diff).  The
// code is an original design: a packet-at-a-time TS engine (ts_engine.inc),
// a shared frame-segmentation engine for the sync-framed audio codecs plus
// a run-based LPCM repacker (es_audio.inc), and start-code-dispatch video
// parsers over shared deferred-write/bitrate-window/PTS-latch components
// (es_common.inc, es_video.inc).  Observable reference quirks required by
// the parity contract are replicated and marked [QUIRK]; see
// native/README.md for the rewrite provenance notes.

#include <cinttypes>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <string>
#include <vector>

#include "dtv/bitreader.hpp"

namespace dtv {
namespace {

struct Options {
  bool parse_only = false;
  bool dump_audio_pts = false;
  bool dump_video_pts = false;
  bool timecode_mode = false;
  bool dump_pids = false;
  bool suppress_tsrate = false;
  bool pes_streams = false;
  bool dump_psip = false;
  bool hdmv_mode = false;
  bool dump_extra = false;
  bool dump_pcr = false;
  bool lpcm_mode = false;
  bool force_mode = false;
  bool dump_index = false;
};

class Xport;

// ------------------------------------------------------------------------
// Shared stream context: the cross-parser globals of the reference
// (xport.c:29-65): PTS alignment, field counts, running-average bitrate.
struct StreamContext {
  Options opt;
  FILE* fpoutvideo = nullptr;
  FILE* fpoutaudio = nullptr;
  unsigned program = 1, video_channel = 1, audio_channel = 1;
  unsigned pid_counter[0x2000] = {};
  unsigned long long packet_counter = 0;
  unsigned long long pid_first_packet[0x2000] = {};
  unsigned long long pid_last_packet[0x2000] = {};
  unsigned long long pts_aligned = 0xffffffffffffffffULL;
  unsigned running_average_bitrate = 0;
  unsigned running_average_bitrate_peak = 0;
  unsigned coded_frames = 0;
  unsigned video_fields = 0;
  unsigned video_progressive = 0;
  unsigned long long last_video_pts = 0, last_audio_pts = 0;
  unsigned long long last_video_pts_diff = 0, last_audio_pts_diff = 0;
  unsigned short pcr_pid = 0xffff, video_pid = 0xffff, audio_pid = 0xffff;
  unsigned char audio_stream_type = 0, video_stream_type = 0;
};

// ------------------------------------------------------------------------
// PSIP per-PID section assembler state (xport.c:2600-2610).
struct PsipState {
  bool section_start = false;
  unsigned pointer_field = 0;
  unsigned section_length_parse = 0;
  unsigned section_parse = 0;
  bool xfer_state = false;
  unsigned section_length = 0;
  unsigned offset = 0;
  unsigned index = 0;
  unsigned char table_id = 0;
  unsigned short table_id_ext = 0;
  unsigned char section_number = 0, last_section_number = 0;
  unsigned char table[4096] = {};
};

#include "es_common.inc"
#include "es_audio.inc"
#include "es_video.inc"
#include "ts_engine.inc"

}  // namespace

int xport_main(int argc, char** argv) {
  static const char* kUsage =
      "xport Transport Stream Demuxer 1.1\n\n"
      "Usage:\n"
      "\txport <-pavtdszgher2fi> <infile> <program number> <video stream "
      "number> <audio stream number>\n\n"
      "Options:\n"
      "\tp = parse only, do not demux to video and audio files\n"
      "\ta = dump audio PTS\n"
      "\tv = dump video PTS\n"
      "\tt = GOP timecode mode, count repeated fields/frames\n"
      "\td = dump all PID's (useful for debugging muxers, but tons of "
      "output)\n"
      "\ts = suppress TS rate dumping (useful when piping output to a "
      "file)\n"
      "\tz = demux to PES streams (instead of elementary streams)\n"
      "\tg = dump ATSC PSIP information\n"
      "\th = input file is in HDMV (AVCHD and Blu-ray) format (192 byte "
      "packets)\n"
      "\te = dump HDMV arrival_time_stamp difference\n"
      "\tr = dump PCR\n"
      "\t2 = only extract 2 channels of HDMV LPCM audio from multi-channel "
      "tracks\n"
      "\tf = force PID's and video stream type\n"
      "\ti = dump index info\n";

  if (argc != 5 && argc != 6) {
    fputs(kUsage, stderr);
    return -1;
  }
  Xport xp;
  StreamContext& g = xp.g;
  FILE* fp;
  if (argc == 5) {
    fp = fopen(argv[1], "rb");
    if (!fp) {
      fprintf(stderr, "Cannot open bitstream file <%s>\n", argv[1]);
      return -1;
    }
  } else {
    if (argv[1][0] == '-') {
      for (size_t i = 1; i < strlen(argv[1]); i++) {
        switch (argv[1][i]) {
          case 'p': case 'P': g.opt.parse_only = true; break;
          case 'a': case 'A': g.opt.dump_audio_pts = true; break;
          case 'v': case 'V': g.opt.dump_video_pts = true; break;
          case 't': case 'T': g.opt.timecode_mode = true; break;
          case 'd': case 'D': g.opt.dump_pids = true; break;
          case 's': case 'S': g.opt.suppress_tsrate = true; break;
          case 'z': case 'Z': g.opt.pes_streams = true; break;
          case 'g': case 'G': g.opt.dump_psip = true; break;
          case 'h': case 'H': g.opt.hdmv_mode = true; break;
          case 'e': case 'E': g.opt.dump_extra = true; break;
          case 'r': case 'R': g.opt.dump_pcr = true; break;
          case '2': g.opt.lpcm_mode = true; break;
          case 'f': case 'F': g.opt.force_mode = true; break;
          case 'i': case 'I': g.opt.dump_index = true; break;
          default:
            fprintf(stderr, "Unsupported Option: %c\n", argv[1][i]);
        }
      }
    } else {
      fputs(kUsage, stderr);
      return -1;
    }
    fp = fopen(argv[2], "rb");
    if (!fp) {
      fprintf(stderr, "Cannot open bitstream file <%s>\n", argv[2]);
      return -1;
    }
  }

  if (!g.opt.parse_only) {
    g.fpoutvideo = fopen("bits0001.mpv", "wb");
    if (!g.fpoutvideo) {
      fprintf(stderr, "Cannot open video output file <bits0001.mpv>\n");
      return -1;
    }
    g.fpoutaudio = fopen("bits0001.mpa", "wb");
    if (!g.fpoutaudio) {
      fprintf(stderr, "Cannot open audio output file <bits0001.mpa>\n");
      return -1;
    }
  }

  if (argc == 5) {
    g.program = atoi(argv[2]);
    g.video_channel = atoi(argv[3]);
    g.audio_channel = atoi(argv[4]);
  } else if (g.opt.force_mode) {
    g.video_pid = (unsigned short)strtoul(argv[3], nullptr, 16);
    if (g.video_pid == 0) g.video_channel = 0;
    g.audio_pid = (unsigned short)strtoul(argv[4], nullptr, 16);
    g.video_stream_type = (unsigned char)strtoul(argv[5], nullptr, 16);
    g.audio_stream_type = 0x81;
    g.pcr_pid = g.video_pid;
  } else {
    g.program = atoi(argv[3]);
    g.video_channel = atoi(argv[4]);
    g.audio_channel = atoi(argv[5]);
  }
  printf("xport Transport Stream Demuxer 1.1\n");
  printf("program = %d, video channel = %d, audio channel = %d\n", g.program,
         g.video_channel, g.audio_channel);
  xp.init();

  std::vector<unsigned char> buffer(16384);
  size_t n;
  while ((n = fread(buffer.data(), 1, buffer.size(), fp)) > 0) {
    xp.demux((unsigned)n, buffer.data());
  }
  printf("\n");
  for (unsigned i = 0; i < 0x2000; i++) {
    if (g.pid_counter[i] != 0) {
      printf("packets for pid %4d <0x%04x> = %d, first = %llu, last = "
             "%llu\n",
             i, i, g.pid_counter[i], g.pid_first_packet[i],
             g.pid_last_packet[i]);
    }
  }
  if (g.video_progressive == 0) {
    printf("coded pictures = %d, video fields = %d\n", g.coded_frames,
           g.video_fields);
  } else {
    printf("coded pictures = %d, video frames = %d\n", g.coded_frames,
           g.video_fields);
  }
  int temp = (int)((g.last_audio_pts + g.last_audio_pts_diff) -
                   (g.last_video_pts + g.last_video_pts_diff));
  printf("Ending audio to video PTS difference = %d ticks, %f milliseconds\n",
         temp, (double)temp / 90.0);
  fclose(fp);
  if (!g.opt.parse_only) {
    fclose(g.fpoutvideo);
    fclose(g.fpoutaudio);
  }
  return 0;
}

}  // namespace dtv
