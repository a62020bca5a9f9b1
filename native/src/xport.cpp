// MPEG-2 transport-stream demultiplexer / analyzer ("xport" equivalent).
//
// SPDX-License-Identifier: GPL-3.0-or-later
//
// Behavior contract: byte-identical stdout and demuxed ES/PES output files
// vs /root/reference/xport.c, verified against the reference binary in
// tests/test_native_xport.py (17 parity cases + a 60-trial corruption
// fuzz diff).  The TS layer is an original packet-at-a-time engine
// (ts_engine.inc, MIT).  The Mpeg2Video / Mp2Audio ES parsers in THIS
// file, like the stage-2 ES parsers in xport_es2.inc, are DERIVATIVE
// WORKS of the ES parsers in xport.c from drmpeg/dtv-utils,
// (c) Ron Economos, GPLv3: although reorganized into classes, they keep
// the reference's shift-register control flow and locals, so this
// translation unit is licensed GPLv3 (see native/COPYING.GPLv3), NOT
// under the repository's MIT license — see native/README.md.  Reference
// quirks are kept and marked [QUIRK].

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
// MPEG-2 video ES parser (xport.c:1038-1493): prints the first sequence
// header/extension summary, counts pictures/fields, renumbers temporal
// references and synthesizes GOP headers with a running timecode when the
// stream has none, and writes the ES starting at the first sequence header.
class Mpeg2Video {
 public:
  explicit Mpeg2Video(StreamContext& g) : g_(g) {}

  void parse(unsigned char* es_ptr, unsigned length, unsigned long long pts,
             unsigned dts) {
    unsigned i, j;
    unsigned temporal_reference, temp_flags, picture_coding_type;
    unsigned whole_buffer = 1;
    unsigned char* start_es_ptr = es_ptr;
    unsigned char* middle_es_ptr = nullptr;
    unsigned middle_length = 0x55555555;
    unsigned char hours, minutes, seconds, pictures;
    unsigned char temp_temporal_reference;
    long double temp_running_average, temp_running_fields;

    for (i = 0; i < length; i++) {
      parse_ = (parse_ << 8) + *es_ptr++;
      if (parse_ == 0x00000100) {
        picture_parse_ = 2;
        if (first_sequence_) g_.coded_frames++;
        if (first_) {
          picture_size_ = 0;
        } else {
          running_average_samples_[running_average_frames_] =
              picture_size_ * 8;
          picture_size_ = 0;
        }
        if (look_for_gop_) {
          look_for_gop_ = false;
          if (!gop_found_ && !g_.opt.parse_only) {
            j = time_code_rate_ * 60 * 60;
            hours = ((time_code_field_ / 2) / j) % 24;
            j /= 60;
            minutes = ((time_code_field_ / 2) / j) % 60;
            j /= 60;
            seconds = ((time_code_field_ / 2) / j) % 60;
            pictures = ((time_code_field_ / 2) % j);
            gop_header_[1] = 0x00;
            gop_header_[2] = 0x08;
            gop_header_[3] = 0x00;
            gop_header_[4] = 0x00;
            gop_header_[1] |= (hours << 2) & 0x7c;
            gop_header_[1] |= (minutes >> 4) & 0x03;
            gop_header_[2] |= (minutes << 4) & 0xf0;
            gop_header_[2] |= (seconds >> 3) & 0x07;
            gop_header_[3] |= (seconds << 5) & 0xe0;
            gop_header_[3] |= (pictures >> 1) & 0x1f;
            gop_header_[4] |= (pictures << 7) & 0x80;
            if (middle_length == 0x55555555) {
              fwrite(start_es_ptr, 1, i, g_.fpoutvideo);
            } else {
              fwrite(middle_es_ptr, 1, middle_length - (length - i),
                     g_.fpoutvideo);
            }
            fwrite(gop_header_, 1, 9, g_.fpoutvideo);
            middle_es_ptr = es_ptr;
            middle_length = length - i - 1;
            whole_buffer = 0;
          }
        }
      } else if (parse_ == 0x000001b3) {
        sequence_header_parse_ = 7;
        look_for_gop_ = true;
        gop_found_ = false;
        last_gop_temporal_reference_ = last_temporal_reference_;
        if (g_.opt.dump_index) {
          printf("Sequence header at packet number %llu/%llu\r\n",
                 g_.packet_counter, (g_.packet_counter - 1) * 188);
        }
        if (!first_sequence_) {
          printf("Sequence Header found\n");
          printf("%d frames before first Sequence Header\n", picture_count_);
          if (!g_.opt.parse_only) {
            fwrite(header_, 1, 3, g_.fpoutvideo);
            middle_es_ptr = es_ptr - 1;
            middle_length = length - i;
            whole_buffer = 0;
          }
          first_sequence_ = true;
          picture_count_ = 0;
          time_code_field_ = 0;
          first_pts_count_ = 2;
        } else {
          picture_count_ = 0;
        }
      } else if (sequence_header_parse_ != 0) {
        --sequence_header_parse_;
        if (!first_sequence_dump_) {
          switch (sequence_header_parse_) {
            case 4:
              printf("Horizontal size = %d\n", (parse_ & 0xfff000) >> 12);
              printf("Vertical size = %d\n", parse_ & 0xfff);
              break;
            case 3: {
              static const char* kAspect[5] = {"forbidden", "square samples",
                                               "4:3", "16:9", "2.21:1"};
              unsigned a = (parse_ & 0xf0) >> 4;
              printf("Aspect ratio = %s\n", a <= 4 ? kAspect[a] : "reserved");
              switch (parse_ & 0xf) {
                case 0:
                  printf("Frame rate = forbidden\n");
                  time_code_rate_ = 1;
                  frame_rate_ = 1.0;
                  break;
                case 1:
                  printf("Frame rate = 23.976\n");
                  time_code_rate_ = 24;
                  frame_rate_ = 24.0 * (1000.0 / 1001.0);
                  break;
                case 2:
                  printf("Frame rate = 24\n");
                  time_code_rate_ = 24;
                  frame_rate_ = 24.0;
                  break;
                case 3:
                  printf("Frame rate = 25\n");
                  time_code_rate_ = 25;
                  frame_rate_ = 25.0;
                  break;
                case 4:
                  printf("Frame rate = 29.97\n");
                  time_code_rate_ = 30;
                  frame_rate_ = 30.0 * (1000.0 / 1001.0);
                  break;
                case 5:
                  printf("Frame rate = 30\n");
                  time_code_rate_ = 30;
                  frame_rate_ = 30.0;
                  break;
                case 6:
                  printf("Frame rate = 50\n");
                  time_code_rate_ = 50;
                  frame_rate_ = 50.0;
                  break;
                case 7:
                  printf("Frame rate = 59.94\n");
                  time_code_rate_ = 60;
                  frame_rate_ = 60.0 * (1000.0 / 1001.0);
                  break;
                case 8:
                  printf("Frame rate = 60\n");
                  time_code_rate_ = 60;
                  frame_rate_ = 60.0;
                  break;
                default:
                  printf("Frame rate = reserved\n");
                  break;
              }
              break;
            }
            case 0:
              printf("Sequence header bitrate = %d bps\n",
                     ((parse_ & 0xffffc0) >> 6) * 400);
              break;
            default:
              break;
          }
        }
      } else if (picture_parse_ != 0) {
        --picture_parse_;
        switch (picture_parse_) {
          case 1:
            // temporal-reference patch may straddle the burst boundary
            if (!gop_found_ && i == (length - 1)) {
              length -= 1;
              if (whole_buffer == 0) middle_length -= 1;
              extra_byte_ = true;
            }
            break;
          case 0:
            temporal_reference = (parse_ & 0xffff) >> 6;
            if (dts == 1) last_temporal_reference_ = temporal_reference;
            if (temporal_reference >= (last_gop_temporal_reference_ + 1)) {
              temporal_reference -= last_gop_temporal_reference_ + 1;
            } else {
              temporal_reference =
                  (temporal_reference + 1024) -
                  (last_gop_temporal_reference_ + 1);
            }
            if (extra_byte_) {
              extra_byte_ = false;
              temp_temporal_reference = (temporal_reference >> 2) & 0xff;
              if (!gop_found_) {
                if (!g_.opt.parse_only) {
                  fwrite(&temp_temporal_reference, 1, 1, g_.fpoutvideo);
                }
                *(es_ptr - 1) = (unsigned char)(
                    ((temporal_reference & 0x3) << 6) | (parse_ & 0x3f));
              }
            } else if (!gop_found_) {
              *(es_ptr - 2) = (temporal_reference >> 2) & 0xff;
              *(es_ptr - 1) = (unsigned char)(
                  ((temporal_reference & 0x3) << 6) | (parse_ & 0x3f));
            }
            picture_coding_type = (parse_ & 0x38) >> 3;
            if (picture_coding_type == 0 || picture_coding_type > 3) {
              printf("illegal picture_coding_type = %d\n",
                     picture_coding_type);
            }
            break;
        }
      } else if (parse_ == 0x000001b5) {
        extension_parse_ = 1;
      } else if (extension_parse_ != 0) {
        --extension_parse_;
        if (extension_parse_ == 0) {
          if ((parse_ & 0xf0) == 0x80) {
            if (first_sequence_) picture_coding_parse_ = 5;
            picture_count_++;
          } else if ((parse_ & 0xf0) == 0x10) {
            sequence_extension_parse_ = 1;
          }
        }
      } else if (picture_coding_parse_ != 0) {
        --picture_coding_parse_;
        if (picture_coding_parse_ == 1) {
          if (g_.opt.timecode_mode) {
            if (progressive_sequence_ == 0) {
              time_code_field_ += (parse_ & 0x200) ? 3 : 2;
            } else {
              temp_flags = ((parse_ & 0x8000) >> 14) | ((parse_ & 0x200) >> 9);
              switch (temp_flags & 0x3) {
                case 3: time_code_field_ += 6; break;
                case 2: break;
                case 1: time_code_field_ += 4; break;
                case 0: time_code_field_ += 2; break;
              }
            }
          } else {
            time_code_field_ += 2;
          }
          if (progressive_sequence_ == 0) {
            if (parse_ & 0x200) {
              g_.video_fields += 3;
              running_average_fields_[running_average_frames_] = 3;
            } else {
              g_.video_fields += 2;
              running_average_fields_[running_average_frames_] = 2;
            }
          } else {
            temp_flags = ((parse_ & 0x8000) >> 14) | ((parse_ & 0x200) >> 9);
            switch (temp_flags & 0x3) {
              case 3:
                g_.video_fields += 3;
                running_average_fields_[running_average_frames_] = 3;
                break;
              case 2:
                break;
              case 1:
                g_.video_fields += 2;
                running_average_fields_[running_average_frames_] = 2;
                break;
              case 0:
                g_.video_fields += 1;
                running_average_fields_[running_average_frames_] = 1;
                break;
            }
          }
          if (first_) {
            first_ = false;
          } else {
            running_average_frames_ = (running_average_frames_ + 1) & 1023;
            running_average_count_++;
            if (running_average_count_ == 300) {
              running_average_count_ = 299;
              temp_running_average = 0;
              temp_running_fields = 0.0;
              for (j = 0; j < 300; j++) {
                temp_running_average +=
                    running_average_samples_[(running_average_start_ + j) &
                                             1023];
                temp_running_fields +=
                    running_average_fields_[(running_average_start_ + j) &
                                            1023];
              }
              running_average_start_ = (running_average_start_ + 1) & 1023;
              if (progressive_sequence_ == 0) {
                g_.running_average_bitrate = (unsigned)(
                    (temp_running_average / 300.0) *
                    ((600.0 / temp_running_fields) * frame_rate_));
              } else {
                g_.running_average_bitrate = (unsigned)(
                    (temp_running_average / 300.0) *
                    ((300.0 / temp_running_fields) * frame_rate_));
              }
              if (g_.running_average_bitrate >
                  g_.running_average_bitrate_peak) {
                g_.running_average_bitrate_peak = g_.running_average_bitrate;
              }
            }
          }
          if (first_pts_count_ != 0) {
            if (first_pts_count_ == 2) first_pts_ = pts;
            --first_pts_count_;
            if (first_pts_count_ == 0) {
              if (first_pts_ > pts) first_pts_ = pts;
              g_.pts_aligned = first_pts_;
              printf("First Video PTS = 0x%08x\n", (unsigned)g_.pts_aligned);
            }
          }
        }
      } else if (sequence_extension_parse_ != 0) {
        --sequence_extension_parse_;
        if (!first_sequence_dump_ && sequence_extension_parse_ == 0) {
          printf("Progressive Sequence = %d\n", (parse_ & 0x8) >> 3);
          progressive_sequence_ = (parse_ & 0x8) >> 3;
          g_.video_progressive = progressive_sequence_;
          first_sequence_dump_ = true;
        }
      } else if (parse_ == 0x000001b8) {
        gop_found_ = true;
      }
      picture_size_++;
    }
    if (!g_.opt.parse_only && first_sequence_) {
      if (whole_buffer) {
        fwrite(start_es_ptr, 1, length, g_.fpoutvideo);
      } else {
        fwrite(middle_es_ptr, 1, middle_length, g_.fpoutvideo);
      }
    }
  }

 private:
  StreamContext& g_;
  bool first_ = true;
  bool first_sequence_ = false;
  bool first_sequence_dump_ = false;
  bool look_for_gop_ = false;
  bool gop_found_ = false;
  unsigned parse_ = 0;
  unsigned picture_parse_ = 0, extension_parse_ = 0;
  unsigned picture_coding_parse_ = 0;
  unsigned sequence_header_parse_ = 0, sequence_extension_parse_ = 0;
  unsigned picture_size_ = 0, picture_count_ = 0;
  unsigned time_code_field_ = 0, time_code_rate_ = 1;
  long double frame_rate_ = 1.0;
  unsigned char header_[3] = {0x0, 0x0, 0x1};
  unsigned char gop_header_[9] = {0xb8, 0x00, 0x08, 0x00, 0x00,
                                  0x00, 0x00, 0x01, 0x00};
  unsigned progressive_sequence_ = 0;
  unsigned long long first_pts_ = 0;
  unsigned first_pts_count_ = 0;
  bool extra_byte_ = false;
  unsigned last_temporal_reference_ = 0;
  unsigned last_gop_temporal_reference_ = 0;
  unsigned running_average_start_ = 0, running_average_count_ = 0;
  unsigned running_average_frames_ = 0;
  unsigned running_average_samples_[1024] = {};
  unsigned running_average_fields_[1024] = {};
};

// ------------------------------------------------------------------------
// MPEG-1/2 Layer II audio ES parser (xport.c:531-788): buffers whole frames
// until the video-aligned PTS is reached, then emits aligned ES;
// interpolates PTS by 1152-sample frames between PES headers.
class Mp2Audio {
 public:
  explicit Mp2Audio(StreamContext& g) : g_(g) {}

  void parse(unsigned char* es_ptr, unsigned length, unsigned long long pts,
             unsigned first_access_unit) {
    unsigned i, j;
    if (!g_.opt.parse_only && audio_synced_) {
      fwrite(es_ptr, 1, length, g_.fpoutaudio);
    }
    if (audio_synced_) return;
    if (first_access_unit) {
      current_pts_saved_ = pts;
      current_pts_valid_ = true;
    }
    for (i = 0; i < length; i++) {
      parse_ = (parse_ << 8) + *es_ptr++;
      if ((parse_ & 0xffff) == 0x0000fffc || (parse_ & 0xffff) == 0x0000fffd) {
        if (current_pts_valid_) {
          current_pts_ = current_pts_saved_;
          current_pts_valid_ = false;
        } else if (frame_size_check_ != 0 &&
                   frame_buffer_index_ == frame_size_check_) {
          current_pts_ += ((1152 * 90000) / audio_sampling_rate_);
        }
        if (!first_header_) {
          header_parse_ = 2;
          first_header_ = true;
          frame_buffer_pts_[frame_buffer_count_] = current_pts_;
        } else if (!second_header_) {
          if (frame_size_ == 2) {
            second_header_ = true;
            printf("Audio Bitrate = %d, Audio Sampling Rate = %d\n",
                   audio_bitrate_, audio_sampling_rate_);
            static const char* kMode[4] = {"Stereo", "Joint Stereo",
                                           "Dual Channel", "Single Channel"};
            printf("Audio Mode = %s, mode_extension = %d\n",
                   kMode[audio_mode_ & 0x3], audio_mode_ext_);
            static const char* kEmph[4] = {"None", "50/15 usec", "Reserved",
                                           "CCITT J.17"};
            printf("Audio Emphasis = %s, copyright = %d, original = %d\n",
                   kEmph[audio_emphasis_ & 0x3], audio_copyright_,
                   audio_original_);
            frame_buffer_length_[frame_buffer_count_] = frame_buffer_index_;
            frame_buffer_index_ = 0;
            frame_buffer_count_ = (frame_buffer_count_ + 1) & 0x7f;
            frame_buffer_pts_[frame_buffer_count_] = current_pts_;
          } else {
            first_header_ = false;
            frame_buffer_count_ = 0;
            frame_buffer_index_ = 0;
          }
        } else if (frame_buffer_index_ == frame_size_check_) {
          frame_buffer_length_[frame_buffer_count_] = frame_buffer_index_;
          frame_buffer_index_ = 0;
          frame_buffer_count_ = (frame_buffer_count_ + 1) & 0x7f;
          frame_buffer_pts_[frame_buffer_count_] = current_pts_;
        }
      } else if (header_parse_ != 0) {
        --header_parse_;
        if (header_parse_ == 1) {
          static const unsigned kRates[4] = {44100, 48000, 32000, 0};
          audio_sampling_rate_ = kRates[(parse_ & 0xc) >> 2];
          static const unsigned kBitrates[15] = {
              0,      32000,  48000,  56000,  64000,  80000,  96000, 112000,
              128000, 160000, 192000, 224000, 256000, 320000, 384000};
          unsigned idx = (parse_ & 0xf0) >> 4;
          audio_bitrate_ = idx < 15 ? kBitrates[idx] : 0;
        } else if (header_parse_ == 0) {
          audio_mode_ = (parse_ & 0xc0) >> 6;
          audio_mode_ext_ = (parse_ & 0x30) >> 4;
          audio_copyright_ = (parse_ & 0x8) >> 3;
          audio_original_ = (parse_ & 0x4) >> 2;
          audio_emphasis_ = parse_ & 0x3;
          if (audio_sampling_rate_ == 0 || audio_bitrate_ == 0) {
            first_header_ = false;
          } else {
            frame_size_ = audio_bitrate_ * 144 / audio_sampling_rate_;
            frame_size_check_ = frame_size_;
          }
        }
      }
      if (!audio_synced_ && first_header_ && second_header_) {
        if (g_.pts_aligned != 0xffffffffffffffffULL ||
            g_.video_channel == 0) {
          if (current_pts_ >= g_.pts_aligned || g_.video_channel == 0) {
            audio_synced_ = true;
            frame_buffer_length_[frame_buffer_count_] = frame_buffer_index_;
            for (j = 0; j <= frame_buffer_count_; j++) {
              if ((frame_buffer_pts_[j] + 2160) > g_.pts_aligned ||
                  g_.video_channel == 0) {
                if (!first_synced_) {
                  first_synced_ = true;
                  if (g_.video_channel == 0) {
                    printf("First Audio PTS = 0x%08x\n",
                           (unsigned)frame_buffer_pts_[j]);
                  } else {
                    printf("First Audio PTS = 0x%08x, %d\n",
                           (unsigned)frame_buffer_pts_[j],
                           (unsigned)(frame_buffer_pts_[j] - g_.pts_aligned));
                  }
                  if (!g_.opt.parse_only) {
                    fwrite(&frame_buffer_start_, 1, 1, g_.fpoutaudio);
                  }
                }
                if (!g_.opt.parse_only) {
                  fwrite(&frame_buffer_[j][0], 1, frame_buffer_length_[j],
                         g_.fpoutaudio);
                }
              }
            }
            if (!g_.opt.parse_only) {
              fwrite(es_ptr - 1, 1, length - i, g_.fpoutaudio);
            }
          } else {
            capture_byte();
          }
        } else {
          capture_byte();
        }
      } else if (first_header_) {
        capture_byte();
      }
    }
  }

 private:
  void capture_byte() {
    --frame_size_;
    frame_buffer_[frame_buffer_count_][frame_buffer_index_++] =
        (unsigned char)(parse_ & 0xff);
    if (frame_buffer_index_ == (3840 + 8)) --frame_buffer_index_;
  }

  StreamContext& g_;
  bool first_header_ = false, second_header_ = false;
  bool audio_synced_ = false, first_synced_ = false;
  unsigned parse_ = 0, header_parse_ = 0;
  unsigned frame_size_ = 0, frame_size_check_ = 0;
  unsigned char frame_buffer_[128][3840 + 8];
  unsigned char frame_buffer_start_ = 0xff;
  unsigned frame_buffer_index_ = 0, frame_buffer_count_ = 0;
  unsigned frame_buffer_length_[128] = {};
  unsigned long long frame_buffer_pts_[128] = {};
  unsigned long long current_pts_ = 0, current_pts_saved_ = 0;
  bool current_pts_valid_ = false;
  unsigned audio_sampling_rate_ = 0, audio_bitrate_ = 0;
  unsigned audio_mode_ = 0, audio_mode_ext_ = 0;
  unsigned audio_copyright_ = 0, audio_original_ = 0, audio_emphasis_ = 0;
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

#include "xport_es2.inc"
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
