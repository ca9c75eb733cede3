// Host-side video decode worker (FFmpeg libavformat/libavcodec/libswscale).
//
// Completes the native data plane (SURVEY.md section 2.8 item 3): the
// reference relies on decord/PyAV/OpenCV for container decode; this is the
// TPU build's C++ equivalent, exposed through a C ABI for ctypes. Decodes
// the requested frame indices by sequential decode up to the max index
// (the reference's "accurate" mode, loading.py:150-180), converting each
// selected frame to BGR24 (pipeline convention).
//
// API (0 on success, negative on failure):
//   mvf_video_probe(path, &num_frames, &w, &h)
//   mvf_video_decode(path, indices, n, out, capacity, &w, &h)
//     out receives n frames of h*w*3 bytes each, in indices order
//     (duplicate and clamped indices allowed).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libswscale/swscale.h>
}

namespace {

struct Reader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  int stream_index = -1;

  ~Reader() {
    if (codec) avcodec_free_context(&codec);
    if (fmt) avformat_close_input(&fmt);
  }

  int open(const char* path) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return -2;
    const AVCodec* dec = nullptr;
    stream_index =
        av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
    if (stream_index < 0 || !dec) return -3;
    codec = avcodec_alloc_context3(dec);
    if (!codec) return -4;
    if (avcodec_parameters_to_context(
            codec, fmt->streams[stream_index]->codecpar) < 0)
      return -5;
    codec->thread_count = 0;  // auto
    if (avcodec_open2(codec, dec, nullptr) < 0) return -6;
    return 0;
  }
};

}  // namespace

extern "C" {

int mvf_video_probe(const char* path, long* num_frames, int* w, int* h) {
  Reader r;
  int rc = r.open(path);
  if (rc != 0) return rc;
  AVStream* st = r.fmt->streams[r.stream_index];
  long n = st->nb_frames;
  if (n <= 0 && st->avg_frame_rate.den > 0 && st->avg_frame_rate.num > 0 &&
      r.fmt->duration > 0) {
    n = (long)((double)r.fmt->duration / AV_TIME_BASE *
               st->avg_frame_rate.num / st->avg_frame_rate.den);
  }
  if (n <= 0) {
    // last resort: count by decoding packets (no frame decode)
    AVPacket* pkt = av_packet_alloc();
    n = 0;
    while (av_read_frame(r.fmt, pkt) >= 0) {
      if (pkt->stream_index == r.stream_index) n++;
      av_packet_unref(pkt);
    }
    av_packet_free(&pkt);
  }
  *num_frames = n;
  *w = r.codec->width;
  *h = r.codec->height;
  return n > 0 ? 0 : -7;
}

int mvf_video_decode(const char* path, const long* indices, int n,
                     unsigned char* out, long capacity, int* out_w,
                     int* out_h) {
  if (n <= 0) return -1;
  Reader r;
  int rc = r.open(path);
  if (rc != 0) return rc;
  const int w = r.codec->width;
  const int h = r.codec->height;
  if ((long)n * w * h * 3 > capacity) return -8;
  *out_w = w;
  *out_h = h;

  long max_idx = 0;
  for (int i = 0; i < n; ++i) max_idx = std::max(max_idx, indices[i]);

  SwsContext* sws = sws_getContext(w, h, r.codec->pix_fmt, w, h,
                                   AV_PIX_FMT_BGR24, SWS_BILINEAR, nullptr,
                                   nullptr, nullptr);
  if (!sws) return -9;

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  std::vector<long> last_filled(n, -1);
  long decoded = 0;   // index of next decoded frame
  long last_kept = -1;
  std::vector<unsigned char> last_frame((size_t)w * h * 3);
  bool have_last = false;
  int err = 0;

  auto deliver = [&](long idx, const unsigned char* data) {
    for (int i = 0; i < n; ++i) {
      if (indices[i] == idx)
        std::memcpy(out + (size_t)i * w * h * 3, data, (size_t)w * h * 3);
    }
  };

  auto handle_frame = [&](AVFrame* f) {
    long idx = decoded++;
    bool wanted = false;
    for (int i = 0; i < n; ++i)
      if (indices[i] == idx) { wanted = true; break; }
    if (!wanted && idx != max_idx) return;
    uint8_t* dst[1] = {last_frame.data()};
    int dst_stride[1] = {w * 3};
    sws_scale(sws, f->data, f->linesize, 0, h, dst, dst_stride);
    have_last = true;
    last_kept = idx;
    deliver(idx, last_frame.data());
  };

  bool done = false;
  while (!done && av_read_frame(r.fmt, pkt) >= 0) {
    if (pkt->stream_index == r.stream_index) {
      if (avcodec_send_packet(r.codec, pkt) == 0) {
        while (avcodec_receive_frame(r.codec, frame) == 0) {
          handle_frame(frame);
          if (decoded > max_idx) { done = true; break; }
        }
      }
    }
    av_packet_unref(pkt);
  }
  if (!done) {
    // flush decoder
    avcodec_send_packet(r.codec, nullptr);
    while (avcodec_receive_frame(r.codec, frame) == 0) {
      handle_frame(frame);
      if (decoded > max_idx) break;
    }
  }

  // Clamp semantics: indices past the last decodable frame get the last
  // frame we saw (reference decode_frames_accurate fallback).
  if (have_last) {
    for (int i = 0; i < n; ++i) {
      if (indices[i] >= decoded)
        std::memcpy(out + (size_t)i * w * h * 3, last_frame.data(),
                    (size_t)w * h * 3);
    }
  } else {
    err = -10;  // nothing decoded at all
  }

  av_frame_free(&frame);
  av_packet_free(&pkt);
  sws_freeContext(sws);
  return err;
}

}  // extern "C"
