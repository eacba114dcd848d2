// Native host video-decode stage (libavformat/libavcodec/libswscale).
//
// Replaces the reference's ffmpeg-subprocess frame dump
// (/root/reference/dataset/extract_frames.py:120-122: `ffmpeg -i <mp4>
// -vf fps=0.5 <frames>/%04d.jpg`) with an in-process decoder that samples
// frames at a fixed rate and hands RGB24 buffers straight to the caller —
// no JPEG round trip, no subprocess, optional swscale resize fused into
// the decode. This is the BASELINE.md "C++ libavcodec infeed stage"
// north-star item; the Python twin/fallback is the cv2 path in
// video_dqn_tpu/data/video.py.
//
// C ABI (ctypes; see video_dqn_tpu/data/native_decode.py):
//   void* decoder_open(const char* path, double sample_fps,
//                      int target_w, int target_h)   // 0,0 = native size
//   int   decoder_info(void* h, int* w, int* h, double* duration_sec)
//   int   decoder_next(void* h, uint8_t* out_rgb)    // 1 = frame, 0 = EOF,
//                                                    // <0 = error
//   void  decoder_close(void* h)
//
// Build: native/decode/Makefile -> libvdecode.so (pkg-config ffmpeg libs).

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <cstdint>
#include <cstring>

namespace {

struct Decoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  int stream = -1;
  int out_w = 0, out_h = 0;
  double sample_dt = 0.0;   // seconds between sampled frames
  double next_sample = 0.0; // next sample timestamp (seconds)
  bool input_eof = false;   // av_read_frame exhausted the container
  bool eof_sent = false;    // flush packet ACCEPTED by the decoder
  bool pkt_pending = false;  // send_packet returned EAGAIN; resend d->pkt
  int64_t frames_seen = 0;   // timestamp fallback counter
};

double frame_time(Decoder* d, const AVFrame* f) {
  int64_t pts = f->best_effort_timestamp;
  if (pts == AV_NOPTS_VALUE) pts = f->pts;
  if (pts == AV_NOPTS_VALUE) {
    // elementary streams without timestamps: synthesize from the frame
    // counter and the stream's frame rate (cv2-oracle behavior)
    AVRational fr = d->fmt->streams[d->stream]->avg_frame_rate;
    double fps = (fr.num > 0 && fr.den > 0) ? av_q2d(fr) : 30.0;
    return d->frames_seen / fps;
  }
  AVRational tb = d->fmt->streams[d->stream]->time_base;
  return pts * av_q2d(tb);
}

}  // namespace

extern "C" {

void* decoder_open(const char* path, double sample_fps, int target_w,
                   int target_h) {
  Decoder* d = new Decoder();
  if (avformat_open_input(&d->fmt, path, nullptr, nullptr) < 0) {
    delete d;
    return nullptr;
  }
  if (avformat_find_stream_info(d->fmt, nullptr) < 0) goto fail;
  d->stream = av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1,
                                  nullptr, 0);
  if (d->stream < 0) goto fail;
  {
    AVStream* st = d->fmt->streams[d->stream];
    const AVCodec* dec = avcodec_find_decoder(st->codecpar->codec_id);
    if (!dec) goto fail;
    d->codec = avcodec_alloc_context3(dec);
    if (avcodec_parameters_to_context(d->codec, st->codecpar) < 0) goto fail;
    if (avcodec_open2(d->codec, dec, nullptr) < 0) goto fail;
    d->out_w = target_w > 0 ? target_w : d->codec->width;
    d->out_h = target_h > 0 ? target_h : d->codec->height;
    d->sample_dt = sample_fps > 0 ? 1.0 / sample_fps : 0.0;
    // ffmpeg's fps filter emits the first frame at t=0
    d->next_sample = 0.0;
    d->pkt = av_packet_alloc();
    d->frame = av_frame_alloc();
  }
  return d;
fail:
  if (d->codec) avcodec_free_context(&d->codec);
  if (d->fmt) avformat_close_input(&d->fmt);
  delete d;
  return nullptr;
}

int decoder_info(void* h, int* w, int* hh, double* duration_sec) {
  Decoder* d = (Decoder*)h;
  *w = d->out_w;
  *hh = d->out_h;
  *duration_sec =
      d->fmt->duration > 0 ? d->fmt->duration / (double)AV_TIME_BASE : -1.0;
  return 0;
}

static int emit(Decoder* d, uint8_t* out_rgb) {
  if (!d->sws) {
    d->sws = sws_getContext(d->codec->width, d->codec->height,
                            d->codec->pix_fmt, d->out_w, d->out_h,
                            AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr, nullptr,
                            nullptr);
    if (!d->sws) return -2;
  }
  uint8_t* dst[4] = {out_rgb, nullptr, nullptr, nullptr};
  int dst_stride[4] = {3 * d->out_w, 0, 0, 0};
  sws_scale(d->sws, d->frame->data, d->frame->linesize, 0, d->codec->height,
            dst, dst_stride);
  return 1;
}

int decoder_next(void* h, uint8_t* out_rgb) {
  Decoder* d = (Decoder*)h;
  while (true) {
    int r = avcodec_receive_frame(d->codec, d->frame);
    if (r == 0) {
      double t = frame_time(d, d->frame);
      d->frames_seen++;
      if (d->sample_dt <= 0 || t >= d->next_sample - 1e-9) {
        if (d->sample_dt > 0) {
          // skip ahead past any samples this frame covers
          while (d->next_sample <= t + 1e-9) d->next_sample += d->sample_dt;
        }
        int e = emit(d, out_rgb);
        av_frame_unref(d->frame);
        return e;
      }
      av_frame_unref(d->frame);
      continue;
    }
    if (r == AVERROR_EOF) return 0;
    if (r != AVERROR(EAGAIN)) return -1;

    // feed more packets
    if (d->eof_sent) return 0;
    while (true) {
      if (d->input_eof) {
        // flush: send_packet(nullptr) returns EAGAIN while decoded
        // frames are still queued — the flush is NOT registered then and
        // must be re-sent after draining, or codecs with frame delay
        // (H.264 B-frames) silently lose their last frames
        int sr = avcodec_send_packet(d->codec, nullptr);
        if (sr == 0 || sr == AVERROR_EOF) d->eof_sent = true;
        break;  // drain frames; retry the flush on the next pass if EAGAIN
      }
      if (!d->pkt_pending) {
        int pr = av_read_frame(d->fmt, d->pkt);
        if (pr < 0) {
          d->input_eof = true;
          continue;
        }
        if (d->pkt->stream_index != d->stream) {
          av_packet_unref(d->pkt);
          continue;
        }
      }
      int sr = avcodec_send_packet(d->codec, d->pkt);
      if (sr == 0) {
        av_packet_unref(d->pkt);
        d->pkt_pending = false;
        break;
      }
      if (sr == AVERROR(EAGAIN)) {
        // decoder is full: HOLD the packet (FFmpeg contract says resend
        // the same packet after draining frames) and go receive
        d->pkt_pending = true;
        break;
      }
      av_packet_unref(d->pkt);
      d->pkt_pending = false;
      return -1;
    }
  }
}

void decoder_close(void* h) {
  Decoder* d = (Decoder*)h;
  if (!d) return;
  if (d->sws) sws_freeContext(d->sws);
  if (d->frame) av_frame_free(&d->frame);
  if (d->pkt) av_packet_free(&d->pkt);
  if (d->codec) avcodec_free_context(&d->codec);
  if (d->fmt) avformat_close_input(&d->fmt);
  delete d;
}

}  // extern "C"
