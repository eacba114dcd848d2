// Native host video-encode stage (libavformat/libavcodec/libswscale + x264).
//
// The inverse boundary of decode.cc: turns RGB frame streams into real
// H.264 mp4 bytes. The reference never encodes video itself — its input
// corpus is YouTube H.264 (/root/reference/dataset/download_videos.py) —
// but proving the five dataset CLIs compose from VIDEO BYTES (VERDICT
// round-3 ask #2) requires producing genuine mp4s in-container, and this
// image ships no ffmpeg CLI / PyAV / cv2 VideoWriter backend. So the
// encode twin lives next to the decoder and shares its .so.
//
// C ABI (ctypes; see video_dqn_tpu/data/native_decode.py):
//   void* encoder_open(const char* path, int w, int h, double fps,
//                      const char* codec)  // nullptr/"" = best available
//                                          // (libx264, else mpeg4)
//   int   encoder_write(void* h, const uint8_t* rgb)  // one RGB24 frame
//   int   encoder_close(void* h)  // flush + trailer; 0 = ok (also frees)
//
// Build: native/decode/Makefile -> libvdecode.so.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

#include <cstdint>
#include <cstring>

namespace {

struct Encoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  AVStream* stream = nullptr;
  SwsContext* sws = nullptr;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  int w = 0, h = 0;
  int64_t next_pts = 0;
  bool header_written = false;
};

int drain(Encoder* e) {
  while (true) {
    int r = avcodec_receive_packet(e->codec, e->pkt);
    if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) return 0;
    if (r < 0) return -1;
    // a zero-duration final sample makes the mp4 edit list end BEFORE it;
    // demuxers then flag that packet AV_PKT_FLAG_DISCARD and the last
    // frame vanishes on decode (roundtrip found this: 30 in, 29 out)
    if (e->pkt->duration == 0) e->pkt->duration = 1;
    av_packet_rescale_ts(e->pkt, e->codec->time_base, e->stream->time_base);
    e->pkt->stream_index = e->stream->index;
    r = av_interleaved_write_frame(e->fmt, e->pkt);
    av_packet_unref(e->pkt);
    if (r < 0) return -1;
  }
}

void destroy(Encoder* e) {
  if (e->sws) sws_freeContext(e->sws);
  if (e->frame) av_frame_free(&e->frame);
  if (e->pkt) av_packet_free(&e->pkt);
  if (e->codec) avcodec_free_context(&e->codec);
  if (e->fmt) {
    if (e->fmt->pb) avio_closep(&e->fmt->pb);
    avformat_free_context(e->fmt);
  }
  delete e;
}

}  // namespace

extern "C" {

void* encoder_open(const char* path, int w, int h, double fps,
                   const char* codec_name) {
  // yuv420p needs even dimensions; reject rather than silently crop
  if (w <= 0 || h <= 0 || (w & 1) || (h & 1) || fps <= 0) return nullptr;
  Encoder* e = new Encoder();
  e->w = w;
  e->h = h;
  const AVCodec* codec = nullptr;
  if (codec_name && codec_name[0])
    codec = avcodec_find_encoder_by_name(codec_name);
  if (!codec) codec = avcodec_find_encoder_by_name("libx264");
  if (!codec) codec = avcodec_find_encoder_by_name("mpeg4");
  if (!codec) { delete e; return nullptr; }

  if (avformat_alloc_output_context2(&e->fmt, nullptr, nullptr, path) < 0 ||
      !e->fmt) {
    delete e;
    return nullptr;
  }
  e->stream = avformat_new_stream(e->fmt, nullptr);
  e->codec = avcodec_alloc_context3(codec);
  if (!e->stream || !e->codec) { destroy(e); return nullptr; }

  e->codec->width = w;
  e->codec->height = h;
  e->codec->pix_fmt = AV_PIX_FMT_YUV420P;
  // integer-safe time base carrying fractional fps (e.g. 29.97)
  e->codec->time_base = av_d2q(1.0 / fps, 1'000'000);
  e->codec->framerate = av_inv_q(e->codec->time_base);
  e->codec->gop_size = 12;
  if (e->fmt->oformat->flags & AVFMT_GLOBALHEADER)
    e->codec->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (!strcmp(codec->name, "libx264")) {
    av_opt_set(e->codec->priv_data, "preset", "fast", 0);
    av_opt_set(e->codec->priv_data, "crf", "20", 0);
  } else {
    e->codec->bit_rate = (int64_t)w * h * 4;  // ~4 bpp: high quality
  }
  if (avcodec_open2(e->codec, codec, nullptr) < 0) { destroy(e); return nullptr; }
  if (avcodec_parameters_from_context(e->stream->codecpar, e->codec) < 0) {
    destroy(e);
    return nullptr;
  }
  e->stream->time_base = e->codec->time_base;

  if (!(e->fmt->oformat->flags & AVFMT_NOFILE) &&
      avio_open(&e->fmt->pb, path, AVIO_FLAG_WRITE) < 0) {
    destroy(e);
    return nullptr;
  }
  if (avformat_write_header(e->fmt, nullptr) < 0) { destroy(e); return nullptr; }
  e->header_written = true;

  e->frame = av_frame_alloc();
  e->pkt = av_packet_alloc();
  if (!e->frame || !e->pkt) { destroy(e); return nullptr; }
  e->frame->format = AV_PIX_FMT_YUV420P;
  e->frame->width = w;
  e->frame->height = h;
  if (av_frame_get_buffer(e->frame, 0) < 0) { destroy(e); return nullptr; }
  e->sws = sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h, AV_PIX_FMT_YUV420P,
                          SWS_BILINEAR, nullptr, nullptr, nullptr);
  if (!e->sws) { destroy(e); return nullptr; }
  return e;
}

int encoder_write(void* h, const uint8_t* rgb) {
  Encoder* e = (Encoder*)h;
  if (av_frame_make_writable(e->frame) < 0) return -1;
  const uint8_t* src[4] = {rgb, nullptr, nullptr, nullptr};
  int src_stride[4] = {3 * e->w, 0, 0, 0};
  sws_scale(e->sws, src, src_stride, 0, e->h, e->frame->data,
            e->frame->linesize);
  e->frame->pts = e->next_pts++;
  e->frame->pkt_duration = 1;  // one tick of codec time_base (= 1/fps)
  if (avcodec_send_frame(e->codec, e->frame) < 0) return -1;
  return drain(e);
}

int encoder_close(void* h) {
  Encoder* e = (Encoder*)h;
  if (!e) return 0;
  int rc = 0;
  if (e->header_written) {
    if (avcodec_send_frame(e->codec, nullptr) < 0) rc = -1;  // flush
    if (drain(e) < 0) rc = -1;
    if (av_write_trailer(e->fmt) < 0) rc = -1;
  }
  destroy(e);
  return rc;
}

}  // extern "C"
