// Native video decode shim: ffmpeg/libav demux+decode -> BGR24 frames.
//
// SURVEY.md N1/N7: the reference decodes through OpenCV's videoio
// (itself libav underneath, /root/reference/yolo_multi_model.py:252).
// This shim talks to libav directly so the media layer owns its decode
// path end-to-end: demux (avformat) -> decode (avcodec) -> BGR24
// convert (swscale) into a caller-provided buffer. The Python binding
// (strongsort_yolo_tpu/media/native_decoder.py) drives it from the
// per-stream reader threads; ctypes calls drop the GIL, so decode
// genuinely overlaps the device step.
//
// C ABI:
//   void*  vd_open(const char* path)
//   int    vd_info(void*, int* w, int* h, double* fps, long* nframes)
//   int    vd_read(void*, uint8_t* out_bgr)   // 1 frame, 0 EOF, <0 err
//   void   vd_close(void*)

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
  int stream_index = -1;
  int width = 0;
  int height = 0;
  double fps = 0.0;
  int64_t nframes = 0;
  bool draining = false;
};

void destroy(Decoder* d) {
  if (!d) return;
  if (d->sws) sws_freeContext(d->sws);
  if (d->frame) av_frame_free(&d->frame);
  if (d->pkt) av_packet_free(&d->pkt);
  if (d->codec) avcodec_free_context(&d->codec);
  if (d->fmt) avformat_close_input(&d->fmt);
  delete d;
}

}  // namespace

extern "C" {

void* vd_open(const char* path) {
  Decoder* d = new Decoder();
  if (avformat_open_input(&d->fmt, path, nullptr, nullptr) < 0) {
    destroy(d);
    return nullptr;
  }
  if (avformat_find_stream_info(d->fmt, nullptr) < 0) {
    destroy(d);
    return nullptr;
  }
  const AVCodec* dec = nullptr;
  d->stream_index =
      av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
  if (d->stream_index < 0 || !dec) {
    destroy(d);
    return nullptr;
  }
  AVStream* st = d->fmt->streams[d->stream_index];
  d->codec = avcodec_alloc_context3(dec);
  if (!d->codec ||
      avcodec_parameters_to_context(d->codec, st->codecpar) < 0 ||
      avcodec_open2(d->codec, dec, nullptr) < 0) {
    destroy(d);
    return nullptr;
  }
  d->width = d->codec->width;
  d->height = d->codec->height;
  AVRational r = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
  d->fps = r.den ? static_cast<double>(r.num) / r.den : 0.0;
  d->nframes = st->nb_frames;  // 0 when the container doesn't say
  d->pkt = av_packet_alloc();
  d->frame = av_frame_alloc();
  if (!d->pkt || !d->frame) {
    destroy(d);
    return nullptr;
  }
  return d;
}

int vd_info(void* h, int* w, int* hgt, double* fps, long* nframes) {
  Decoder* d = static_cast<Decoder*>(h);
  if (!d) return -1;
  if (w) *w = d->width;
  if (hgt) *hgt = d->height;
  if (fps) *fps = d->fps;
  if (nframes) *nframes = static_cast<long>(d->nframes);
  return 0;
}

int vd_read(void* h, uint8_t* out_bgr) {
  Decoder* d = static_cast<Decoder*>(h);
  if (!d) return -1;
  for (;;) {
    int r = avcodec_receive_frame(d->codec, d->frame);
    if (r == 0) {
      if (!d->sws) {
        d->sws = sws_getContext(
            d->frame->width, d->frame->height,
            static_cast<AVPixelFormat>(d->frame->format), d->width,
            d->height, AV_PIX_FMT_BGR24, SWS_BILINEAR, nullptr, nullptr,
            nullptr);
        if (!d->sws) return -2;
      }
      uint8_t* dst[1] = {out_bgr};
      int dst_stride[1] = {3 * d->width};
      sws_scale(d->sws, d->frame->data, d->frame->linesize, 0,
                d->frame->height, dst, dst_stride);
      av_frame_unref(d->frame);
      return 1;
    }
    if (r == AVERROR_EOF) return 0;
    if (r != AVERROR(EAGAIN)) return -3;
    if (d->draining) return 0;
    // feed the decoder another packet
    for (;;) {
      int pr = av_read_frame(d->fmt, d->pkt);
      if (pr < 0) {  // demux EOF: flush the decoder
        avcodec_send_packet(d->codec, nullptr);
        d->draining = true;
        break;
      }
      if (d->pkt->stream_index == d->stream_index) {
        int sr = avcodec_send_packet(d->codec, d->pkt);
        av_packet_unref(d->pkt);
        if (sr < 0 && sr != AVERROR(EAGAIN)) return -4;
        break;
      }
      av_packet_unref(d->pkt);
    }
  }
}

void vd_close(void* h) { destroy(static_cast<Decoder*>(h)); }

}  // extern "C"
