// Minimal audio transcoder used to (re)generate the compressed-container
// test fixtures (tests/data/*.m4a/.ogg/.opus) from the WAV/FLAC originals.
// Test tooling only — the shipped package contains decoders, never
// encoders.  The reference's own benchmark file is an .m4a
// (reference: benchmark/utils.py:12-15), which is why the container
// matrix matters.
//
// Build:  g++ -O3 -o media_encode media_encode.cpp \
//             -lavformat -lavcodec -lavutil -lswresample
// Usage:  media_encode <input> <output.{m4a,ogg,opus,mp3,...}> [seconds]

#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/audio_fifo.h>
#include <libavutil/channel_layout.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
}

static const AVCodec* pick_encoder(AVCodecID id) {
  // Prefer the battle-tested external encoders when the native one is
  // experimental (vorbis/opus).
  const char* preferred = nullptr;
  if (id == AV_CODEC_ID_VORBIS) preferred = "libvorbis";
  if (id == AV_CODEC_ID_OPUS) preferred = "libopus";
  if (id == AV_CODEC_ID_MP3) preferred = "libmp3lame";
  if (preferred) {
    const AVCodec* c = avcodec_find_encoder_by_name(preferred);
    if (c) return c;
  }
  return avcodec_find_encoder(id);
}

static int pick_rate(const AVCodec* enc, int want) {
  if (!enc->supported_samplerates) return want;
  int best = enc->supported_samplerates[0], bd = 1 << 30;
  for (const int* r = enc->supported_samplerates; *r; ++r) {
    int d = abs(*r - want);
    if (d < bd) bd = d, best = *r;
  }
  return best;
}

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: %s <in> <out> [max_seconds]\n", argv[0]);
    return 2;
  }
  const char* inf = argv[1];
  const char* outf = argv[2];
  double max_seconds = argc > 3 ? atof(argv[3]) : 1e18;
  av_log_set_level(AV_LOG_ERROR);

  // ---- input ----
  AVFormatContext* ifmt = nullptr;
  if (avformat_open_input(&ifmt, inf, nullptr, nullptr) < 0) return 3;
  if (avformat_find_stream_info(ifmt, nullptr) < 0) return 3;
  int si = av_find_best_stream(ifmt, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
  if (si < 0) return 4;
  AVStream* ist = ifmt->streams[si];
  const AVCodec* dec = avcodec_find_decoder(ist->codecpar->codec_id);
  AVCodecContext* dctx = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(dctx, ist->codecpar);
  if (avcodec_open2(dctx, dec, nullptr) < 0) return 5;

  // ---- output ----
  AVFormatContext* ofmt = nullptr;
  if (avformat_alloc_output_context2(&ofmt, nullptr, nullptr, outf) < 0 || !ofmt)
    return 6;
  const AVCodec* enc = pick_encoder(ofmt->oformat->audio_codec);
  if (!enc) {
    fprintf(stderr, "no encoder for %s\n", outf);
    return 6;
  }
  AVCodecContext* ectx = avcodec_alloc_context3(enc);
  ectx->sample_fmt = enc->sample_fmts ? enc->sample_fmts[0] : AV_SAMPLE_FMT_FLTP;
  ectx->sample_rate = pick_rate(enc, dctx->sample_rate);
  av_channel_layout_default(&ectx->ch_layout,
                            dctx->ch_layout.nb_channels >= 2 ? 2 : 1);
  ectx->bit_rate = 64000;
  ectx->time_base = AVRational{1, ectx->sample_rate};
  if (ofmt->oformat->flags & AVFMT_GLOBALHEADER)
    ectx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  ectx->strict_std_compliance = FF_COMPLIANCE_EXPERIMENTAL;
  if (avcodec_open2(ectx, enc, nullptr) < 0) {
    fprintf(stderr, "encoder open failed (%s)\n", enc->name);
    return 7;
  }
  AVStream* ost = avformat_new_stream(ofmt, nullptr);
  avcodec_parameters_from_context(ost->codecpar, ectx);
  ost->time_base = ectx->time_base;
  if (!(ofmt->oformat->flags & AVFMT_NOFILE) &&
      avio_open(&ofmt->pb, outf, AVIO_FLAG_WRITE) < 0)
    return 8;
  if (avformat_write_header(ofmt, nullptr) < 0) return 8;

  // ---- resampler + fifo ----
  SwrContext* swr = nullptr;
  if (swr_alloc_set_opts2(&swr, &ectx->ch_layout, ectx->sample_fmt,
                          ectx->sample_rate, &dctx->ch_layout,
                          dctx->sample_fmt, dctx->sample_rate, 0,
                          nullptr) < 0 ||
      swr_init(swr) < 0)
    return 9;
  AVAudioFifo* fifo = av_audio_fifo_alloc(ectx->sample_fmt,
                                          ectx->ch_layout.nb_channels, 1);

  AVPacket* pkt = av_packet_alloc();
  AVPacket* opkt = av_packet_alloc();
  AVFrame* frm = av_frame_alloc();
  int64_t pts = 0;
  int64_t max_in = (int64_t)(max_seconds * dctx->sample_rate);
  int64_t seen_in = 0;
  const int fsz = ectx->frame_size > 0 ? ectx->frame_size : 1024;

  auto push_resampled = [&](const AVFrame* f) {
    uint8_t* buf[8] = {nullptr};
    int cap = swr_get_out_samples(swr, f ? f->nb_samples : 0);
    if (cap <= 0) cap = fsz;
    av_samples_alloc(buf, nullptr, ectx->ch_layout.nb_channels, cap,
                     ectx->sample_fmt, 0);
    int got = swr_convert(swr, buf, cap,
                          f ? const_cast<const uint8_t**>(f->extended_data)
                            : nullptr,
                          f ? f->nb_samples : 0);
    if (got > 0) av_audio_fifo_write(fifo, reinterpret_cast<void**>(buf), got);
    av_freep(&buf[0]);
  };

  auto drain_encoder = [&](bool flush) {
    while (av_audio_fifo_size(fifo) >= fsz ||
           (flush && av_audio_fifo_size(fifo) > 0)) {
      int n = av_audio_fifo_size(fifo) < fsz ? av_audio_fifo_size(fifo) : fsz;
      AVFrame* ef = av_frame_alloc();
      ef->nb_samples = n;
      av_channel_layout_copy(&ef->ch_layout, &ectx->ch_layout);
      ef->format = ectx->sample_fmt;
      ef->sample_rate = ectx->sample_rate;
      av_frame_get_buffer(ef, 0);
      av_audio_fifo_read(fifo, reinterpret_cast<void**>(ef->data), n);
      ef->pts = pts;
      pts += n;
      avcodec_send_frame(ectx, ef);
      av_frame_free(&ef);
      while (avcodec_receive_packet(ectx, opkt) >= 0) {
        av_packet_rescale_ts(opkt, ectx->time_base, ost->time_base);
        opkt->stream_index = 0;
        av_interleaved_write_frame(ofmt, opkt);
      }
    }
  };

  bool done = false;
  while (!done && av_read_frame(ifmt, pkt) >= 0) {
    if (pkt->stream_index == si && avcodec_send_packet(dctx, pkt) >= 0) {
      while (avcodec_receive_frame(dctx, frm) >= 0) {
        if (seen_in >= max_in) {
          av_frame_unref(frm);
          done = true;
          break;
        }
        if (seen_in + frm->nb_samples > max_in)
          frm->nb_samples = (int)(max_in - seen_in);
        seen_in += frm->nb_samples;
        push_resampled(frm);
        av_frame_unref(frm);
      }
      drain_encoder(false);
    }
    av_packet_unref(pkt);
  }
  // flush decode -> resample -> encode chain
  avcodec_send_packet(dctx, nullptr);
  while (avcodec_receive_frame(dctx, frm) >= 0) {
    if (seen_in < max_in) {
      if (seen_in + frm->nb_samples > max_in)
        frm->nb_samples = (int)(max_in - seen_in);
      seen_in += frm->nb_samples;
      push_resampled(frm);
    }
    av_frame_unref(frm);
  }
  push_resampled(nullptr);
  drain_encoder(true);
  avcodec_send_frame(ectx, nullptr);
  while (avcodec_receive_packet(ectx, opkt) >= 0) {
    av_packet_rescale_ts(opkt, ectx->time_base, ost->time_base);
    opkt->stream_index = 0;
    av_interleaved_write_frame(ofmt, opkt);
  }
  av_write_trailer(ofmt);

  fprintf(stderr, "%s: %lld in-samples @%d -> %s (%s @%d)\n", inf,
          (long long)seen_in, dctx->sample_rate, outf, enc->name,
          ectx->sample_rate);

  av_audio_fifo_free(fifo);
  swr_free(&swr);
  av_packet_free(&pkt);
  av_packet_free(&opkt);
  av_frame_free(&frm);
  avcodec_free_context(&dctx);
  avcodec_free_context(&ectx);
  avformat_close_input(&ifmt);
  if (!(ofmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&ofmt->pb);
  avformat_free_context(ofmt);
  return 0;
}
