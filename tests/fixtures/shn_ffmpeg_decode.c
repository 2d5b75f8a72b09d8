/* Third-party shorten oracle: decode a raw .shn stream with FFmpeg's
 * libavformat/libavcodec and write interleaved s16le PCM to stdout.
 *
 * Compiled at test time (tests/test_shorten.py, gated on libavcodec-dev
 * being present) to differentially verify that data/shorten.py's encoder
 * emits REAL shorten v2 — the bitstream LDC/ICSI tools produce — not a
 * self-consistent dialect.  (A resn off-by-one that round-tripped through
 * our own twin decoders was caught exactly this way.)
 *
 * Usage: shn_ffmpeg_decode <file.shn> > out.s16le
 */
#include <stdio.h>
#include <stdint.h>
#include <libavformat/avformat.h>
#include <libavcodec/avcodec.h>
#include <libavutil/samplefmt.h>

static int emit(const AVFrame *fr, const AVCodecContext *cc) {
  int nch = cc->ch_layout.nb_channels;
  int planar = av_sample_fmt_is_planar(cc->sample_fmt);
  int bps = av_get_bytes_per_sample(cc->sample_fmt);
  if (bps != 2) { fprintf(stderr, "unexpected sample fmt %d\n", cc->sample_fmt); return 1; }
  for (int i = 0; i < fr->nb_samples; i++)
    for (int c = 0; c < nch; c++) {
      const uint8_t *p = planar ? fr->data[c] + (size_t)i * bps
                                : fr->data[0] + ((size_t)i * nch + c) * bps;
      fwrite(p, 1, bps, stdout);
    }
  return 0;
}

int main(int argc, char **argv) {
  if (argc != 2) { fprintf(stderr, "usage: %s file.shn\n", argv[0]); return 2; }
  AVFormatContext *fmt = NULL;
  if (avformat_open_input(&fmt, argv[1], NULL, NULL) < 0) {
    fprintf(stderr, "open failed\n"); return 3;
  }
  if (avformat_find_stream_info(fmt, NULL) < 0) { fprintf(stderr, "no stream info\n"); return 3; }
  int si = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, NULL, 0);
  if (si < 0) { fprintf(stderr, "no audio stream\n"); return 3; }
  const AVCodec *dec = avcodec_find_decoder(fmt->streams[si]->codecpar->codec_id);
  if (!dec) { fprintf(stderr, "no decoder\n"); return 3; }
  AVCodecContext *cc = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(cc, fmt->streams[si]->codecpar);
  if (avcodec_open2(cc, dec, NULL) < 0) { fprintf(stderr, "open codec failed\n"); return 3; }

  AVPacket *pkt = av_packet_alloc();
  AVFrame *fr = av_frame_alloc();
  int rc = 0;
  while (av_read_frame(fmt, pkt) >= 0 && rc == 0) {
    if (pkt->stream_index == si) {
      if (avcodec_send_packet(cc, pkt) < 0) { fprintf(stderr, "decode error\n"); rc = 4; break; }
      int r;
      while ((r = avcodec_receive_frame(cc, fr)) >= 0)
        if (emit(fr, cc)) { rc = 4; break; }
      if (r != AVERROR(EAGAIN) && r != AVERROR_EOF && rc == 0) { fprintf(stderr, "recv error\n"); rc = 4; }
    }
    av_packet_unref(pkt);
  }
  if (rc == 0) {  /* flush */
    avcodec_send_packet(cc, NULL);
    int r;
    while ((r = avcodec_receive_frame(cc, fr)) >= 0)
      if (emit(fr, cc)) { rc = 4; break; }
  }
  av_frame_free(&fr);
  av_packet_free(&pkt);
  avcodec_free_context(&cc);
  avformat_close_input(&fmt);
  return rc;
}
