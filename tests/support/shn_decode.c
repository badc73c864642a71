/* Test oracle: decode an audio file (e.g. a shorten .shn stream) with
 * FFmpeg's libavformat/libavcodec and dump raw interleaved samples.
 *
 * Usage: shn_decode <in> <out.raw>
 * Output: for S16/S16P -> native-endian int16; for U8/U8P -> uint8.
 * Prints "fmt <name> channels <n>" on stdout.
 *
 * Used by tests/test_shorten.py to prove ast_tpu.data.shorten speaks
 * the real-world shorten bitstream (not a private dialect): our
 * encoder's output must decode bit-exact under FFmpeg's independent
 * implementation.  Built on demand with g++ at test time; tests skip
 * if the toolchain or libraries are absent.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#ifdef __cplusplus
extern "C" {
#endif
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/samplefmt.h>
#ifdef __cplusplus
}
#endif

static int die(const char *msg) { fprintf(stderr, "%s\n", msg); return 1; }

int main(int argc, char **argv) {
  if (argc != 3) return die("usage: shn_decode <in> <out.raw>");
  AVFormatContext *fmt = NULL;
  if (avformat_open_input(&fmt, argv[1], NULL, NULL) < 0)
    return die("open_input failed");
  if (avformat_find_stream_info(fmt, NULL) < 0)
    return die("find_stream_info failed");
  int si = -1;
  for (unsigned i = 0; i < fmt->nb_streams; i++)
    if (fmt->streams[i]->codecpar->codec_type == AVMEDIA_TYPE_AUDIO) {
      si = (int)i;
      break;
    }
  if (si < 0) return die("no audio stream");
  AVCodecParameters *par = fmt->streams[si]->codecpar;
  const AVCodec *dec = avcodec_find_decoder(par->codec_id);
  if (!dec) return die("no decoder");
  AVCodecContext *ctx = avcodec_alloc_context3(dec);
  if (avcodec_parameters_to_context(ctx, par) < 0)
    return die("parameters_to_context failed");
  if (avcodec_open2(ctx, dec, NULL) < 0) return die("avcodec_open2 failed");

  FILE *out = fopen(argv[2], "wb");
  if (!out) return die("cannot open output");

  AVPacket *pkt = av_packet_alloc();
  AVFrame *frame = av_frame_alloc();
  int channels = 0;
  enum AVSampleFormat sfmt = AV_SAMPLE_FMT_NONE;

  int draining = 0;
  while (1) {
    if (!draining) {
      int r = av_read_frame(fmt, pkt);
      if (r < 0) {
        draining = 1;
        avcodec_send_packet(ctx, NULL);
      } else if (pkt->stream_index != si) {
        av_packet_unref(pkt);
        continue;
      } else {
        if (avcodec_send_packet(ctx, pkt) < 0) return die("send_packet");
        av_packet_unref(pkt);
      }
    }
    int r;
    while ((r = avcodec_receive_frame(ctx, frame)) == 0) {
      sfmt = (enum AVSampleFormat)frame->format;
      channels = frame->ch_layout.nb_channels;
      int planar = av_sample_fmt_is_planar(sfmt);
      int bps = av_get_bytes_per_sample(sfmt);
      if (planar) {
        for (int i = 0; i < frame->nb_samples; i++)
          for (int c = 0; c < channels; c++)
            fwrite(frame->data[c] + (size_t)i * bps, bps, 1, out);
      } else {
        fwrite(frame->data[0], (size_t)bps * channels, frame->nb_samples,
               out);
      }
    }
    if (draining && r != 0) break;
    if (r != AVERROR(EAGAIN) && r != 0 && !draining) break;
  }
  printf("fmt %s channels %d\n", av_get_sample_fmt_name(sfmt), channels);
  fclose(out);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  avcodec_free_context(&ctx);
  avformat_close_input(&fmt);
  return 0;
}
