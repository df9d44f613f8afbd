// Compressed-audio decode/encode via the system FFmpeg libraries
// (libavformat/libavcodec/libavutil, ffmpeg 5.1 API).
//
// Role: the reference loads mp3/ogg/m4a through librosa -> audioread ->
// *system codecs* (/root/reference/nisqa/NISQA_lib.py:2298-2306); this shim
// is the same contract for nisqa_tpu — when the host has FFmpeg libraries,
// any container/codec they decode becomes a valid input; when it does not,
// nisqa_tpu/audio/wav.py keeps raising its actionable format error.
// WAV and FLAC never come through here (own from-spec decoders).
//
// C ABI (ctypes-consumed by nisqa_tpu/audio/codec.py):
//   codec_decode(path, &buf, &n_frames, &sr, &n_ch, err, errlen) -> 0 ok
//       buf: malloc'd interleaved float32, n_frames*n_ch samples, full
//       native sample rate / channel count (mono mix-down happens in numpy
//       so it is bit-identical to the WAV path's float-mean semantics).
//   codec_free(buf)
//   codec_encode(path, pcm, n_frames, n_ch, sr, bitrate, err, errlen) -> 0
//       test-vector generator: format by file extension (.mp3/.ogg/.m4a/
//       .opus/...), interleaved float32 in.
//
// Build: make -C native codec   (separate target: hosts without the FFmpeg
// dev files still build the WAV loader).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/channel_layout.h>
#include <libavutil/opt.h>
#include <libavutil/samplefmt.h>
}

namespace {

// decoder warnings ("could not update timestamps for skipped samples" on
// every gapless mp3/opus) are noise on stderr during corpus loads
struct LogQuiet {
    LogQuiet() { av_log_set_level(AV_LOG_ERROR); }
} log_quiet;

void set_err(char* err, int errlen, const std::string& msg) {
    if (err && errlen > 0) {
        std::snprintf(err, errlen, "%s", msg.c_str());
    }
}

std::string av_err_str(int rc) {
    char buf[AV_ERROR_MAX_STRING_SIZE] = {0};
    av_strerror(rc, buf, sizeof(buf));
    return std::string(buf);
}

// Convert one decoded frame (any common sample format, planar or packed)
// to interleaved float32 appended onto `out`. Integer formats scale by
// 1/2^(bits-1) — the same convention libsndfile/librosa use.
bool append_frame_f32(const AVFrame* f, int n_ch, std::vector<float>& out) {
    const int n = f->nb_samples;
    const auto fmt = static_cast<AVSampleFormat>(f->format);
    const bool planar = av_sample_fmt_is_planar(fmt) != 0;
    const size_t base = out.size();
    out.resize(base + static_cast<size_t>(n) * n_ch);
    float* dst = out.data() + base;

    auto plane = [&](int ch) -> const uint8_t* {
        return planar ? f->extended_data[ch] : f->extended_data[0];
    };
    // packed data indexes as [i*n_ch + ch]; planar as [i] on plane ch
    auto idx = [&](int i, int ch) -> int { return planar ? i : i * n_ch + ch; };

    switch (av_get_packed_sample_fmt(fmt)) {
        case AV_SAMPLE_FMT_FLT:
            for (int ch = 0; ch < n_ch; ch++) {
                const float* s = reinterpret_cast<const float*>(plane(ch));
                for (int i = 0; i < n; i++) dst[i * n_ch + ch] = s[idx(i, ch)];
            }
            return true;
        case AV_SAMPLE_FMT_DBL:
            for (int ch = 0; ch < n_ch; ch++) {
                const double* s = reinterpret_cast<const double*>(plane(ch));
                for (int i = 0; i < n; i++)
                    dst[i * n_ch + ch] = static_cast<float>(s[idx(i, ch)]);
            }
            return true;
        case AV_SAMPLE_FMT_S16:
            for (int ch = 0; ch < n_ch; ch++) {
                const int16_t* s = reinterpret_cast<const int16_t*>(plane(ch));
                for (int i = 0; i < n; i++)
                    dst[i * n_ch + ch] = s[idx(i, ch)] / 32768.0f;
            }
            return true;
        case AV_SAMPLE_FMT_S32:
            for (int ch = 0; ch < n_ch; ch++) {
                const int32_t* s = reinterpret_cast<const int32_t*>(plane(ch));
                for (int i = 0; i < n; i++)
                    dst[i * n_ch + ch] =
                        static_cast<float>(s[idx(i, ch)] / 2147483648.0);
            }
            return true;
        case AV_SAMPLE_FMT_U8:
            for (int ch = 0; ch < n_ch; ch++) {
                const uint8_t* s = plane(ch);
                for (int i = 0; i < n; i++)
                    dst[i * n_ch + ch] = (s[idx(i, ch)] - 128) / 128.0f;
            }
            return true;
        case AV_SAMPLE_FMT_S64:
            for (int ch = 0; ch < n_ch; ch++) {
                const int64_t* s = reinterpret_cast<const int64_t*>(plane(ch));
                for (int i = 0; i < n; i++)
                    dst[i * n_ch + ch] = static_cast<float>(
                        s[idx(i, ch)] / 9223372036854775808.0);
            }
            return true;
        default:
            out.resize(base);
            return false;
    }
}

}  // namespace

extern "C" int codec_decode(const char* path, float** out_buf,
                            int64_t* out_frames, int* out_sr, int* out_ch,
                            char* err, int errlen) {
    *out_buf = nullptr;
    *out_frames = 0;
    *out_sr = 0;
    *out_ch = 0;

    AVFormatContext* fmt_ctx = nullptr;
    int rc = avformat_open_input(&fmt_ctx, path, nullptr, nullptr);
    if (rc < 0) {
        set_err(err, errlen, "open: " + av_err_str(rc));
        return 1;
    }
    struct FmtGuard {
        AVFormatContext** c;
        ~FmtGuard() { avformat_close_input(c); }
    } fmt_guard{&fmt_ctx};

    rc = avformat_find_stream_info(fmt_ctx, nullptr);
    if (rc < 0) {
        set_err(err, errlen, "stream info: " + av_err_str(rc));
        return 2;
    }
    const AVCodec* dec = nullptr;
    int stream = av_find_best_stream(fmt_ctx, AVMEDIA_TYPE_AUDIO, -1, -1, &dec, 0);
    if (stream < 0 || !dec) {
        set_err(err, errlen, "no decodable audio stream");
        return 3;
    }
    AVCodecContext* ctx = avcodec_alloc_context3(dec);
    if (!ctx) {
        set_err(err, errlen, "alloc codec context failed");
        return 4;
    }
    struct CtxGuard {
        AVCodecContext** c;
        ~CtxGuard() { avcodec_free_context(c); }
    } ctx_guard{&ctx};

    rc = avcodec_parameters_to_context(ctx, fmt_ctx->streams[stream]->codecpar);
    if (rc >= 0) rc = avcodec_open2(ctx, dec, nullptr);
    if (rc < 0) {
        set_err(err, errlen, "codec open: " + av_err_str(rc));
        return 5;
    }

    AVPacket* pkt = av_packet_alloc();
    AVFrame* frame = av_frame_alloc();
    struct PkGuard {
        AVPacket** p;
        AVFrame** f;
        ~PkGuard() {
            av_packet_free(p);
            av_frame_free(f);
        }
    } pk_guard{&pkt, &frame};

    std::vector<float> pcm;
    int n_ch = 0, sr = 0;
    bool draining = false;
    while (true) {
        if (!draining) {
            rc = av_read_frame(fmt_ctx, pkt);
            if (rc == AVERROR_EOF) {
                draining = true;
                avcodec_send_packet(ctx, nullptr);  // enter drain mode
            } else if (rc < 0) {
                set_err(err, errlen, "read: " + av_err_str(rc));
                return 6;
            } else {
                if (pkt->stream_index != stream) {
                    av_packet_unref(pkt);
                    continue;
                }
                rc = avcodec_send_packet(ctx, pkt);
                av_packet_unref(pkt);
                if (rc < 0 && rc != AVERROR(EAGAIN)) {
                    set_err(err, errlen, "decode: " + av_err_str(rc));
                    return 7;
                }
            }
        }
        while ((rc = avcodec_receive_frame(ctx, frame)) >= 0) {
            const int f_ch = frame->ch_layout.nb_channels;
            const int f_sr = frame->sample_rate ? frame->sample_rate : ctx->sample_rate;
            if (n_ch == 0) {
                n_ch = f_ch;
                sr = f_sr;
            } else if (f_ch != n_ch || f_sr != sr) {
                // chained/reconfigured streams: appending with a stale
                // stride would scramble (or over-read) every later frame —
                // fail loudly instead
                set_err(err, errlen,
                        "stream changes format mid-file (" +
                            std::to_string(n_ch) + "ch@" + std::to_string(sr) +
                            " -> " + std::to_string(f_ch) + "ch@" +
                            std::to_string(f_sr) + ")");
                return 12;
            }
            if (!append_frame_f32(frame, n_ch, pcm)) {
                set_err(err, errlen,
                        std::string("unsupported sample format: ") +
                            av_get_sample_fmt_name(
                                static_cast<AVSampleFormat>(frame->format)));
                return 8;
            }
            av_frame_unref(frame);
        }
        if (draining && rc == AVERROR_EOF) break;
        if (rc != AVERROR(EAGAIN) && rc != AVERROR_EOF) {
            set_err(err, errlen, "receive: " + av_err_str(rc));
            return 9;
        }
    }
    if (n_ch == 0 || pcm.empty()) {
        set_err(err, errlen, "stream decoded to zero samples");
        return 10;
    }

    float* buf = static_cast<float*>(std::malloc(pcm.size() * sizeof(float)));
    if (!buf) {
        set_err(err, errlen, "out of memory");
        return 11;
    }
    std::memcpy(buf, pcm.data(), pcm.size() * sizeof(float));
    *out_buf = buf;
    *out_frames = static_cast<int64_t>(pcm.size()) / n_ch;
    *out_sr = sr;
    *out_ch = n_ch;
    return 0;
}

extern "C" void codec_free(float* buf) { std::free(buf); }

// ---------------------------------------------------------------------------
// Encoder: test-vector generation only (the serving path never encodes).
// ---------------------------------------------------------------------------

namespace {

const AVCodec* pick_encoder(AVCodecID id) {
    // prefer the external-library encoders (libmp3lame/libvorbis produce
    // standard files; the native vorbis encoder is experimental)
    const char* preferred = nullptr;
    switch (id) {
        case AV_CODEC_ID_MP3: preferred = "libmp3lame"; break;
        case AV_CODEC_ID_VORBIS: preferred = "libvorbis"; break;
        case AV_CODEC_ID_OPUS: preferred = "libopus"; break;
        default: break;
    }
    if (preferred) {
        const AVCodec* c = avcodec_find_encoder_by_name(preferred);
        if (c) return c;
    }
    return avcodec_find_encoder(id);
}

AVSampleFormat pick_sample_fmt(const AVCodec* enc) {
    if (!enc->sample_fmts) return AV_SAMPLE_FMT_FLTP;
    for (const AVSampleFormat* f = enc->sample_fmts; *f != AV_SAMPLE_FMT_NONE; f++) {
        if (*f == AV_SAMPLE_FMT_FLTP) return *f;
    }
    return enc->sample_fmts[0];
}

// fill an encoder frame from interleaved f32 input
bool fill_enc_frame(AVFrame* f, const float* src, int64_t start, int n,
                    int n_ch, AVSampleFormat fmt) {
    const bool planar = av_sample_fmt_is_planar(fmt) != 0;
    for (int ch = 0; ch < n_ch; ch++) {
        uint8_t* d = planar ? f->extended_data[ch] : f->extended_data[0];
        for (int i = 0; i < n; i++) {
            const float v = src[(start + i) * n_ch + ch];
            const int o = planar ? i : i * n_ch + ch;
            switch (av_get_packed_sample_fmt(fmt)) {
                case AV_SAMPLE_FMT_FLT:
                    reinterpret_cast<float*>(d)[o] = v;
                    break;
                case AV_SAMPLE_FMT_S16: {
                    float s = v * 32768.0f;
                    if (s > 32767.0f) s = 32767.0f;
                    if (s < -32768.0f) s = -32768.0f;
                    reinterpret_cast<int16_t*>(d)[o] = static_cast<int16_t>(s);
                    break;
                }
                case AV_SAMPLE_FMT_S32: {
                    double s = static_cast<double>(v) * 2147483648.0;
                    if (s > 2147483647.0) s = 2147483647.0;
                    if (s < -2147483648.0) s = -2147483648.0;
                    reinterpret_cast<int32_t*>(d)[o] = static_cast<int32_t>(s);
                    break;
                }
                default:
                    return false;
            }
        }
    }
    return true;
}

}  // namespace

extern "C" int codec_encode(const char* path, const float* pcm,
                            int64_t n_frames, int n_ch, int sr, int bitrate,
                            char* err, int errlen) {
    AVFormatContext* fmt_ctx = nullptr;
    int rc = avformat_alloc_output_context2(&fmt_ctx, nullptr, nullptr, path);
    if (rc < 0 || !fmt_ctx) {
        set_err(err, errlen, "output format: " + av_err_str(rc));
        return 1;
    }
    struct FmtGuard {
        AVFormatContext* c;
        ~FmtGuard() {
            if (c && !(c->oformat->flags & AVFMT_NOFILE) && c->pb)
                avio_closep(&c->pb);
            avformat_free_context(c);
        }
    } fmt_guard{fmt_ctx};

    const AVCodec* enc = pick_encoder(fmt_ctx->oformat->audio_codec);
    if (!enc) {
        set_err(err, errlen, "no encoder for this extension");
        return 2;
    }
    AVCodecContext* ctx = avcodec_alloc_context3(enc);
    if (!ctx) {
        set_err(err, errlen, "alloc codec context failed");
        return 14;
    }
    struct CtxGuard {
        AVCodecContext** c;
        ~CtxGuard() { avcodec_free_context(c); }
    } ctx_guard{&ctx};

    ctx->sample_rate = sr;
    ctx->sample_fmt = pick_sample_fmt(enc);
    ctx->bit_rate = bitrate > 0 ? bitrate : 128000;
    ctx->time_base = {1, sr};
    av_channel_layout_default(&ctx->ch_layout, n_ch);
    if (fmt_ctx->oformat->flags & AVFMT_GLOBALHEADER)
        ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    ctx->strict_std_compliance = FF_COMPLIANCE_EXPERIMENTAL;

    rc = avcodec_open2(ctx, enc, nullptr);
    if (rc < 0) {
        set_err(err, errlen, "encoder open: " + av_err_str(rc));
        return 3;
    }
    AVStream* st = avformat_new_stream(fmt_ctx, nullptr);
    if (!st) {
        set_err(err, errlen, "new stream failed");
        return 4;
    }
    st->time_base = ctx->time_base;
    rc = avcodec_parameters_from_context(st->codecpar, ctx);
    if (rc < 0) {
        set_err(err, errlen, "stream params: " + av_err_str(rc));
        return 5;
    }
    if (!(fmt_ctx->oformat->flags & AVFMT_NOFILE)) {
        rc = avio_open(&fmt_ctx->pb, path, AVIO_FLAG_WRITE);
        if (rc < 0) {
            set_err(err, errlen, "open output: " + av_err_str(rc));
            return 6;
        }
    }
    rc = avformat_write_header(fmt_ctx, nullptr);
    if (rc < 0) {
        set_err(err, errlen, "write header: " + av_err_str(rc));
        return 7;
    }

    const int chunk = ctx->frame_size > 0 ? ctx->frame_size : 4096;
    AVPacket* pkt = av_packet_alloc();
    AVFrame* frame = av_frame_alloc();
    struct PkGuard {
        AVPacket** p;
        AVFrame** f;
        ~PkGuard() {
            av_packet_free(p);
            av_frame_free(f);
        }
    } pk_guard{&pkt, &frame};

    auto drain = [&](bool flush) -> int {
        while (true) {
            int r = avcodec_receive_packet(ctx, pkt);
            if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) return 0;
            if (r < 0) return r;
            av_packet_rescale_ts(pkt, ctx->time_base, st->time_base);
            pkt->stream_index = st->index;
            r = av_interleaved_write_frame(fmt_ctx, pkt);
            if (r < 0) return r;
        }
        (void)flush;
    };

    int64_t pos = 0;
    while (pos < n_frames) {
        const int n = static_cast<int>(std::min<int64_t>(chunk, n_frames - pos));
        frame->nb_samples = n;
        frame->format = ctx->sample_fmt;
        frame->sample_rate = sr;
        av_channel_layout_copy(&frame->ch_layout, &ctx->ch_layout);
        rc = av_frame_get_buffer(frame, 0);
        if (rc < 0) {
            set_err(err, errlen, "frame buffer: " + av_err_str(rc));
            return 8;
        }
        if (!fill_enc_frame(frame, pcm, pos, n, n_ch, ctx->sample_fmt)) {
            set_err(err, errlen, "unsupported encoder sample format");
            return 9;
        }
        frame->pts = pos;
        pos += n;
        rc = avcodec_send_frame(ctx, frame);
        av_frame_unref(frame);
        if (rc < 0) {
            set_err(err, errlen, "encode: " + av_err_str(rc));
            return 10;
        }
        rc = drain(false);
        if (rc < 0) {
            set_err(err, errlen, "write: " + av_err_str(rc));
            return 11;
        }
    }
    avcodec_send_frame(ctx, nullptr);  // flush
    rc = drain(true);
    if (rc < 0) {
        set_err(err, errlen, "final write: " + av_err_str(rc));
        return 12;
    }
    rc = av_write_trailer(fmt_ctx);
    if (rc < 0) {
        set_err(err, errlen, "trailer: " + av_err_str(rc));
        return 13;
    }
    return 0;
}
