// Test-only oracle: decode audio via the system FFmpeg (libavcodec 59).
//
// Purpose (BASELINE.md first milestone, adapted): the reference's codecs
// are D translations of public C decoders (minimp3.d:1-20, drflac.d:1-110,
// stb_vorbis2.d:1-90).  No D toolchain or network exists here, so the
// accuracy anchor for MP3/FLAC is the system libavcodec — an independent,
// widely-validated C lineage — exactly as libopus/libvorbis already anchor
// Opus/Vorbis (tests/golden/opus_oracle.py, vorbis_oracle.py).
//
// Build: tools/build_av_oracle.sh -> tests/golden/_av_oracle.so
// API (ctypes): av_oracle_decode(bytes) -> interleaved PCM, both a float
// view (all formats) and, for integer codec output (FLAC), the raw int32
// samples for bit-exact comparison.
//
// This file is ORACLE GLUE ONLY — no decoding logic lives here.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/opt.h>
}

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>
#include <string>

namespace {

struct MemIn {
    const uint8_t* data;
    int64_t size;
    int64_t pos;
};

int mem_read(void* opaque, uint8_t* buf, int buf_size) {
    MemIn* m = static_cast<MemIn*>(opaque);
    int64_t left = m->size - m->pos;
    if (left <= 0) return AVERROR_EOF;
    int n = buf_size < left ? buf_size : static_cast<int>(left);
    memcpy(buf, m->data + m->pos, n);
    m->pos += n;
    return n;
}

int64_t mem_seek(void* opaque, int64_t offset, int whence) {
    MemIn* m = static_cast<MemIn*>(opaque);
    if (whence == AVSEEK_SIZE) return m->size;
    whence &= ~AVSEEK_FORCE;
    int64_t p = whence == SEEK_SET ? offset
              : whence == SEEK_CUR ? m->pos + offset
              : m->size + offset;
    if (p < 0 || p > m->size) return AVERROR(EINVAL);
    m->pos = p;
    return p;
}

void set_err(char* errbuf, int errlen, const char* msg, int code = 0) {
    if (!errbuf || errlen <= 0) return;
    if (code) {
        char av[128];
        av_strerror(code, av, sizeof av);
        snprintf(errbuf, errlen, "%s: %s", msg, av);
    } else {
        snprintf(errbuf, errlen, "%s", msg);
    }
}

}  // namespace

extern "C" {

// Decode a whole in-memory stream.  Outputs interleaved frames:
//   *out_f   — float32 (always; integer formats scaled by 1/2^(bits-1))
//   *out_i   — int32 raw codec samples (NULL when codec output is float)
// Caller frees both with av_oracle_free.  Returns 0 on success.
int av_oracle_decode(const uint8_t* data, long long size,
                     float** out_f, int32_t** out_i,
                     long long* out_frames, int* out_ch, int* out_sr,
                     int* out_int_bits,
                     char* errbuf, int errlen) {
    *out_f = nullptr;
    *out_i = nullptr;
    *out_frames = 0;
    *out_ch = 0;
    *out_sr = 0;
    *out_int_bits = 0;

    MemIn mem{data, static_cast<int64_t>(size), 0};
    unsigned char* iobuf =
        static_cast<unsigned char*>(av_malloc(1 << 16));
    AVIOContext* avio = avio_alloc_context(
        iobuf, 1 << 16, 0, &mem, mem_read, nullptr, mem_seek);
    if (!avio) { set_err(errbuf, errlen, "avio_alloc"); return -1; }

    AVFormatContext* fmt = avformat_alloc_context();
    fmt->pb = avio;
    int rc = avformat_open_input(&fmt, nullptr, nullptr, nullptr);
    if (rc < 0) {
        set_err(errbuf, errlen, "open_input", rc);
        av_freep(&avio->buffer); avio_context_free(&avio);
        return -1;
    }
    rc = avformat_find_stream_info(fmt, nullptr);
    if (rc < 0) {
        set_err(errbuf, errlen, "find_stream_info", rc);
        goto fail_fmt;
    }

    {
        int sidx = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1,
                                       nullptr, 0);
        if (sidx < 0) { set_err(errbuf, errlen, "no audio stream"); goto fail_fmt; }
        AVStream* st = fmt->streams[sidx];
        const AVCodec* dec = avcodec_find_decoder(st->codecpar->codec_id);
        if (!dec) { set_err(errbuf, errlen, "no decoder"); goto fail_fmt; }
        AVCodecContext* ctx = avcodec_alloc_context3(dec);
        avcodec_parameters_to_context(ctx, st->codecpar);
        rc = avcodec_open2(ctx, dec, nullptr);
        if (rc < 0) {
            set_err(errbuf, errlen, "avcodec_open2", rc);
            avcodec_free_context(&ctx);
            goto fail_fmt;
        }

        std::vector<float> fl;
        std::vector<int32_t> iv;
        bool have_int = false;
        int int_bits = 0;
        int nch = 0, sr = 0;

        AVPacket* pkt = av_packet_alloc();
        AVFrame* frm = av_frame_alloc();
        bool eof = false;
        while (!eof) {
            rc = av_read_frame(fmt, pkt);
            if (rc == AVERROR_EOF) {
                avcodec_send_packet(ctx, nullptr);
                eof = true;
            } else if (rc < 0) {
                set_err(errbuf, errlen, "read_frame", rc);
                break;
            } else {
                if (pkt->stream_index != sidx) { av_packet_unref(pkt); continue; }
                rc = avcodec_send_packet(ctx, pkt);
                av_packet_unref(pkt);
                if (rc < 0 && rc != AVERROR(EAGAIN)) continue;  // skip bad packet
            }
            while (true) {
                rc = avcodec_receive_frame(ctx, frm);
                if (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF) break;
                if (rc < 0) { eof = true; break; }
                int n = frm->nb_samples;
                int c = ctx->ch_layout.nb_channels;
                nch = c;
                sr = ctx->sample_rate;
                AVSampleFormat sf = static_cast<AVSampleFormat>(frm->format);
                bool planar = av_sample_fmt_is_planar(sf) != 0;
                AVSampleFormat base = av_get_packed_sample_fmt(sf);
                size_t off_f = fl.size();
                fl.resize(off_f + size_t(n) * c);
                auto plane = [&](int ch) -> const uint8_t* {
                    return planar ? frm->extended_data[ch]
                                  : frm->extended_data[0];
                };
                auto idx = [&](int i, int ch) -> int {
                    return planar ? i : i * c + ch;
                };
                if (base == AV_SAMPLE_FMT_FLT) {
                    for (int ch = 0; ch < c; ch++) {
                        const float* p = reinterpret_cast<const float*>(plane(ch));
                        for (int i = 0; i < n; i++)
                            fl[off_f + size_t(i) * c + ch] = p[idx(i, ch)];
                    }
                } else if (base == AV_SAMPLE_FMT_DBL) {
                    for (int ch = 0; ch < c; ch++) {
                        const double* p = reinterpret_cast<const double*>(plane(ch));
                        for (int i = 0; i < n; i++)
                            fl[off_f + size_t(i) * c + ch] =
                                static_cast<float>(p[idx(i, ch)]);
                    }
                } else if (base == AV_SAMPLE_FMT_S16) {
                    have_int = true;
                    if (!int_bits) int_bits = 16;
                    size_t off_i = iv.size();
                    iv.resize(off_i + size_t(n) * c);
                    for (int ch = 0; ch < c; ch++) {
                        const int16_t* p = reinterpret_cast<const int16_t*>(plane(ch));
                        for (int i = 0; i < n; i++) {
                            int32_t v = p[idx(i, ch)];
                            iv[off_i + size_t(i) * c + ch] = v;
                            fl[off_f + size_t(i) * c + ch] = v / 32768.0f;
                        }
                    }
                } else if (base == AV_SAMPLE_FMT_S32) {
                    have_int = true;
                    if (!int_bits) int_bits = 32;
                    size_t off_i = iv.size();
                    iv.resize(off_i + size_t(n) * c);
                    for (int ch = 0; ch < c; ch++) {
                        const int32_t* p = reinterpret_cast<const int32_t*>(plane(ch));
                        for (int i = 0; i < n; i++) {
                            int32_t v = p[idx(i, ch)];
                            iv[off_i + size_t(i) * c + ch] = v;
                            fl[off_f + size_t(i) * c + ch] =
                                static_cast<float>(v / 2147483648.0);
                        }
                    }
                } else {
                    set_err(errbuf, errlen, "unhandled sample_fmt");
                    eof = true;
                    break;
                }
            }
        }
        av_frame_free(&frm);
        av_packet_free(&pkt);
        avcodec_free_context(&ctx);

        if (nch > 0 && !fl.empty()) {
            *out_ch = nch;
            *out_sr = sr;
            *out_frames = static_cast<long long>(fl.size() / nch);
            float* rf = static_cast<float*>(malloc(fl.size() * sizeof(float)));
            memcpy(rf, fl.data(), fl.size() * sizeof(float));
            *out_f = rf;
            if (have_int && iv.size() == fl.size()) {
                int32_t* ri = static_cast<int32_t*>(
                    malloc(iv.size() * sizeof(int32_t)));
                memcpy(ri, iv.data(), iv.size() * sizeof(int32_t));
                *out_i = ri;
                *out_int_bits = int_bits;
            }
            avformat_close_input(&fmt);
            av_freep(&avio->buffer);
            avio_context_free(&avio);
            return 0;
        }
        if (errbuf && !errbuf[0]) set_err(errbuf, errlen, "no samples");
    }

fail_fmt:
    avformat_close_input(&fmt);  // custom AVIO is ours to free
    av_freep(&avio->buffer);
    avio_context_free(&avio);
    return -1;
}

void av_oracle_free(void* p) { free(p); }

const char* av_oracle_version() { return av_version_info(); }

}  // extern "C"
