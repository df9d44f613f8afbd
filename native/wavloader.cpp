// Native batch WAV/FLAC loader / buffer filler for the TPU inference engine.
//
// The reference's data loading is Python DataLoader workers computing librosa
// spectrograms per file (`/root/reference/nisqa/NISQA_lib.py:2052-2236`). In
// this framework the spectrogram lives on-device; what remains on the host is
// decoding PCM16 WAVs (and 16-bit mono FLAC) and memcpy-ing samples (plus
// 2 x n_fft/2 reflected samples) into the fixed-size batch buffers the XLA
// pipeline consumes. On 1-core hosts that fill contends with the transfer
// client for the GIL / CPU, so it is implemented here in C++ with std::thread
// workers and exposed through ctypes (nisqa_tpu/data/native.py), with a
// pure-numpy fallback (nisqa_tpu/audio/{wav,flac}.py).
//
// Build: make -C native   (produces libwavloader.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct WavData {
    const int16_t* samples;  // points into the file buffer (PCM16 mono only)
    int64_t n;           // samples available in the provided buffer
    int64_t n_declared;  // samples per the data-chunk size field
    int32_t sample_rate;
    int ok;  // 1 = PCM16 mono fast path, 0 = caller must fall back
};

// Parse a RIFF/WAVE file already in memory. Returns ok=0 for anything that
// is not plain 16-bit mono PCM (caller falls back to the Python decoder).
WavData parse_wav(const uint8_t* buf, int64_t len) {
    WavData out{nullptr, 0, 0, 0, 0};
    if (len < 44 || memcmp(buf, "RIFF", 4) != 0 || memcmp(buf + 8, "WAVE", 4) != 0)
        return out;
    int64_t pos = 12;
    uint16_t fmt = 0, channels = 0, bits = 0;
    uint32_t rate = 0;
    while (pos + 8 <= len) {
        const uint8_t* cid = buf + pos;
        uint32_t size;
        memcpy(&size, buf + pos + 4, 4);
        int64_t data_off = pos + 8;
        if (memcmp(cid, "fmt ", 4) == 0 && data_off + 16 <= len) {
            memcpy(&fmt, buf + data_off, 2);
            memcpy(&channels, buf + data_off + 2, 2);
            memcpy(&rate, buf + data_off + 4, 4);
            memcpy(&bits, buf + data_off + 14, 2);
            // extensible sub-format tag lives at +24..+26: guard on the
            // BUFFER length, not just the declared chunk size (truncated
            // headers would read out of bounds otherwise)
            if (fmt == 0xFFFE && size >= 40 && data_off + 26 <= len)
                memcpy(&fmt, buf + data_off + 24, 2);
        } else if (memcmp(cid, "data", 4) == 0) {
            // keep scanning: the Python reference decoder lets a LATER data
            // chunk win (wav.py::read_wav reassigns `data` per chunk)
            int64_t avail = len - data_off;
            int64_t dsize = (int64_t)size < avail ? (int64_t)size : avail;
            if (fmt == 1 && bits == 16 && channels == 1) {
                out.samples = reinterpret_cast<const int16_t*>(buf + data_off);
                out.n = dsize / 2;
                out.n_declared = (int64_t)size / 2;
                out.sample_rate = (int32_t)rate;
                out.ok = 1;
            } else {
                out.ok = 0;
            }
        }
        pos = data_off + size + (size & 1);
    }
    return out;
}

// Decode one file from disk and fill one batch-buffer row:
// [left reflect pad | samples | right reflect pad (clamped)].
// The PCM16 payload is read straight into the destination row (no
// intermediate file buffer): header parse from a 64K prefix, then one
// positioned read of the data chunk.
int fill_row_flac(const char* path, int16_t* row, int64_t buf_len, int64_t pad,
                  int32_t* n_out, int32_t* sr_out);

int fill_row(const char* path, int16_t* row, int64_t buf_len, int64_t pad,
             int32_t* n_out, int32_t* sr_out) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    uint8_t hdr[65536];
    size_t got = fread(hdr, 1, sizeof(hdr), f);
    if (got >= 4 && memcmp(hdr, "fLaC", 4) == 0) {
        fclose(f);
        return fill_row_flac(path, row, buf_len, pad, n_out, sr_out);
    }

    WavData w = parse_wav(hdr, (int64_t)got);
    int64_t n = w.ok ? w.n_declared : 0;
    // Clamp the copy to the buffer: under seg_hop subsampling a file's last
    // ceil-remainder frames extend past the bucket's STFT read span, so up
    // to ~seg_hop*hop trailing samples are legitimately never read by any
    // frame. Ship them truncated; n_out stays the TRUE sample count so the
    // device-side n_frames/n_wins masks match the scan-time plan (the
    // Python f32 fill has always clamped the same way).
    int64_t w_n = n;
    if (pad + w_n > buf_len) w_n = buf_len - pad;
    if (!w.ok || n < pad + 2 || w_n < pad + 2) {
        fclose(f);
        return -1;
    }
    int64_t data_off = (const uint8_t*)w.samples - hdr;
    int16_t* dst = row + pad;
    int64_t have = (int64_t)got - data_off;
    if (have > w_n * 2) have = w_n * 2;
    if (have > 0) memcpy(dst, hdr + data_off, (size_t)have);
    int64_t remain = w_n * 2 - (have > 0 ? have : 0);
    if (remain > 0) {
        if (fseek(f, (long)(data_off + (have > 0 ? have : 0)), SEEK_SET) != 0 ||
            fread((uint8_t*)dst + (have > 0 ? have : 0), 1, (size_t)remain, f)
                != (size_t)remain) {
            fclose(f);
            return -1;
        }
    }
    fclose(f);

    // left reflect: x[pad], x[pad-1], ..., x[1]
    const int16_t* x = dst;
    for (int64_t i = 0; i < pad; ++i) row[i] = x[pad - i];
    // right reflect (clamped: the tail past the last STFT read is unused)
    int64_t take = buf_len - (pad + n);
    if (take > pad) take = pad;
    for (int64_t i = 0; i < take; ++i) row[pad + n + i] = x[n - 2 - i];

    *n_out = (int32_t)n;
    *sr_out = w.sample_rate;
    return 0;
}

// ---------------------------------------------------------------------------
// FLAC (RFC 9639): full-stream decode for 16-bit MONO files (the i16
// transport case); anything else returns ok=0 and the caller falls back to
// the Python decoder (nisqa_tpu/audio/flac.py, the reference implementation
// this code is tested against bit-for-bit).
// ---------------------------------------------------------------------------

struct FlacInfo {
    int32_t sample_rate;
    int32_t channels;
    int32_t bits;
    int64_t total_samples;
    int64_t audio_off;  // first frame byte
    int ok;
};

FlacInfo parse_flac_header(const uint8_t* buf, int64_t len) {
    FlacInfo out{0, 0, 0, 0, 0, 0};
    if (len < 8 || memcmp(buf, "fLaC", 4) != 0) return out;
    int64_t pos = 4;
    bool have_si = false;
    while (pos + 4 <= len) {
        uint8_t hdr = buf[pos];
        int64_t blen = ((int64_t)buf[pos + 1] << 16) | ((int64_t)buf[pos + 2] << 8) | buf[pos + 3];
        const uint8_t* b = buf + pos + 4;
        if ((hdr & 0x7F) == 0 && pos + 4 + 34 <= len) {  // STREAMINFO
            out.sample_rate = ((int32_t)b[10] << 12) | ((int32_t)b[11] << 4) | (b[12] >> 4);
            out.channels = ((b[12] >> 1) & 0x7) + 1;
            out.bits = (((b[12] & 1) << 4) | (b[13] >> 4)) + 1;
            out.total_samples = ((int64_t)(b[13] & 0x0F) << 32) |
                                ((int64_t)b[14] << 24) | ((int64_t)b[15] << 16) |
                                ((int64_t)b[16] << 8) | b[17];
            have_si = true;
        }
        pos += 4 + blen;
        if (hdr & 0x80) break;
    }
    if (!have_si || pos > len) return out;
    out.audio_off = pos;
    out.ok = 1;
    return out;
}

// MSB-first bit reader over an in-memory buffer.
struct BitReader {
    const uint8_t* data;
    int64_t len;
    int64_t byte = 0;
    uint64_t acc = 0;
    int nbits = 0;
    bool fail = false;

    bool pull() {
        if (byte >= len) { fail = true; return false; }
        acc = (acc << 8) | data[byte++];
        nbits += 8;
        return true;
    }
    uint32_t read_uint(int n) {  // n <= 32
        while (nbits < n) if (!pull()) return 0;
        nbits -= n;
        uint32_t r = (uint32_t)(acc >> nbits);
        acc &= (nbits ? ((1ULL << nbits) - 1) : 0);
        return r;
    }
    int64_t read_sint(int n) {
        // n can be up to 33 (17-bit side channels never occur in mono, but
        // escape residuals can declare up to 31 bits + warmups up to 32)
        int64_t v = 0;
        int take = n;
        while (take > 32) { v = (v << 32) | read_uint(32); take -= 32; }
        v = (v << take) | read_uint(take);
        if (n < 64 && (v & (1LL << (n - 1)))) v -= (1LL << n);
        return v;
    }
    int64_t read_unary() {
        int64_t q = 0;
        for (;;) {
            if (nbits == 0 && !pull()) return 0;
            if (acc == 0) { q += nbits; nbits = 0; continue; }
            int top = 64 - __builtin_clzll(acc);
            q += nbits - top;
            nbits = top - 1;
            acc &= (nbits ? ((1ULL << nbits) - 1) : 0);
            return q;
        }
    }
    void align() { int d = nbits & 7; if (d) read_uint(d); }
    uint64_t read_utf8() {
        uint32_t b0 = read_uint(8);
        if (b0 < 0x80) return b0;
        int nf = 0;
        uint32_t mask = 0x40;
        while (b0 & mask) { ++nf; mask >>= 1; }
        if (nf < 1 || nf > 6) { fail = true; return 0; }
        uint64_t v = b0 & (mask - 1);
        for (int i = 0; i < nf; ++i) {
            uint32_t b = read_uint(8);
            if ((b & 0xC0) != 0x80) { fail = true; return 0; }
            v = (v << 6) | (b & 0x3F);
        }
        return v;
    }
};

// decode one subframe into x[0..blocksize); returns false on error/unsupported
bool decode_subframe(BitReader& br, int64_t* x, int64_t blocksize, int bps) {
    if (br.read_uint(1) != 0) return false;
    int type = (int)br.read_uint(6);
    int wasted = 0;
    if (br.read_uint(1)) wasted = 1 + (int)br.read_unary();
    bps -= wasted;
    if (bps <= 0 || bps > 32) return false;

    int order = 0;
    int64_t coefs[32];
    int shift = 0;
    bool is_lpc = false;

    if (type == 0) {  // CONSTANT
        int64_t c = br.read_sint(bps);
        for (int64_t i = 0; i < blocksize; ++i) x[i] = c;
        order = -1;  // no residual
    } else if (type == 1) {  // VERBATIM
        for (int64_t i = 0; i < blocksize; ++i) x[i] = br.read_sint(bps);
        order = -1;
    } else if (type >= 8 && type <= 12) {  // FIXED
        order = type - 8;
        static const int fc[5][4] = {{0,0,0,0},{1,0,0,0},{2,-1,0,0},{3,-3,1,0},{4,-6,4,-1}};
        for (int j = 0; j < order; ++j) coefs[j] = fc[order][j];
        shift = 0;
        for (int64_t i = 0; i < order; ++i) x[i] = br.read_sint(bps);
    } else if (type >= 32) {  // LPC
        is_lpc = true;
        order = (type & 31) + 1;
        for (int64_t i = 0; i < order; ++i) x[i] = br.read_sint(bps);
        int prec = (int)br.read_uint(4) + 1;
        if (prec == 16) return false;
        shift = (int)br.read_sint(5);
        if (shift < 0) return false;
        for (int j = 0; j < order; ++j) coefs[j] = br.read_sint(prec);
    } else {
        return false;
    }
    (void)is_lpc;

    if (order >= 0) {
        // partitioned rice residual
        int method = (int)br.read_uint(2);
        if (method > 1) return false;
        int plen = method == 0 ? 4 : 5;
        uint32_t escape = (1u << plen) - 1;
        int po = (int)br.read_uint(4);
        int64_t n_part = 1LL << po;
        if (blocksize % n_part || (blocksize >> po) < order) return false;
        int64_t idx = order;
        for (int64_t p = 0; p < n_part; ++p) {
            int64_t n = (blocksize >> po) - (p == 0 ? order : 0);
            uint32_t k = br.read_uint(plen);
            if (k == escape) {
                int nb = (int)br.read_uint(5);
                for (int64_t i = 0; i < n; ++i)
                    x[idx++] = nb ? br.read_sint(nb) : 0;
            } else {
                for (int64_t i = 0; i < n; ++i) {
                    uint64_t u = ((uint64_t)br.read_unary() << k) | br.read_uint((int)k);
                    x[idx++] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);
                }
            }
            if (br.fail) return false;
        }
        // predictor reconstruction (residual is stored in x[order..))
        for (int64_t i = order; i < blocksize; ++i) {
            __int128 accp = 0;
            for (int j = 0; j < order; ++j) accp += (__int128)coefs[j] * x[i - 1 - j];
            x[i] += (int64_t)(accp >> shift);
        }
    }
    if (wasted)
        for (int64_t i = 0; i < blocksize; ++i) x[i] <<= wasted;
    return !br.fail;
}

// Decode a whole 16-bit mono FLAC stream into out[0..max_out). Returns the
// number of samples decoded, or -1 on error/unsupported stream.
int64_t decode_flac_mono16(const uint8_t* buf, int64_t len, const FlacInfo& fi,
                           int16_t* out, int64_t max_out,
                           std::vector<int64_t>& scratch) {
    static const int bs_code_tab[16] = {0, 192, 576, 1152, 2304, 4608, -1, -2,
                                        256, 512, 1024, 2048, 4096, 8192, 16384, 32768};
    static const int ss_code_tab[8] = {0, 8, 12, -1, 16, 20, 24, 32};
    BitReader br{buf, len};
    br.byte = fi.audio_off;
    int64_t done = 0;
    while (br.byte < len || br.nbits > 0) {
        if (fi.total_samples && done >= fi.total_samples) break;
        if (br.read_uint(14) != 0x3FFE) return done > 0 ? done : -1;
        br.read_uint(2);  // reserved + blocking strategy
        int bs_code = (int)br.read_uint(4);
        int sr_code = (int)br.read_uint(4);
        int ch_code = (int)br.read_uint(4);
        int ss_code = (int)br.read_uint(3);
        br.read_uint(1);
        br.read_utf8();
        int64_t blocksize;
        if (bs_code == 0) return -1;
        else if (bs_code == 6) blocksize = (int64_t)br.read_uint(8) + 1;
        else if (bs_code == 7) blocksize = (int64_t)br.read_uint(16) + 1;
        else blocksize = bs_code_tab[bs_code];
        if (sr_code == 12) br.read_uint(8);
        else if (sr_code == 13 || sr_code == 14) br.read_uint(16);
        else if (sr_code == 15) return -1;
        int bits = ss_code == 0 ? fi.bits : ss_code_tab[ss_code];
        if (bits != 16 || ch_code != 0) return -1;  // mono 16-bit only here
        br.read_uint(8);  // CRC-8 (not verified)

        if ((int64_t)scratch.size() < blocksize) scratch.resize(blocksize);
        if (!decode_subframe(br, scratch.data(), blocksize, bits)) return -1;
        br.align();
        br.read_uint(16);  // CRC-16 (not verified)
        if (br.fail) return -1;

        int64_t take = blocksize;
        if (done + take > max_out) take = max_out - done;
        if (fi.total_samples && done + take > fi.total_samples)
            take = fi.total_samples - done;
        for (int64_t i = 0; i < take; ++i) out[done + i] = (int16_t)scratch[i];
        done += take;
        if (take < blocksize) break;  // buffer full
    }
    return done;
}

// Read the whole file; decode FLAC into the row at [pad, pad+n); reflect-pad.
int fill_row_flac(const char* path, int16_t* row, int64_t buf_len, int64_t pad,
                  int32_t* n_out, int32_t* sr_out) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    fseek(f, 0, SEEK_END);
    long fsize = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> data((size_t)fsize);
    if (fread(data.data(), 1, (size_t)fsize, f) != (size_t)fsize) { fclose(f); return -1; }
    fclose(f);

    FlacInfo fi = parse_flac_header(data.data(), fsize);
    if (!fi.ok || fi.channels != 1 || fi.bits != 16) return -1;
    int64_t n_total = fi.total_samples;
    // clamp like fill_row: decode up to the buffer, report the true count
    int64_t w_n = n_total;
    if (pad + w_n > buf_len) w_n = buf_len - pad;
    if (n_total <= pad + 1 || w_n <= pad + 1) return -1;

    std::vector<int64_t> scratch;
    int64_t n = decode_flac_mono16(data.data(), fsize, fi, row + pad,
                                   w_n, scratch);
    if (n != w_n) return -1;

    const int16_t* x = row + pad;
    for (int64_t i = 0; i < pad; ++i) row[i] = x[pad - i];
    int64_t take = buf_len - (pad + n_total);  // <= 0 when truncated
    if (take > pad) take = pad;
    for (int64_t i = 0; i < take; ++i) row[pad + n_total + i] = x[n_total - 2 - i];

    *n_out = (int32_t)n_total;
    *sr_out = fi.sample_rate;
    return 0;
}

// ---------------------------------------------------------------------------
// Generic WAV decode -> float32 rows (the transport for everything that is
// not plain PCM16 mono: 8/24/32-bit int, IEEE float 32/64, multi-channel).
// Mirrors the numpy reference decoder (nisqa_tpu/audio/wav.py::read_wav)
// operation-for-operation so the rows are bit-identical: per-sample integer
// -> float32 conversion FIRST, then float32 channel mean (librosa semantics).
// ---------------------------------------------------------------------------

struct WavFmtAny {
    uint16_t fmt = 0, channels = 0, bits = 0;
    uint32_t rate = 0;
    int64_t data_off = -1;
    int64_t data_declared = 0;
    bool parsed = false;
};

WavFmtAny parse_wav_any(const uint8_t* buf, int64_t len) {
    WavFmtAny out;
    if (len < 44 || memcmp(buf, "RIFF", 4) != 0 || memcmp(buf + 8, "WAVE", 4) != 0)
        return out;
    int64_t pos = 12;
    bool have_fmt = false;
    while (pos + 8 <= len) {
        const uint8_t* cid = buf + pos;
        uint32_t size;
        memcpy(&size, buf + pos + 4, 4);
        int64_t data_off = pos + 8;
        if (memcmp(cid, "fmt ", 4) == 0 && data_off + 16 <= len) {
            memcpy(&out.fmt, buf + data_off, 2);
            memcpy(&out.channels, buf + data_off + 2, 2);
            memcpy(&out.rate, buf + data_off + 4, 4);
            memcpy(&out.bits, buf + data_off + 14, 2);
            // guard the +24..+26 read on the buffer length (see parse_wav)
            if (out.fmt == 0xFFFE && size >= 40 && data_off + 26 <= len)
                memcpy(&out.fmt, buf + data_off + 24, 2);
            have_fmt = true;
        } else if (memcmp(cid, "data", 4) == 0) {
            // last data chunk wins, matching the Python reference decoder's
            // chunk loop (wav.py::read_wav reassigns `data` per chunk)
            out.data_off = data_off;
            out.data_declared = (int64_t)size;
            out.parsed = have_fmt;
        }
        pos = data_off + size + (size & 1);
    }
    return out;
}

// true when fill_row_f32 can decode this header
bool f32_decodable(const WavFmtAny& w) {
    if (!w.parsed || w.channels < 1 || w.channels > 64) return false;
    if (w.fmt == 1) return w.bits == 8 || w.bits == 16 || w.bits == 24 || w.bits == 32;
    if (w.fmt == 3) return w.bits == 32 || w.bits == 64;
    return false;
}

// channel == kChannelMean selects the float32 mean across channels (librosa
// mono=True). Any other value is a 0-based channel index with reference
// semantics: negative counts from the end (numpy x[channel]), and mono
// files ignore the selector entirely (NISQA_lib.py:2299-2303). A plain -1
// must NOT be the mean sentinel — it is a reference-legal "last channel".
constexpr int kChannelMean = INT32_MIN;

// Decode one file into a float32 row: [reflect | samples | reflect(clamped)].
// FLAC (16-bit mono) is decoded then scaled, so DE pairs that force the f32
// transport still ride the native path.
int fill_row_f32(const char* path, float* row, int64_t buf_len, int64_t pad,
                 int channel, int32_t* n_out, int32_t* sr_out) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    fseek(f, 0, SEEK_END);
    long fsize = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> data((size_t)fsize);
    if (fread(data.data(), 1, (size_t)fsize, f) != (size_t)fsize) { fclose(f); return -1; }
    fclose(f);

    float* dst = row + pad;
    int64_t n;
    int32_t rate;

    if (fsize >= 4 && memcmp(data.data(), "fLaC", 4) == 0) {
        FlacInfo fi = parse_flac_header(data.data(), fsize);
        if (!fi.ok || fi.channels != 1 || fi.bits != 16) return -1;
        // mono: the channel selector is ignored (reference semantics)
        n = fi.total_samples;
        int64_t w_n = n;  // clamp like fill_row; n stays the true count
        if (pad + w_n > buf_len) w_n = buf_len - pad;
        if (n <= pad + 1 || w_n <= pad + 1) return -1;
        std::vector<int16_t> tmp((size_t)w_n);
        std::vector<int64_t> scratch;
        if (decode_flac_mono16(data.data(), fsize, fi, tmp.data(), w_n, scratch) != w_n)
            return -1;
        for (int64_t i = 0; i < w_n; ++i) dst[i] = (float)tmp[i] / 32768.0f;
        rate = fi.sample_rate;
    } else {
        WavFmtAny w = parse_wav_any(data.data(), fsize);
        if (!f32_decodable(w)) return -1;
        int C = w.channels;
        if (channel != kChannelMean) {
            // mono ignores the selector; multi-channel applies numpy
            // indexing (negative counts from the end), out-of-range fails
            if (C == 1) channel = 0;
            else if (channel < 0) channel += C;
            if (channel < 0 || channel >= C) return -1;
        }
        int bytes = w.bits / 8;
        int64_t frame_bytes = (int64_t)C * bytes;
        int64_t avail = fsize - w.data_off;
        int64_t dsize = w.data_declared < avail ? w.data_declared : avail;
        n = dsize / frame_bytes;
        int64_t w_n = n;  // clamp like fill_row; n stays the true count
        if (pad + w_n > buf_len) w_n = buf_len - pad;
        if (n < pad + 2 || w_n < pad + 2) return -1;
        const uint8_t* p = data.data() + w.data_off;
        uint16_t fmt = w.fmt, bits = w.bits;

        auto sample = [&](const uint8_t* q) -> float {
            if (fmt == 3) {
                if (bits == 32) { float v; memcpy(&v, q, 4); return v; }
                double v; memcpy(&v, q, 8); return (float)v;
            }
            switch (bits) {
                case 8:
                    return ((float)q[0] - 128.0f) / 128.0f;
                case 16: {
                    int16_t v; memcpy(&v, q, 2);
                    return (float)v / 32768.0f;
                }
                case 24: {
                    int32_t v = (int32_t)q[0] | ((int32_t)q[1] << 8) | ((int32_t)q[2] << 16);
                    if (v & 0x800000) v -= (1 << 24);
                    return (float)v / 8388608.0f;
                }
                default: {  // 32
                    int32_t v; memcpy(&v, q, 4);
                    return (float)v / 2147483648.0f;
                }
            }
        };

        if (C == 1 || channel != kChannelMean) {
            int c = channel == kChannelMean ? 0 : channel;
            for (int64_t t = 0; t < w_n; ++t)
                dst[t] = sample(p + t * frame_bytes + (int64_t)c * bytes);
        } else {
            for (int64_t t = 0; t < w_n; ++t) {
                const uint8_t* q = p + t * frame_bytes;
                float acc = 0.0f;
                for (int c = 0; c < C; ++c) acc += sample(q + (int64_t)c * bytes);
                dst[t] = acc / (float)C;  // numpy mean: float32 sum, then divide
            }
        }
        rate = (int32_t)w.rate;
    }

    for (int64_t i = 0; i < pad; ++i) row[i] = dst[pad - i];
    int64_t take = buf_len - (pad + n);
    if (take > pad) take = pad;
    for (int64_t i = 0; i < take; ++i) row[pad + n + i] = dst[n - 2 - i];

    *n_out = (int32_t)n;
    *sr_out = rate;
    return 0;
}

}  // namespace

extern "C" {

// Fill a (batch, buf_len) int16 buffer from n_files WAV paths using
// n_threads workers. status[i]: 0 ok, -1 fall back to Python for file i.
void fill_batch_i16(const char** paths, int n_files, int16_t* buf,
                    int64_t buf_len, int64_t pad, int32_t* n_out,
                    int32_t* sr_out, int32_t* status, int n_threads) {
    if (n_threads < 1) n_threads = 1;
    std::vector<std::thread> workers;
    int per = (n_files + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int lo = t * per;
        int hi = lo + per < n_files ? lo + per : n_files;
        if (lo >= hi) break;
        workers.emplace_back([=]() {
            for (int i = lo; i < hi; ++i)
                status[i] = (int32_t)fill_row(paths[i], buf + (int64_t)i * buf_len,
                                              buf_len, pad, n_out + i, sr_out + i);
        });
    }
    for (auto& w : workers) w.join();
}

// Fill a (batch, buf_len) float32 buffer: any decodable WAV (8/16/24/32-bit
// PCM, float 32/64, any channel count) plus 16-bit mono FLAC. channel < 0 =
// float32 channel mean (librosa mono), else that channel index.
void fill_batch_f32(const char** paths, int n_files, float* buf,
                    int64_t buf_len, int64_t pad, int channel, int32_t* n_out,
                    int32_t* sr_out, int32_t* status, int n_threads) {
    if (n_threads < 1) n_threads = 1;
    std::vector<std::thread> workers;
    int per = (n_files + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int lo = t * per;
        int hi = lo + per < n_files ? lo + per : n_files;
        if (lo >= hi) break;
        workers.emplace_back([=]() {
            for (int i = lo; i < hi; ++i)
                status[i] = (int32_t)fill_row_f32(paths[i], buf + (int64_t)i * buf_len,
                                                  buf_len, pad, channel,
                                                  n_out + i, sr_out + i);
        });
    }
    for (auto& w : workers) w.join();
}

// Header-only scan with a transport hint. kind_out[i]: 0 = PCM16-mono WAV /
// 16-bit mono FLAC (raw-int16 transport eligible), 1 = other WAV this
// library decodes to float32 natively, -1 (with status -1) = Python decode.
void scan_audio(const char** paths, int n_files, int32_t* n_out,
                int32_t* sr_out, int32_t* kind_out, int32_t* status,
                int n_threads) {
    if (n_threads < 1) n_threads = 1;
    std::vector<std::thread> workers;
    int per = (n_files + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int lo = t * per;
        int hi = lo + per < n_files ? lo + per : n_files;
        if (lo >= hi) break;
        workers.emplace_back([=]() {
            for (int i = lo; i < hi; ++i) {
                status[i] = -1;
                kind_out[i] = -1;
                FILE* f = fopen(paths[i], "rb");
                if (!f) continue;
                uint8_t hdr[65536];
                size_t got = fread(hdr, 1, sizeof(hdr), f);
                fclose(f);
                WavData w16 = parse_wav(hdr, (int64_t)got);
                if (w16.ok) {
                    n_out[i] = (int32_t)w16.n_declared;
                    sr_out[i] = w16.sample_rate;
                    kind_out[i] = 0;
                    status[i] = 0;
                    continue;
                }
                FlacInfo fi = parse_flac_header(hdr, (int64_t)got);
                if (fi.ok && fi.channels == 1 && fi.bits == 16 &&
                    fi.total_samples > 0 && fi.total_samples < (1LL << 31)) {
                    n_out[i] = (int32_t)fi.total_samples;
                    sr_out[i] = fi.sample_rate;
                    kind_out[i] = 0;
                    status[i] = 0;
                    continue;
                }
                WavFmtAny wa = parse_wav_any(hdr, (int64_t)got);
                if (f32_decodable(wa)) {
                    int64_t frames = wa.data_declared /
                                     ((int64_t)wa.channels * (wa.bits / 8));
                    if (frames > 0 && frames < (1LL << 31)) {
                        n_out[i] = (int32_t)frames;
                        sr_out[i] = (int32_t)wa.rate;
                        kind_out[i] = 1;
                        status[i] = 0;
                    }
                }
            }
        });
    }
    for (auto& w : workers) w.join();
}

// Legacy i16-only scan: one scanner implementation (scan_audio) with the
// historical contract that only raw-int16-eligible files report status 0.
void scan_wavs(const char** paths, int n_files, int32_t* n_out,
               int32_t* sr_out, int32_t* status, int n_threads) {
    std::vector<int32_t> kind((size_t)(n_files > 0 ? n_files : 1));
    scan_audio(paths, n_files, n_out, sr_out, kind.data(), status, n_threads);
    for (int i = 0; i < n_files; ++i)
        if (kind[i] != 0) status[i] = -1;
}

}  // extern "C"
