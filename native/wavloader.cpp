// Native batch WAV loader / buffer filler for the TPU inference engine.
//
// The reference's data loading is Python DataLoader workers computing librosa
// spectrograms per file (`/root/reference/nisqa/NISQA_lib.py:2052-2236`). In
// this framework the spectrogram lives on-device; what remains on the host is
// decoding PCM16 WAVs and memcpy-ing samples (plus 2 x n_fft/2 reflected
// samples) into the fixed-size batch buffers the XLA pipeline consumes. On
// 1-core hosts that fill contends with the transfer client for the GIL /
// CPU, so it is implemented here in C++ with std::thread workers and exposed
// through ctypes (nisqa_tpu/data/native.py), with a pure-numpy fallback.
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
            if (fmt == 0xFFFE && size >= 40)  // WAVE_FORMAT_EXTENSIBLE
                memcpy(&fmt, buf + data_off + 24, 2);
        } else if (memcmp(cid, "data", 4) == 0) {
            int64_t avail = len - data_off;
            int64_t dsize = (int64_t)size < avail ? (int64_t)size : avail;
            if (fmt == 1 && bits == 16 && channels == 1) {
                out.samples = reinterpret_cast<const int16_t*>(buf + data_off);
                out.n = dsize / 2;
                out.n_declared = (int64_t)size / 2;
                out.sample_rate = (int32_t)rate;
                out.ok = 1;
            }
            return out;
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
int fill_row(const char* path, int16_t* row, int64_t buf_len, int64_t pad,
             int32_t* n_out, int32_t* sr_out) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    uint8_t hdr[65536];
    size_t got = fread(hdr, 1, sizeof(hdr), f);

    WavData w = parse_wav(hdr, (int64_t)got);
    int64_t n = w.ok ? w.n_declared : 0;
    if (!w.ok || n < pad + 2 || pad + n > buf_len) {
        fclose(f);
        return -1;
    }
    int64_t data_off = (const uint8_t*)w.samples - hdr;
    int16_t* dst = row + pad;
    int64_t have = (int64_t)got - data_off;
    if (have > n * 2) have = n * 2;
    if (have > 0) memcpy(dst, hdr + data_off, (size_t)have);
    int64_t remain = n * 2 - (have > 0 ? have : 0);
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

// Header-only scan: sample counts + rates for bucketing (status as above).
void scan_wavs(const char** paths, int n_files, int32_t* n_out,
               int32_t* sr_out, int32_t* status, int n_threads) {
    if (n_threads < 1) n_threads = 1;
    std::vector<std::thread> workers;
    int per = (n_files + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int lo = t * per;
        int hi = lo + per < n_files ? lo + per : n_files;
        if (lo >= hi) break;
        workers.emplace_back([=]() {
            for (int i = lo; i < hi; ++i) {
                FILE* f = fopen(paths[i], "rb");
                if (!f) { status[i] = -1; continue; }
                uint8_t hdr[65536];
                size_t got = fread(hdr, 1, sizeof(hdr), f);
                fclose(f);
                WavData w = parse_wav(hdr, (int64_t)got);
                if (w.ok) {
                    // the data chunk usually extends past the 64K header
                    // read; the declared size field is authoritative
                    n_out[i] = (int32_t)w.n_declared;
                    sr_out[i] = w.sample_rate;
                    status[i] = 0;
                } else {
                    status[i] = -1;
                }
            }
        });
    }
    for (auto& w : workers) w.join();
}

}  // extern "C"
