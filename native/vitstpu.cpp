// Native runtime layer for tpu-vits: checkpoint IO, tokenizer, WAV encode.
//
// The reference implements its IO/runtime in C++ (loader:
// src/vits_model_data.cpp, tokenizer: src/vits_tokenizer.cpp, WAV:
// test/main.cpp) — this library provides the TPU framework's equivalents
// behind a stable C ABI (consumed from Python via ctypes, see
// vits_tpu/io/native.py).  The compute path stays XLA; this layer covers the
// host-side hot spots:
//
//   * vt_ggml_open/...: mmap-based zero-copy .ggml checkpoint parser — tensor
//     bytes are returned as pointers into the mapping, so a 75 MB model
//     "loads" in microseconds and the bytes are only touched when the arrays
//     are first read (vs the reference's full memcpy loop,
//     vits_model_data.cpp:17-27).
//   * vt_tokenize: greedy longest-prefix vocabulary matcher with lowercase
//     fallback + blank interspersal (vits_tokenizer.cpp:57-78,201-207
//     semantics, trie-accelerated).
//   * vt_wav_encode: float PCM -> 16-bit WAV bytes (main.cpp:23-63).
//
// Build: cmake -S native -B native/build && cmake --build native/build

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <deque>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#define VT_API extern "C" __attribute__((visibility("default")))

// ---------------------------------------------------------------------------
// Checkpoint parsing (.ggml format; layout documented in vits_tpu/io/ggml.py)
// ---------------------------------------------------------------------------

struct VtTensor {
    const char* name;     // NUL-terminated, owned by VtCheckpoint
    uint32_t dtype;       // 0 = f32, 1 = f16, 2 = int8 (repo extension, io/ggml.py)
    uint32_t rank;
    uint32_t dims[8];     // torch-order shape (already un-reversed)
    const uint8_t* data;  // pointer into the mmap
    uint64_t nbytes;
};

struct VtKV {
    const char* key;
    const char* value;
};

struct VtVocabEntry {
    const char* token;
    uint32_t id;
};

struct VtCheckpoint {
    // mapping
    uint8_t* base = nullptr;
    size_t size = 0;
    int fd = -1;
    bool owned_copy = false;  // true when loaded from bytes (we own base)

    // parsed views; deque gives stable addresses for the interned strings
    // (SSO strings in a reallocating vector would dangle their c_str()).
    std::deque<std::string> strings;
    std::vector<VtVocabEntry> vocab;
    uint32_t add_blank = 0, normalize = 0;
    const char* pad_token = nullptr;
    const char* unk_token = nullptr;
    std::vector<VtKV> config;
    std::vector<VtTensor> tensors;
    std::string error;
};

namespace {

struct Cursor {
    const uint8_t* p;
    const uint8_t* end;
    bool ok = true;

    uint32_t u32() {
        if (!ok || end - p < 4) { ok = false; return 0; }
        uint32_t v;
        std::memcpy(&v, p, 4);
        p += 4;
        return v;
    }
    const uint8_t* bytes(uint64_t n) {
        if (!ok || (uint64_t)(end - p) < n) { ok = false; return nullptr; }
        const uint8_t* r = p;
        p += n;
        return r;
    }
};

const char* intern(VtCheckpoint* ck, const uint8_t* data, uint32_t len) {
    ck->strings.emplace_back(reinterpret_cast<const char*>(data), len);
    return ck->strings.back().c_str();
}

bool parse(VtCheckpoint* ck) {
    Cursor c{ck->base, ck->base + ck->size};

    // [tokenizer]
    uint32_t vocab_size = c.u32();
    ck->vocab.reserve(vocab_size);
    for (uint32_t i = 0; i < vocab_size && c.ok; ++i) {
        uint32_t klen = c.u32();
        const uint8_t* kb = c.bytes(klen);
        uint32_t id = c.u32();
        if (!c.ok) break;
        ck->vocab.push_back({intern(ck, kb, klen), id});
    }
    ck->add_blank = c.u32();
    ck->normalize = c.u32();
    uint32_t plen = c.u32();
    const uint8_t* pb = c.bytes(plen);
    if (c.ok) ck->pad_token = intern(ck, pb, plen);
    uint32_t ulen = c.u32();
    const uint8_t* ub = c.bytes(ulen);
    if (c.ok) ck->unk_token = intern(ck, ub, ulen);

    // [config]
    uint32_t n_config = c.u32();
    ck->config.reserve(n_config);
    for (uint32_t i = 0; i < n_config && c.ok; ++i) {
        uint32_t klen = c.u32();
        const uint8_t* kb = c.bytes(klen);
        uint32_t vlen = c.u32();
        const uint8_t* vb = c.bytes(vlen);
        if (!c.ok) break;
        ck->config.push_back({intern(ck, kb, klen), intern(ck, vb, vlen)});
    }

    // [tensors]
    uint32_t n_tensors = c.u32();
    ck->tensors.reserve(n_tensors);
    for (uint32_t i = 0; i < n_tensors && c.ok; ++i) {
        VtTensor t{};
        uint32_t nlen = c.u32();
        const uint8_t* nb = c.bytes(nlen);
        t.dtype = c.u32();
        t.rank = c.u32();
        if (t.rank > 8) { ck->error = "tensor rank > 8"; return false; }
        // dims stored reversed (ggml ne order); un-reverse to torch order
        uint32_t rev[8];
        for (uint32_t d = 0; d < t.rank; ++d) rev[d] = c.u32();
        for (uint32_t d = 0; d < t.rank; ++d) t.dims[d] = rev[t.rank - 1 - d];
        t.nbytes = c.u32();
        t.data = c.bytes(t.nbytes);
        if (!c.ok) break;
        t.name = intern(ck, nb, nlen);
        if (t.dtype > 2) { ck->error = "unsupported dtype"; return false; }
        ck->tensors.push_back(t);
    }
    if (!c.ok) {
        ck->error = "truncated checkpoint";
        return false;
    }
    return true;
}

}  // namespace

VT_API VtCheckpoint* vt_ggml_open(const char* path) {
    auto* ck = new VtCheckpoint();
    ck->fd = ::open(path, O_RDONLY);
    if (ck->fd < 0) {
        ck->error = "open failed";
        return ck;
    }
    struct stat st;
    if (fstat(ck->fd, &st) != 0) {
        ck->error = "stat failed";
        return ck;
    }
    ck->size = (size_t)st.st_size;
    void* m = mmap(nullptr, ck->size, PROT_READ, MAP_PRIVATE, ck->fd, 0);
    if (m == MAP_FAILED) {
        ck->error = "mmap failed";
        return ck;
    }
    madvise(m, ck->size, MADV_SEQUENTIAL);
    ck->base = static_cast<uint8_t*>(m);
    parse(ck);
    return ck;
}

VT_API VtCheckpoint* vt_ggml_from_bytes(const uint8_t* data, uint64_t size) {
    auto* ck = new VtCheckpoint();
    ck->base = static_cast<uint8_t*>(std::malloc(size));
    if (!ck->base) {
        ck->error = "alloc failed";
        return ck;
    }
    std::memcpy(ck->base, data, size);
    ck->size = size;
    ck->owned_copy = true;
    parse(ck);
    return ck;
}

VT_API const char* vt_ggml_error(const VtCheckpoint* ck) {
    return ck->error.empty() ? nullptr : ck->error.c_str();
}

VT_API uint32_t vt_ggml_num_tensors(const VtCheckpoint* ck) {
    return (uint32_t)ck->tensors.size();
}
VT_API const VtTensor* vt_ggml_tensor(const VtCheckpoint* ck, uint32_t i) {
    return &ck->tensors[i];
}
VT_API uint32_t vt_ggml_num_config(const VtCheckpoint* ck) {
    return (uint32_t)ck->config.size();
}
VT_API const VtKV* vt_ggml_config(const VtCheckpoint* ck, uint32_t i) {
    return &ck->config[i];
}
VT_API uint32_t vt_ggml_num_vocab(const VtCheckpoint* ck) {
    return (uint32_t)ck->vocab.size();
}
VT_API const VtVocabEntry* vt_ggml_vocab(const VtCheckpoint* ck, uint32_t i) {
    return &ck->vocab[i];
}
VT_API uint32_t vt_ggml_add_blank(const VtCheckpoint* ck) { return ck->add_blank; }
VT_API uint32_t vt_ggml_normalize(const VtCheckpoint* ck) { return ck->normalize; }
VT_API const char* vt_ggml_pad_token(const VtCheckpoint* ck) { return ck->pad_token; }
VT_API const char* vt_ggml_unk_token(const VtCheckpoint* ck) { return ck->unk_token; }

VT_API void vt_ggml_close(VtCheckpoint* ck) {
    if (ck->base) {
        if (ck->owned_copy)
            std::free(ck->base);
        else
            munmap(ck->base, ck->size);
    }
    if (ck->fd >= 0) ::close(ck->fd);
    delete ck;
}

// ---------------------------------------------------------------------------
// Tokenizer: greedy longest-prefix match over a byte trie + blank interspersal
// ---------------------------------------------------------------------------

struct VtTokenizer {
    // byte-level trie
    struct Node {
        int32_t children[256];
        int32_t token_id;  // -1 if not terminal
        Node() : token_id(-1) { std::memset(children, -1, sizeof(children)); }
    };
    std::vector<Node> nodes;
    uint32_t blank_id = 0;
    uint32_t add_blank = 1;

    void insert(const char* token, uint32_t id) {
        int cur = 0;
        for (const uint8_t* p = (const uint8_t*)token; *p; ++p) {
            int32_t& next = nodes[cur].children[*p];
            if (next < 0) {
                next = (int32_t)nodes.size();
                nodes.emplace_back();
            }
            cur = next;
        }
        nodes[cur].token_id = (int32_t)id;
    }

    // longest match starting at text[i]; returns (id, length) or (-1, 1)
    std::pair<int32_t, size_t> match(const char* text, size_t n, size_t i) const {
        int cur = 0;
        int32_t best_id = -1;
        size_t best_len = 0;
        for (size_t j = i; j < n; ++j) {
            int32_t next = nodes[cur].children[(uint8_t)text[j]];
            if (next < 0) break;
            cur = next;
            if (nodes[cur].token_id >= 0) {
                best_id = nodes[cur].token_id;
                best_len = j - i + 1;
            }
        }
        if (best_id < 0) return {-1, 1};
        return {best_id, best_len};
    }
};

VT_API VtTokenizer* vt_tokenizer_new(uint32_t add_blank, uint32_t blank_id) {
    auto* t = new VtTokenizer();
    t->nodes.emplace_back();
    t->add_blank = add_blank;
    t->blank_id = blank_id;
    return t;
}

VT_API void vt_tokenizer_add(VtTokenizer* t, const char* token, uint32_t id) {
    t->insert(token, id);
}

// Tokenize text (already normalized/lowercased by the caller) into out_ids.
// Returns the number of ids written (at most out_cap).
VT_API uint32_t vt_tokenize(const VtTokenizer* t, const char* text,
                            int32_t* out_ids, uint32_t out_cap) {
    size_t n = std::strlen(text);
    std::vector<int32_t> raw;
    raw.reserve(n);
    size_t i = 0;
    while (i < n) {
        auto [id, len] = t->match(text, n, i);
        if (id >= 0) raw.push_back(id);
        i += len;
    }
    uint32_t count = 0;
    if (t->add_blank && !raw.empty()) {
        uint32_t total = (uint32_t)raw.size() * 2 + 1;
        for (uint32_t k = 0; k < total && count < out_cap; ++k) {
            out_ids[count++] = (k % 2 == 1) ? raw[k / 2] : (int32_t)t->blank_id;
        }
    } else {
        for (size_t k = 0; k < raw.size() && count < out_cap; ++k)
            out_ids[count++] = raw[k];
    }
    return count;
}

VT_API void vt_tokenizer_free(VtTokenizer* t) { delete t; }

// ---------------------------------------------------------------------------
// WAV encode (16-bit PCM mono)
// ---------------------------------------------------------------------------

VT_API uint64_t vt_wav_size(uint64_t n_samples) { return 44 + n_samples * 2; }

VT_API void vt_wav_encode(const float* samples, uint64_t n, uint32_t rate,
                          uint8_t* out) {
    auto put_u32 = [&](uint64_t off, uint32_t v) { std::memcpy(out + off, &v, 4); };
    auto put_u16 = [&](uint64_t off, uint16_t v) { std::memcpy(out + off, &v, 2); };
    std::memcpy(out, "RIFF", 4);
    put_u32(4, (uint32_t)(36 + n * 2));
    std::memcpy(out + 8, "WAVEfmt ", 8);
    put_u32(16, 16);
    put_u16(20, 1);            // PCM
    put_u16(22, 1);            // mono
    put_u32(24, rate);
    put_u32(28, rate * 2);     // byte rate
    put_u16(32, 2);            // block align
    put_u16(34, 16);           // bits
    std::memcpy(out + 36, "data", 4);
    put_u32(40, (uint32_t)(n * 2));
    int16_t* pcm = reinterpret_cast<int16_t*>(out + 44);
    for (uint64_t i = 0; i < n; ++i) {
        float v = samples[i];
        if (v > 1.0f) v = 1.0f;
        if (v < -1.0f) v = -1.0f;
        pcm[i] = (int16_t)(v * 32767.0f);
    }
}

// ---------------------------------------------------------------------------
// Training corpus loader: WAV decode + VITS-framed linear spectrogram
//
// The reference has no training and no data loader; this backs the training
// pipeline (vits_tpu/train/data.py).  Semantics mirror read_wav +
// linear_spectrogram exactly so the native path is a drop-in fast path:
//   * 16-bit mono PCM -> float32 = s / 32767.0f        (utils/wav.py)
//   * frames capped at max_frames, audio truncated to n_frames*hop
//   * reflect pad (n_fft-hop)/2 per side, Hann window applied in float32,
//     FFT in double (numpy promotes float32 input to complex128), magnitude
//     cast back to float32 — matches np.fft.rfft to ~1e-6 relative.
// Called from a Python thread pool; the ctypes call releases the GIL, so
// utterances decode in parallel across cores (the numpy path cannot).
// ---------------------------------------------------------------------------

struct VtUtterance {
    float* audio;        // n_frames*hop samples (malloc'd)
    float* spec;         // n_frames x bins row-major magnitudes (malloc'd)
    uint32_t n_frames;
    uint32_t bins;       // n_fft/2 + 1
    uint32_t rate;       // sample rate read from the file header
    char error[256];     // empty string on success
};

namespace {

// Iterative radix-2 complex FFT (in-place, double precision) with a
// precomputed twiddle table (tw[j] = exp(-2*pi*i*j/n), size n/2) and a
// precomputed bit-reversal permutation.  n must be a power of two.
struct FftPlan {
    size_t n;
    std::vector<double> tw_re, tw_im;  // n/2 twiddles
    std::vector<uint32_t> rev;         // bit-reversal permutation

    explicit FftPlan(size_t n_) : n(n_), tw_re(n_ / 2), tw_im(n_ / 2), rev(n_) {
        for (size_t j = 0; j < n / 2; ++j) {
            const double ang = -2.0 * M_PI * (double)j / (double)n;
            tw_re[j] = std::cos(ang);
            tw_im[j] = std::sin(ang);
        }
        rev[0] = 0;
        for (size_t i = 1, j = 0; i < n; ++i) {
            size_t bit = n >> 1;
            for (; j & bit; bit >>= 1) j ^= bit;
            j ^= bit;
            rev[i] = (uint32_t)j;
        }
    }

    void run(double* re, double* im) const {
        for (size_t i = 0; i < n; ++i) {
            const size_t j = rev[i];
            if (i < j) { std::swap(re[i], re[j]); std::swap(im[i], im[j]); }
        }
        for (size_t len = 2; len <= n; len <<= 1) {
            const size_t stride = n / len;
            const size_t half = len / 2;
            for (size_t i = 0; i < n; i += len) {
                const double* wr = tw_re.data();
                const double* wi = tw_im.data();
                for (size_t k = 0; k < half; ++k) {
                    const double cr = wr[k * stride], ci = wi[k * stride];
                    const double xr = re[i + k + half], xi = im[i + k + half];
                    const double vr = xr * cr - xi * ci;
                    const double vi = xr * ci + xi * cr;
                    const double ur = re[i + k], ui = im[i + k];
                    re[i + k] = ur + vr; im[i + k] = ui + vi;
                    re[i + k + half] = ur - vr; im[i + k + half] = ui - vi;
                }
            }
        }
    }
};

// numpy 'reflect' (even, boundary excluded) index for position k in
// [-pad, T+pad); multi-bounce safe for any pad.
inline int64_t reflect_index(int64_t k, int64_t T) {
    if (T == 1) return 0;
    const int64_t period = 2 * (T - 1);
    k %= period;
    if (k < 0) k += period;
    return k < T ? k : period - k;
}

VtUtterance* utt_fail(VtUtterance* u, const char* msg) {
    std::snprintf(u->error, sizeof u->error, "%s", msg);
    return u;
}

}  // namespace

VT_API VtUtterance* vt_utt_load(const char* path, uint32_t n_fft, uint32_t hop,
                                uint32_t max_frames) {
    auto* u = new VtUtterance();
    std::memset(u, 0, sizeof *u);
    if (n_fft == 0 || (n_fft & (n_fft - 1)) != 0 || hop == 0 || hop > n_fft)
        return utt_fail(u, "n_fft must be a power of two and >= hop");

    FILE* f = std::fopen(path, "rb");
    if (!f) return utt_fail(u, "cannot open file");
    std::fseek(f, 0, SEEK_END);
    const long fsize = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> raw((size_t)std::max(fsize, 0L));
    if (fsize <= 0 || std::fread(raw.data(), 1, raw.size(), f) != raw.size()) {
        std::fclose(f);
        return utt_fail(u, "cannot read file");
    }
    std::fclose(f);

    // RIFF/WAVE chunk walk (same chunk semantics as utils/wav.py::read_wav).
    if (raw.size() < 12 || std::memcmp(raw.data(), "RIFF", 4) != 0 ||
        std::memcmp(raw.data() + 8, "WAVE", 4) != 0)
        return utt_fail(u, "not a RIFF/WAVE file");
    const int16_t* pcm = nullptr;
    uint64_t n_samples = 0;
    uint32_t rate = 0;
    bool fmt_ok = false;
    for (size_t pos = 12; pos + 8 <= raw.size();) {
        const uint8_t* p = raw.data() + pos;
        uint32_t size;
        std::memcpy(&size, p + 4, 4);
        if (pos + 8 + size > raw.size()) break;
        if (std::memcmp(p, "fmt ", 4) == 0 && size >= 16) {
            uint16_t channels, bits;
            std::memcpy(&channels, p + 8 + 2, 2);
            std::memcpy(&rate, p + 8 + 4, 4);
            std::memcpy(&bits, p + 8 + 14, 2);
            if (channels != 1 || bits != 16)
                return utt_fail(u, "only 16-bit mono supported");
            fmt_ok = true;
        } else if (std::memcmp(p, "data", 4) == 0) {
            pcm = reinterpret_cast<const int16_t*>(p + 8);
            n_samples = size / 2;
        }
        pos += 8 + size + (size & 1);
    }
    if (!fmt_ok || pcm == nullptr) return utt_fail(u, "missing fmt/data chunk");
    u->rate = rate;

    uint64_t n_frames = n_samples / hop;
    if (n_frames > max_frames) n_frames = max_frames;
    u->n_frames = (uint32_t)n_frames;
    u->bins = n_fft / 2 + 1;
    if (n_frames == 0) return u;  // caller's min_frames check rejects it

    const uint64_t T = n_frames * hop;
    u->audio = static_cast<float*>(std::malloc(T * sizeof(float)));
    u->spec = static_cast<float*>(std::malloc(n_frames * u->bins * sizeof(float)));
    if (!u->audio || !u->spec) return utt_fail(u, "out of memory");
    for (uint64_t i = 0; i < T; ++i) u->audio[i] = (float)pcm[i] / 32767.0f;

    // Hann window, computed in double then cast (numpy computes in float64
    // and .astype(np.float32)s — same rounding).
    std::vector<float> window(n_fft);
    for (uint32_t j = 0; j < n_fft; ++j)
        window[j] = (float)(0.5 - 0.5 * std::cos(2.0 * M_PI * j / (double)n_fft));

    const int64_t pad = (int64_t)(n_fft - hop) / 2;
    const FftPlan plan(n_fft);
    std::vector<double> re(n_fft), im(n_fft);
    // Load a windowed frame (float32 multiply first — numpy windows in
    // float32, then rfft promotes to double).
    auto fill = [&](uint64_t fidx, double* dst) {
        const int64_t start = (int64_t)(fidx * hop) - pad;
        if (start >= 0 && start + (int64_t)n_fft <= (int64_t)T) {
            // interior frame: no boundary reflection
            const float* src = u->audio + start;
            for (uint32_t j = 0; j < n_fft; ++j)
                dst[j] = (double)(src[j] * window[j]);
            return;
        }
        for (uint32_t j = 0; j < n_fft; ++j)
            dst[j] = (double)(
                u->audio[reflect_index(start + j, (int64_t)T)] * window[j]);
    };
    // Two real frames per complex FFT: frame a rides the real part, frame b
    // the imaginary part; with F = FFT(a + i*b), the two spectra untangle as
    //   A[k] = (F[k] + conj(F[n-k]))/2,  B[k] = (F[k] - conj(F[n-k]))/(2i)
    // and only their magnitudes are needed.
    for (uint64_t fidx = 0; fidx < n_frames; fidx += 2) {
        const bool paired = fidx + 1 < n_frames;
        fill(fidx, re.data());
        if (paired) fill(fidx + 1, im.data());
        else std::fill(im.begin(), im.end(), 0.0);
        plan.run(re.data(), im.data());
        float* out_a = u->spec + fidx * u->bins;
        float* out_b = paired ? out_a + u->bins : nullptr;
        for (uint32_t b = 0; b < u->bins; ++b) {
            const uint32_t nb = (n_fft - b) & (n_fft - 1);
            const double ar = 0.5 * (re[b] + re[nb]);
            const double ai = 0.5 * (im[b] - im[nb]);
            // plain sqrt, not hypot: magnitudes here are nowhere near
            // double over/underflow and sqrt is several times faster
            out_a[b] = (float)std::sqrt(ar * ar + ai * ai);
            if (paired) {
                const double br = 0.5 * (im[b] + im[nb]);
                const double bi = -0.5 * (re[b] - re[nb]);
                out_b[b] = (float)std::sqrt(br * br + bi * bi);
            }
        }
    }
    return u;
}

VT_API const char* vt_utt_error(const VtUtterance* u) {
    return u->error[0] ? u->error : nullptr;
}
VT_API const float* vt_utt_audio(const VtUtterance* u) { return u->audio; }
VT_API const float* vt_utt_spec(const VtUtterance* u) { return u->spec; }
VT_API uint32_t vt_utt_num_frames(const VtUtterance* u) { return u->n_frames; }
VT_API uint32_t vt_utt_bins(const VtUtterance* u) { return u->bins; }
VT_API uint32_t vt_utt_rate(const VtUtterance* u) { return u->rate; }

VT_API void vt_utt_free(VtUtterance* u) {
    if (!u) return;
    std::free(u->audio);
    std::free(u->spec);
    delete u;
}

// ---------------------------------------------------------------------------
// Embeddable synthesis (vt_engine_* / vt_synthesize)
//
// The reference exposes synthesis itself through its C ABI
// (vits_model_process, /root/reference/src/include/vits.h:87-102) because its
// whole engine is in-process CPU code.  On TPU the compiled XLA program must
// live inside the host process that owns the chip (the Python/JAX engine), so
// the embeddable C story is a thin client: vt_synthesize speaks the engine
// server's HTTP protocol over a local socket and hands back float PCM.  This
// is the same shape every production TPU serving stack takes — the accelerator
// program is a service, the C ABI is the integration point.
// ---------------------------------------------------------------------------

#include <netdb.h>
#include <sys/socket.h>

struct VtAudio {
    float* samples;
    uint64_t n_samples;
    uint32_t sample_rate;
};

struct VtEngine {
    std::string host;
    uint16_t port = 0;
    std::string error;
};

static int vt_dial(VtEngine* e) {
    struct addrinfo hints = {};
    hints.ai_family = AF_UNSPEC;
    hints.ai_socktype = SOCK_STREAM;
    struct addrinfo* res = nullptr;
    char portbuf[16];
    std::snprintf(portbuf, sizeof portbuf, "%u", (unsigned)e->port);
    if (getaddrinfo(e->host.c_str(), portbuf, &hints, &res) != 0 || !res) {
        e->error = "getaddrinfo failed for " + e->host;
        return -1;
    }
    int fd = -1;
    for (auto* ai = res; ai; ai = ai->ai_next) {
        fd = socket(ai->ai_family, ai->ai_socktype, ai->ai_protocol);
        if (fd < 0) continue;
        if (connect(fd, ai->ai_addr, ai->ai_addrlen) == 0) break;
        close(fd);
        fd = -1;
    }
    freeaddrinfo(res);
    if (fd < 0) e->error = "connect failed to " + e->host + ":" + portbuf;
    return fd;
}

static bool vt_send_all(int fd, const char* data, size_t n) {
    while (n) {
        ssize_t w = write(fd, data, n);
        if (w <= 0) return false;
        data += w;
        n -= (size_t)w;
    }
    return true;
}

// Full HTTP/1.1 exchange: returns status code, fills body; -1 on IO error.
static int vt_http_roundtrip(VtEngine* e, const std::string& request,
                             std::vector<uint8_t>& body) {
    int fd = vt_dial(e);
    if (fd < 0) return -1;
    if (!vt_send_all(fd, request.data(), request.size())) {
        e->error = "short write";
        close(fd);
        return -1;
    }
    std::vector<uint8_t> buf;
    uint8_t chunk[65536];
    ssize_t r;
    while ((r = read(fd, chunk, sizeof chunk)) > 0)
        buf.insert(buf.end(), chunk, chunk + r);
    close(fd);
    // split headers / body
    const char* marker = "\r\n\r\n";
    auto it = std::search(buf.begin(), buf.end(), marker, marker + 4);
    if (buf.size() < 12 || it == buf.end()) {
        e->error = "malformed HTTP response";
        return -1;
    }
    int status = std::atoi(reinterpret_cast<const char*>(buf.data()) + 9);
    body.assign(it + 4, buf.end());
    return status;
}

static void vt_json_escape(const char* s, std::string& out) {
    for (const unsigned char* p = (const unsigned char*)s; *p; ++p) {
        switch (*p) {
            case '"': out += "\\\""; break;
            case '\\': out += "\\\\"; break;
            case '\n': out += "\\n"; break;
            case '\r': out += "\\r"; break;
            case '\t': out += "\\t"; break;
            default:
                if (*p < 0x20) {
                    char esc[8];
                    std::snprintf(esc, sizeof esc, "\\u%04x", *p);
                    out += esc;
                } else {
                    out += (char)*p;
                }
        }
    }
}

// Parse a WAV response body (RIFF....WAVE, fmt + data chunks) into a
// heap VtAudio; nullptr + e->error on malformed/unsupported layouts.
static VtAudio* vt_parse_wav_response(VtEngine* e, const std::vector<uint8_t>& body) {
    if (body.size() < 44 || std::memcmp(body.data(), "RIFF", 4) != 0 ||
        std::memcmp(body.data() + 8, "WAVE", 4) != 0) {
        e->error = "response is not a WAV file";
        return nullptr;
    }
    uint32_t rate = 0;
    uint16_t bits = 0, channels = 0;
    const uint8_t* pcm = nullptr;
    uint64_t pcm_bytes = 0;
    for (uint64_t off = 12; off + 8 <= body.size();) {
        uint32_t sz;
        std::memcpy(&sz, body.data() + off + 4, 4);
        const uint8_t* chunk_data = body.data() + off + 8;
        if (off + 8 + sz > body.size()) sz = (uint32_t)(body.size() - off - 8);
        if (std::memcmp(body.data() + off, "fmt ", 4) == 0 && sz >= 16) {
            std::memcpy(&channels, chunk_data + 2, 2);
            std::memcpy(&rate, chunk_data + 4, 4);
            std::memcpy(&bits, chunk_data + 14, 2);
        } else if (std::memcmp(body.data() + off, "data", 4) == 0) {
            pcm = chunk_data;
            pcm_bytes = sz;
        }
        off += 8 + sz + (sz & 1);
    }
    if (!pcm || bits != 16 || channels != 1) {
        e->error = "unsupported WAV layout (want 16-bit mono PCM)";
        return nullptr;
    }
    auto* audio = new VtAudio();
    audio->n_samples = pcm_bytes / 2;
    audio->sample_rate = rate;
    audio->samples = (float*)std::malloc(audio->n_samples * sizeof(float));
    const int16_t* s16 = reinterpret_cast<const int16_t*>(pcm);
    for (uint64_t i = 0; i < audio->n_samples; ++i)
        audio->samples[i] = (float)s16[i] / 32767.0f;
    return audio;
}

VT_API VtEngine* vt_engine_connect(const char* host, uint16_t port) {
    auto* e = new VtEngine();
    e->host = host ? host : "127.0.0.1";
    e->port = port;
    std::string req = "GET /healthz HTTP/1.1\r\nHost: " + e->host +
                      "\r\nConnection: close\r\n\r\n";
    std::vector<uint8_t> body;
    int status = vt_http_roundtrip(e, req, body);
    if (status != 200) {
        if (e->error.empty()) e->error = "healthz returned " + std::to_string(status);
        // keep the handle so the caller can read the error, but mark it
        e->port = port;  // retain for retries
        return e;        // caller checks vt_engine_error
    }
    e->error.clear();
    return e;
}

VT_API const char* vt_engine_error(const VtEngine* e) {
    return (e && !e->error.empty()) ? e->error.c_str() : nullptr;
}

// Synthesize text -> float PCM.  speaker_id < 0 means "no speaker";
// noise_scale / noise_scale_duration < 0 mean "use the checkpoint's
// configured value" — 0.0 is a LEGITIMATE noise scale (deterministic
// synthesis) and is sent through.  speaking_rate must be STRICTLY positive
// to be honored (<= 0, including the old 0.0 "use default" sentinel, falls
// back to the config value: the engine computes length_scale = 1/rate, so a
// literal 0.0 would mean infinite durations).  ABI note vs the pre-round-2
// sentinel: only the noise scales changed meaning at 0.0; speaking_rate==0.0
// still means "use default".  Returns nullptr on failure (vt_engine_error).
VT_API VtAudio* vt_synthesize(VtEngine* e, const char* text, int32_t speaker_id,
                              int64_t seed, float speaking_rate,
                              float noise_scale, float noise_scale_duration) {
    if (!e || !text) return nullptr;
    e->error.clear();
    std::string payload = "{\"text\": \"";
    vt_json_escape(text, payload);
    payload += "\", \"seed\": " + std::to_string(seed);
    if (speaker_id >= 0)
        payload += ", \"speaker_id\": " + std::to_string(speaker_id);
    char num[64];
    if (speaking_rate > 0) {
        std::snprintf(num, sizeof num, ", \"speaking_rate\": %.6f", speaking_rate);
        payload += num;
    }
    if (noise_scale >= 0) {
        std::snprintf(num, sizeof num, ", \"noise_scale\": %.6f", noise_scale);
        payload += num;
    }
    if (noise_scale_duration >= 0) {
        std::snprintf(num, sizeof num, ", \"noise_scale_duration\": %.6f",
                      noise_scale_duration);
        payload += num;
    }
    payload += "}";

    std::string req = "POST /synthesize HTTP/1.1\r\nHost: " + e->host +
                      "\r\nContent-Type: application/json\r\nContent-Length: " +
                      std::to_string(payload.size()) +
                      "\r\nConnection: close\r\n\r\n" + payload;
    std::vector<uint8_t> body;
    int status = vt_http_roundtrip(e, req, body);
    if (status != 200) {
        if (e->error.empty())
            e->error = "synthesize returned HTTP " + std::to_string(status) +
                       ": " + std::string(body.begin(), body.end());
        return nullptr;
    }
    return vt_parse_wav_response(e, body);
}

// Voice conversion: float PCM in -> float PCM in the target speaker's voice
// (the server's POST /convert).  source_speaker / target_speaker < 0 mean
// "unconditioned" (single-speaker checkpoints); noise_scale < 0 means the
// deterministic default (0.0 = convert from the posterior mean).
// sample_rate must match the checkpoint's rate — the server rejects
// mismatches with HTTP 400 (surfaced via vt_engine_error).
VT_API VtAudio* vt_convert(VtEngine* e, const float* samples, uint64_t n_samples,
                           uint32_t sample_rate, int32_t source_speaker,
                           int32_t target_speaker, int64_t seed,
                           float noise_scale) {
    if (!e || !samples || n_samples == 0) return nullptr;
    e->error.clear();

    std::string path = "/convert?seed=" + std::to_string(seed);
    if (source_speaker >= 0)
        path += "&source_speaker=" + std::to_string(source_speaker);
    if (target_speaker >= 0)
        path += "&target_speaker=" + std::to_string(target_speaker);
    if (noise_scale >= 0) {
        char num[48];
        std::snprintf(num, sizeof num, "&noise_scale=%.6f", noise_scale);
        path += num;
    }

    const uint64_t wav_bytes = vt_wav_size(n_samples);
    std::string req = "POST " + path + " HTTP/1.1\r\nHost: " + e->host +
                      "\r\nContent-Type: audio/wav\r\nContent-Length: " +
                      std::to_string(wav_bytes) +
                      "\r\nConnection: close\r\n\r\n";
    size_t header_len = req.size();
    req.resize(header_len + wav_bytes);
    vt_wav_encode(samples, n_samples, sample_rate,
                  reinterpret_cast<uint8_t*>(&req[header_len]));

    std::vector<uint8_t> body;
    int status = vt_http_roundtrip(e, req, body);
    if (status != 200) {
        if (e->error.empty())
            e->error = "convert returned HTTP " + std::to_string(status) +
                       ": " + std::string(body.begin(), body.end());
        return nullptr;
    }
    return vt_parse_wav_response(e, body);
}

VT_API const float* vt_audio_samples(const VtAudio* a) { return a->samples; }
VT_API uint64_t vt_audio_num_samples(const VtAudio* a) { return a->n_samples; }
VT_API uint32_t vt_audio_sample_rate(const VtAudio* a) { return a->sample_rate; }

VT_API void vt_audio_free(VtAudio* a) {
    if (a) {
        std::free(a->samples);
        delete a;
    }
}

VT_API void vt_engine_close(VtEngine* e) { delete e; }
