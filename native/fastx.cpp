// Native FASTA/FASTQ tokenizer + 2-bit packer.
//
// Host-side ingest hot path (the C++ counterpart of the reference's
// needletail parser, orion-kmer count.rs:63 / build.rs:42): parses an
// in-memory (already decompressed) buffer and emits, in one pass:
//   * a 2-bit code stream (0..3, 255 = invalid base) with `sep` invalid
//     positions inserted between records so no k-mer window can span two
//     records -- directly consumable by the device extraction kernel
//   * per-record code-end offsets (for window->read ownership)
//   * record ids (header lines) as a blob + end offsets
//
// Two base LUT modes mirror the engine's semantics:
//   normalize=1 (count/build/classify): case-insensitive ACGT, U/u -> T
//   normalize=0 (query, raw bytes):     case-insensitive ACGT only
//
// Build: g++ -O3 -shared -fPIC -o libokt_fastx.so fastx.cpp

#include <cstdint>
#include <cstring>

namespace {

constexpr uint8_t INVALID = 255;

struct Luts {
    uint8_t norm[256];
    uint8_t raw[256];
    Luts() {
        std::memset(norm, INVALID, sizeof(norm));
        std::memset(raw, INVALID, sizeof(raw));
        const char* bases = "ACGT";
        for (int i = 0; i < 4; ++i) {
            uint8_t u = (uint8_t)bases[i];
            uint8_t l = (uint8_t)(bases[i] + 32);
            norm[u] = norm[l] = (uint8_t)i;
            raw[u] = raw[l] = (uint8_t)i;
        }
        norm[(uint8_t)'U'] = norm[(uint8_t)'u'] = 3;  // needletail normalize: U->T
    }
};
const Luts kLuts;

struct Cursor {
    const uint8_t* p;
    const uint8_t* end;
    bool eof() const { return p >= end; }
    // Returns [line_start, line_end) excluding trailing \r, advances past \n.
    bool next_line(const uint8_t*& s, const uint8_t*& e) {
        if (eof()) return false;
        s = p;
        const uint8_t* nl = (const uint8_t*)memchr(p, '\n', (size_t)(end - p));
        if (nl) {
            e = nl;
            p = nl + 1;
        } else {
            e = end;
            p = end;
        }
        if (e > s && e[-1] == '\r') --e;
        return true;
    }
};

struct Out {
    uint8_t* codes;
    int64_t codes_cap;
    int64_t codes_len = 0;
    int64_t* rec_code_end;
    uint8_t* id_blob;
    int64_t id_cap;
    int64_t id_len = 0;
    int64_t* id_end;
    int64_t max_records;
    int64_t n_records = 0;
    int64_t sep;
    const uint8_t* lut;

    bool add_record_id(const uint8_t* s, const uint8_t* e) {
        if (n_records >= max_records) return false;
        int64_t len = e - s;
        if (id_len + len > id_cap) return false;
        std::memcpy(id_blob + id_len, s, (size_t)len);
        id_len += len;
        id_end[n_records] = id_len;
        return true;
    }
    bool add_seq_line(const uint8_t* s, const uint8_t* e) {
        int64_t len = e - s;
        if (codes_len + len > codes_cap) return false;
        uint8_t* dst = codes + codes_len;
        for (int64_t i = 0; i < len; ++i) dst[i] = lut[s[i]];
        codes_len += len;
        return true;
    }
    bool end_record() {
        if (codes_len + sep > codes_cap) return false;
        std::memset(codes + codes_len, INVALID, (size_t)sep);
        codes_len += sep;
        rec_code_end[n_records] = codes_len - sep;  // end of this record's bases
        ++n_records;
        return true;
    }
};

}  // namespace

extern "C" {

// Error codes
enum {
    OKT_OK = 0,
    OKT_EMPTY = -1,
    OKT_UNKNOWN_FORMAT = -2,
    OKT_MALFORMED = -3,
    OKT_CAPACITY = -4,
};

// out[0]=n_records, out[1]=codes_len, out[2]=id_len
long okt_parse_fastx(const uint8_t* data, long len, int normalize, long sep,
                     uint8_t* codes, long codes_cap, int64_t* rec_code_end,
                     uint8_t* id_blob, long id_cap, int64_t* id_end,
                     long max_records, int64_t* out) {
    // skip leading whitespace to find the format marker
    const uint8_t* q = data;
    const uint8_t* qend = data + len;
    while (q < qend && (*q == '\n' || *q == '\r' || *q == ' ' || *q == '\t')) ++q;
    if (q >= qend) return OKT_EMPTY;

    Out o;
    o.codes = codes;
    o.codes_cap = codes_cap;
    o.rec_code_end = rec_code_end;
    o.id_blob = id_blob;
    o.id_cap = id_cap;
    o.id_end = id_end;
    o.max_records = max_records;
    o.sep = sep;
    o.lut = normalize ? kLuts.norm : kLuts.raw;

    Cursor cur{q, qend};
    const uint8_t *s, *e;

    if (*q == '>') {
        // FASTA: header lines start records; sequence may span lines.
        bool in_record = false;
        while (cur.next_line(s, e)) {
            if (s < e && *s == '>') {
                if (in_record && !o.end_record()) return OKT_CAPACITY;
                if (!o.add_record_id(s + 1, e)) return OKT_CAPACITY;
                in_record = true;
            } else if (s < e) {
                if (!in_record) return OKT_MALFORMED;
                if (!o.add_seq_line(s, e)) return OKT_CAPACITY;
            }
        }
        if (in_record && !o.end_record()) return OKT_CAPACITY;
    } else if (*q == '@') {
        // FASTQ: strict 4-line records.
        while (true) {
            if (!cur.next_line(s, e)) break;
            if (s == e) continue;  // tolerate trailing blank lines
            if (*s != '@') return OKT_MALFORMED;
            if (!o.add_record_id(s + 1, e)) return OKT_CAPACITY;
            const uint8_t *ss, *se;
            if (!cur.next_line(ss, se)) return OKT_MALFORMED;
            int64_t seq_len = se - ss;
            if (!o.add_seq_line(ss, se)) return OKT_CAPACITY;
            if (!cur.next_line(s, e) || s == e || *s != '+') return OKT_MALFORMED;
            if (!cur.next_line(s, e)) return OKT_MALFORMED;
            if ((e - s) != seq_len) return OKT_MALFORMED;
            if (!o.end_record()) return OKT_CAPACITY;
        }
    } else {
        return OKT_UNKNOWN_FORMAT;
    }

    if (o.n_records == 0) return OKT_EMPTY;
    out[0] = o.n_records;
    out[1] = o.codes_len;
    out[2] = o.id_len;
    return OKT_OK;
}

// Pack a 2-bit code stream (0..3 valid, anything >3 invalid) into the
// device wire format (engine.pack_for_transfer semantics): 16 bases per
// u32 lane, base j at bits 2j..2j+1 (invalid bases contribute 0 bits),
// plus a 1-bit-per-base invalid bitmap, 32 flags per u32 little-endian.
// `size` (multiple of 32) >= n; positions n..size are padding = invalid.
// Replaces the numpy shift loop (~195 Mbases/s single-core) on the
// host's critical path.
long okt_pack_wire(const uint8_t* codes, long n, long size,
                   uint32_t* lanes, uint32_t* invalid_words) {
    if (size % 32 != 0 || n > size) return OKT_CAPACITY;
    long full_words = n / 32;  // invalid-bitmap words with all-real bases
    for (long w = 0; w < full_words; ++w) {
        const uint8_t* c = codes + w * 32;
        uint32_t lane0 = 0, lane1 = 0, inv = 0;
        for (int j = 0; j < 16; ++j) {
            uint8_t a = c[j];
            uint8_t b = c[16 + j];
            uint32_t abad = a > 3, bbad = b > 3;
            lane0 |= (uint32_t)(abad ? 0u : a) << (2 * j);
            lane1 |= (uint32_t)(bbad ? 0u : b) << (2 * j);
            inv |= (abad << j) | (bbad << (16 + j));
        }
        lanes[2 * w] = lane0;
        lanes[2 * w + 1] = lane1;
        invalid_words[w] = inv;
    }
    // tail: remaining real codes + padding
    for (long w = full_words; w < size / 32; ++w) {
        uint32_t lane0 = 0, lane1 = 0, inv = 0;
        for (int j = 0; j < 32; ++j) {
            long pos = w * 32 + j;
            uint8_t v = pos < n ? codes[pos] : INVALID;
            uint32_t bad = v > 3;
            uint32_t code = bad ? 0u : v;
            if (j < 16) lane0 |= code << (2 * j);
            else lane1 |= code << (2 * (j - 16));
            inv |= bad << j;
        }
        lanes[2 * w] = lane0;
        lanes[2 * w + 1] = lane1;
        invalid_words[w] = inv;
    }
    return OKT_OK;
}

}  // extern "C"
