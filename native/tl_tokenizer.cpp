// Native SPM tokenizer core — the heap-merge hot loop of
// llm_tokenizer_spm (llama.cpp-b2430/llama.cpp:9484-9600), C++17.
//
// The Python layer (tpulamm/tokenizer/spm.py) keeps the pre-processing
// (special-token partitioning, space escaping); this library implements the
// inner encode over one raw fragment: split into UTF-8 chars, greedily merge
// adjacent symbols by vocab score (ties: leftmost), resegment through the
// merge history, byte-fallback for unmatched symbols.
//
// Exposed C ABI (ctypes):
//   tl_spm_new(tokens_blob, offsets, scores, types, n)   -> handle
//   tl_spm_encode(handle, text, text_len, out, max_out)  -> n_tokens
//   tl_spm_free(handle)

#include <cstdint>
#include <cstring>
#include <queue>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Vocab {
    std::unordered_map<std::string, int32_t> token_to_id;
    std::vector<float> scores;
    int32_t byte_tokens[256];
    int32_t unk_id = 0;
};

struct Bigram {
    float score;
    int32_t left, right;
    int32_t size;       // total bytes covered
    int32_t tid;
};
struct BigramCmp {
    // max-heap by score; ties -> leftmost (matches python heapq tuple
    // (-score, left, right, ...))
    bool operator()(const Bigram& a, const Bigram& b) const {
        if (a.score != b.score) return a.score < b.score;
        if (a.left != b.left) return a.left > b.left;
        return a.right > b.right;
    }
};

int utf8_len(uint8_t b) {
    // reference lookup semantics: stray continuation bytes -> length 1
    if (b < 0xC0) return 1;
    if (b < 0xE0) return 2;
    if (b < 0xF0) return 3;
    return 4;
}

}  // namespace

extern "C" {

void* tl_spm_new(const char* blob, const int64_t* offsets,
                 const float* scores, const int32_t* types, int32_t n,
                 int32_t unk_id) {
    auto* v = new Vocab();
    v->scores.assign(scores, scores + n);
    v->unk_id = unk_id;
    for (int i = 0; i < 256; ++i) v->byte_tokens[i] = -1;
    char hexbuf[8];
    for (int32_t i = 0; i < n; ++i) {
        std::string tok(blob + offsets[i], blob + offsets[i + 1]);
        v->token_to_id.emplace(tok, i);
        if (types[i] == 6) {  // BYTE token "<0xXX>" (or raw single char)
            if (tok.size() == 6 && tok.rfind("<0x", 0) == 0 && tok[5] == '>') {
                int b = std::stoi(tok.substr(3, 2), nullptr, 16);
                v->byte_tokens[b] = i;
            } else if (tok.size() == 1) {
                v->byte_tokens[(uint8_t)tok[0]] = i;
            }
        }
    }
    // single-char fallback map (python: chr(b)) for vocabs without <0xXX>
    for (int b = 0; b < 256; ++b) {
        if (v->byte_tokens[b] >= 0) continue;
        snprintf(hexbuf, sizeof hexbuf, "<0x%02X>", b);
        auto it = v->token_to_id.find(hexbuf);
        if (it != v->token_to_id.end()) v->byte_tokens[b] = it->second;
    }
    return v;
}

void tl_spm_free(void* h) { delete static_cast<Vocab*>(h); }

int32_t tl_spm_encode(void* h, const char* text, int64_t len,
                      int32_t* out, int32_t max_out) {
    const Vocab& v = *static_cast<Vocab*>(h);
    if (len <= 0) return 0;
    const uint8_t* data = (const uint8_t*)text;

    // split into utf-8 chars
    std::vector<int32_t> starts, sizes, prev, next;
    for (int64_t i = 0; i < len;) {
        int nb = utf8_len(data[i]);
        if (i + nb > len) nb = (int)(len - i);
        starts.push_back((int32_t)i);
        sizes.push_back(nb);
        i += nb;
    }
    const int32_t nsym = (int32_t)starts.size();
    prev.resize(nsym); next.resize(nsym);
    for (int32_t i = 0; i < nsym; ++i) { prev[i] = i - 1; next[i] = i + 1 < nsym ? i + 1 : -1; }

    std::priority_queue<Bigram, std::vector<Bigram>, BigramCmp> heap;
    std::unordered_map<std::string, std::pair<int32_t, int32_t>> rev_merge;

    auto try_add = [&](int32_t l, int32_t r) {
        if (l < 0 || r < 0) return;
        std::string t((const char*)data + starts[l],
                      (size_t)(sizes[l] + sizes[r]));
        auto it = v.token_to_id.find(t);
        if (it == v.token_to_id.end()) return;
        heap.push({v.scores[it->second], l, r, sizes[l] + sizes[r],
                   it->second});
        rev_merge[t] = {l, r};
    };
    for (int32_t i = 1; i < nsym; ++i) try_add(i - 1, i);

    while (!heap.empty()) {
        Bigram bg = heap.top(); heap.pop();
        if (sizes[bg.left] == 0 || sizes[bg.right] == 0 ||
            sizes[bg.left] + sizes[bg.right] != bg.size) continue;
        sizes[bg.left] += sizes[bg.right];
        sizes[bg.right] = 0;
        next[bg.left] = next[bg.right];
        if (next[bg.right] >= 0) prev[next[bg.right]] = bg.left;
        try_add(prev[bg.left], bg.left);
        try_add(bg.left, next[bg.left]);
    }

    int32_t n_out = 0;
    // iterative resegment (explicit stack; matches python recursion order)
    auto emit = [&](int32_t tid) {
        if (n_out < max_out) out[n_out] = tid;
        ++n_out;
    };
    std::vector<std::pair<int32_t, int32_t>> dfs;
    for (int32_t i = 0; i != -1 && i < nsym; i = next[i]) {
        dfs.clear();
        dfs.push_back({starts[i], sizes[i]});
        while (!dfs.empty()) {
            auto [st, sz] = dfs.back(); dfs.pop_back();
            std::string t((const char*)data + st, (size_t)sz);
            auto it = v.token_to_id.find(t);
            if (it != v.token_to_id.end()) { emit(it->second); continue; }
            auto rm = rev_merge.find(t);
            if (rm == rev_merge.end()) {
                for (int32_t b = 0; b < sz; ++b) {
                    int32_t bt = v.byte_tokens[data[st + b]];
                    emit(bt >= 0 ? bt : v.unk_id);
                }
                continue;
            }
            // push right then left so left pops first
            int32_t r = rm->second.second;
            // NOTE: rev_merge indices reference the ORIGINAL symbol table;
            // their (start, size) at merge time were starts[x], sizes at
            // that moment. We recompute via stored spans: left span starts
            // at starts[l] and covers t.size() - right_span; right span
            // starts at starts[r].
            int32_t r_start = starts[r];
            int32_t l_size = r_start - st;
            int32_t r_size = sz - l_size;
            dfs.push_back({r_start, r_size});
            dfs.push_back({st, l_size});
        }
    }
    return n_out;
}

}  // extern "C"
