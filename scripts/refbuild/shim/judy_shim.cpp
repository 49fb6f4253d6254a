// std::map-backed implementation of the Judy shim (see Judy.h in this dir).
//
// JudySL keys are NUL-terminated byte strings compared lexicographically by
// unsigned byte; std::string's operator< has exactly those semantics
// (char_traits<char>::compare is memcmp-like).  std::map is node-based, so
// pointers to mapped values stay valid across inserts — the same stability
// contract Judy gives for its value slots.

#include <cstring>
#include <map>
#include <string>

extern "C" {
typedef unsigned long Word_t;

struct BftJSL {
    std::map<std::string, Word_t> m;
};
struct BftJL {
    std::map<Word_t, Word_t> m;
};

static BftJSL *jsl(void **ppa, bool create) {
    if (!*ppa) {
        if (!create) return nullptr;
        *ppa = new BftJSL();
    }
    return static_cast<BftJSL *>(*ppa);
}

static BftJL *jl(void **ppa, bool create) {
    if (!*ppa) {
        if (!create) return nullptr;
        *ppa = new BftJL();
    }
    return static_cast<BftJL *>(*ppa);
}

Word_t *bft_shim_jsl_ins(void **ppa, const unsigned char *key) {
    return &jsl(ppa, true)->m[reinterpret_cast<const char *>(key)];
}

Word_t *bft_shim_jsl_get(void **ppa, const unsigned char *key) {
    BftJSL *a = jsl(ppa, false);
    if (!a) return nullptr;
    auto it = a->m.find(reinterpret_cast<const char *>(key));
    return it == a->m.end() ? nullptr : &it->second;
}

int bft_shim_jsl_del(void **ppa, const unsigned char *key) {
    BftJSL *a = jsl(ppa, false);
    if (!a) return 0;
    return static_cast<int>(a->m.erase(reinterpret_cast<const char *>(key)));
}

// JSLF/JSLN/JSLL/JSLP write the found key back into the caller's buffer
// (Judy requires the buffer be large enough for the longest stored key).
static Word_t *jsl_emit(std::map<std::string, Word_t> &m,
                        std::map<std::string, Word_t>::iterator it,
                        unsigned char *key) {
    if (it == m.end()) return nullptr;
    std::memcpy(key, it->first.c_str(), it->first.size() + 1);
    return &it->second;
}

Word_t *bft_shim_jsl_first(void **ppa, unsigned char *key) {
    BftJSL *a = jsl(ppa, false);
    if (!a) return nullptr;
    return jsl_emit(a->m,
                    a->m.lower_bound(reinterpret_cast<const char *>(key)), key);
}

Word_t *bft_shim_jsl_next(void **ppa, unsigned char *key) {
    BftJSL *a = jsl(ppa, false);
    if (!a) return nullptr;
    return jsl_emit(a->m,
                    a->m.upper_bound(reinterpret_cast<const char *>(key)), key);
}

Word_t *bft_shim_jsl_last(void **ppa, unsigned char *key) {
    BftJSL *a = jsl(ppa, false);
    if (!a) return nullptr;
    // last index <= key: predecessor of upper_bound(key)
    auto it = a->m.upper_bound(reinterpret_cast<const char *>(key));
    if (it == a->m.begin()) return nullptr;
    return jsl_emit(a->m, --it, key);
}

Word_t *bft_shim_jsl_prev(void **ppa, unsigned char *key) {
    BftJSL *a = jsl(ppa, false);
    if (!a) return nullptr;
    auto it = a->m.lower_bound(reinterpret_cast<const char *>(key));
    if (it == a->m.begin()) return nullptr;
    return jsl_emit(a->m, --it, key);
}

Word_t bft_shim_jsl_freearray(void **ppa) {
    BftJSL *a = jsl(ppa, false);
    if (!a) return 0;
    Word_t bytes = 0;  // Judy returns freed bytes; approximate
    for (auto &kv : a->m) bytes += kv.first.size() + sizeof(Word_t);
    delete a;
    *ppa = nullptr;
    return bytes;
}

Word_t *bft_shim_jl_ins(void **ppa, Word_t key) {
    return &jl(ppa, true)->m[key];
}

Word_t *bft_shim_jl_get(void **ppa, Word_t key) {
    BftJL *a = jl(ppa, false);
    if (!a) return nullptr;
    auto it = a->m.find(key);
    return it == a->m.end() ? nullptr : &it->second;
}

int bft_shim_jl_del(void **ppa, Word_t key) {
    BftJL *a = jl(ppa, false);
    if (!a) return 0;
    return static_cast<int>(a->m.erase(key));
}

static Word_t *jl_emit(std::map<Word_t, Word_t> &m,
                       std::map<Word_t, Word_t>::iterator it, Word_t *key) {
    if (it == m.end()) return nullptr;
    *key = it->first;
    return &it->second;
}

Word_t *bft_shim_jl_first(void **ppa, Word_t *key) {
    BftJL *a = jl(ppa, false);
    if (!a) return nullptr;
    return jl_emit(a->m, a->m.lower_bound(*key), key);
}

Word_t *bft_shim_jl_next(void **ppa, Word_t *key) {
    BftJL *a = jl(ppa, false);
    if (!a) return nullptr;
    return jl_emit(a->m, a->m.upper_bound(*key), key);
}

Word_t *bft_shim_jl_last(void **ppa, Word_t *key) {
    BftJL *a = jl(ppa, false);
    if (!a) return nullptr;
    auto it = a->m.upper_bound(*key);
    if (it == a->m.begin()) return nullptr;
    return jl_emit(a->m, --it, key);
}

Word_t *bft_shim_jl_prev(void **ppa, Word_t *key) {
    BftJL *a = jl(ppa, false);
    if (!a) return nullptr;
    auto it = a->m.lower_bound(*key);
    if (it == a->m.begin()) return nullptr;
    return jl_emit(a->m, --it, key);
}

Word_t bft_shim_jl_freearray(void **ppa) {
    BftJL *a = jl(ppa, false);
    if (!a) return 0;
    Word_t bytes = a->m.size() * 2 * sizeof(Word_t);
    delete a;
    *ppa = nullptr;
    return bytes;
}
}  // extern "C"
