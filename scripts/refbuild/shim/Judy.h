/* Judy.h shim — std::map-backed replacement for the Judy array library.
 *
 * The reference (BloomFilterTrie) links against Judy(3) for its annotation
 * dictionary compression: JudySL (string-keyed map, used by
 * src/replaceAnnotation.c, src/annotation.c, src/file_io.c) and JudyL
 * (word-keyed map, src/annotation.c).  Judy is not available in this
 * container, so this header provides the same macro API backed by C++
 * std::map (scripts/refbuild/shim/judy_shim.cpp).  Semantics preserved:
 *   - values are word-sized slots owned by the array; JSLI/JLI return a
 *     stable pointer to a zero-initialized slot (std::map nodes never move);
 *   - iteration order is lexicographic by unsigned byte (JudySL) /
 *     numeric (JudyL), matching Judy;
 *   - JSLF/JSLN/JSLL/JSLP copy the found key back into the caller's buffer.
 * Only the macros the reference's *built* sources use are provided
 * (see Makefile.in:27-32 object list).
 */
#ifndef BFT_JUDY_SHIM_H
#define BFT_JUDY_SHIM_H

#include <stdlib.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef unsigned long Word_t, *PWord_t;
typedef void *Pvoid_t, **PPvoid_t;

#define JERR (-1)
#define PJERR ((Pvoid_t)(~0UL))
#define PPJERR ((PPvoid_t)(~0UL))
#define PJE0 ((void *)0)

/* JudySL: keys are NUL-terminated byte strings */
Word_t *bft_shim_jsl_ins(Pvoid_t *ppa, const unsigned char *key);
Word_t *bft_shim_jsl_get(Pvoid_t *ppa, const unsigned char *key);
int bft_shim_jsl_del(Pvoid_t *ppa, const unsigned char *key);
Word_t *bft_shim_jsl_first(Pvoid_t *ppa, unsigned char *key);
Word_t *bft_shim_jsl_next(Pvoid_t *ppa, unsigned char *key);
Word_t *bft_shim_jsl_last(Pvoid_t *ppa, unsigned char *key);
Word_t *bft_shim_jsl_prev(Pvoid_t *ppa, unsigned char *key);
Word_t bft_shim_jsl_freearray(Pvoid_t *ppa);

/* JudyL: keys are words */
Word_t *bft_shim_jl_ins(Pvoid_t *ppa, Word_t key);
Word_t *bft_shim_jl_get(Pvoid_t *ppa, Word_t key);
int bft_shim_jl_del(Pvoid_t *ppa, Word_t key);
Word_t *bft_shim_jl_first(Pvoid_t *ppa, Word_t *key);
Word_t *bft_shim_jl_next(Pvoid_t *ppa, Word_t *key);
Word_t *bft_shim_jl_last(Pvoid_t *ppa, Word_t *key);
Word_t *bft_shim_jl_prev(Pvoid_t *ppa, Word_t *key);
Word_t bft_shim_jl_freearray(Pvoid_t *ppa);

#ifdef __cplusplus
}
#endif

/* Judy(3) macro API.  PV is any pointer lvalue; Array is a Pvoid_t lvalue;
 * Index is a byte buffer (JudySL) or Word_t lvalue (JudyL).
 *
 * Real Judy.h expands these to brace-block statements (its error-checking
 * wrapper), which callers rely on syntactically — the reference writes
 * `if (cond) JSLD(...) else ...` (src/annotation.c:1517) which only parses
 * if the macro is a compound statement.  Rc results go through __typeof__
 * because the reference sometimes passes a pointer lvalue as Rc. */
#define JSLI(PV, Array, Index) \
    { (PV) = (void *)bft_shim_jsl_ins(&(Array), (const unsigned char *)(Index)); }
#define JSLG(PV, Array, Index) \
    { (PV) = (void *)bft_shim_jsl_get(&(Array), (const unsigned char *)(Index)); }
#define JSLD(Rc, Array, Index) \
    { (Rc) = (__typeof__(Rc))(Word_t)bft_shim_jsl_del(&(Array), (const unsigned char *)(Index)); }
#define JSLF(PV, Array, Index) \
    { (PV) = (void *)bft_shim_jsl_first(&(Array), (unsigned char *)(Index)); }
#define JSLN(PV, Array, Index) \
    { (PV) = (void *)bft_shim_jsl_next(&(Array), (unsigned char *)(Index)); }
#define JSLL(PV, Array, Index) \
    { (PV) = (void *)bft_shim_jsl_last(&(Array), (unsigned char *)(Index)); }
#define JSLP(PV, Array, Index) \
    { (PV) = (void *)bft_shim_jsl_prev(&(Array), (unsigned char *)(Index)); }
#define JSLFA(Rc, Array) \
    { (Rc) = (__typeof__(Rc))bft_shim_jsl_freearray(&(Array)); }

#define JLI(PV, Array, Index) \
    { (PV) = (void *)bft_shim_jl_ins(&(Array), (Word_t)(Index)); }
#define JLG(PV, Array, Index) \
    { (PV) = (void *)bft_shim_jl_get(&(Array), (Word_t)(Index)); }
#define JLD(Rc, Array, Index) \
    { (Rc) = (__typeof__(Rc))(Word_t)bft_shim_jl_del(&(Array), (Word_t)(Index)); }
#define JLF(PV, Array, Index) \
    { (PV) = (void *)bft_shim_jl_first(&(Array), &(Index)); }
#define JLN(PV, Array, Index) \
    { (PV) = (void *)bft_shim_jl_next(&(Array), &(Index)); }
#define JLL(PV, Array, Index) \
    { (PV) = (void *)bft_shim_jl_last(&(Array), &(Index)); }
#define JLP(PV, Array, Index) \
    { (PV) = (void *)bft_shim_jl_prev(&(Array), &(Index)); }
#define JLFA(Rc, Array) \
    { (Rc) = (__typeof__(Rc))bft_shim_jl_freearray(&(Array)); }

#endif /* BFT_JUDY_SHIM_H */
