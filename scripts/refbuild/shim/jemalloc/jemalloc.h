/* jemalloc shim — the reference's src/main.c includes <jemalloc/jemalloc.h>
 * purely to link against the jemalloc allocator (no API beyond malloc/free
 * is used).  jemalloc is not in this container; the system allocator is a
 * drop-in functional replacement, so this header only needs to exist. */
#ifndef BFT_JEMALLOC_SHIM_H
#define BFT_JEMALLOC_SHIM_H
#include <stdlib.h>
#endif
