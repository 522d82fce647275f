/* NumPy data allocator routing large buffers through mmap +
 * madvise(MADV_HUGEPAGE).
 *
 * This sandbox's guest memory is lazily provisioned: every first-touch
 * 4 KiB fault costs ~300 us (host-side fetch), making fresh numpy
 * buffers fill at ~0.01 GB/s. With MADV_HUGEPAGE the fetch granularity
 * becomes 2 MiB (~20x fewer faults). Installed via
 * hgaprec_tpu.data.hugealloc.install() -> PyDataMem_SetHandler.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_TARGET_VERSION NPY_1_22_API_VERSION
#include <numpy/arrayobject.h>
#include <string.h>
#include <sys/mman.h>

#define HUGE_THRESHOLD (4u << 20)  /* route allocs >= 4 MiB */
#define HEADER 64                  /* stash size + tag before the data */

typedef struct { size_t size; unsigned long tag; } hdr_t;
#define TAG_MMAP 0x48554741UL
#define TAG_MALLOC 0x4d414c43UL

static void *huge_alloc(void *ctx, size_t size) {
  (void)ctx;
  size_t total = size + HEADER;
  void *base;
  if (total >= HUGE_THRESHOLD) {
    size_t rounded = (total + ((2u << 20) - 1)) & ~(size_t)((2u << 20) - 1);
    base = mmap(NULL, rounded, PROT_READ | PROT_WRITE,
                MAP_SHARED | MAP_ANONYMOUS, -1, 0);
    if (base == MAP_FAILED) return NULL;
    madvise(base, rounded, MADV_HUGEPAGE);
    hdr_t *h = (hdr_t *)base;
    h->size = rounded;
    h->tag = TAG_MMAP;
    return (char *)base + HEADER;
  }
  base = malloc(total);
  if (!base) return NULL;
  hdr_t *h = (hdr_t *)base;
  h->size = total;
  h->tag = TAG_MALLOC;
  return (char *)base + HEADER;
}

static void *huge_zeroed(void *ctx, size_t nelem, size_t elsize) {
  size_t size = nelem * elsize;
  void *p = huge_alloc(ctx, size);
  if (!p) return NULL;
  hdr_t *h = (hdr_t *)((char *)p - HEADER);
  if (h->tag == TAG_MALLOC) memset(p, 0, size);
  /* fresh anonymous mmap pages are already zero */
  return p;
}

static void huge_free(void *ctx, void *ptr, size_t size) {
  (void)ctx;
  (void)size;
  if (!ptr) return;
  hdr_t *h = (hdr_t *)((char *)ptr - HEADER);
  if (h->tag == TAG_MMAP) {
    munmap((void *)h, h->size);
  } else {
    free((void *)h);
  }
}

static void *huge_realloc(void *ctx, void *ptr, size_t new_size) {
  if (!ptr) return huge_alloc(ctx, new_size);
  hdr_t *h = (hdr_t *)((char *)ptr - HEADER);
  size_t old_data = h->size - HEADER;
  if (h->tag == TAG_MALLOC && new_size + HEADER < HUGE_THRESHOLD) {
    void *nb = realloc((void *)h, new_size + HEADER);
    if (!nb) return NULL;
    ((hdr_t *)nb)->size = new_size + HEADER;
    return (char *)nb + HEADER;
  }
  void *np_ = huge_alloc(ctx, new_size);
  if (!np_) return NULL;
  memcpy(np_, ptr, old_data < new_size ? old_data : new_size);
  huge_free(ctx, ptr, old_data);
  return np_;
}

static PyDataMem_Handler handler = {
    "hugepage_allocator",
    1,
    {NULL, huge_alloc, huge_zeroed, huge_realloc, huge_free},
};

static PyObject *install(PyObject *self, PyObject *args) {
  (void)self;
  (void)args;
  PyObject *cap = PyCapsule_New(&handler, "mem_handler", NULL);
  if (!cap) return NULL;
  PyObject *old = PyDataMem_SetHandler(cap);
  Py_DECREF(cap);
  return old ? old : Py_None;
}

static PyMethodDef methods[] = {
    {"install", install, METH_NOARGS,
     "Install the hugepage numpy allocator; returns the old handler."},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef mod = {PyModuleDef_HEAD_INIT, "_hugealloc", NULL,
                                 -1, methods, NULL, NULL, NULL, NULL};

PyMODINIT_FUNC PyInit__hugealloc(void) {
  import_array();
  return PyModule_Create(&mod);
}
