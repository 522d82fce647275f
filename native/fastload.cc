// Fast TSV ratings parser: mmap + hand-rolled integer scan, exposed as a
// C ABI for ctypes. Parses "uid <sep> mid <sep> rating [extra]" rows at
// ~500 MB/s — the Python tokenizer path is the ingest bottleneck at
// Netflix/EchoNest row counts (reference ingest: ratings.cc:63-119).
//
// Build: g++ -O3 -shared -fPIC -o libfastload.so fastload.cc

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// Returns number of parsed rows, or -1 on error. Caller provides output
// buffers of capacity `cap` rows; rows beyond cap are dropped (caller
// should size cap from a line count or file size / min-line-bytes).
int64_t parse_tsv3(const char *path, int64_t *u, int64_t *m, int64_t *y,
                   int64_t cap) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return -1; }
  size_t len = (size_t)st.st_size;
  if (len == 0) { close(fd); return 0; }
  const char *base =
      (const char *)mmap(nullptr, len, PROT_READ, MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) { close(fd); return -1; }

  int64_t rows = 0;
  const char *p = base, *end = base + len;
  while (p < end && rows < cap) {
    // parse up to three integers on this line; ignore the rest
    int64_t vals[3] = {0, 0, 0};
    int nv = 0;
    bool neg = false;
    while (p < end && *p != '\n') {
      const char c = *p;
      if (c >= '0' && c <= '9') {
        if (nv < 3) {
          int64_t v = 0;
          while (p < end && *p >= '0' && *p <= '9') {
            v = v * 10 + (*p - '0');
            ++p;
          }
          // swallow a fractional part (ratings like "4.0")
          if (p < end && *p == '.') {
            ++p;
            while (p < end && *p >= '0' && *p <= '9') ++p;
          }
          vals[nv++] = neg ? -v : v;
          neg = false;
          continue;
        }
      } else if (c == '-') {
        neg = true;
      }
      ++p;
    }
    if (p < end) ++p;  // consume newline
    if (nv >= 3) {
      u[rows] = vals[0];
      m[rows] = vals[1];
      y[rows] = vals[2];
      ++rows;
    }
  }
  munmap((void *)base, len);
  close(fd);
  return rows;
}

// Count newline characters (to size buffers).
int64_t count_lines(const char *path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return -1; }
  size_t len = (size_t)st.st_size;
  if (len == 0) { close(fd); return 0; }
  const char *base =
      (const char *)mmap(nullptr, len, PROT_READ, MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) { close(fd); return -1; }
  int64_t n = 0;
  for (size_t j = 0; j < len; ++j) n += (base[j] == '\n');
  if (len > 0 && base[len - 1] != '\n') ++n;
  munmap((void *)base, len);
  close(fd);
  return n;
}

}  // extern "C"
