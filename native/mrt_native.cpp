// mrt_native: native runtime components for micro_raytracer_tpu.
//
// The reference implements its runtime in native code (Rust): a hand-rolled
// HTTP/1.1 server (/root/reference/src/http.rs) and PNG/JPEG encoding via
// the `image` crate. This library is the C++ equivalent for the TPU build:
//
//   * a zlib-based PNG encoder (RGB8, filter 0) for the CLI's image output;
//   * a thread-per-connection HTTP/1.1 transport reproducing the reference's
//     request validation order (http.rs:73-113), which calls back into the
//     host (Python) only for the render itself.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>
#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {

void* mrt_alloc(size_t n) { return std::malloc(n); }
void mrt_free(void* p) { std::free(p); }

// ---------------------------------------------------------------- PNG ----

static void put_be32(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back(x >> 24); v.push_back(x >> 16); v.push_back(x >> 8); v.push_back(x);
}

static void put_chunk(std::vector<uint8_t>& out, const char type[4],
                      const uint8_t* data, size_t len) {
  put_be32(out, (uint32_t)len);
  size_t start = out.size();
  out.insert(out.end(), type, type + 4);
  out.insert(out.end(), data, data + len);
  uint32_t crc = crc32(0L, out.data() + start, (uInt)(len + 4));
  put_be32(out, crc);
}

// Encode an RGB8 image (h rows of w pixels, tightly packed) as a PNG byte
// stream. Returns malloc'd buffer in *out (caller frees with mrt_free).
int mrt_png_encode(const uint8_t* rgb, int w, int h,
                   uint8_t** out, size_t* out_len) {
  if (!rgb || w <= 0 || h <= 0 || !out || !out_len) return -1;

  // raw stream: one filter byte (0) per row
  std::vector<uint8_t> raw((size_t)h * (w * 3 + 1));
  for (int y = 0; y < h; ++y) {
    uint8_t* row = raw.data() + (size_t)y * (w * 3 + 1);
    row[0] = 0;
    std::memcpy(row + 1, rgb + (size_t)y * w * 3, (size_t)w * 3);
  }

  uLongf zcap = compressBound((uLong)raw.size());
  std::vector<uint8_t> z(zcap);
  if (compress2(z.data(), &zcap, raw.data(), (uLong)raw.size(), 6) != Z_OK)
    return -2;
  z.resize(zcap);

  std::vector<uint8_t> png;
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  png.insert(png.end(), sig, sig + 8);

  uint8_t ihdr[13];
  ihdr[0] = w >> 24; ihdr[1] = w >> 16; ihdr[2] = w >> 8; ihdr[3] = w;
  ihdr[4] = h >> 24; ihdr[5] = h >> 16; ihdr[6] = h >> 8; ihdr[7] = h;
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // color type: truecolor RGB
  ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
  put_chunk(png, "IHDR", ihdr, 13);
  put_chunk(png, "IDAT", z.data(), z.size());
  put_chunk(png, "IEND", nullptr, 0);

  *out = (uint8_t*)std::malloc(png.size());
  if (!*out) return -3;
  std::memcpy(*out, png.data(), png.size());
  *out_len = png.size();
  return 0;
}

int mrt_png_write(const char* path, const uint8_t* rgb, int w, int h) {
  uint8_t* buf = nullptr;
  size_t len = 0;
  int rc = mrt_png_encode(rgb, w, h, &buf, &len);
  if (rc != 0) return rc;
  FILE* f = std::fopen(path, "wb");
  if (!f) { std::free(buf); return -4; }
  size_t written = std::fwrite(buf, 1, len, f);
  std::fclose(f);
  std::free(buf);
  return written == len ? 0 : -5;
}

// --------------------------------------------------------------- HTTP ----

// Host render callback: receives the JSON body, fills *out (allocated with
// mrt_alloc) with the JPEG response body. Returns 0 on success.
typedef int (*mrt_render_cb)(const char* body, size_t len,
                             uint8_t** out, size_t* out_len);

static std::atomic<int> g_stop_fd{-1};

static void send_all(int fd, const char* data, size_t len) {
  size_t off = 0;
  while (off < len) {
    ssize_t n = send(fd, data + off, len - off, MSG_NOSIGNAL);
    if (n <= 0) return;
    off += (size_t)n;
  }
}

static void send_status(int fd, const char* line) {
  send_all(fd, line, std::strlen(line));
}

static void handle_conn(int fd, mrt_render_cb cb) {
  // Drain until the header block terminator arrives (it may span several TCP
  // segments), bounded by the reference's 1 MB request buffer (http.rs:66).
  // The Python fallback transport (frontends/http.py) does the same.
  std::string buf;
  size_t hdr_end = std::string::npos;
  while (buf.size() < (1u << 20)) {
    char tmp[1 << 16];
    ssize_t n = recv(fd, tmp, sizeof tmp, 0);
    if (n <= 0) break;
    size_t scan_from = buf.size() > 3 ? buf.size() - 3 : 0;
    buf.append(tmp, (size_t)n);
    hdr_end = buf.find("\r\n\r\n", scan_from);
    if (hdr_end != std::string::npos) break;
  }
  if (buf.empty()) { close(fd); return; }
  if (hdr_end == std::string::npos) {
    send_status(fd, "HTTP/1.1 400 Bad Request\r\n"); close(fd); return;
  }
  std::string head = buf.substr(0, hdr_end);
  std::string body = buf.substr(hdr_end + 4);

  // status line
  size_t sp1 = head.find(' '), sp2 = head.find(' ', sp1 + 1);
  size_t eol = head.find("\r\n");
  if (sp1 == std::string::npos || sp2 == std::string::npos) {
    send_status(fd, "HTTP/1.1 400 Bad Request\r\n"); close(fd); return;
  }
  std::string method = head.substr(0, sp1);
  std::string version = head.substr(sp2 + 1, (eol == std::string::npos ?
                                              head.size() : eol) - sp2 - 1);

  auto header = [&](const char* name) -> std::string {
    std::string key = std::string("\r\n") + name + ": ";
    size_t p = head.find(key);
    if (p == std::string::npos) return "";
    p += key.size();
    size_t e = head.find("\r\n", p);
    return head.substr(p, (e == std::string::npos ? head.size() : e) - p);
  };

  // validation order mirrors http.rs:73-113
  if (version != "HTTP/1.1") {
    send_status(fd, "HTTP/1.1 505 HTTP Version Not Supported\r\n");
    close(fd); return;
  }
  if (method != "POST") {
    send_status(fd, "HTTP/1.1 405 Method Not Allowed\r\n"); close(fd); return;
  }
  std::string ctype = header("Content-Type");
  if (ctype.empty()) {
    send_status(fd, "HTTP/1.1 400 Bad Request\r\n"); close(fd); return;
  }
  if (ctype.rfind("application/json", 0) != 0) {
    send_status(fd, "HTTP/1.1 415 Unsupported Media Type\r\n");
    close(fd); return;
  }
  std::string clen = header("Content-Length");
  if (clen.empty()) {
    send_status(fd, "HTTP/1.1 411 Length Required\r\n"); close(fd); return;
  }
  size_t want = (size_t)std::strtoull(clen.c_str(), nullptr, 10);
  while (body.size() < want) {  // drain the remainder (beyond the ref's 1 MB)
    char tmp[1 << 16];
    ssize_t m = recv(fd, tmp, sizeof tmp, 0);
    if (m <= 0) break;
    body.append(tmp, (size_t)m);
  }
  if (body.size() != want) {
    send_status(fd, "HTTP/1.1 400 Bad Request\r\n"); close(fd); return;
  }

  uint8_t* jpg = nullptr;
  size_t jpg_len = 0;
  int rc = cb(body.data(), body.size(), &jpg, &jpg_len);
  if (rc != 0 || !jpg) {
    send_status(fd, "HTTP/1.1 500 Internal Server Error\r\n");
    close(fd); return;
  }
  char hdr[160];
  int hl = std::snprintf(hdr, sizeof hdr,
                         "HTTP/1.1 200 OK\r\nContent-Type: image/jpeg\r\n"
                         "Content-Length: %zu\r\n\r\n", jpg_len);
  send_all(fd, hdr, (size_t)hl);
  send_all(fd, (const char*)jpg, jpg_len);
  send_all(fd, "\r\n", 2);
  std::free(jpg);
  close(fd);
}

// Blocking accept loop (http.rs:150-163). Returns 0 on clean shutdown
// (mrt_http_stop), negative on setup errors.
int mrt_http_serve(const char* host, int port, mrt_render_cb cb) {
  int srv = socket(AF_INET, SOCK_STREAM, 0);
  if (srv < 0) return -1;
  int one = 1;
  setsockopt(srv, SOL_SOCKET, SO_REUSEADDR, &one, sizeof one);
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons((uint16_t)port);
  addr.sin_addr.s_addr = host && *host ? inet_addr(host) : INADDR_ANY;
  if (bind(srv, (sockaddr*)&addr, sizeof addr) != 0) { close(srv); return -2; }
  if (listen(srv, 64) != 0) { close(srv); return -3; }
  g_stop_fd.store(srv);

  for (;;) {
    int fd = accept(srv, nullptr, nullptr);
    if (fd < 0) break;  // closed by mrt_http_stop
    std::thread(handle_conn, fd, cb).detach();
  }
  return 0;
}

void mrt_http_stop(void) {
  int fd = g_stop_fd.exchange(-1);
  if (fd >= 0) { shutdown(fd, SHUT_RDWR); close(fd); }
}

}  // extern "C"
