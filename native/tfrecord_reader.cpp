// Native TFRecord scanner + protobuf field extractor (component C1 host side).
//
// The reference reads Waymo segments through tf.data's C++ TFRecord reader
// and the C++ protobuf runtime (SURVEY.md §2 C1 [INFERRED]); our Python
// framing walker (data/waymo.py) is correct but pays Python-interpreter cost
// per record — significant for the lazy per-chunk re-parse design (a real
// Waymo record is ~5 MB of proto). This shim does the byte scanning in C++:
//
//   w2t_tfr_index(path, offsets, lengths, cap)       -> record count
//       framing-only pass (12-byte header + seek over payload/CRC).
//   w2t_tfr_meta(path, f_ts, f_images, f_cam, f_img,
//                cam_ids, n_cams, out_ts, out_present, cap)
//       one sequential pass: per record, the top-level varint field f_ts
//       (timestamp) and, for each requested camera id, whether the repeated
//       LEN field f_images contains a submessage with varint f_cam == id
//       and non-empty LEN f_img (image presence).
//   w2t_tfr_extract(path, offset, length, f_images, f_cam, cam_id, f_img,
//                   dst, cap)
//       read ONE record and copy camera `cam_id`'s image bytes into dst.
//       dst == NULL -> returns the needed size. Returns -1 when absent,
//       -2 when dst is too small, -3 on IO error.
//
// Schema confinement: ALL field numbers are passed in from Python
// (data/waymo.py _FRAME_SCHEMA keeps the [RECALLED] numbers in one place);
// this file only implements wire-format walking (varint / i64 / LEN / i32),
// which is protobuf-spec, not Waymo-schema.
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct Cursor {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;

  uint64_t varint() {
    uint64_t v = 0;
    int shift = 0;
    while (p < end && shift < 64) {
      uint8_t b = *p++;
      v |= static_cast<uint64_t>(b & 0x7F) << shift;
      if (!(b & 0x80)) return v;
      shift += 7;
    }
    ok = false;
    return 0;
  }

  // Skips a field body of the given wire type. Returns false on malformed.
  bool skip(int wire_type) {
    switch (wire_type) {
      case 0: varint(); return ok;
      case 1: if (end - p < 8) { ok = false; return false; } p += 8; return true;
      case 2: {
        uint64_t n = varint();
        if (!ok || static_cast<uint64_t>(end - p) < n) { ok = false; return false; }
        p += n;
        return true;
      }
      case 5: if (end - p < 4) { ok = false; return false; } p += 4; return true;
      default: ok = false; return false;
    }
  }
};

// Finds camera `cam_id`'s image bytes inside one Frame payload.
// Returns length and sets *out to the bytes, or -1 if absent.
long long find_camera_image(const uint8_t* buf, long long len, int f_images,
                            int f_cam, uint64_t cam_id, int f_img,
                            const uint8_t** out) {
  Cursor c{buf, buf + len};
  while (c.p < c.end && c.ok) {
    uint64_t tag = c.varint();
    if (!c.ok) break;
    int field = static_cast<int>(tag >> 3);
    int wt = static_cast<int>(tag & 7);
    if (field == f_images && wt == 2) {
      uint64_t n = c.varint();
      if (!c.ok || static_cast<uint64_t>(c.end - c.p) < n) break;
      const uint8_t* sub = c.p;
      const uint8_t* sub_end = c.p + n;
      c.p += n;
      // walk the CameraImage submessage
      Cursor s{sub, sub_end};
      uint64_t name = 0;
      const uint8_t* img = nullptr;
      uint64_t img_len = 0;
      while (s.p < s.end && s.ok) {
        uint64_t stag = s.varint();
        if (!s.ok) break;
        int sfield = static_cast<int>(stag >> 3);
        int swt = static_cast<int>(stag & 7);
        if (sfield == f_cam && swt == 0) {
          name = s.varint();
        } else if (sfield == f_img && swt == 2) {
          uint64_t m = s.varint();
          if (!s.ok || static_cast<uint64_t>(s.end - s.p) < m) break;
          img = s.p;
          img_len = m;
          s.p += m;
        } else if (!s.skip(swt)) {
          break;
        }
      }
      if (name == cam_id && img != nullptr && img_len > 0) {
        *out = img;
        return static_cast<long long>(img_len);
      }
    } else if (!c.skip(wt)) {
      break;
    }
  }
  return -1;
}

// Reads the 12-byte TFRecord header at the current file position.
// Returns payload length, or -1 at EOF/short read/implausible length.
// `file_size` bounds the length claim: a corrupt/truncated/non-TFRecord
// file must fail with an error code, not feed a garbage length (e.g. 2^40)
// into a buffer allocation — a std::bad_alloc escaping the extern "C"
// boundary would std::terminate the whole Python process, while the Python
// fallback fails catchably.
long long read_header(FILE* f, long long file_size) {
  uint8_t hdr[12];
  long long pos = ftell(f);
  if (fread(hdr, 1, 12, f) != 12) return -1;
  uint64_t len;
  memcpy(&len, hdr, 8);  // little-endian framing; TPU hosts are LE
  if (pos < 0 || len > static_cast<uint64_t>(file_size - pos - 12)) return -1;
  return static_cast<long long>(len);
}

long long get_file_size(FILE* f) {
  if (fseek(f, 0, SEEK_END) != 0) return -1;
  long long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  return size;
}

}  // namespace

extern "C" {

long long w2t_tfr_index(const char* path, unsigned long long* offsets,
                        unsigned long long* lengths, long long cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return -3;
  long long file_size = get_file_size(f);
  long long n = 0;
  for (;;) {
    long long len = read_header(f, file_size);
    if (len < 0) break;
    long long pos = ftell(f);
    if (n < cap) {
      offsets[n] = static_cast<unsigned long long>(pos);
      lengths[n] = static_cast<unsigned long long>(len);
    }
    ++n;
    if (fseek(f, len + 4, SEEK_CUR) != 0) break;  // payload + data CRC
  }
  fclose(f);
  return n;
}

long long w2t_tfr_meta(const char* path, int f_ts, int f_images, int f_cam,
                       int f_img, const int* cam_ids, int n_cams,
                       long long* out_ts, unsigned char* out_present,
                       long long cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return -3;
  long long file_size = get_file_size(f);
  std::vector<uint8_t> buf;
  long long n = 0;
  for (;;) {
    long long len = read_header(f, file_size);
    if (len < 0) break;
    if (n >= cap) break;
    buf.resize(static_cast<size_t>(len));
    if (fread(buf.data(), 1, static_cast<size_t>(len), f)
        != static_cast<size_t>(len)) {
      break;
    }
    fseek(f, 4, SEEK_CUR);  // data CRC
    // timestamp: first top-level varint field f_ts
    out_ts[n] = 0;
    Cursor c{buf.data(), buf.data() + len};
    while (c.p < c.end && c.ok) {
      uint64_t tag = c.varint();
      if (!c.ok) break;
      int field = static_cast<int>(tag >> 3);
      int wt = static_cast<int>(tag & 7);
      if (field == f_ts && wt == 0) {
        out_ts[n] = static_cast<long long>(c.varint());
        break;
      }
      if (!c.skip(wt)) break;
    }
    for (int k = 0; k < n_cams; ++k) {
      const uint8_t* img = nullptr;
      long long got = find_camera_image(
          buf.data(), len, f_images, f_cam,
          static_cast<uint64_t>(cam_ids[k]), f_img, &img);
      out_present[n * n_cams + k] = got > 0 ? 1 : 0;
    }
    ++n;
  }
  fclose(f);
  return n;
}

long long w2t_tfr_extract(const char* path, unsigned long long offset,
                          unsigned long long length, int f_images, int f_cam,
                          unsigned long long cam_id, int f_img,
                          unsigned char* dst, long long cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return -3;
  long long file_size = get_file_size(f);
  if (static_cast<long long>(offset) > file_size ||
      static_cast<long long>(length) > file_size - static_cast<long long>(offset)) {
    fclose(f);
    return -3;  // caller-supplied position outside the file: corrupt index
  }
  if (fseek(f, static_cast<long>(offset), SEEK_SET) != 0) {
    fclose(f);
    return -3;
  }
  std::vector<uint8_t> buf(static_cast<size_t>(length));
  if (fread(buf.data(), 1, buf.size(), f) != buf.size()) {
    fclose(f);
    return -3;
  }
  fclose(f);
  const uint8_t* img = nullptr;
  long long got = find_camera_image(
      buf.data(), static_cast<long long>(length), f_images, f_cam, cam_id,
      f_img, &img);
  if (got < 0) return -1;
  if (dst == nullptr) return got;
  if (got > cap) return -2;
  memcpy(dst, img, static_cast<size_t>(got));
  return got;
}

}  // extern "C"
