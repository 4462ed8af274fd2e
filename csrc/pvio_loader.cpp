// Native dataset loader for pvio_tpu.
//
// C++ re-design of the reference's dataset-reader runtime
// (pvio-pc/src/euroc_dataset_reader.cpp:21-104, dataset_reader.cpp:34-46):
// ASL/EuRoC directory parsing (cam0/imu0 data.csv, ns -> s), time-sorted
// event merge with the reference's tie-break (gyro, accel, camera at
// equal t), grayscale image decoding (PNG via libpng, PGM/P5, and raw
// .npy uint8), and a BACKGROUND PREFETCH THREAD that decodes ahead of the
// consumer — the data-loader never stalls the tracking pipeline on disk
// or zlib work.
//
// Plain C ABI for ctypes. Build:
//   g++ -O2 -shared -fPIC -std=c++17 -o libpvioloader.so pvio_loader.cpp -lpng -lz -lpthread

#include <png.h>

#include <algorithm>
#include <atomic>
#include <cctype>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <fstream>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

namespace {

struct ImuRow {
    double t;
    double w[3];
    double a[3];
};

struct CamRow {
    double t;
    std::string path;
};

struct Image {
    int width = 0;
    int height = 0;
    std::vector<uint8_t> gray;
    bool ok = false;
};

// ---------------------------------------------------------------------------
// image decoding
// ---------------------------------------------------------------------------

Image decode_png(const std::string &path) {
    Image out;
    FILE *fp = std::fopen(path.c_str(), "rb");
    if (!fp) return out;
    png_byte header[8];
    if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
        std::fclose(fp);
        return out;
    }
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (!png || !info || setjmp(png_jmpbuf(png))) {
        if (png) png_destroy_read_struct(&png, &info, nullptr);
        std::fclose(fp);
        return out;
    }
    png_init_io(png, fp);
    png_set_sig_bytes(png, 8);
    png_read_info(png, info);

    // normalize every color type to 8-bit grayscale
    png_byte color = png_get_color_type(png, info);
    png_byte depth = png_get_bit_depth(png, info);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (depth == 16) png_set_strip_16(png);
    if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
    if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
        color == PNG_COLOR_TYPE_PALETTE) {
        // ITU-R BT.601 luma, same as cv::IMREAD_GRAYSCALE / PIL convert("L")
        png_set_rgb_to_gray_fixed(png, 1, 29900, 58700);
    }
    png_read_update_info(png, info);

    out.width = static_cast<int>(png_get_image_width(png, info));
    out.height = static_cast<int>(png_get_image_height(png, info));
    out.gray.resize(static_cast<size_t>(out.width) * out.height);
    std::vector<png_bytep> rows(out.height);
    for (int y = 0; y < out.height; y++) {
        rows[y] = out.gray.data() + static_cast<size_t>(y) * out.width;
    }
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    out.ok = true;
    return out;
}

Image decode_pgm(const std::string &path) {
    Image out;
    std::ifstream f(path, std::ios::binary);
    if (!f) return out;
    std::string magic;
    f >> magic;
    if (magic != "P5") return out;
    auto next_int = [&f]() {
        int c;
        // skip whitespace + comments
        while ((c = f.peek()) != EOF && (std::isspace(c) || c == '#')) {
            if (c == '#') {
                std::string line;
                std::getline(f, line);
            } else {
                f.get();
            }
        }
        int v;
        f >> v;
        return v;
    };
    int w = next_int(), h = next_int(), maxv = next_int();
    f.get();  // single whitespace after maxval
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 65535) return out;
    out.width = w;
    out.height = h;
    out.gray.resize(static_cast<size_t>(w) * h);
    if (maxv < 256) {
        f.read(reinterpret_cast<char *>(out.gray.data()), out.gray.size());
    } else {
        std::vector<uint8_t> raw(out.gray.size() * 2);
        f.read(reinterpret_cast<char *>(raw.data()), raw.size());
        for (size_t i = 0; i < out.gray.size(); i++) {
            // big-endian 16-bit sample scaled by maxval (not just the high
            // byte — that is only correct for maxval == 65535)
            uint32_t v16 = (static_cast<uint32_t>(raw[2 * i]) << 8) | raw[2 * i + 1];
            out.gray[i] = static_cast<uint8_t>((v16 * 255 + maxv / 2) / maxv);
        }
    }
    out.ok = static_cast<bool>(f);
    return out;
}

Image decode_npy(const std::string &path) {
    // minimal NPY v1 reader for ('<u1'|'|u1'|'<f4'|'<f8') C-order 2-D arrays
    Image out;
    std::ifstream f(path, std::ios::binary);
    if (!f) return out;
    char magic[6];
    f.read(magic, 6);
    if (std::memcmp(magic, "\x93NUMPY", 6) != 0) return out;
    uint8_t ver[2];
    f.read(reinterpret_cast<char *>(ver), 2);
    uint32_t hlen = 0;
    if (ver[0] == 1) {
        uint16_t h16;
        f.read(reinterpret_cast<char *>(&h16), 2);
        hlen = h16;
    } else {
        f.read(reinterpret_cast<char *>(&hlen), 4);
    }
    std::string header(hlen, '\0');
    f.read(header.data(), hlen);
    auto find_shape = [&header]() {
        std::pair<long, long> s{-1, -1};
        auto p = header.find("'shape':");
        if (p == std::string::npos) return s;
        p = header.find('(', p);
        if (p == std::string::npos) return s;
        std::sscanf(header.c_str() + p, "(%ld, %ld", &s.first, &s.second);
        return s;
    };
    auto [h, w] = find_shape();
    if (h <= 0 || w <= 0 || header.find("'fortran_order': True") != std::string::npos)
        return out;
    out.height = static_cast<int>(h);
    out.width = static_cast<int>(w);
    size_t n = static_cast<size_t>(h) * w;
    out.gray.resize(n);
    // float arrays: decide the [0,1]-vs-[0,255] range question on the
    // GLOBAL max, exactly like the Python reader (datasets._load_image) —
    // a per-pixel heuristic would blow dark pixels of a 0-255 image up
    auto store_float = [&](auto const &buf) {
        double mx = 0.0;
        for (size_t i = 0; i < n; i++) mx = std::max(mx, static_cast<double>(buf[i]));
        const double scale = (mx <= 1.5) ? 255.0 : 1.0;
        for (size_t i = 0; i < n; i++) {
            double v = static_cast<double>(buf[i]) * scale;
            out.gray[i] = static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v + 0.5));
        }
    };
    if (header.find("u1'") != std::string::npos) {
        f.read(reinterpret_cast<char *>(out.gray.data()), n);
    } else if (header.find("<f4'") != std::string::npos) {
        std::vector<float> buf(n);
        f.read(reinterpret_cast<char *>(buf.data()), n * 4);
        store_float(buf);
    } else if (header.find("<f8'") != std::string::npos) {
        std::vector<double> buf(n);
        f.read(reinterpret_cast<char *>(buf.data()), n * 8);
        store_float(buf);
    } else {
        return out;
    }
    out.ok = static_cast<bool>(f);
    return out;
}

Image decode_image(const std::string &path) {
    auto dot = path.rfind('.');
    std::string ext = dot == std::string::npos ? "" : path.substr(dot);
    for (auto &c : ext) c = static_cast<char>(std::tolower(c));
    if (ext == ".png") return decode_png(path);
    if (ext == ".pgm") return decode_pgm(path);
    if (ext == ".npy") return decode_npy(path);
    // try by magic
    Image img = decode_png(path);
    if (img.ok) return img;
    img = decode_pgm(path);
    if (img.ok) return img;
    return decode_npy(path);
}

// ---------------------------------------------------------------------------
// CSV parsing (EuRoC ASL layout)
// ---------------------------------------------------------------------------

bool parse_imu_csv(const std::string &path, std::vector<ImuRow> &rows) {
    std::ifstream f(path);
    if (!f) return false;
    std::string line;
    while (std::getline(f, line)) {
        if (line.empty() || line[0] == '#') continue;
        ImuRow r;
        long long ns;
        if (std::sscanf(line.c_str(), "%lld,%lf,%lf,%lf,%lf,%lf,%lf", &ns,
                        &r.w[0], &r.w[1], &r.w[2], &r.a[0], &r.a[1], &r.a[2]) == 7) {
            r.t = static_cast<double>(ns) * 1e-9;
            rows.push_back(r);
        }
    }
    return !rows.empty();
}

bool parse_cam_csv(const std::string &path, const std::string &data_dir,
                   std::vector<CamRow> &rows) {
    std::ifstream f(path);
    if (!f) return false;
    std::string line;
    while (std::getline(f, line)) {
        if (line.empty() || line[0] == '#') continue;
        auto comma = line.find(',');
        if (comma == std::string::npos) continue;
        long long ns = std::atoll(line.substr(0, comma).c_str());
        std::string name = line.substr(comma + 1);
        // trim whitespace/CR
        while (!name.empty() && (std::isspace(static_cast<unsigned char>(name.back()))))
            name.pop_back();
        while (!name.empty() && std::isspace(static_cast<unsigned char>(name.front())))
            name.erase(name.begin());
        if (name.empty()) continue;
        rows.push_back({static_cast<double>(ns) * 1e-9, data_dir + "/" + name});
    }
    return !rows.empty();
}

// ---------------------------------------------------------------------------
// loader with prefetch thread
// ---------------------------------------------------------------------------

struct Event {
    double t;
    int prio;   // 0 gyro, 1 accel, 2 camera (reference tie-break)
    int imu_i;  // index into imu rows (gyro/accel)
    int cam_i;  // index into cam rows
};

struct Loader {
    std::vector<ImuRow> imu;
    std::vector<CamRow> cam;
    std::vector<Event> events;
    size_t cursor = 0;

    // prefetch
    std::thread worker;
    std::mutex mu;
    std::condition_variable cv_full, cv_empty;
    std::deque<std::pair<int, Image>> queue;  // (cam_i, image)
    size_t queue_cap = 4;
    std::atomic<bool> stop{false};
    Image last;  // stashed when the caller's buffer was too small

    ~Loader() {
        stop = true;
        cv_full.notify_all();
        cv_empty.notify_all();
        if (worker.joinable()) worker.join();
    }

    void start_prefetch() {
        worker = std::thread([this]() {
            for (size_t i = 0; i < cam.size() && !stop; i++) {
                Image img = decode_image(cam[i].path);
                std::unique_lock<std::mutex> lk(mu);
                cv_full.wait(lk, [this]() { return queue.size() < queue_cap || stop; });
                if (stop) return;
                queue.emplace_back(static_cast<int>(i), std::move(img));
                cv_empty.notify_one();
            }
        });
    }

    bool pop_image(int cam_i, Image &out) {
        std::unique_lock<std::mutex> lk(mu);
        cv_empty.wait(lk, [this]() { return !queue.empty() || stop; });
        if (queue.empty()) return false;
        auto &front = queue.front();
        if (front.first != cam_i) return false;  // consumer out of order
        out = std::move(front.second);
        queue.pop_front();
        cv_full.notify_one();
        return true;
    }
};

bool exists(const std::string &p) {
    std::ifstream f(p);
    return static_cast<bool>(f);
}

}  // namespace

extern "C" {

void *loader_open(const char *root_c) {
    std::string root(root_c);
    if (exists(root + "/mav0/imu0/data.csv")) root += "/mav0";
    auto *L = new Loader();
    if (!parse_imu_csv(root + "/imu0/data.csv", L->imu) ||
        !parse_cam_csv(root + "/cam0/data.csv", root + "/cam0/data", L->cam)) {
        delete L;
        return nullptr;
    }
    // the prefetch thread decodes in cam-row order while events are
    // time-sorted — sort the rows first so decode order always matches
    // consumption order even for unsorted CSVs
    std::stable_sort(L->cam.begin(), L->cam.end(),
                     [](const CamRow &a, const CamRow &b) { return a.t < b.t; });
    std::stable_sort(L->imu.begin(), L->imu.end(),
                     [](const ImuRow &a, const ImuRow &b) { return a.t < b.t; });
    L->events.reserve(L->imu.size() * 2 + L->cam.size());
    for (size_t i = 0; i < L->imu.size(); i++) {
        L->events.push_back({L->imu[i].t, 0, static_cast<int>(i), -1});
        L->events.push_back({L->imu[i].t, 1, static_cast<int>(i), -1});
    }
    for (size_t i = 0; i < L->cam.size(); i++) {
        L->events.push_back({L->cam[i].t, 2, -1, static_cast<int>(i)});
    }
    std::stable_sort(L->events.begin(), L->events.end(),
                     [](const Event &a, const Event &b) {
                         return a.t != b.t ? a.t < b.t : a.prio < b.prio;
                     });
    L->start_prefetch();
    return L;
}

void loader_close(void *h) { delete static_cast<Loader *>(h); }

// Reset to the first event and restart the prefetch thread, so a stream
// can be replayed (EurocDatasetReader replays on every iteration).
void loader_rewind(void *h) {
    auto *L = static_cast<Loader *>(h);
    L->stop = true;
    L->cv_full.notify_all();
    L->cv_empty.notify_all();
    if (L->worker.joinable()) L->worker.join();
    L->queue.clear();
    L->last = Image();
    L->cursor = 0;
    L->stop = false;
    L->start_prefetch();
}

int64_t loader_counts(void *h, int64_t *n_imu, int64_t *n_cam) {
    auto *L = static_cast<Loader *>(h);
    *n_imu = static_cast<int64_t>(L->imu.size());
    *n_cam = static_cast<int64_t>(L->cam.size());
    return static_cast<int64_t>(L->events.size());
}

// Returns event kind: 0 gyro, 1 accel, 2 camera, -1 end, -2 decode error.
// For kind 0/1: *t and vec3[0..2] are filled.
// For kind 2: *t, *width, *height filled and the grayscale uint8 image is
// copied into img_buf (capacity bytes); if the image is larger than the
// capacity, returns -3 (caller re-sizes and calls loader_retry_image).
int loader_next(void *h, double *t, double *vec3, uint8_t *img_buf,
                int64_t capacity, int64_t *width, int64_t *height) {
    auto *L = static_cast<Loader *>(h);
    if (!L) return -1;  // closed handle: end-of-stream, not a segfault
    if (L->cursor >= L->events.size()) return -1;
    const Event ev = L->events[L->cursor++];
    *t = ev.t;
    if (ev.prio == 0) {
        std::memcpy(vec3, L->imu[ev.imu_i].w, 3 * sizeof(double));
        return 0;
    }
    if (ev.prio == 1) {
        std::memcpy(vec3, L->imu[ev.imu_i].a, 3 * sizeof(double));
        return 1;
    }
    Image img;
    if (!L->pop_image(ev.cam_i, img) || !img.ok) return -2;
    *width = img.width;
    *height = img.height;
    int64_t n = static_cast<int64_t>(img.gray.size());
    if (n > capacity) {
        L->last = std::move(img);  // retrievable via loader_fetch_last
        return -3;
    }
    std::memcpy(img_buf, img.gray.data(), static_cast<size_t>(n));
    return 2;
}

// Copy the image stashed by a -3 return into a (now large enough) buffer.
int loader_fetch_last(void *h, uint8_t *img_buf, int64_t capacity) {
    auto *L = static_cast<Loader *>(h);
    int64_t n = static_cast<int64_t>(L->last.gray.size());
    if (!L->last.ok || n == 0 || n > capacity) return -1;
    std::memcpy(img_buf, L->last.gray.data(), static_cast<size_t>(n));
    L->last = Image();
    return 0;
}

}  // extern "C"
