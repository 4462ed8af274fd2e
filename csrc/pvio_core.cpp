// Native sensor-runtime for pvio_tpu.
//
// C++ re-design of the reference's host hot path (pvio/src/pvio/core/
// core.cpp): gyro/accel stream pairing by linear interpolation
// (core.cpp:59-107), IMU-to-frame association with full-interval
// boundary seeding (core.cpp:129-141 — coverage fixed, see
// pvio_tpu/core/core.py), and IMU-rate pose prediction by forward
// integration (core.cpp:32-39, 143-164). These run at IMU rate (200+ Hz)
// per sample, where Python dispatch overhead dominates; the TPU compute
// path stays in JAX — this is the runtime *around* it.
//
// Plain C ABI for ctypes. Build: g++ -O2 -shared -fPIC -o libpviocore.so
// pvio_core.cpp

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <vector>

namespace {

struct Vec3 {
    double x, y, z;
};

struct Quat {  // (w, x, y, z)
    double w, x, y, z;
};

inline Quat qmul(const Quat &a, const Quat &b) {
    return {a.w * b.w - a.x * b.x - a.y * b.y - a.z * b.z,
            a.w * b.x + a.x * b.w + a.y * b.z - a.z * b.y,
            a.w * b.y - a.x * b.z + a.y * b.w + a.z * b.x,
            a.w * b.z + a.x * b.y - a.y * b.x + a.z * b.w};
}

inline Quat qexp(const Vec3 &v) {  // rotation vector -> quaternion
    double t2 = v.x * v.x + v.y * v.y + v.z * v.z;
    if (t2 < 1e-12) {
        return {1.0 - t2 / 8.0, 0.5 * v.x, 0.5 * v.y, 0.5 * v.z};
    }
    double t = std::sqrt(t2);
    double s = std::sin(0.5 * t) / t;
    return {std::cos(0.5 * t), s * v.x, s * v.y, s * v.z};
}

inline void qnormalize(Quat &q) {
    double n = std::sqrt(q.w * q.w + q.x * q.x + q.y * q.y + q.z * q.z);
    q.w /= n;
    q.x /= n;
    q.y /= n;
    q.z /= n;
}

inline Vec3 qrot(const Quat &q, const Vec3 &v) {
    // v + 2*(w*(u x v) + u x (u x v))
    Vec3 u{q.x, q.y, q.z};
    Vec3 uv{u.y * v.z - u.z * v.y, u.z * v.x - u.x * v.z, u.x * v.y - u.y * v.x};
    Vec3 uuv{u.y * uv.z - u.z * uv.y, u.z * uv.x - u.x * uv.z,
             u.x * uv.y - u.y * uv.x};
    return {v.x + 2.0 * (q.w * uv.x + uuv.x), v.y + 2.0 * (q.w * uv.y + uuv.y),
            v.z + 2.0 * (q.w * uv.z + uuv.z)};
}

constexpr double kGravity = -9.80665;

struct ImuSample {
    double t;
    Vec3 w;
    Vec3 a;
};

struct FramePending {
    int64_t id;
    double t;
};

struct SensorHub {
    std::deque<std::pair<double, Vec3>> gyro;
    std::deque<std::pair<double, Vec3>> accel;
    std::deque<ImuSample> fused;       // paired, not yet claimed by a frame
    std::deque<FramePending> frames;
    bool has_boundary = false;
    ImuSample boundary{};              // last sample consumed by a frame
    double last_frame_t = -1e300;
};

}  // namespace

namespace {

// pair while accel samples are bracketed by gyro (core.cpp:59-107)
void pair_streams(SensorHub *hub) {
    while (!hub->accel.empty() && hub->gyro.size() >= 2) {
        double ta = hub->accel.front().first;
        if (hub->gyro.front().first > ta) {
            hub->accel.pop_front();
            continue;
        }
        if (hub->gyro.back().first < ta) break;
        while (hub->gyro.size() >= 2 && hub->gyro[1].first <= ta) {
            hub->gyro.pop_front();
        }
        const auto &g0 = hub->gyro[0];
        const auto &g1 = hub->gyro.size() > 1 ? hub->gyro[1] : hub->gyro[0];
        double lam = (g1.first == g0.first)
                         ? 0.0
                         : (ta - g0.first) / (g1.first - g0.first);
        Vec3 w{g0.second.x * (1 - lam) + g1.second.x * lam,
               g0.second.y * (1 - lam) + g1.second.y * lam,
               g0.second.z * (1 - lam) + g1.second.z * lam};
        hub->fused.push_back({ta, w, hub->accel.front().second});
        hub->accel.pop_front();
    }
    // bound the unclaimed queue (no frames flowing => drop oldest)
    while (hub->fused.size() > 8192) hub->fused.pop_front();
}

}  // namespace

extern "C" {

void *hub_create() { return new SensorHub(); }

void hub_destroy(void *h) { delete static_cast<SensorHub *>(h); }

void hub_push_gyro(void *h, double t, double x, double y, double z) {
    auto *hub = static_cast<SensorHub *>(h);
    hub->gyro.push_back({t, {x, y, z}});
    pair_streams(hub);
}

void hub_push_accel(void *h, double t, double x, double y, double z) {
    auto *hub = static_cast<SensorHub *>(h);
    hub->accel.push_back({t, {x, y, z}});
    pair_streams(hub);
}

void hub_push_frame(void *h, int64_t id, double t) {
    auto *hub = static_cast<SensorHub *>(h);
    hub->frames.push_back({id, t});
}

// Poll the next complete frame. Returns the number of IMU samples written
// (>= 0) and fills id/t; returns -1 when no frame is ready. Buffers are
// caller-allocated with capacity `cap` (extra samples are dropped oldest-
// first, matching the fixed device buffer).
int64_t hub_poll_frame(void *h, int64_t *id, double *t, double *ts,
                       double *ws, double *as, int64_t cap) {
    auto *hub = static_cast<SensorHub *>(h);
    if (hub->frames.empty()) return -1;
    double ft = hub->frames.front().t;
    if (hub->fused.empty() || hub->fused.back().t < ft) return -1;

    std::vector<ImuSample> take;
    // seed with the boundary sample held at the previous frame time
    if (hub->has_boundary && hub->last_frame_t > -1e299 &&
        (!hub->fused.empty() && hub->fused.front().t > hub->last_frame_t)) {
        ImuSample b = hub->boundary;
        b.t = hub->last_frame_t;
        take.push_back(b);
    }
    while (!hub->fused.empty() && hub->fused.front().t <= ft) {
        take.push_back(hub->fused.front());
        hub->fused.pop_front();
    }
    if (!take.empty()) {
        hub->boundary = take.back();
        hub->has_boundary = true;
    }
    *id = hub->frames.front().id;
    *t = ft;
    hub->last_frame_t = ft;
    hub->frames.pop_front();

    int64_t n = static_cast<int64_t>(take.size());
    int64_t start = n > cap ? n - cap : 0;
    int64_t m = n - start;
    for (int64_t i = 0; i < m; ++i) {
        const ImuSample &s = take[start + i];
        ts[i] = s.t;
        ws[3 * i + 0] = s.w.x;
        ws[3 * i + 1] = s.w.y;
        ws[3 * i + 2] = s.w.z;
        as[3 * i + 0] = s.a.x;
        as[3 * i + 1] = s.a.y;
        as[3 * i + 2] = s.a.z;
    }
    return m;
}

// Forward-propagate state (q wxyz, p, v, bg, ba = 16 doubles) through the
// pending fused samples in (t0, t_now], writing pose (q wxyz, p = 7
// doubles). The queue is not consumed (core.cpp:143-164 frontal_imus).
void hub_predict(void *h, const double *state, double t0, double t_now,
                 double *pose_out) {
    auto *hub = static_cast<SensorHub *>(h);
    Quat q{state[0], state[1], state[2], state[3]};
    Vec3 p{state[4], state[5], state[6]};
    Vec3 v{state[7], state[8], state[9]};
    Vec3 bg{state[10], state[11], state[12]};
    Vec3 ba{state[13], state[14], state[15]};
    double t = t0;
    for (const auto &s : hub->fused) {
        if (s.t <= t0 || s.t > t_now) continue;
        double dt = s.t - t;
        if (dt <= 0) continue;
        Vec3 w{s.w.x - bg.x, s.w.y - bg.y, s.w.z - bg.z};
        Vec3 a{s.a.x - ba.x, s.a.y - ba.y, s.a.z - ba.z};
        Vec3 aw = qrot(q, a);
        aw.z += kGravity;
        p.x += dt * v.x + 0.5 * dt * dt * aw.x;
        p.y += dt * v.y + 0.5 * dt * dt * aw.y;
        p.z += dt * v.z + 0.5 * dt * dt * aw.z;
        v.x += dt * aw.x;
        v.y += dt * aw.y;
        v.z += dt * aw.z;
        q = qmul(q, qexp({w.x * dt, w.y * dt, w.z * dt}));
        qnormalize(q);
        t = s.t;
    }
    pose_out[0] = q.w;
    pose_out[1] = q.x;
    pose_out[2] = q.y;
    pose_out[3] = q.z;
    pose_out[4] = p.x;
    pose_out[5] = p.y;
    pose_out[6] = p.z;
}

int64_t hub_fused_count(void *h) {
    return static_cast<int64_t>(static_cast<SensorHub *>(h)->fused.size());
}

// --- TUM trajectory writer (output_writer.h:26-51) ---

void *tum_open(const char *path) { return std::fopen(path, "w"); }

void tum_write(void *f, double t, const double *q_wxyz, const double *p) {
    std::fprintf(static_cast<FILE *>(f), "%.9f %.9f %.9f %.9f %.9f %.9f %.9f %.9f\n",
                 t, p[0], p[1], p[2], q_wxyz[1], q_wxyz[2], q_wxyz[3], q_wxyz[0]);
    std::fflush(static_cast<FILE *>(f));  // per-pose flush (output_writer.h:49)
}

void tum_close(void *f) { std::fclose(static_cast<FILE *>(f)); }

}  // extern "C"
