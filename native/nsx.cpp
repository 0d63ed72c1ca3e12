// NSX — neural stream exchange: a small native pub/sub transport.
//
// Plays the role liblsl (C++) plays for the reference system: named, typed,
// timestamped sample streams between processes (amplifier -> decoder ->
// experiment GUI), resolvable by name.  The reference reaches liblsl through
// pylsl (livenodes/lsl_socket.py, dev_lsl_streamer.py, local/marker.py);
// this image has no liblsl, so the framework ships its own transport with
// the same semantics for loopback/LAN use, exposed to Python via ctypes
// (closed_loop_seeg_speech_synthesis_tpu/runtime/nsx.py).
//
// Design: one TCP listener per outlet on 127.0.0.1 (configurable via
// NSX_BIND), a JSON registry file per stream under $NSX_REGISTRY_DIR
// (default /tmp/nsx) for resolution, length-prefixed frames
// [u8 kind][u32 payload][f64 timestamp][payload bytes] where numeric
// payloads are float32 sample-major chunks.  Outlets broadcast to all
// connected subscribers from a writer thread; slow subscribers are dropped
// rather than allowed to stall the producer (same latency-over-completeness
// policy as the reference's bounded audio pipes, JackAudioSink.py:111-118).

#include <arpa/inet.h>
#include <cerrno>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <ctime>
#include <fcntl.h>
#include <mutex>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <poll.h>
#include <string>
#include <sys/socket.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>
#include <atomic>

namespace {

constexpr uint8_t KIND_NUMERIC = 0;
constexpr uint8_t KIND_STRING = 1;

std::string registry_dir() {
    const char* d = getenv("NSX_REGISTRY_DIR");
    return d ? d : "/tmp/nsx";
}

double monotonic_clock() {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + ts.tv_nsec * 1e-9;
}

bool send_all(int fd, const void* buf, size_t n) {
    const char* p = static_cast<const char*>(buf);
    while (n > 0) {
        ssize_t w = ::send(fd, p, n, MSG_NOSIGNAL);
        if (w <= 0) return false;
        p += w;
        n -= static_cast<size_t>(w);
    }
    return true;
}

// 1 = ok, 0 = timeout (no bytes consumed yet), -1 = connection closed/error.
int recv_all(int fd, void* buf, size_t n, double timeout_s) {
    char* p = static_cast<char*>(buf);
    bool started = false;
    while (n > 0) {
        struct pollfd pfd{fd, POLLIN, 0};
        int pr = ::poll(&pfd, 1, timeout_s < 0 ? -1 : static_cast<int>(timeout_s * 1000));
        if (pr <= 0) return started ? -1 : 0;  // mid-message timeout = broken peer
        ssize_t r = ::recv(fd, p, n, 0);
        if (r <= 0) return -1;  // EOF or error, NOT a timeout
        started = true;
        p += r;
        n -= static_cast<size_t>(r);
    }
    return 1;
}

// Send with a stall budget: on EAGAIN, wait for writability up to the
// remaining budget; a subscriber that stays blocked past it is dropped
// (latency-over-completeness, like the reference's bounded audio pipes).
bool send_all_budget(int fd, const void* buf, size_t n, double budget_s) {
    const char* p = static_cast<const char*>(buf);
    double deadline = monotonic_clock() + budget_s;
    while (n > 0) {
        ssize_t w = ::send(fd, p, n, MSG_NOSIGNAL | MSG_DONTWAIT);
        if (w > 0) {
            p += w;
            n -= static_cast<size_t>(w);
            continue;
        }
        if (w < 0 && (errno == EAGAIN || errno == EWOULDBLOCK)) {
            double left = deadline - monotonic_clock();
            if (left <= 0) return false;
            struct pollfd pfd{fd, POLLOUT, 0};
            if (::poll(&pfd, 1, static_cast<int>(left * 1000) + 1) <= 0) return false;
            continue;
        }
        return false;
    }
    return true;
}

struct Outlet {
    std::string name;
    int listen_fd = -1;
    int port = 0;
    int channels = 1;
    std::vector<int> subs;
    std::mutex mu;
    std::thread acceptor;
    std::atomic<bool> stop{false};
    std::string reg_path;

    ~Outlet() {
        stop = true;
        if (listen_fd >= 0) {
            ::shutdown(listen_fd, SHUT_RDWR);
            ::close(listen_fd);
        }
        if (acceptor.joinable()) acceptor.join();
        std::lock_guard<std::mutex> g(mu);
        for (int fd : subs) ::close(fd);
        if (!reg_path.empty()) ::unlink(reg_path.c_str());
    }

    std::vector<std::thread> ctl_threads;

    // Control connections serve clock-offset probes (the LSL
    // time-correction equivalent): client sends 8-byte t_send, server
    // replies (t_send, t_server_monotonic).
    void control_loop(int fd) {
        while (!stop) {
            double t_send;
            if (recv_all(fd, &t_send, 8, 0.5) != 1) {
                struct pollfd pfd{fd, POLLIN | POLLHUP, 0};
                if (::poll(&pfd, 1, 0) > 0 && (pfd.revents & (POLLHUP | POLLERR))) break;
                continue;
            }
            double reply[2] = {t_send, monotonic_clock()};
            if (!send_all(fd, reply, sizeof(reply))) break;
        }
        ::close(fd);
    }

    void accept_loop() {
        while (!stop) {
            struct pollfd pfd{listen_fd, POLLIN, 0};
            if (::poll(&pfd, 1, 200) <= 0) continue;
            int fd = ::accept(listen_fd, nullptr, nullptr);
            if (fd < 0) continue;
            int one = 1;
            ::setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
            char hello = 'D';
            if (recv_all(fd, &hello, 1, 2.0) != 1) {
                ::close(fd);
                continue;
            }
            if (hello == 'C') {
                ctl_threads.emplace_back([this, fd] { control_loop(fd); });
            } else {
                std::lock_guard<std::mutex> g(mu);
                subs.push_back(fd);
            }
        }
        for (auto& t : ctl_threads) {
            if (t.joinable()) t.join();
        }
    }

    bool broadcast(uint8_t kind, double ts, const void* payload, uint32_t bytes) {
        const double budget = 1.0;  // seconds of stall before a subscriber is dropped
        std::lock_guard<std::mutex> g(mu);
        for (size_t i = 0; i < subs.size();) {
            int fd = subs[i];
            bool ok = send_all_budget(fd, &kind, 1, budget) &&
                      send_all_budget(fd, &bytes, 4, budget) &&
                      send_all_budget(fd, &ts, 8, budget) &&
                      send_all_budget(fd, payload, bytes, budget);
            if (!ok) {
                ::close(fd);
                subs.erase(subs.begin() + i);
            } else {
                ++i;
            }
        }
        return true;
    }
};

struct Inlet {
    int fd = -1;
    int ctl_fd = -1;
    int port = 0;
    int channels = 1;
    double srate = 0.0;
    std::string type;
    ~Inlet() {
        if (fd >= 0) ::close(fd);
        if (ctl_fd >= 0) ::close(ctl_fd);
    }
};

int connect_to(int port, double timeout_s) {
    int fd = ::socket(AF_INET, SOCK_STREAM, 0);
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    const char* ip = getenv("NSX_CONNECT");
    addr.sin_addr.s_addr = inet_addr(ip ? ip : "127.0.0.1");
    addr.sin_port = htons(static_cast<uint16_t>(port));
    double deadline = monotonic_clock() + timeout_s;
    while (::connect(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0) {
        if (monotonic_clock() > deadline) {
            ::close(fd);
            return -1;
        }
        ::usleep(50 * 1000);
    }
    int one = 1;
    ::setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
    return fd;
}

}  // namespace

extern "C" {

double nsx_local_clock() { return monotonic_clock(); }

void* nsx_outlet_create(const char* name, const char* type, int channels, double srate,
                        int is_string) {
    auto* o = new Outlet();
    o->name = name;
    o->channels = channels;
    o->listen_fd = ::socket(AF_INET, SOCK_STREAM, 0);
    if (o->listen_fd < 0) { delete o; return nullptr; }
    int one = 1;
    ::setsockopt(o->listen_fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    const char* bind_ip = getenv("NSX_BIND");
    addr.sin_addr.s_addr = inet_addr(bind_ip ? bind_ip : "127.0.0.1");
    addr.sin_port = 0;
    if (::bind(o->listen_fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0 ||
        ::listen(o->listen_fd, 16) != 0) {
        delete o;
        return nullptr;
    }
    socklen_t len = sizeof(addr);
    ::getsockname(o->listen_fd, reinterpret_cast<sockaddr*>(&addr), &len);
    o->port = ntohs(addr.sin_port);

    std::string dir = registry_dir();
    ::mkdir(dir.c_str(), 0777);
    o->reg_path = dir + "/" + std::string(name) + ".json";
    std::string tmp = o->reg_path + ".tmp";
    FILE* f = ::fopen(tmp.c_str(), "w");
    if (!f) { delete o; return nullptr; }
    ::fprintf(f,
              "{\"name\": \"%s\", \"type\": \"%s\", \"port\": %d, \"channels\": %d, "
              "\"srate\": %.9g, \"fmt\": \"%s\"}\n",
              name, type, o->port, channels, srate, is_string ? "string" : "float32");
    ::fclose(f);
    ::rename(tmp.c_str(), o->reg_path.c_str());

    o->acceptor = std::thread([o] { o->accept_loop(); });
    return o;
}

int nsx_outlet_push(void* outlet, const float* data, int n_samples, double timestamp) {
    auto* o = static_cast<Outlet*>(outlet);
    if (timestamp <= 0) timestamp = monotonic_clock();
    uint32_t bytes = static_cast<uint32_t>(n_samples * o->channels * sizeof(float));
    return o->broadcast(KIND_NUMERIC, timestamp, data, bytes) ? n_samples : -1;
}

int nsx_outlet_push_str(void* outlet, const char* s, double timestamp) {
    auto* o = static_cast<Outlet*>(outlet);
    if (timestamp <= 0) timestamp = monotonic_clock();
    return o->broadcast(KIND_STRING, timestamp, s, static_cast<uint32_t>(strlen(s))) ? 0 : -1;
}

int nsx_outlet_subscriber_count(void* outlet) {
    auto* o = static_cast<Outlet*>(outlet);
    std::lock_guard<std::mutex> g(o->mu);
    return static_cast<int>(o->subs.size());
}

void nsx_outlet_destroy(void* outlet) { delete static_cast<Outlet*>(outlet); }

void* nsx_inlet_open(const char* name, double timeout_s) {
    std::string path = registry_dir() + "/" + std::string(name) + ".json";
    double deadline = monotonic_clock() + timeout_s;
    std::string content;
    while (true) {
        FILE* f = ::fopen(path.c_str(), "r");
        if (f) {
            char buf[1024];
            size_t n = ::fread(buf, 1, sizeof(buf) - 1, f);
            ::fclose(f);
            buf[n] = 0;
            content = buf;
            break;
        }
        if (monotonic_clock() > deadline) return nullptr;
        ::usleep(50 * 1000);
    }
    // minimal JSON field extraction (fixed writer format above)
    auto find_num = [&](const char* key) -> double {
        size_t p = content.find(key);
        if (p == std::string::npos) return 0.0;
        p = content.find(':', p);
        return ::atof(content.c_str() + p + 1);
    };
    auto find_str = [&](const char* key) -> std::string {
        size_t p = content.find(key);
        if (p == std::string::npos) return "";
        p = content.find(':', p);
        p = content.find('"', p);
        size_t e = content.find('"', p + 1);
        return content.substr(p + 1, e - p - 1);
    };
    int port = static_cast<int>(find_num("\"port\""));
    auto* in = new Inlet();
    in->port = port;
    in->channels = static_cast<int>(find_num("\"channels\""));
    in->srate = find_num("\"srate\"");
    in->type = find_str("\"type\"");

    in->fd = connect_to(port, deadline - monotonic_clock() + 0.1);
    if (in->fd < 0) { delete in; return nullptr; }
    char hello = 'D';
    if (!send_all(in->fd, &hello, 1)) { delete in; return nullptr; }
    return in;
}

// Clock-offset estimate to the stream's producer (LSL time_correction
// equivalent): N ping/pong probes over a control connection; the probe with
// the smallest RTT gives offset = t_server - (t_send + rtt/2).  Returns the
// offset to ADD to received timestamps; NAN on failure.
double nsx_inlet_time_correction(void* inlet, int n_probes, double timeout_s) {
    auto* in = static_cast<Inlet*>(inlet);
    if (in->ctl_fd < 0) {
        in->ctl_fd = connect_to(in->port, timeout_s);
        if (in->ctl_fd < 0) return NAN;
        char hello = 'C';
        if (!send_all(in->ctl_fd, &hello, 1)) return NAN;
    }
    double best_rtt = 1e18, best_offset = NAN;
    for (int i = 0; i < n_probes; ++i) {
        double t0 = monotonic_clock();
        if (!send_all(in->ctl_fd, &t0, 8)) return best_offset;
        double reply[2];
        if (recv_all(in->ctl_fd, reply, sizeof(reply), timeout_s) != 1) return best_offset;
        double t1 = monotonic_clock();
        double rtt = t1 - reply[0];
        if (rtt < best_rtt) {
            best_rtt = rtt;
            best_offset = reply[1] - (reply[0] + rtt / 2.0);
        }
    }
    return best_offset;
}

int nsx_inlet_info(void* inlet, int* channels, double* srate, char* type_buf, int type_len) {
    auto* in = static_cast<Inlet*>(inlet);
    if (channels) *channels = in->channels;
    if (srate) *srate = in->srate;
    if (type_buf && type_len > 0) {
        ::snprintf(type_buf, static_cast<size_t>(type_len), "%s", in->type.c_str());
    }
    return 0;
}

// Returns number of samples written to buf (numeric streams), 0 on timeout,
// -1 on disconnect/error.  One wire frame per call.
int nsx_inlet_pull(void* inlet, float* buf, int max_samples, double* ts_out, double timeout_s) {
    auto* in = static_cast<Inlet*>(inlet);
    uint8_t kind;
    uint32_t bytes;
    double ts;
    int rc = recv_all(in->fd, &kind, 1, timeout_s);
    if (rc <= 0) return rc;  // 0 timeout, -1 closed
    if (recv_all(in->fd, &bytes, 4, 5.0) != 1 || recv_all(in->fd, &ts, 8, 5.0) != 1) return -1;
    if (ts_out) *ts_out = ts;
    int n = static_cast<int>(bytes / (in->channels * sizeof(float)));
    if (kind != KIND_NUMERIC || n > max_samples) {
        // drain and drop oversized/mistyped frames
        std::vector<char> sink(bytes);
        recv_all(in->fd, sink.data(), bytes, 5.0);
        return kind != KIND_NUMERIC ? -2 : 0;
    }
    if (recv_all(in->fd, buf, bytes, 5.0) != 1) return -1;
    return n;
}

int nsx_inlet_pull_str(void* inlet, char* buf, int buf_len, double* ts_out, double timeout_s) {
    auto* in = static_cast<Inlet*>(inlet);
    uint8_t kind;
    uint32_t bytes;
    double ts;
    int rc = recv_all(in->fd, &kind, 1, timeout_s);
    if (rc <= 0) return rc;
    if (recv_all(in->fd, &bytes, 4, 5.0) != 1 || recv_all(in->fd, &ts, 8, 5.0) != 1) return -1;
    if (ts_out) *ts_out = ts;
    std::vector<char> tmp(bytes);
    if (recv_all(in->fd, tmp.data(), bytes, 5.0) != 1) return -1;
    if (kind != KIND_STRING) return -2;
    int n = static_cast<int>(bytes) < buf_len - 1 ? static_cast<int>(bytes) : buf_len - 1;
    ::memcpy(buf, tmp.data(), static_cast<size_t>(n));
    buf[n] = 0;
    return n;
}

void nsx_inlet_destroy(void* inlet) { delete static_cast<Inlet*>(inlet); }

}  // extern "C"
