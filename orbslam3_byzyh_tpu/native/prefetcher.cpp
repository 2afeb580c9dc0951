// Multithreaded image prefetcher: the native data-loading runtime.
//
// Role parity: the reference's example mains load + convert images inline on
// the tracking thread (/root/reference/Examples/Monocular/mono_euroc.cc
// LoadImages + cv::imread in the main loop). Here decode happens on worker
// threads ahead of the consumer so the TPU stream never stalls on PNG
// decode; frames are delivered strictly in order.
//
// C ABI (ctypes-friendly):
//   pf_create(paths, n, n_threads, capacity, gray) -> handle
//   pf_frame_size(handle, index, &h, &w)  [after create; sizes from probe]
//   pf_next(handle, out_f32, h*w)        -> index (or -1 when exhausted)
//   pf_destroy(handle)

#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

#include <atomic>
#include <condition_variable>
#include <cstring>
#include <map>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
    int index = -1;
    cv::Mat img;  // CV_32F grayscale
};

struct Prefetcher {
    std::vector<std::string> paths;
    int capacity;
    bool gray;

    std::mutex mu;
    std::condition_variable cv_ready;
    std::condition_variable cv_space;
    std::map<int, cv::Mat> ready;      // decoded, waiting for delivery
    std::atomic<int> next_to_fetch{0}; // next index a worker grabs
    int next_to_deliver = 0;
    bool stop = false;
    std::vector<std::thread> workers;

    void worker() {
        for (;;) {
            int idx = next_to_fetch.fetch_add(1);
            if (idx >= static_cast<int>(paths.size())) return;
            cv::Mat raw = cv::imread(
                paths[idx], gray ? cv::IMREAD_GRAYSCALE : cv::IMREAD_COLOR);
            cv::Mat f32;
            if (raw.empty()) {
                f32 = cv::Mat();
            } else {
                if (!gray && raw.channels() == 3)
                    cv::cvtColor(raw, raw, cv::COLOR_BGR2GRAY);
                raw.convertTo(f32, CV_32F);
            }
            std::unique_lock<std::mutex> lk(mu);
            cv_space.wait(lk, [&] {
                return stop ||
                       static_cast<int>(ready.size()) < capacity ||
                       idx < next_to_deliver + capacity;
            });
            if (stop) return;
            ready.emplace(idx, std::move(f32));
            cv_ready.notify_all();
        }
    }
};

}  // namespace

extern "C" {

void* pf_create(const char** paths, int n, int n_threads, int capacity,
                int gray) {
    auto* p = new Prefetcher();
    p->paths.reserve(n);
    for (int i = 0; i < n; ++i) p->paths.emplace_back(paths[i]);
    p->capacity = capacity > 0 ? capacity : 8;
    p->gray = gray != 0;
    int workers = n_threads > 0 ? n_threads : 4;
    for (int i = 0; i < workers; ++i)
        p->workers.emplace_back(&Prefetcher::worker, p);
    return p;
}

// Returns the frame index delivered, -1 when the sequence is exhausted,
// -2 if the decoded image did not fit (h*w mismatch) or failed to decode.
int pf_next(void* handle, float* out, long long out_elems, int* out_h,
            int* out_w) {
    auto* p = static_cast<Prefetcher*>(handle);
    std::unique_lock<std::mutex> lk(p->mu);
    int idx = p->next_to_deliver;
    if (idx >= static_cast<int>(p->paths.size())) return -1;
    p->cv_ready.wait(lk, [&] { return p->ready.count(idx) > 0; });
    cv::Mat img = std::move(p->ready[idx]);
    p->ready.erase(idx);
    p->next_to_deliver = idx + 1;
    p->cv_space.notify_all();
    lk.unlock();

    if (img.empty()) return -2;
    *out_h = img.rows;
    *out_w = img.cols;
    long long need = static_cast<long long>(img.rows) * img.cols;
    if (need > out_elems) return -2;
    if (img.isContinuous()) {
        std::memcpy(out, img.ptr<float>(0), need * sizeof(float));
    } else {
        for (int r = 0; r < img.rows; ++r)
            std::memcpy(out + static_cast<long long>(r) * img.cols,
                        img.ptr<float>(r), img.cols * sizeof(float));
    }
    return idx;
}

void pf_destroy(void* handle) {
    auto* p = static_cast<Prefetcher*>(handle);
    {
        std::lock_guard<std::mutex> lk(p->mu);
        p->stop = true;
    }
    p->cv_space.notify_all();
    p->next_to_fetch.store(1 << 30);
    for (auto& t : p->workers) t.join();
    delete p;
}

}  // extern "C"
