// Reference replica harness: replay a dumped synthetic scene through the
// reference trackers (compiled verbatim from /root/reference/src) and write
// MOT-format results. Diagnostic only — lives in /tmp, never in the repo.
#include <motcpp/trackers/strongsort.hpp>
#include <motcpp/trackers/sort.hpp>
#include <motcpp/trackers/bytetrack.hpp>
#include <motcpp/trackers/ocsort.hpp>
#include <motcpp/trackers/deepocsort.hpp>
#include <motcpp/trackers/botsort.hpp>
#include <motcpp/trackers/boosttrack.hpp>
#include <motcpp/trackers/hybridsort.hpp>
#include <motcpp/trackers/ucmc.hpp>
#include <opencv2/opencv.hpp>
#include <cstdio>
#include <cstring>
#include <memory>
#include <string>
#include <vector>

int main(int argc, char** argv) {
    if (argc < 4) { fprintf(stderr, "usage: %s tracker scene.bin out.txt\n", argv[0]); return 2; }
    std::string method = argv[1];
    // "-noembs" suffix: feed empty embeddings (motion-only) — needed for
    // hybridsort, whose TCM+ReID leg computes emb_dists as (tracks x dets)
    // but adds it to a (dets x tracks) cost (hybridsort.cpp:752,997):
    // Eigen asserts on any non-square frame, so the reference cannot run
    // this scene with embeddings at all.
    bool noembs = false;
    const std::string sfx = "-noembs";
    if (method.size() > sfx.size() &&
        method.compare(method.size() - sfx.size(), sfx.size(), sfx) == 0) {
        noembs = true;
        method = method.substr(0, method.size() - sfx.size());
    }
    FILE* f = fopen(argv[2], "rb");
    if (!f) { perror("scene"); return 1; }
    char magic[4]; fread(magic, 1, 4, f);
    if (memcmp(magic, "MSCN", 4)) { fprintf(stderr, "bad magic\n"); return 1; }
    int32_t T, D; fread(&T, 4, 1, f); fread(&D, 4, 1, f);
    float fps = 30.0f;

    std::unique_ptr<motcpp::BaseTracker> tracker;
    // configs copied from the reference eval tool (tools/motcpp_eval.cpp:96-316)
    if (method == "sort") {
        tracker = std::make_unique<motcpp::trackers::Sort>(0.3f, 1, 50, 3, 0.3f, false, 80, "iou", false);
    } else if (method == "ucmc") {
        tracker = std::make_unique<motcpp::trackers::UCMCTrack>(0.3f, 30, 50, 3, 0.3f, false, 80, "iou", false,
            100.0, 100.0, 5.0, 5.0, 10.0, 1.0 / fps, 0.5f);
    } else if (method == "bytetrack") {
        tracker = std::make_unique<motcpp::trackers::ByteTrack>(0.3f, 30, 50, 3, 0.3f, false, 80, "iou", false,
            0.1f, 0.45f, 0.8f, 30, fps);
    } else if (method == "ocsort") {
        tracker = std::make_unique<motcpp::trackers::OCSort>(0.2f, 30, 50, 3, 0.3f, false, 80, "iou", false,
            0.1f, 3, 0.2f, false, 0.01f, 0.0001f);
    } else if (method == "deepocsort") {
        tracker = std::make_unique<motcpp::trackers::DeepOCSort>("", false, false,
            0.3f, 30, 50, 3, 0.3f, false, 80, "iou", false,
            3, 0.2f, 0.5f, 0.95f, 0.5f, false, false, false, 0.01f, 0.0001f);
    } else if (method == "strongsort") {
        tracker = std::make_unique<motcpp::trackers::StrongSORT>("", false, false,
            0.3f, 30, 50, 3, 0.3f, false, 80, "iou", false,
            0.6f, 0.4f, 0.7f, 3, 100, 0.98f, 0.9f);
    } else if (method == "strongsort-hppdef") {
        // header-default config (strongsort.hpp:305-324): min_conf=0.1, max_cos_dist=0.2
        tracker = std::make_unique<motcpp::trackers::StrongSORT>("", false, false,
            0.3f, 30, 50, 3, 0.3f, false, 80, "iou", false,
            0.1f, 0.2f, 0.7f, 3, 100, 0.98f, 0.9f);
    } else if (method == "botsort-noreid") {
        // eval-tool reality: with_reid = !reid_weights.empty() == false when
        // running from precomputed embeddings (motcpp_eval.cpp:245)
        tracker = std::make_unique<motcpp::trackers::BotSort>("", false, false,
            0.3f, 30, 50, 3, 0.3f, false, 80, "iou", false,
            0.6f, 0.1f, 0.7f, 30, 0.8f, 0.5f, 0.25f, "ecc", fps, false, false);
    } else if (method == "botsort") {
        tracker = std::make_unique<motcpp::trackers::BotSort>("", false, false,
            0.3f, 30, 50, 3, 0.3f, false, 80, "iou", false,
            0.6f, 0.1f, 0.7f, 30, 0.8f, 0.5f, 0.25f, "ecc", fps, false, true);
    } else if (method == "boosttrack-noreid") {
        tracker = std::make_unique<motcpp::trackers::BoostTrackTracker>("", false, false,
            0.6f, 60, 50, 3, 0.3f, false, 80, "iou", false,
            true, 10, 1.6f, "ecc", 0.5f, 0.25f, 0.25f,
            true, true, 0.65f, false, true, true, true, false);
    } else if (method == "boosttrack") {
        tracker = std::make_unique<motcpp::trackers::BoostTrackTracker>("", false, false,
            0.6f, 60, 50, 3, 0.3f, false, 80, "iou", false,
            true, 10, 1.6f, "ecc", 0.5f, 0.25f, 0.25f,
            true, true, 0.65f, false, true, true, true, true);
    } else if (method == "hybridsort" || method == "hybridsort-noreid") {
        // with_reid mirrors the eval tool's !reid_weights.empty()
        // (motcpp_eval.cpp:315): false when replaying precomputed embs
        tracker = std::make_unique<motcpp::trackers::HybridSort>("", false, false,
            0.5f, 30, 50, 3, 0.3f, false, 80, "hmiou", false,
            0.1f, 3, 0.05f, true, true, 30, 0.9f, false, 0.5f,
            4.6f, 1.3f, true, true, 1.0f, 0.7f, true, 0.0f,
            true, 0.4f, 0.4f, "ecc", method == "hybridsort");
    } else {
        fprintf(stderr, "unknown tracker %s\n", method.c_str());
        return 2;
    }

    cv::Mat img = cv::Mat::zeros(1080, 1920, CV_8UC3);
    FILE* out = fopen(argv[3], "w");
    std::vector<float> buf;
    for (int t = 1; t <= T; ++t) {
        int32_t n; fread(&n, 4, 1, f);
        Eigen::MatrixXf dets(n, 6), embs(n, D);
        buf.resize((size_t)n * 6);
        fread(buf.data(), 4, (size_t)n * 6, f);
        for (int i = 0; i < n; ++i)
            for (int j = 0; j < 6; ++j) dets(i, j) = buf[(size_t)i * 6 + j];
        buf.resize((size_t)n * D);
        fread(buf.data(), 4, (size_t)n * D, f);
        for (int i = 0; i < n; ++i)
            for (int j = 0; j < D; ++j) embs(i, j) = buf[(size_t)i * D + j];
        Eigen::MatrixXf res = tracker->update(
            dets, img, noembs ? Eigen::MatrixXf() : embs);
        for (int i = 0; i < res.rows(); ++i) {
            float x1 = res(i, 0), y1 = res(i, 1), x2 = res(i, 2), y2 = res(i, 3);
            fprintf(out, "%d,%d,%.2f,%.2f,%.2f,%.2f,%.4f,-1,-1,-1\n",
                    t, (int)res(i, 4), x1, y1, x2 - x1, y2 - y1, res(i, 5));
        }
        if (t % 100 == 0) fprintf(stderr, "frame %d/%d\n", t, T);
    }
    fclose(out); fclose(f);
    return 0;
}
