// Replica-harness shim: non-throwing ONNXBackend so trackers that
// construct it unconditionally (deepocsort.cpp:550) can run with
// precomputed embeddings. get_features is never called in that mode.
#include <motcpp/appearance/onnx_backend.hpp>
#include <stdexcept>

namespace motcpp::appearance {

ONNXBackend::ONNXBackend(const std::string& model_path,
                         const std::string& model_name,
                         bool use_half,
                         bool use_gpu)
    : ReIDBackend()
    , model_path_(model_path)
    , model_name_(model_name.empty() ? model_path : model_name)
    , use_gpu_(use_gpu)
{
    input_shape_ = determine_input_shape(model_name_);
    auto [mean, std] = determine_normalization(model_name_);
    mean_ = mean;
    std_ = std;
    use_half_ = use_half;
}

ONNXBackend::~ONNXBackend() = default;

Eigen::MatrixXf ONNXBackend::get_features(const Eigen::MatrixXf&, const cv::Mat&) {
    throw std::runtime_error("stub: no ONNX inference in replica harness");
}

void ONNXBackend::warmup() {}

} // namespace motcpp::appearance
