// Python-free consumer of exported SAM artifacts.
//
// Loads a TF SavedModel produced by export.export_decoder_savedmodel (the
// jax2tf rendering of the StableHLO decoder) through the TensorFlow C API
// (libtensorflow_cc) and runs it on raw float32 tensors — the counterpart of
// the reference's external-runtime inference paths (TensorRT engine loading
// at trt_infer.py:142-205; PPLNN at ppl_infer.py:11-152), closing the
// "artifacts are written but never loaded outside Python" gap.
//
// Usage:
//   savedmodel_runner <saved_model_dir> <input_dir> <output_dir>
//
// <saved_model_dir>/manifest.txt lists the signature tensors:
//   in  <key> <tensor_name>     e.g.  in image_embeddings serving_default_image_embeddings:0
//   out <key> <tensor_name>
// Each input is read from <input_dir>/<key>.bin (raw float32, C-order) with
// its shape in <input_dir>/<key>.shape (ascii dims, space-separated). Each
// output is written to <output_dir>/<key>.bin + .shape in the same format.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include "tensorflow/c/c_api.h"

namespace {

struct TensorSpec {
  std::string key;
  std::string op_name;  // graph operation name (before ':')
  int index = 0;        // output index (after ':')
};

void Fail(const std::string& msg) {
  std::fprintf(stderr, "savedmodel_runner: %s\n", msg.c_str());
  std::exit(1);
}

void CheckStatus(TF_Status* status, const char* what) {
  if (TF_GetCode(status) != TF_OK) {
    Fail(std::string(what) + ": " + TF_Message(status));
  }
}

TensorSpec ParseSpec(const std::string& key, const std::string& tensor_name) {
  TensorSpec spec;
  spec.key = key;
  auto colon = tensor_name.rfind(':');
  if (colon == std::string::npos) {
    spec.op_name = tensor_name;
  } else {
    spec.op_name = tensor_name.substr(0, colon);
    spec.index = std::atoi(tensor_name.c_str() + colon + 1);
  }
  return spec;
}

std::vector<int64_t> ReadShape(const std::string& path) {
  std::ifstream f(path);
  if (!f) Fail("cannot open " + path);
  std::vector<int64_t> dims;
  int64_t d;
  while (f >> d) dims.push_back(d);
  return dims;
}

std::vector<float> ReadFloats(const std::string& path, size_t numel) {
  std::ifstream f(path, std::ios::binary);
  if (!f) Fail("cannot open " + path);
  std::vector<float> data(numel);
  f.read(reinterpret_cast<char*>(data.data()),
         static_cast<std::streamsize>(numel * sizeof(float)));
  if (static_cast<size_t>(f.gcount()) != numel * sizeof(float)) {
    Fail("short read from " + path);
  }
  return data;
}

void NoOpDeallocator(void*, size_t, void*) {}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 4) {
    std::fprintf(stderr,
                 "usage: %s <saved_model_dir> <input_dir> <output_dir>\n",
                 argv[0]);
    return 2;
  }
  const std::string model_dir = argv[1];
  const std::string input_dir = argv[2];
  const std::string output_dir = argv[3];

  // manifest
  std::vector<TensorSpec> inputs, outputs;
  {
    std::ifstream mf(model_dir + "/manifest.txt");
    if (!mf) Fail("missing manifest.txt in " + model_dir);
    std::string kind, key, name;
    while (mf >> kind >> key >> name) {
      if (kind == "in") inputs.push_back(ParseSpec(key, name));
      else if (kind == "out") outputs.push_back(ParseSpec(key, name));
    }
  }
  if (inputs.empty() || outputs.empty()) Fail("empty manifest");

  TF_Status* status = TF_NewStatus();
  TF_Graph* graph = TF_NewGraph();
  TF_SessionOptions* opts = TF_NewSessionOptions();
  TF_Buffer* run_opts = nullptr;
  const char* tags[] = {"serve"};
  TF_Session* session = TF_LoadSessionFromSavedModel(
      opts, run_opts, model_dir.c_str(), tags, 1, graph, nullptr, status);
  CheckStatus(status, "TF_LoadSessionFromSavedModel");

  std::vector<TF_Output> feed_ports;
  std::vector<TF_Tensor*> feed_tensors;
  std::vector<std::vector<float>> keepalive;
  for (const auto& spec : inputs) {
    TF_Operation* op = TF_GraphOperationByName(graph, spec.op_name.c_str());
    if (!op) Fail("input op not found: " + spec.op_name);
    auto dims = ReadShape(input_dir + "/" + spec.key + ".shape");
    size_t numel = 1;
    for (auto d : dims) numel *= static_cast<size_t>(d);
    keepalive.push_back(ReadFloats(input_dir + "/" + spec.key + ".bin", numel));
    TF_Tensor* t = TF_NewTensor(
        TF_FLOAT, dims.data(), static_cast<int>(dims.size()),
        keepalive.back().data(), numel * sizeof(float), NoOpDeallocator,
        nullptr);
    feed_ports.push_back({op, spec.index});
    feed_tensors.push_back(t);
  }

  std::vector<TF_Output> fetch_ports;
  for (const auto& spec : outputs) {
    TF_Operation* op = TF_GraphOperationByName(graph, spec.op_name.c_str());
    if (!op) Fail("output op not found: " + spec.op_name);
    fetch_ports.push_back({op, spec.index});
  }
  std::vector<TF_Tensor*> fetch_tensors(outputs.size(), nullptr);

  TF_SessionRun(session, nullptr, feed_ports.data(), feed_tensors.data(),
                static_cast<int>(feed_ports.size()), fetch_ports.data(),
                fetch_tensors.data(), static_cast<int>(fetch_ports.size()),
                nullptr, 0, nullptr, status);
  CheckStatus(status, "TF_SessionRun");

  for (size_t i = 0; i < outputs.size(); ++i) {
    TF_Tensor* t = fetch_tensors[i];
    if (TF_TensorType(t) != TF_FLOAT) Fail("non-float output " + outputs[i].key);
    int nd = TF_NumDims(t);
    std::ostringstream shape;
    size_t numel = 1;
    for (int d = 0; d < nd; ++d) {
      if (d) shape << ' ';
      shape << TF_Dim(t, d);
      numel *= static_cast<size_t>(TF_Dim(t, d));
    }
    {
      std::ofstream sf(output_dir + "/" + outputs[i].key + ".shape");
      sf << shape.str() << "\n";
    }
    std::ofstream bf(output_dir + "/" + outputs[i].key + ".bin",
                     std::ios::binary);
    bf.write(reinterpret_cast<const char*>(TF_TensorData(t)),
             static_cast<std::streamsize>(numel * sizeof(float)));
  }

  for (auto* t : feed_tensors) TF_DeleteTensor(t);
  for (auto* t : fetch_tensors) TF_DeleteTensor(t);
  TF_CloseSession(session, status);
  TF_DeleteSession(session, status);
  TF_DeleteSessionOptions(opts);
  TF_DeleteGraph(graph);
  TF_DeleteStatus(status);
  std::printf("ok %zu outputs\n", outputs.size());
  return 0;
}
