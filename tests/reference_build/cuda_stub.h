// CUDA API stub for building the reference CPU-only WITHOUT nvcc.
//
// The reference's DISABLE_CUDA build path still references a handful of
// CUDA runtime symbols in code that is compiled but unreachable at runtime
// (reference Recommender.cu:86-89 destructor frees, :153-170 allocation
// block behind `if (gpuEnabled)`, :198-201 H2D copy behind the
// `!gpuEnabled` early return).  nvcc implicitly declares them; plain g++
// needs these no-op definitions.  This is OUR test shim, not reference
// code — it exists so the differential parity test can run the genuine
// reference binary on CPU.
#ifndef REFERENCE_CUDA_STUB_H
#define REFERENCE_CUDA_STUB_H

#include <cstddef>

typedef int cudaError_t;
static const cudaError_t cudaSuccess = 0;

enum cudaMemcpyKind {
  cudaMemcpyHostToDevice = 1,
  cudaMemcpyDeviceToHost = 2,
};

static inline cudaError_t cudaFree(void*) { return 1; }
// CUDA's runtime header provides a templated overload accepting T**
template <typename T>
static inline cudaError_t cudaMalloc(T**, size_t) { return 1; }
static inline cudaError_t cudaMemcpy(void*, const void*, size_t,
                                     cudaMemcpyKind) {
  return 1;
}

#endif  // REFERENCE_CUDA_STUB_H
