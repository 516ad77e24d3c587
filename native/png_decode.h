// Minimal PNG decoder (grayscale output) for the native frame feeder.
// Supports 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
// 6 (RGBA), no interlacing — covers EuRoC/TUM dataset images.
// Replaces the role OpenCV's imdecode plays for the reference's dataset
// tooling; intentionally dependency-free beyond zlib.
#pragma once

#include <cstddef>
#include <cstdint>
#include <vector>

namespace svo_native {

struct GrayImage {
  int width = 0;
  int height = 0;
  std::vector<float> pixels;  // row-major, [0, 255]
};

// Returns false on parse error. Luma conversion: 0.299R+0.587G+0.114B.
bool DecodePngGray(const uint8_t* data, size_t size, GrayImage* out);

// PGM (P5, 8-bit) for completeness.
bool DecodePgmGray(const uint8_t* data, size_t size, GrayImage* out);

}  // namespace svo_native
