// Minimal cv::Mat declaration so `using cv::Mat;` in the reference sources
// compiles. The core math under cross-check (cpd_lle, traverse_*, utils
// helpers) never constructs or touches a Mat.
#pragma once
namespace cv {
class Mat {};
}
