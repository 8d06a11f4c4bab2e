// ROS logging-macro stub for compiling the reference's core math without a
// ROS installation (cross-check harness). The macros are the only ros.h
// surface trackdlo.cpp/utils.cpp touch (ROS_INFO / ROS_ERROR /
// ROS_INFO_STREAM around the EM loop and the occlusion dispatch).
#pragma once
#include <iostream>
#include <string>

#define ROS_INFO(...) \
    do {              \
    } while (0)
#define ROS_ERROR(...) \
    do {               \
    } while (0)
#define ROS_WARN(...) \
    do {              \
    } while (0)
#define ROS_INFO_STREAM(expr) \
    do {                      \
    } while (0)
#define ROS_ERROR_STREAM(expr) \
    do {                       \
    } while (0)

namespace ros {
inline void shutdown() {}
}  // namespace ros
