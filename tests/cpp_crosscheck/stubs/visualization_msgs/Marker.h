// Field-compatible stand-ins for the visualization_msgs message structs, just
// enough to compile utils.cpp's MatrixXd2MarkerArray (utils.cpp:244-475) in
// the ROS-free cross-check harness. Only the fields that function assigns.
#pragma once
#include <string>
#include <vector>

namespace std_msgs {
struct Header {
    std::string frame_id;
};
}  // namespace std_msgs

namespace geometry_msgs {
struct Point {
    double x = 0, y = 0, z = 0;
};
struct Quaternion {
    double x = 0, y = 0, z = 0, w = 0;
};
struct Pose {
    Point position;
    Quaternion orientation;
};
struct Vector3 {
    double x = 0, y = 0, z = 0;
};
}  // namespace geometry_msgs

namespace visualization_msgs {
struct ColorRGBA {
    float r = 0, g = 0, b = 0, a = 0;
};
struct Marker {
    static constexpr int ADD = 0;
    static constexpr int SPHERE = 2;
    static constexpr int CYLINDER = 3;
    static constexpr int LINE_STRIP = 4;
    std_msgs::Header header;
    std::string ns;
    int id = 0;
    int type = 0;
    int action = 0;
    geometry_msgs::Pose pose;
    geometry_msgs::Vector3 scale;
    ColorRGBA color;
};
struct MarkerArray {
    std::vector<Marker> markers;
};
}  // namespace visualization_msgs
