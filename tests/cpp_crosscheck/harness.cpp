// Cross-validation harness: compiles the ACTUAL reference implementation
// (trackdlo.cpp + utils.cpp from the upstream repo, unmodified, ROS-free via
// the stub headers in ./stubs) and exposes its core math over a tiny binary
// fixture protocol so tests/test_cpp_crosscheck.py can assert the repo's
// float64 NumPy oracle against the reference C++ itself — closing the one
// previously-unverified link in the parity chain (oracle == port of the
// reference, never compared to the reference).
//
// Reference entry points driven here:
//   trackdlo::cpd_lle            trackdlo.cpp:161-441
//   trackdlo::tracking_step      trackdlo.cpp:900-999 (all 5 dispatch cases)
//   trackdlo::traverse_euclidean trackdlo.cpp:584-898
//   trackdlo::traverse_geodesic  trackdlo.cpp:444-581
//   trackdlo::calc_LLE_weights   trackdlo.cpp:119-158
//   reg / sort_pts / line_sphere_intersection   utils.cpp:21-241
//
// Protocol: a fixture file is a sequence of records; each record is
// int32 rows, int32 cols, rows*cols little-endian float64 (row-major).
// Usage: harness <mode> <in.bin> <out.bin>

// Pre-include every system/Eigen header trackdlo.h pulls in, BEFORE the
// `#define private public` below — redefining `private` inside libstdc++ or
// Eigen headers breaks them; header guards make the later includes no-ops.
#include <Eigen/Core>
#include <Eigen/Dense>
#include <Eigen/Geometry>
#include <signal.h>
#include <unistd.h>

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <fstream>
#include <iostream>
#include <string>
#include <thread>
#include <vector>

// The harness (a test driver) needs the reference's private members
// (traverse_euclidean, calc_LLE_weights, Y_/sigma2_ state). Access control
// does not affect layout or mangling, so this is safe for a test binary.
// The reference include dir is supplied by the builder via -I (see
// tests/test_cpp_crosscheck.py build_harness).
#define private public
#include <trackdlo.h>
#include <utils.h>
#undef private

using Eigen::MatrixXd;

static std::vector<MatrixXd> read_records(const char* path) {
    std::ifstream f(path, std::ios::binary);
    if (!f) {
        std::cerr << "cannot open " << path << "\n";
        exit(2);
    }
    std::vector<MatrixXd> out;
    for (;;) {
        int32_t rows, cols;
        if (!f.read(reinterpret_cast<char*>(&rows), 4)) break;
        f.read(reinterpret_cast<char*>(&cols), 4);
        MatrixXd m = MatrixXd::Zero(rows, cols);
        for (int i = 0; i < rows; i++)
            for (int j = 0; j < cols; j++) {
                double v;
                f.read(reinterpret_cast<char*>(&v), 8);
                m(i, j) = v;
            }
        out.push_back(m);
    }
    return out;
}

static void write_record(std::ofstream& f, const MatrixXd& m) {
    int32_t rows = m.rows(), cols = m.cols();
    f.write(reinterpret_cast<char*>(&rows), 4);
    f.write(reinterpret_cast<char*>(&cols), 4);
    for (int i = 0; i < rows; i++)
        for (int j = 0; j < cols; j++) {
            double v = m(i, j);
            f.write(reinterpret_cast<char*>(&v), 8);
        }
}

static std::vector<int> to_int_vec(const MatrixXd& row) {
    std::vector<int> v;
    for (int j = 0; j < row.cols(); j++) v.push_back((int)row(0, j));
    return v;
}

static std::vector<double> to_dbl_vec(const MatrixXd& row) {
    std::vector<double> v;
    for (int j = 0; j < row.cols(); j++) v.push_back(row(0, j));
    return v;
}

static std::vector<MatrixXd> to_prior_vec(const MatrixXd& p) {
    std::vector<MatrixXd> v;
    for (int i = 0; i < p.rows(); i++) {
        MatrixXd r = MatrixXd::Zero(1, 4);
        r << p(i, 0), p(i, 1), p(i, 2), p(i, 3);
        v.push_back(r);
    }
    return v;
}

static MatrixXd from_prior_vec(const std::vector<MatrixXd>& v) {
    MatrixXd out = MatrixXd::Zero((int)v.size(), 4);
    for (size_t i = 0; i < v.size(); i++) out.row(i) = v[i].row(0);
    return out;
}

int main(int argc, char** argv) {
    if (argc != 4) {
        std::cerr << "usage: harness <mode> <in.bin> <out.bin>\n";
        return 2;
    }
    std::string mode = argv[1];
    auto rec = read_records(argv[2]);
    std::ofstream out(argv[3], std::ios::binary);

    if (mode == "cpd") {
        MatrixXd Y = rec[0];
        const MatrixXd& X = rec[1];
        auto s = to_dbl_vec(rec[2]);  // sigma2 beta lambda lle_w mu max_iter tol include_lle
        auto priors = to_prior_vec(rec[3]);
        auto s2 = to_dbl_vec(rec[4]);  // alpha k_vis vis_threshold
        auto vis = to_int_vec(rec[5]);
        double sigma2 = s[0];
        trackdlo t((int)Y.rows());
        bool conv = t.cpd_lle(X, Y, sigma2, s[1], s[2], s[3], s[4], (int)s[5],
                              s[6], s[7] != 0.0, priors, s2[0], vis, s2[1],
                              s2[2]);
        write_record(out, Y);
        MatrixXd sc(1, 2);
        sc << sigma2, conv ? 1.0 : 0.0;
        write_record(out, sc);
    } else if (mode == "step") {
        MatrixXd Y = rec[0];
        const MatrixXd& X = rec[1];
        auto geo = to_dbl_vec(rec[2]);
        auto vis = to_int_vec(rec[3]);
        auto vis_ext = to_int_vec(rec[4]);
        auto s = to_dbl_vec(rec[5]);
        // s: sigma2 vis_threshold beta lambda alpha k_vis mu max_iter tol
        //    beta_pre_proc lambda_pre_proc lle_weight
        trackdlo t((int)Y.rows(), s[1], s[2], s[3], s[4], s[5], s[6],
                   (int)s[7], s[8], s[9], s[10], s[11]);
        t.initialize_nodes(Y);
        t.initialize_geodesic_coord(geo);
        t.set_sigma2(s[0]);
        MatrixXd proj = MatrixXd::Zero(3, 4);
        t.tracking_step(X, vis, vis_ext, proj, 720, 1280);
        write_record(out, t.get_guide_nodes());
        write_record(out, from_prior_vec(t.get_correspondence_pairs()));
        write_record(out, t.get_tracking_result());
        MatrixXd sc(1, 1);
        sc << t.get_sigma2();
        write_record(out, sc);
    } else if (mode == "walk" || mode == "geo") {
        auto geo = to_dbl_vec(rec[0]);
        const MatrixXd& guide = rec[1];
        auto vis = to_int_vec(rec[2]);
        auto s = to_dbl_vec(rec[3]);  // alignment [alignment_node_idx]
        trackdlo t((int)geo.size());
        std::vector<MatrixXd> res =
            mode == "walk"
                ? t.traverse_euclidean(geo, guide, vis, (int)s[0],
                                       (int)s[1])
                : t.traverse_geodesic(geo, guide, vis, (int)s[0]);
        write_record(out, from_prior_vec(res));
    } else if (mode == "lle") {
        trackdlo t((int)rec[0].rows());
        write_record(out, t.calc_LLE_weights((int)rec[1](0, 0), rec[0]));
    } else if (mode == "sort") {
        write_record(out, sort_pts(rec[0]));
    } else if (mode == "reg") {
        auto s = to_dbl_vec(rec[1]);  // M mu max_iter
        MatrixXd Y;
        double sigma2 = 0.0;
        reg(rec[0], Y, sigma2, (int)s[0], s[1], (int)s[2]);
        write_record(out, Y);
        MatrixXd sc(1, 1);
        sc << sigma2;
        write_record(out, sc);
    } else if (mode == "lsi") {
        auto res = line_sphere_intersection(rec[0], rec[1], rec[2],
                                            rec[3](0, 0));
        MatrixXd pts = MatrixXd::Zero((int)res.size(), 3);
        for (size_t i = 0; i < res.size(); i++) pts.row(i) = res[i].row(0);
        write_record(out, pts);
    } else {
        std::cerr << "unknown mode " << mode << "\n";
        return 2;
    }
    return 0;
}
