// Native IO codecs for the TPU-native SCV-OD engine.
//
// Replaces the reference's IO-bound native code paths with standalone C++
// (no ROS/PCL): KITTI .bin/.label decode (reference: src/ssc.cpp:1046-1058
// reads them with ifstream into vectors) and binary PCD read/write
// (reference: pcl::io::savePCDFile / loadPCDFile via utility.h:408-430).
//
// Exposed as a C ABI for ctypes (pybind11 is not available in this image).
// mmap-based zero-copy reads; all functions return 0 on success.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// KITTI velodyne .bin: N * 4 float32 (x, y, z, intensity)
// ---------------------------------------------------------------------------

// Returns the number of points, or -1 on error.
int64_t kitti_bin_num_points(const char* path) {
    struct stat st;
    if (stat(path, &st) != 0) return -1;
    return st.st_size / (4 * sizeof(float));
}

// out must hold n*4 floats (n from kitti_bin_num_points).
int kitti_bin_read(const char* path, float* out, int64_t n) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return 1;
    size_t bytes = static_cast<size_t>(n) * 4 * sizeof(float);
    void* m = mmap(nullptr, bytes, PROT_READ, MAP_PRIVATE, fd, 0);
    if (m == MAP_FAILED) { close(fd); return 2; }
    std::memcpy(out, m, bytes);
    munmap(m, bytes);
    close(fd);
    return 0;
}

// ---------------------------------------------------------------------------
// SemanticKITTI .label: N * uint32 (semantic = low 16 bits, instance = high)
// ---------------------------------------------------------------------------

int64_t kitti_label_num_points(const char* path) {
    struct stat st;
    if (stat(path, &st) != 0) return -1;
    return st.st_size / sizeof(uint32_t);
}

int kitti_label_read(const char* path, uint32_t* out, int64_t n) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return 1;
    size_t bytes = static_cast<size_t>(n) * sizeof(uint32_t);
    void* m = mmap(nullptr, bytes, PROT_READ, MAP_PRIVATE, fd, 0);
    if (m == MAP_FAILED) { close(fd); return 2; }
    std::memcpy(out, m, bytes);
    munmap(m, bytes);
    close(fd);
    return 0;
}

// ---------------------------------------------------------------------------
// Binary PCD, fields x y z intensity (float32) - the artifact format the
// reference writes per frame (seg/<id>.pcd etc., src/ssc.cpp:556).
// ---------------------------------------------------------------------------

int pcd_write_xyzi(const char* path, const float* xyzi, int64_t n) {
    FILE* f = fopen(path, "wb");
    if (!f) return 1;
    fprintf(f,
            "# .PCD v0.7 - Point Cloud Data file format\n"
            "VERSION 0.7\n"
            "FIELDS x y z intensity\n"
            "SIZE 4 4 4 4\n"
            "TYPE F F F F\n"
            "COUNT 1 1 1 1\n"
            "WIDTH %lld\nHEIGHT 1\n"
            "VIEWPOINT 0 0 0 1 0 0 0\n"
            "POINTS %lld\nDATA binary\n",
            static_cast<long long>(n), static_cast<long long>(n));
    size_t wrote = fwrite(xyzi, sizeof(float) * 4, n, f);
    fclose(f);
    return wrote == static_cast<size_t>(n) ? 0 : 2;
}

// Parses the header of a binary xyzi PCD; returns n or -1.
int64_t pcd_num_points(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    char line[512];
    int64_t n = -1;
    while (fgets(line, sizeof line, f)) {
        if (std::strncmp(line, "POINTS", 6) == 0) {
            n = atoll(line + 6);
        }
        if (std::strncmp(line, "DATA", 4) == 0) break;
    }
    fclose(f);
    return n;
}

int pcd_read_xyzi(const char* path, float* out, int64_t n) {
    FILE* f = fopen(path, "rb");
    if (!f) return 1;
    char line[512];
    bool binary = false;
    int n_fields = 0;
    while (fgets(line, sizeof line, f)) {
        if (std::strncmp(line, "FIELDS", 6) == 0) {
            const char* p = line + 6;
            while (*p) { if (*p == ' ') n_fields++; p++; }
        }
        if (std::strncmp(line, "DATA", 4) == 0) {
            binary = std::strstr(line, "binary") != nullptr;
            break;
        }
    }
    if (!binary || n_fields < 3) { fclose(f); return 3; }
    if (n_fields == 4) {
        size_t got = fread(out, sizeof(float) * 4, n, f);
        fclose(f);
        return got == static_cast<size_t>(n) ? 0 : 2;
    }
    // generic: read n_fields floats per point, keep first 4 (pad intensity)
    std::vector<float> row(n_fields);
    for (int64_t i = 0; i < n; i++) {
        if (fread(row.data(), sizeof(float), n_fields, f)
            != static_cast<size_t>(n_fields)) { fclose(f); return 2; }
        out[i * 4 + 0] = row[0];
        out[i * 4 + 1] = row[1];
        out[i * 4 + 2] = row[2];
        out[i * 4 + 3] = n_fields > 3 ? row[3] : 0.0f;
    }
    fclose(f);
    return 0;
}

}  // extern "C"
