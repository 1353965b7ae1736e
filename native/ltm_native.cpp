// ltm native runtime: high-throughput host-side I/O + preprocessing.
//
// The reference implements its entire runtime in C++ over PCL/ROS; the TPU
// engine keeps dense compute in XLA but routes the I/O-bound host path
// (PCD parsing, KITTI bins, pose files, host-side voxel pre-reduction)
// through this library, exposed to Python via a plain C ABI (ctypes).
//
// Covers: pcl::io::loadPCDFile / savePCDFileBinary usage
// (ltremovert/src/Session.cpp:275, Removerter.cpp:232), readBin
// (ltremovert/src/utility.cpp:6-26), splitPoseLine (:28-36), and the
// octree/voxel downsampling entry (utility.cpp:204-219) as a host fallback.
//
// Build: make -C native   (produces libltm_native.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <unordered_map>
#include <fstream>
#include <sstream>
#include <cmath>

extern "C" {

// ---------------------------------------------------------------------------
// PCD
// ---------------------------------------------------------------------------

// Parses a PCD v0.7 header. Returns 0 on success.
static int parse_pcd_header(std::ifstream& f, long& n_points, int& n_fields,
                            std::vector<std::string>& fields,
                            std::vector<int>& sizes, std::vector<char>& types,
                            std::vector<int>& counts, std::string& data_fmt) {
    std::string line;
    n_points = -1;
    while (std::getline(f, line)) {
        if (line.empty() || line[0] == '#') continue;
        std::istringstream ss(line);
        std::string key;
        ss >> key;
        if (key == "FIELDS") { std::string v; while (ss >> v) fields.push_back(v); }
        else if (key == "SIZE") { int v; while (ss >> v) sizes.push_back(v); }
        else if (key == "TYPE") { std::string v; while (ss >> v) types.push_back(v[0]); }
        else if (key == "COUNT") { int v; while (ss >> v) counts.push_back(v); }
        else if (key == "POINTS") { ss >> n_points; }
        else if (key == "WIDTH") { if (n_points < 0) ss >> n_points; }
        else if (key == "HEIGHT") { long h; ss >> h; if (h > 1 && n_points > 0) n_points *= h; }
        else if (key == "DATA") { ss >> data_fmt; break; }
    }
    if (counts.empty()) counts.assign(fields.size(), 1);
    n_fields = (int)fields.size();
    return (n_points >= 0 && !fields.empty() && data_fmt.size()) ? 0 : -1;
}

// Number of points in a PCD file (-1 on error).
long ltm_pcd_num_points(const char* path) {
    std::ifstream f(path, std::ios::binary);
    if (!f.good()) return -1;
    long n; int nf;
    std::vector<std::string> fields; std::vector<int> sizes; std::vector<char> types;
    std::vector<int> counts; std::string fmt;
    if (parse_pcd_header(f, n, nf, fields, sizes, types, counts, fmt) != 0) return -1;
    return n;
}

// Reads x,y,z,intensity (intensity 0 if absent) into out[4*capacity].
// Returns number of points read, or -1 on error.
long ltm_read_pcd(const char* path, float* out, long capacity) {
    std::ifstream f(path, std::ios::binary);
    if (!f.good()) return -1;
    long n; int nf;
    std::vector<std::string> fields; std::vector<int> sizes; std::vector<char> types;
    std::vector<int> counts; std::string fmt;
    if (parse_pcd_header(f, n, nf, fields, sizes, types, counts, fmt) != 0) return -1;
    if (n > capacity) n = capacity;

    // byte offset of each field within a point record
    int point_bytes = 0;
    std::vector<int> offsets(nf);
    for (int i = 0; i < nf; i++) { offsets[i] = point_bytes; point_bytes += sizes[i] * counts[i]; }
    int ix = -1, iy = -1, iz = -1, ii = -1;
    for (int i = 0; i < nf; i++) {
        if (fields[i] == "x") ix = i;
        else if (fields[i] == "y") iy = i;
        else if (fields[i] == "z") iz = i;
        else if (fields[i] == "intensity") ii = i;
    }
    if (ix < 0 || iy < 0 || iz < 0) return -1;

    if (fmt == "binary") {
        std::vector<char> buf((size_t)n * point_bytes);
        f.read(buf.data(), buf.size());
        if (f.gcount() < (std::streamsize)buf.size()) n = f.gcount() / point_bytes;
        for (long p = 0; p < n; p++) {
            const char* rec = buf.data() + (size_t)p * point_bytes;
            float v;
            std::memcpy(&v, rec + offsets[ix], 4); out[4 * p + 0] = v;
            std::memcpy(&v, rec + offsets[iy], 4); out[4 * p + 1] = v;
            std::memcpy(&v, rec + offsets[iz], 4); out[4 * p + 2] = v;
            if (ii >= 0) { std::memcpy(&v, rec + offsets[ii], 4); out[4 * p + 3] = v; }
            else out[4 * p + 3] = 0.f;
        }
        return n;
    } else if (fmt == "ascii") {
        int total_cols = 0;
        std::vector<int> col_of(nf);
        for (int i = 0; i < nf; i++) { col_of[i] = total_cols; total_cols += counts[i]; }
        std::string line;
        long p = 0;
        std::vector<double> vals(total_cols);
        while (p < n && std::getline(f, line)) {
            if (line.empty()) continue;
            std::istringstream ss(line);
            for (int c = 0; c < total_cols; c++) if (!(ss >> vals[c])) return -1;
            out[4 * p + 0] = (float)vals[col_of[ix]];
            out[4 * p + 1] = (float)vals[col_of[iy]];
            out[4 * p + 2] = (float)vals[col_of[iz]];
            out[4 * p + 3] = ii >= 0 ? (float)vals[col_of[ii]] : 0.f;
            p++;
        }
        return p;
    }
    return -1;  // binary_compressed handled by the Python path
}

// Writes an x/y/z/intensity float32 PCD (binary if binary != 0).
int ltm_write_pcd(const char* path, const float* xyzi, long n, int binary) {
    std::ofstream f(path, std::ios::binary);
    if (!f.good()) return -1;
    f << "# .PCD v0.7 - Point Cloud Data file format\n"
      << "VERSION 0.7\nFIELDS x y z intensity\nSIZE 4 4 4 4\nTYPE F F F F\n"
      << "COUNT 1 1 1 1\nWIDTH " << n << "\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
      << "POINTS " << n << "\nDATA " << (binary ? "binary" : "ascii") << "\n";
    if (binary) {
        f.write(reinterpret_cast<const char*>(xyzi), (size_t)n * 16);
    } else {
        char buf[128];
        for (long p = 0; p < n; p++) {
            std::snprintf(buf, sizeof(buf), "%.8g %.8g %.8g %.8g\n",
                          xyzi[4 * p], xyzi[4 * p + 1], xyzi[4 * p + 2], xyzi[4 * p + 3]);
            f << buf;
        }
    }
    return f.good() ? 0 : -1;
}

// ---------------------------------------------------------------------------
// KITTI .bin
// ---------------------------------------------------------------------------

long ltm_read_kitti_bin(const char* path, float* out, long capacity) {
    std::ifstream f(path, std::ios::binary);
    if (!f.good()) return -1;
    f.seekg(0, std::ios::end);
    long bytes = f.tellg();
    f.seekg(0, std::ios::beg);
    long n = bytes / 16;
    if (n > capacity) n = capacity;
    f.read(reinterpret_cast<char*>(out), n * 16);
    return n;
}

// ---------------------------------------------------------------------------
// KITTI pose files (12 or 16 doubles per line -> row-major 4x4)
// ---------------------------------------------------------------------------

long ltm_read_poses(const char* path, double* out, long capacity) {
    std::ifstream f(path);
    if (!f.good()) return -1;
    std::string line;
    long p = 0;
    while (p < capacity && std::getline(f, line)) {
        if (line.empty()) continue;
        std::istringstream ss(line);
        double v[16];
        int c = 0;
        while (c < 16 && (ss >> v[c])) c++;
        if (c != 12 && c != 16) return -1;
        double* T = out + p * 16;
        for (int i = 0; i < 12; i++) T[i] = v[i];
        if (c == 16) { for (int i = 12; i < 16; i++) T[i] = v[i]; }
        else { T[12] = 0; T[13] = 0; T[14] = 0; T[15] = 1; }
        p++;
    }
    return p;
}

// ---------------------------------------------------------------------------
// Host voxel-centroid downsample (octreeDownsampling equivalent)
// ---------------------------------------------------------------------------

// Open-addressing linear-probe slot, epoch-tagged so repeat calls on the
// same thread skip re-zeroing the table.  The previous node-based
// std::unordered_map paid one heap allocation per voxel (~350 ns/pt on the
// session-prep thread pool — the dominant host prep cost at clutter-heavy
// scans where nearly every point is its own voxel); a flat table with
// 2x slots is allocation-free and cache-resident per scan.
struct VoxSlot {
    uint32_t epoch;
    int32_t cnt;
    // full-width keys: coordinates beyond +-2^31 voxels (garbage/corrupt
    // inputs) stay distinct voxels, matching the previous map exactly
    // (an int32 key would alias them into shared slots)
    int64_t kx, ky, kz;
    double sx, sy, sz;
};

// Returns the number of voxels written (<= capacity), or -1 on overflow.
long ltm_voxel_downsample(const float* xyz, long n, float voxel,
                          float* out, long capacity) {
    static thread_local std::vector<VoxSlot> table;
    static thread_local uint32_t epoch = 0;
    size_t want = 64;
    while (want < (size_t)n * 2) want <<= 1;
    if (table.size() < want) {
        table.assign(want, VoxSlot{});
        epoch = 0;
    }
    if (++epoch == 0) {  // uint32 wrap: stale tags could alias, re-zero
        std::fill(table.begin(), table.end(), VoxSlot{});
        epoch = 1;
    }
    const size_t mask = table.size() - 1;
    const double inv = 1.0 / voxel;
    long nvox = 0;
    for (long p = 0; p < n; p++) {
        // identical binning expression to the previous implementation
        // (float coord promoted to double, floor, truncating cast)
        int64_t kx = (int64_t)std::floor(xyz[3 * p] * inv);
        int64_t ky = (int64_t)std::floor(xyz[3 * p + 1] * inv);
        int64_t kz = (int64_t)std::floor(xyz[3 * p + 2] * inv);
        uint64_t h = (uint64_t)kx * 0x9E3779B97F4A7C15ull
                   ^ (uint64_t)ky * 0xC2B2AE3D27D4EB4Full
                   ^ (uint64_t)kz * 0x165667B19E3779F9ull;
        h ^= h >> 29;
        size_t i = (size_t)h & mask;
        for (;;) {
            VoxSlot& s = table[i];
            if (s.epoch != epoch) {  // free slot this call: claim it
                s.epoch = epoch;
                s.kx = kx; s.ky = ky; s.kz = kz;
                s.cnt = 0; s.sx = 0.0; s.sy = 0.0; s.sz = 0.0;
                nvox++;
            }
            if (s.kx == kx && s.ky == ky && s.kz == kz) {
                s.cnt += 1;
                s.sx += xyz[3 * p];
                s.sy += xyz[3 * p + 1];
                s.sz += xyz[3 * p + 2];
                break;
            }
            i = (i + 1) & mask;
        }
    }
    if (nvox > capacity) return -1;
    long i = 0;
    for (const auto& s : table) {
        if (s.epoch != epoch) continue;
        out[3 * i] = (float)(s.sx / s.cnt);
        out[3 * i + 1] = (float)(s.sy / s.cnt);
        out[3 * i + 2] = (float)(s.sz / s.cnt);
        i++;
    }
    return i;
}

}  // extern "C"
