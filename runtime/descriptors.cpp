#include "descriptors.hpp"

#include <algorithm>
#include <cstdlib>
#include <sstream>

namespace mfa {

static const TpuGeneration kGenerations[] = {
    {"v4", 16ll << 20, 1228.0, 137.5, 275.0},
    {"v5e", 16ll << 20, 819.0, 197.0, 394.0},
    {"v5p", 16ll << 20, 2765.0, 229.0, 459.0},
    {"v6e", 32ll << 20, 1640.0, 918.0, 1836.0},
    {"cpu", 16ll << 20, 100.0, 1.0, 2.0},
};

const TpuGeneration* find_generation(const std::string& name) {
  for (const auto& g : kGenerations) {
    if (name == g.name) return &g;
  }
  return nullptr;
}

// --------------------------------------------------------------------------
// Table parser (twin of params.py parse_table)
// --------------------------------------------------------------------------

static std::string trim(const std::string& s) {
  auto b = s.find_first_not_of(" \t\r");
  if (b == std::string::npos) return "";
  auto e = s.find_last_not_of(" \t\r");
  return s.substr(b, e - b + 1);
}

bool parse_table(const std::string& text, std::vector<ParameterRow>* rows,
                 std::string* error) {
  rows->clear();
  std::istringstream in(text);
  std::string line;
  while (std::getline(in, line)) {
    line = trim(line);
    if (line.empty() || line[0] == '#') continue;
    std::vector<std::string> parts;
    std::istringstream ls(line);
    std::string part;
    while (std::getline(ls, part, '|')) parts.push_back(trim(part));
    if (parts.size() != 4 && parts.size() != 5) {
      if (error) *error = "malformed parameter row: " + line;
      return false;
    }
    ParameterRow row;
    row.max_d = (parts[0] == "inf" || parts[0] == "-")
                    ? 0
                    : std::atoi(parts[0].c_str());
    row.block_q = std::atoi(parts[1].c_str());
    row.block_kv = std::atoi(parts[2].c_str());
    row.block_d = std::atoi(parts[3].c_str());
    if (parts.size() == 5 && !parts[4].empty()) {
      std::istringstream os(parts[4]);
      std::string op;
      while (std::getline(os, op, ',')) {
        op = trim(op);
        if (!op.empty()) row.vmem_resident.push_back(op);
      }
    }
    rows->push_back(std::move(row));
  }
  if (rows->empty()) {
    if (error) *error = "empty parameter table";
    return false;
  }
  if (rows->back().max_d != 0) {
    if (error) *error = "last row of a parameter table must be unbounded";
    return false;
  }
  return true;
}

int select_row(const std::vector<ParameterRow>& rows, int head_dim) {
  for (size_t i = 0; i < rows.size(); ++i) {
    if (rows[i].max_d == 0 || head_dim <= rows[i].max_d) {
      return static_cast<int>(i);
    }
  }
  return static_cast<int>(rows.size()) - 1;  // unreachable: last is unbounded
}

int64_t vmem_bytes_estimate(const ParameterRow& row, int head_dim,
                            double in_bytes,
                            const std::string& kernel_type) {
  int d = row.block_d > 0 ? std::min(head_dim, row.block_d) : head_dim;
  int64_t bq = row.block_q, bkv = row.block_kv;
  const double acc = 4.0;
  double streamed = 2.0 * 2.0 * (bkv * d * in_bytes);
  double resident = bq * d * in_bytes + bq * head_dim * acc;
  // All three kernels process q rows in 256-row groups (row grouping):
  // only the live group's S tile materializes, never the full (bq, bkv)
  // tile. Forward: S fp32 + P bf16 for one group; backward: S + dP fp32
  // with up to ~2 groups in flight. Twin of params.vmem_bytes_estimate.
  double tile;
  if (kernel_type == "forward") {
    tile = std::min<int64_t>(bq, 256) * bkv * (acc + 2.0) + 2 * bq * acc;
  } else {
    tile = std::min<int64_t>(bq, 512) * bkv * acc * 2 + 2 * bq * acc;
  }
  if (kernel_type != "forward") {
    resident += bq * d * in_bytes + bq * head_dim * acc;
  }
  return static_cast<int64_t>(streamed + resident + tile);
}

// --------------------------------------------------------------------------
// GEMM heuristic (twin of descriptors.py GEMMDescriptor.kernel_descriptor)
// --------------------------------------------------------------------------

static int64_t round_up(int64_t x, int64_t m) { return (x + m - 1) / m * m; }

GEMMKernelDescriptor gemm_kernel_descriptor(const GEMMDescriptor& desc,
                                            const TpuGeneration& gen) {
  double in_bytes = std::max(desc.a_bytes, desc.b_bytes);
  int64_t bm = std::min<int64_t>(512, round_up(desc.m, 128));
  int64_t bn = std::min<int64_t>(512, round_up(desc.n, 128));
  int64_t bk = std::min<int64_t>(512, round_up(desc.k, 128));
  double budget = gen.vmem_bytes * 0.7;
  while (bm * bn * 4 + 2 * in_bytes * bk * (bm + bn) > budget) {
    if (bk > 128) {
      bk /= 2;
    } else if (std::max(bm, bn) > 128) {
      if (bm >= bn) bm /= 2; else bn /= 2;
    } else {
      break;
    }
  }
  GEMMKernelDescriptor kd;
  kd.block_m = static_cast<int>(bm);
  kd.block_n = static_cast<int>(bn);
  kd.block_k = static_cast<int>(bk);
  return kd;
}

}  // namespace mfa
