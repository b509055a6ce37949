// Minimal gflags-compatible stub (DEFINE_*/ParseCommandLineFlags) so the
// reference binaries build without system gflags. Benchmark scaffolding only.
#pragma once

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <map>
#include <string>

namespace qmf_stub_flags {

struct Registry {
  std::map<std::string, uint64_t*> u64;
  std::map<std::string, int32_t*> i32;
  std::map<std::string, double*> dbl;
  std::map<std::string, bool*> bl;
  std::map<std::string, std::string*> str;
  static Registry& get() {
    static Registry r;
    return r;
  }
};

inline bool set_flag(const std::string& name, const std::string& value) {
  auto& r = Registry::get();
  if (r.u64.count(name)) { *r.u64[name] = std::strtoull(value.c_str(), nullptr, 10); return true; }
  if (r.i32.count(name)) { *r.i32[name] = std::strtol(value.c_str(), nullptr, 10); return true; }
  if (r.dbl.count(name)) { *r.dbl[name] = std::strtod(value.c_str(), nullptr); return true; }
  if (r.str.count(name)) { *r.str[name] = value; return true; }
  if (r.bl.count(name)) {
    *r.bl[name] = !(value == "false" || value == "0" || value == "no");
    return true;
  }
  return false;
}

}  // namespace qmf_stub_flags

#define DEFINE_uint64(name, default_value, help)                     \
  uint64_t FLAGS_##name = default_value;                             \
  static const bool qmf_reg_##name =                                 \
      (qmf_stub_flags::Registry::get().u64[#name] = &FLAGS_##name, true)
#define DEFINE_int32(name, default_value, help)                      \
  int32_t FLAGS_##name = default_value;                              \
  static const bool qmf_reg_##name =                                 \
      (qmf_stub_flags::Registry::get().i32[#name] = &FLAGS_##name, true)
#define DEFINE_double(name, default_value, help)                     \
  double FLAGS_##name = default_value;                               \
  static const bool qmf_reg_##name =                                 \
      (qmf_stub_flags::Registry::get().dbl[#name] = &FLAGS_##name, true)
#define DEFINE_bool(name, default_value, help)                       \
  bool FLAGS_##name = default_value;                                 \
  static const bool qmf_reg_##name =                                 \
      (qmf_stub_flags::Registry::get().bl[#name] = &FLAGS_##name, true)
#define DEFINE_string(name, default_value, help)                     \
  std::string FLAGS_##name = default_value;                          \
  static const bool qmf_reg_##name =                                 \
      (qmf_stub_flags::Registry::get().str[#name] = &FLAGS_##name, true)

namespace gflags {

inline void SetUsageMessage(const std::string&) {}

inline uint32_t ParseCommandLineFlags(int* argc, char*** argv, bool) {
  for (int i = 1; i < *argc; ++i) {
    std::string arg = (*argv)[i];
    size_t dash = arg.find_first_not_of('-');
    if (dash == 0 || dash == std::string::npos) continue;
    arg = arg.substr(dash);
    size_t eq = arg.find('=');
    std::string name, value;
    if (eq == std::string::npos) {
      name = arg;
      if (qmf_stub_flags::Registry::get().bl.count(name)) {
        value = "true";
      } else if (name.rfind("no", 0) == 0 &&
                 qmf_stub_flags::Registry::get().bl.count(name.substr(2))) {
        name = name.substr(2);
        value = "false";
      } else if (i + 1 < *argc) {
        value = (*argv)[++i];
      }
    } else {
      name = arg.substr(0, eq);
      value = arg.substr(eq + 1);
    }
    qmf_stub_flags::set_flag(name, value);
  }
  return 1;
}

}  // namespace gflags
namespace google {
using gflags::ParseCommandLineFlags;
using gflags::SetUsageMessage;
}
