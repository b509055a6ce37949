// Minimal glog-compatible stub so the reference binaries build in this
// environment (no system glog). Implements just the surface the reference
// uses: LOG(level), VLOG(n), CHECK*, InitGoogleLogging, FLAGS_logtostderr.
// This is benchmark scaffolding for measuring the reference — not part of
// the qmf_tpu framework.
#pragma once

// Includes the real glog pulls in transitively (reference headers rely on
// them without including them directly).
#include <cstddef>
#include <cstdint>
#include <cstdlib>
#include <iostream>
#include <map>
#include <memory>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace google {
inline void InitGoogleLogging(const char*) {}
}

extern bool FLAGS_logtostderr;
extern int FLAGS_minloglevel;

namespace qmf_stub_log {

class LogMessage {
 public:
  LogMessage(const char* severity, bool fatal, bool enabled = true)
      : fatal_(fatal), enabled_(enabled) {
    if (enabled_) stream_ << severity << " ";
  }
  ~LogMessage() {
    if (enabled_) std::cerr << stream_.str() << std::endl;
    if (fatal_) std::abort();
  }
  std::ostream& stream() { return stream_; }

 private:
  std::ostringstream stream_;
  bool fatal_;
  bool enabled_;
};

struct Voidify {
  void operator&(std::ostream&) {}
};

}  // namespace qmf_stub_log

#define LOG_INFO qmf_stub_log::LogMessage("I", false, FLAGS_minloglevel <= 0)
#define LOG_WARNING qmf_stub_log::LogMessage("W", false, FLAGS_minloglevel <= 1)
#define LOG_ERROR qmf_stub_log::LogMessage("E", false, FLAGS_minloglevel <= 2)
#define LOG_FATAL qmf_stub_log::LogMessage("F", true)
#define LOG(severity) LOG_##severity.stream()

#define VLOG(n) \
  qmf_stub_log::Voidify() & qmf_stub_log::LogMessage("V", false, false).stream()

#define CHECK(cond) \
  (cond) ? (void)0  \
         : qmf_stub_log::Voidify() & LOG(FATAL) << "Check failed: " #cond " "
#define CHECK_EQ(a, b) CHECK((a) == (b))
#define CHECK_NE(a, b) CHECK((a) != (b))
#define CHECK_GT(a, b) CHECK((a) > (b))
#define CHECK_GE(a, b) CHECK((a) >= (b))
#define CHECK_LT(a, b) CHECK((a) < (b))
#define CHECK_LE(a, b) CHECK((a) <= (b))
