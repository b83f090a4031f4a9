// Syntax-gate stub (see hdk/stubs/README.md). Minimal UT_StringHolder.
#pragma once
#include <string>

class UT_StringHolder {
public:
    UT_StringHolder() = default;
    UT_StringHolder(const char* s) : s_(s ? s : "") {}          // NOLINT
    UT_StringHolder(const std::string& s) : s_(s) {}            // NOLINT
    const char* c_str() const { return s_.c_str(); }
    std::string toStdString() const { return s_; }
    bool isstring() const { return !s_.empty(); }

private:
    std::string s_;
};
