// Syntax-gate stub (see hdk/stubs/README.md).
#pragma once
#include <UT/UT_StringHolder.h>

class UT_TempFileManager {
public:
    static UT_StringHolder class_createTempFileName(const char* tag);
};
