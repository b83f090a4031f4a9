// Syntax-gate stub (see hdk/stubs/README.md).
#pragma once

class UT_Exit {
public:
    static void exit(int code = 0);
};
