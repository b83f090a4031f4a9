// Syntax-gate stub (see hdk/stubs/README.md). GU_Detail with the save /
// load / clearAndDestroy surface the bridge cook uses; IOStatus mirrors
// GA_Detail::IOStatus::success().
#pragma once

class GU_Detail {
public:
    struct IOStatus {
        bool success() const { return ok_; }
        bool ok_ = false;
    };
    IOStatus save(const char* path, const void* options) const;
    IOStatus load(const char* path, const void* options);
    void clearAndDestroy();
};
