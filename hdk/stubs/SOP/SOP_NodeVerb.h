// Syntax-gate stub (see hdk/stubs/README.md). The SOP_NodeVerb cook
// pattern: verb base class, CookParms, parms holder, static registrar.
#pragma once
#include <GU/GU_Detail.h>
#include <SOP/SOP_Node.h>
#include <UT/UT_StringHolder.h>

class SOP_NodeParms {
public:
    virtual ~SOP_NodeParms() = default;
};

class SOP_NodeVerb {
public:
    enum CookMode {
        COOK_GENERIC,
        COOK_INPLACE,
        COOK_DUPLICATE,
        COOK_GENERATOR,
        COOK_PASSTHROUGH,
    };

    class GdhHandle {
    public:
        GU_Detail* gdpNC() const;
    };

    class CookParms {
    public:
        OP_Node* getNode() const;
        const GU_Detail* inputGeo(int idx) const;
        GdhHandle gdh() const;
        void sopAddError(int code, const char* msg) const;
        void sopAddMessage(int code, const char* msg) const;
    };

    virtual ~SOP_NodeVerb() = default;
    virtual SOP_NodeParms* allocParms() const = 0;
    virtual UT_StringHolder name() const = 0;
    virtual CookMode cookMode(const SOP_NodeParms* parms) const = 0;
    virtual void cook(const CookParms& cook) const = 0;

    template <typename T>
    class Register {
    public:
        const SOP_NodeVerb* get() const { return &verb_; }

    private:
        T verb_;
    };
};
