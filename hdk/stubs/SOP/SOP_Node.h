// Syntax-gate stub (see hdk/stubs/README.md). SOP_Node + the verb-cook
// entry points and error-code constants the TU uses.
#pragma once
#include <OP/OP_OperatorTable.h>

inline constexpr int SOP_MESSAGE = 0;

class SOP_NodeVerb;

class SOP_Node : public OP_Network {
public:
    SOP_Node(OP_Network* net, const char* name, OP_Operator* op);
    virtual const char* inputLabel(unsigned idx) const;

protected:
    virtual OP_ERROR cookMySop(OP_Context& context) = 0;
    OP_ERROR cookMyselfAsVerb(OP_Context& context);
    virtual const SOP_NodeVerb* cookVerb() const;
};

#define CAST_SOPNODE(node) (static_cast<SOP_Node*>(node))
