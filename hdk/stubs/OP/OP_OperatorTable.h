// Syntax-gate stub (see hdk/stubs/README.md). OP_Node/OP_Network/
// OP_Operator/OP_OperatorTable surface used by the SOP registration and
// verb-cook pattern. Signatures mirror the public HDK docs.
#pragma once
#include <UT/UT_StringHolder.h>

using OP_ERROR = int;
using fpreal = double;
using exint = long long;

inline constexpr unsigned OP_FLAG_GENERATOR = 1u;

class OP_Context {};
class OP_Network;
class OP_Operator;
class PRM_Template;
class CH_LocalVariable;

class OP_Node {
public:
    virtual ~OP_Node() = default;
    exint evalInt(const char* parm, int vi, fpreal t) const;
    void evalString(UT_StringHolder& out, const char* parm, int vi,
                    fpreal t) const;
    void setInt(const char* parm, int vi, fpreal t, exint value);
};

class OP_Network : public OP_Node {};

using OP_Constructor = OP_Node* (*)(OP_Network*, const char*, OP_Operator*);

class OP_Operator {
public:
    OP_Operator(const char* name, const char* label, OP_Constructor make,
                PRM_Template* templates, unsigned min_inputs,
                unsigned max_inputs = 9999,
                CH_LocalVariable* variables = nullptr, unsigned flags = 0);
};

class OP_OperatorTable {
public:
    void addOperator(OP_Operator* op);
};
