// Syntax-gate stub (see hdk/stubs/README.md).
#pragma once

class PRM_Template {};

class PRM_TemplateBuilder {
public:
    PRM_TemplateBuilder(const char* source_file, const char* ds);
    PRM_Template* templates();
};
