// Syntax-gate stub (see hdk/stubs/README.md). The real header emits the
// DSO version tag; nothing is needed to type-check the TU.
#pragma once
