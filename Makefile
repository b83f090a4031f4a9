# Build / test / bench driver (the reference's CMake+build.sh+Jenkins matrix
# collapses to this: the Python package needs no compilation; the native host
# runtime is one shared library).

.PHONY: all native test test-fast tsan hdk-syntax bench clean

all: native

native:
	sh native/build.sh

test: native
	python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/test_format.py tests/test_native_io.py \
	    tests/test_grid.py tests/test_pallas_quantize.py -q

# Race-detection gate for the threaded native library (safety-by-
# disjointness, checked — not just argued). Also run by the test suite.
tsan:
	g++ -fsanitize=thread -O1 -std=c++17 -pthread native/tsan_check.cpp \
	    -o /tmp/vqvdb_tsan_check
	TSAN_OPTIONS="halt_on_error=1" /tmp/vqvdb_tsan_check

# Houdini SOP syntax gate: no HDK exists here, so the SOP translation
# unit is type-checked against minimal stub headers (hdk/stubs/README.md)
# — red on syntax/signature errors, no Houdini required. The real build
# uses hdk/CMakeLists.txt against an installed HDK.
hdk-syntax:
	g++ -std=c++17 -fsyntax-only -Wall -Wextra -I hdk/stubs \
	    hdk/SOP_VQVDB.cpp
	@echo "hdk syntax: OK"

bench: native
	python bench.py

clean:
	rm -f vqvdb_tpu/native/libvqvdb_native.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
