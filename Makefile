# Build / test / bench driver (the reference's CMake+build.sh+Jenkins matrix
# collapses to this: the Python package needs no compilation; the native host
# runtime is one shared library).

.PHONY: all native test test-fast bench clean

all: native

native:
	sh native/build.sh

test: native
	python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/test_format.py tests/test_native_io.py \
	    tests/test_grid.py tests/test_pallas_quantize.py -q

bench: native
	python bench.py

clean:
	rm -f vqvdb_tpu/native/libvqvdb_native.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
