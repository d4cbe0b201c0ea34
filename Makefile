# pgslam_tpu build/test entry points (the reference's CMake analog).

NATIVE_SRC := pgslam_tpu/native/graph_core.cpp
NATIVE_LIB := pgslam_tpu/native/libpgslam_graph.so

.PHONY: all native test bench verify clean

all: native

native: $(NATIVE_LIB)

$(NATIVE_LIB): $(NATIVE_SRC)
	g++ -O2 -shared -fPIC -std=c++17 $< -o $@

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

verify: native
	python scripts/verify_drive.py

clean:
	rm -f $(NATIVE_LIB)
	find . -name __pycache__ -type d -exec rm -rf {} +
