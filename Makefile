CXX ?= g++
CXXFLAGS ?= -O3 -march=native -std=c++14 -Wall

.PHONY: all native test bench tpu-check clean

all: native

native: native/libfastx.so native/cpu_baseline

native/libfastx.so: native/fastx_parser.cpp
	$(CXX) $(CXXFLAGS) -shared -fPIC -o $@ $<

native/cpu_baseline: native/cpu_baseline.cpp
	$(CXX) $(CXXFLAGS) -fopenmp -o $@ $<

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

# Real-chip differential gate: all Pallas kernel families vs the jnp scan,
# one chip claim, log recorded in native/tpu_check_last.txt.
tpu-check:
	python native/tpu_check.py

clean:
	rm -f native/libfastx.so native/cpu_baseline
