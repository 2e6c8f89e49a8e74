CXX ?= g++
CXXFLAGS ?= -O3 -march=native -std=c++14 -Wall

.PHONY: all native test bench clean

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

clean:
	rm -f native/libfastx.so native/cpu_baseline
