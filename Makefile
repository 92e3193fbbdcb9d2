# Development entry points.
#
# NOTE on this machine: a sitecustomize hook registers the axon TPU PJRT
# plugin in EVERY python process when PALLAS_AXON_POOL_IPS is set, and
# concurrent processes serialize on the TPU tunnel claim (multi-minute
# blocking). CPU-only work (tests) must strip that variable; never run two
# JAX processes concurrently.

PY_CPU := env -u PALLAS_AXON_POOL_IPS python

test:
	$(PY_CPU) -m pytest tests/ -q

test-fast:
	$(PY_CPU) -m pytest tests/ -q -x

bench:
	python bench.py

native: native/libfastio.so native/libresize.so native/libaug.so

native/libfastio.so: native/fastio.cpp
	g++ -O3 -shared -fPIC -std=c++17 -o $@ $< -lpthread

native/libresize.so: native/resize.cpp
	g++ -O3 -shared -fPIC -std=c++17 -o $@ $< -lpthread

native/libaug.so: native/aug.cpp
	g++ -O3 -shared -fPIC -std=c++17 -o $@ $< -lpthread

.PHONY: test test-fast bench native
