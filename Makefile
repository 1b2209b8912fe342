# Developer entry points.

.PHONY: all native test test-fast smoke bench clean

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow"

smoke:
	python tools/e2e_smoke.py /tmp/fwn_smoke --cpu

bench:
	python bench.py

clean:
	$(MAKE) -C native clean
	rm -rf build *.egg-info
