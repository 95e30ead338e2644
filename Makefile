PY := PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python

.PHONY: test test-fast bench native

test:
	$(PY) -m pytest tests/ -x -q

test-fast:
	$(PY) -m pytest tests/ -x -q -m "not slow"

bench:
	python bench.py

native:
	$(MAKE) -C native
