.PHONY: native test bench

native:
	python setup.py build_ext --inplace

test: native
	env -u PALLAS_AXON_POOL_IPS python -m pytest tests/ -x -q

bench:
	python bench.py
