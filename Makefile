# Developer entry points. `make check` is the pre-commit gate: golden
# end-to-end parity + the fast pytest subset (<2 min). A red check means
# do not commit.

PYTEST_FAST = tests/test_end_to_end.py tests/test_dev_scan.py \
              tests/test_genotype_parity.py tests/test_dist.py

.PHONY: check native test bench

native:
	$(MAKE) -C native

check: native
	./run_test.sh
	python3 -m pytest $(PYTEST_FAST) -q

test: native
	python3 -m pytest tests/ -q

bench: native
	python3 bench.py
