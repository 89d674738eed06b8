# Two-tier test suite (VERDICT r1 #8):
#   make test      - fast core tier (default pytest profile, -m "not slow")
#   make test-slow - slow tier only (CLI subprocesses, train smokes)
#   make test-all  - everything
# All tiers run on a virtual 8-device CPU mesh (tests/conftest.py);
# set RUN_TPU_TESTS=1 to include real-TPU tests.

PYTEST ?= python -m pytest
XDIST ?= -n 8

.PHONY: test test-slow test-all bench oracle

test:
	$(PYTEST) tests/ -q $(XDIST)

test-slow:
	$(PYTEST) tests/ -q $(XDIST) -m slow --override-ini addopts=

test-all:
	$(PYTEST) tests/ -q $(XDIST) --override-ini addopts=

bench:
	python bench.py

oracle:
	$(MAKE) -C native
