# Two-tier test suite (VERDICT r1 #8):
#   make test      - fast core tier (default pytest profile, -m "not slow")
#   make test-slow - slow tier only (CLI subprocesses, train smokes)
#   make test-all  - everything
# All tiers run on a virtual 8-device CPU mesh (tests/conftest.py);
# set RUN_TPU_TESTS=1 to include real-TPU tests.

PYTEST ?= python -m pytest
# xdist only helps with >1 CPU; on a 1-vCPU box 8 workers just thrash
NPROC := $(shell nproc 2>/dev/null || echo 1)
XDIST ?= $(if $(filter-out 1,$(NPROC)),-n $(NPROC),)

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
