# Tiered test suite (VERDICT r1 #8 / r4 #8):
#   make test-fast - unit core in one process (numerics, fx, config, data)
#   make test      - full fast tier, run as THREE process-isolated groups
#   make test-slow - slow tier only (CLI subprocesses, train smokes)
#   make test-all  - everything
# All tiers run on a virtual 8-device CPU mesh (tests/conftest.py);
# set RUN_TPU_TESTS=1 to include real-TPU tests.
#
# Why groups: XLA:CPU in this jax build segfaults inside
# backend_compile_and_load after ~200 in-process compilations (observed
# twice at the same suite position with a fresh compile cache; the same
# tests pass in any smaller grouping). Process isolation bounds the
# per-process compile count and also gives per-tier wall times.
# (Wall time on a 1-vCPU box is dominated by XLA:CPU compiles: budget
# minutes cold, far less with the warm per-host cache; run `time make
# test-fast` once on your box for the local number.)

PYTEST ?= python -m pytest
# xdist only helps with >1 CPU; on a 1-vCPU box 8 workers just thrash
NPROC := $(shell nproc 2>/dev/null || echo 1)
XDIST ?= $(if $(filter-out 1,$(NPROC)),-n $(NPROC),)

# unit core: pure-numerics + config + fx/dsp (no torch oracles, no
# subprocesses)
TESTS_FAST = tests/test_config.py tests/test_config_parity.py \
	tests/test_ops.py tests/test_losses.py tests/test_fx.py \
	tests/test_augment.py tests/test_data.py tests/test_dtype.py \
	tests/test_fastconv.py tests/test_subpixel.py tests/test_wiener.py \
	tests/test_precision.py tests/test_golden_fixtures.py
# torch-oracle parity + checkpoint compat
TESTS_PARITY = tests/test_models.py tests/test_dcunet_parity.py \
	tests/test_demucs_parity.py tests/test_dptnet_parity.py \
	tests/test_compat.py tests/test_export_roundtrip_trained.py \
	tests/test_trained_ckpt.py tests/test_vendored_chain.py
# everything else (chain/stream/parallel/train/cli + new files) runs in
# the third group via --ignore of the first two
IGNORE_1_2 = $(foreach f,$(TESTS_FAST) $(TESTS_PARITY),--ignore=$(f))

.PHONY: test test-fast test-slow test-all bench oracle

test-fast:
	$(PYTEST) $(TESTS_FAST) -q $(XDIST)

test: test-fast
	$(PYTEST) $(TESTS_PARITY) -q $(XDIST)
	$(PYTEST) tests/ $(IGNORE_1_2) -q $(XDIST)

test-slow:
	$(PYTEST) tests/ -q $(XDIST) -m slow --override-ini addopts=

test-all: test
	$(PYTEST) tests/ -q $(XDIST) -m slow --override-ini addopts=

bench:
	python bench.py

oracle:
	$(MAKE) -C native
