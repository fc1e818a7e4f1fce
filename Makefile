# Test lanes (VERDICT r1 #7: fast verdict in minutes on a 1-core host).
#
#   make test-fast   pure-logic lane: config tree, data semantics, math,
#                    adapters — no full-model jits (< 2 min)
#   make test        everything except tests marked `slow`
#   make test-all    the whole suite including slow subprocess/e2e tests
#
# All lanes share the persistent JAX compilation cache configured in
# tests/conftest.py, so repeat or sharded runs skip recompiles.

PYTEST := python -m pytest -q -p no:cacheprovider

FAST_TESTS := \
	tests/test_config.py \
	tests/test_config_tree.py \
	tests/test_data.py \
	tests/test_distributions.py \
	tests/test_geometry.py \
	tests/test_utils_misc.py \
	tests/test_env_adapters.py \
	tests/test_reproducibility.py

#   make test-e2e    train-to-success integration runs (tens of minutes:
#                    trains Play-LMP + TACO-RL to rollout success on the
#                    fake CALVIN env through scripts/train.py)

.PHONY: test-fast test test-all test-e2e
test-e2e:
	$(PYTEST) -m e2e tests/test_train_to_success.py

test-fast:
	$(PYTEST) $(FAST_TESTS)

test:
	$(PYTEST) -m "not slow" tests/

test-all:
	$(PYTEST) -m "not e2e" tests/
