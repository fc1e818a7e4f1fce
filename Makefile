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
	tests/test_reproducibility.py \
	tests/test_parity_harness.py \
	tests/test_archived_evidence.py

#   make test-e2e    train-to-success integration runs (tens of minutes:
#                    trains Play-LMP + TACO-RL to rollout success on the
#                    fake CALVIN env through scripts/train.py)

.PHONY: test-fast test test-all test-e2e
test-e2e:
	$(PYTEST) -m e2e tests/

test-fast:
	$(PYTEST) $(FAST_TESTS)

test:
	$(PYTEST) -m "not slow" tests/

# Sharded heavy lane: each shard fits a single 590 s review window on this
# 1-core host even cold-cache (the persistent JAX compile cache makes warm
# reruns much faster); run shards in SEPARATE serial invocations.
HEAVY_SHARD_1 := tests/test_play_lmp.py tests/test_scanned_step.py tests/test_networks.py
HEAVY_SHARD_2 := tests/test_cql.py tests/test_tacorl.py tests/test_ril.py tests/test_online_rl.py
HEAVY_SHARD_3 := tests/test_d4rl.py tests/test_torch_convert.py tests/test_full_model_parity.py
HEAVY_SHARD_4 := tests/test_evaluation.py tests/test_callbacks.py tests/test_image_aug.py tests/test_pallas_aug.py tests/test_multichip_rl.py tests/test_train_cli.py tests/test_mesh.py tests/test_multiprocess.py tests/test_trainer_robustness.py tests/test_expert_play.py tests/test_horizon_curriculum.py

test-heavy-1:
	$(PYTEST) -m "not slow" $(HEAVY_SHARD_1)
test-heavy-2:
	$(PYTEST) -m "not slow" $(HEAVY_SHARD_2)
test-heavy-3:
	$(PYTEST) -m "not slow" $(HEAVY_SHARD_3)
test-heavy-4:
	$(PYTEST) -m "not slow" $(HEAVY_SHARD_4)

test-all:
	$(PYTEST) -m "not e2e" tests/
