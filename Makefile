.PHONY: test test-all test-parity clean-outputs

# Fast tier (default, mirrors reference Makefile:22-27 `pytest -k "not slow"`):
# heavy interpret-mode Pallas / multi-device-mesh / torch-golden / long-anneal
# tests are marked `slow` and excluded by pyproject addopts. Bar: < 5 min on
# an UNLOADED single-core host (the tier keeps >= 1 cheap smoke per kernel /
# sampler / trainer path — see tests/test_pallas.py fast smokes — so a plain
# `pytest` still exercises every rewritten code path). CI and the round
# driver must run `make test-all` — the fast tier alone does NOT prove
# kernel/golden parity.
test:
	python -m pytest tests/ -q

# Full suite (what the round driver / CI runs).
test-all:
	python -m pytest tests/ -q -m "slow or not slow"

# Only the torch-reference parity tests.
test-parity:
	python -m pytest tests/ -q -m "parity or (slow and parity)"

clean-outputs:
	rm -rf outputs/samples outputs/eval logs
