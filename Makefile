.PHONY: test test-all test-parity clean-outputs

# Fast tier (default, mirrors reference Makefile:22-27 `pytest -k "not slow"`):
# heavy interpret-mode Pallas / multi-device-mesh / torch-golden tests are
# marked `slow` and excluded by pyproject addopts.
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
