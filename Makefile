# CI entry point — the analog of the reference's GitHub workflow
# (.github/workflows/build.yml:79-86: build + full 32-model batch + pytest).
# One command a fresh checkout runs green:
#
#   make ci
#
# Stages can run individually: make native / lint / test / golden.

PY ?= python

.PHONY: ci native lint test golden bench clean

ci: native lint test golden

native:
	$(MAKE) -C csrc

# zero-warning AST lint (scripts/lint.py) — the rebuild's analog of the
# reference's -Wall -Wextra -Wpedantic -Werror tier (CMakeLists.txt:8);
# compileall keeps the plain syntax gate too
lint:
	$(PY) -m compileall -q redtime_tpu tests scripts bench.py __graft_entry__.py
	$(PY) scripts/lint.py

# full suite, including the 32-model emulator-comparison golden run
# (tests/test_golden_32models.py) when /root/reference is present
test:
	$(PY) -m pytest tests/ -q

# end-to-end drive vs the reference's bundled example (skips cleanly
# where the reference checkout is absent, e.g. GitHub-hosted runners)
golden:
	@if [ -d /root/reference/examples/1_redTime ]; then \
		$(PY) scripts/golden_check.py --mode fft; \
	else \
		echo "golden: /root/reference not present — skipped"; \
	fi

bench:
	$(PY) bench.py

clean:
	rm -f csrc/libredtime_io.so
	find . -name __pycache__ -type d -exec rm -rf {} +
