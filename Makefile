# CI entry point — the analog of the reference's GitHub workflow
# (.github/workflows/build.yml:79-86: build + full 32-model batch + pytest).
# One command a fresh checkout runs green:
#
#   make ci
#
# Stages can run individually: make native / lint / test / golden.

PY ?= python

.PHONY: ci ci-camb native lint test golden bench clean

ci: native lint test golden ci-camb

# real-CAMB integration (reference build.yml:79-86 runs the actual CAMB
# binary twice per model before the solver).  No CAMB exists in this
# environment, so the stage self-detects: set CAMB=/path/to/camb or put
# `camb` on PATH and the full two-pass pipeline runs on one model;
# otherwise it reports and skips (mock-CAMB coverage lives in
# tests/test_orchestration.py).
CAMB ?= $(shell command -v camb 2>/dev/null)
ci-camb:
	@if [ -n "$(CAMB)" ] && [ -x "$(CAMB)" ]; then \
		tmp=$$(mktemp -d) && \
		printf '2.02\n1.01\n0.0\n' > $$tmp/redshifts.txt && \
		$(PY) scripts/run_redtime.py --camb-exec "$(CAMB)" \
			--redshift-file $$tmp/redshifts.txt \
			--output-dir $$tmp M000 0.1335 0.02258 0.8 0.71 \
			0.963 -1.0 0.0 0.0 && \
		test -s $$tmp/redTime_M000.dat && rm -rf $$tmp && \
		echo "ci-camb: real-CAMB pipeline OK"; \
	else \
		echo "ci-camb: no camb binary found — skipped"; \
	fi

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
