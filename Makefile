# Developer entry points.  `make check` is the full pre-commit gate.

.PHONY: test oracle-smoke oracle-full bench plans check

test:
	python -m pytest tests/ -q

# every registered query vs its DuckDB oracle at sf0.001 (~2 min):
# fails if ANY query loses its oracle match — run before every commit
# that touches query logic
oracle-smoke:
	python tools/check_correctness.py /root/testdata/sf0.001

# the driver-scale gate (sf0.01, what CORRECTNESS_r{N}.json samples)
oracle-full:
	python tools/check_correctness.py /root/testdata/sf0.01

bench:
	python bench.py

# regenerate PLANS.md (static + final-AQE plan audit)
plans:
	python tools/plan_audit.py

check: test oracle-smoke
