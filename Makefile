# Developer loop targets. The external driver samples ~50 of the
# registered queries per round (CORRECTNESS_r{N}.json); `gate-full`
# runs the ENTIRE registry so a regression in an unsampled query cannot
# hide for a round.

SF ?= /root/testdata/sf0.01
BENCH_SF ?= /root/testdata/sf0.1

.PHONY: test gate-full bench plan-lint

test:
	python -m pytest tests/ -q

gate-full:
	python tools/compare_oracle.py --sf $(SF)

plan-lint:
	python tools/plan_lint.py

bench:
	SPARK_GRAFT_SF_DIR=$(BENCH_SF) python bench.py
